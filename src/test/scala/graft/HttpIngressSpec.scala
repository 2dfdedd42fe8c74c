package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.sources.{EventLog, HttpIngress, Signature}
import graft.taskrouter.{Ingest, Synth}

/** Live socket-to-sink parity (r7, VERDICT item 8): POST a signed
  * CloudEvents array at the embedded listener, events land parsed in
  * the partitioned log; a bad signature is rejected with nothing
  * written — the reference's authenticate middleware behavior. */
class HttpIngressSpec extends SparkSpec {
  import spark.implicits._

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(path))
  }

  test("authenticated POST lands parsed events; bad signature is 403") {
    val logPath = "target/graft-test/http-ingress-spec/log"
    rm(logPath)
    val token = "test-auth-token"
    val url = "https://example.test/events" // signed webhook URL
    val srv = HttpIngress.start(spark, token, url, logPath)
    try {
      val envelopes = Synth.cloudEvents(spark, sf0001).limit(8)
      val docs = envelopes
        .select(to_json(struct($"id", $"type", $"data"))).as[String].collect()
      val body = docs.mkString("[", ",", "]")

      val client = HttpClient.newHttpClient()
      def post(b: String, sig: String): HttpResponse[String] = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.port}/"))
          .header("X-Twilio-Signature", sig)
          .POST(HttpRequest.BodyPublishers.ofString(b)).build(),
        HttpResponse.BodyHandlers.ofString())

      // authenticate middleware parity: wrong signature → 403, no
      // write — and the body is the reference's HTML error view
      // (views/error.pug: h1 message, h2 status), not plain text
      val forbidden = post(body, "not-the-mac")
      assert(forbidden.statusCode() == 403)
      assert(forbidden.headers().firstValue("Content-Type")
        .orElse("").startsWith("text/html"))
      assert(forbidden.body().contains("<h1>Forbidden</h1>") &&
        forbidden.body().contains("<h2>403</h2>"), forbidden.body())
      assert(!new java.io.File(logPath).exists())
      // GET before anything landed → the report page with EMPTY tables
      // (the reference renders index.pug over an empty cache the same
      // way); non-GET/POST methods → 404
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.port}/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 200)
      assert(get.body().contains("agent data") &&
        get.body().contains("conversations data"), get.body())
      // express.static parity (app.js:39 + layout.pug:5): the page
      // links the stylesheet and the server serves it as text/css
      assert(get.body().contains(
        """<link rel="stylesheet" href="/stylesheets/style.css">"""), get.body())
      val css = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://localhost:${srv.port}/stylesheets/style.css")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(css.statusCode() == 200)
      assert(css.headers().firstValue("Content-Type")
        .orElse("").startsWith("text/css"), css.headers().toString)
      assert(css.body().contains("padding: 50px") &&
        css.body().contains("#00B7FF"), css.body())
      val del = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.port}/")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() == 404)
      assert(del.body().contains("<h1>Not Found</h1>") &&
        del.body().contains("<h2>404</h2>"), del.body())

      // correct HMAC-SHA1 over url + raw body → 200 and a parsed append
      val sig = Signature.hmacSha1Base64(token)(url, body)
      assert(post(body, sig).statusCode() == 200)

      val landed = EventLog.read(spark, logPath)
      val want = Ingest.parseJson(spark, docs.toSeq.toDS())
      assert(landed.count() == want.count() && want.count() > 0)
      assert(landed.select($"event_id").as[String].collect().sorted.toSeq ==
        want.select($"event_id").as[String].collect().sorted.toSeq)
      // date-partitioned layout: pruning-ready event_date dirs
      assert(landed.columns.contains("event_date"))
    } finally srv.stop()
  }

  test("500 pages carry the stack only in dev mode — production leaks nothing") {
    // the r9 ADVICE gap: the reference gates the stack behind
    // Express's env check; the port now does too (r10). Force a 500
    // by pointing the log at an unwritable path.
    val token = "test-auth-token"
    val url = "https://example.test/events"
    val envelopes = Synth.cloudEvents(spark, sf0001).limit(2)
    val body = envelopes
      .select(to_json(struct($"id", $"type", $"data"))).as[String]
      .collect().mkString("[", ",", "]")
    val sig = Signature.hmacSha1Base64(token)(url, body)
    def errBody(dev: Boolean): String = {
      val srv = HttpIngress.start(spark, token, url,
        "/proc/graft-no-such-dir/log", dev = dev)
      try {
        val client = HttpClient.newHttpClient()
        val resp = client.send(
          HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.port}/"))
            .header("X-Twilio-Signature", sig)
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 500, s"expected 500, got ${resp.statusCode()}")
        resp.body()
      } finally srv.stop()
    }
    val devB = errBody(dev = true)
    val prodB = errBody(dev = false)
    // dev: the error view shows the trace (the NODE_ENV-unset default)
    assert(devB.contains("    at "), devB.take(400))
    // prod: message yes, stack frames never
    assert(prodB.contains("ingest error"), prodB.take(400))
    assert(!prodB.contains("    at "), prodB.take(400))
  }

  test("socket to report: POSTed corpus derives the same segments as batch") {
    val logPath = "target/graft-test/http-ingress-spec/e2e-log"
    rm(logPath)
    val token = "e2e-token"
    val url = "https://example.test/events"
    val srv = HttpIngress.start(spark, token, url, logPath)
    try {
      // the full sf0.001 scenario corpus through the live socket, in
      // webhook-sized batches (one giant body would trip the JSON
      // parser's string-length limit — and real webhooks batch anyway)
      val docs = Synth.cloudEvents(spark, sf0001)
        .select(to_json(struct($"id", $"type", $"data"))).as[String].collect()
      val client = java.net.http.HttpClient.newHttpClient()
      docs.grouped(2000).foreach { chunk =>
        val body = chunk.mkString("[", ",", "]")
        val sig = Signature.hmacSha1Base64(token)(url, body)
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.port}/"))
            .header("X-Twilio-Signature", sig)
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, resp.body())
        assert(!resp.body().contains("\"ingested\":0"), resp.body())
      }

      // derive the reporting model from the INGRESSED log and compare
      // with the batch derivation over the same corpus
      val fromSocket = graft.taskrouter.Derivation
        .segments(EventLog.read(spark, logPath))
      val fromBatch = Synth.segments(spark, sf0001)
      assert(fromSocket.count() == fromBatch.count())
      val keyOf = (df: org.apache.spark.sql.DataFrame) => df
        .select($"conversation_id", $"segment_kind").as[(String, String)]
        .collect().sorted.toSeq
      assert(keyOf(fromSocket) == keyOf(fromBatch))

      // and the reference's demo loop closes over the SAME server: GET /
      // returns both report tables rendered from the ingressed events
      // (routes/index.js:5-31), no auth on the read path
      val page = client.send(
        java.net.http.HttpRequest.newBuilder(
          URI.create(s"http://localhost:${srv.port}/")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(page.statusCode() == 200)
      assert(page.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/html"))
      assert(page.body().contains("agent data") &&
        page.body().contains("conversations data") &&
        page.body().contains("<td>"), page.body().take(500))
      // a conversation id derived from the POSTed corpus appears on the page
      val anyConv = fromSocket.select($"conversation_id").as[String].head()
      assert(page.body().contains(anyConv.take(10)))
    } finally srv.stop()
  }
}
