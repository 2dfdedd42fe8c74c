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
    val logPath = "target/graft-stage/http-ingress-spec/log"
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

      // authenticate middleware parity: wrong signature → 403, no write
      assert(post(body, "not-the-mac").statusCode() == 403)
      assert(!new java.io.File(logPath).exists())
      // non-POST → 404 (the reference routes only POST /)
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.port}/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 404)

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
}
