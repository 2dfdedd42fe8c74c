package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.taskrouter.{Ingest, Model}

/** Live socket-to-sink ingress — the reference's HTTP listener made
  * runnable (bin/www:28-34 server bootstrap; routes/events.js:689
  * `router.post("/", authenticate, processRequest)`): an embedded JDK
  * HttpServer that accepts a JSON array of CloudEvents by POST,
  * validates the HMAC-SHA1 signature header exactly as the reference's
  * authenticate middleware (middleware/authenticate-twilio-signature
  * .js:4-14 — same token + url + raw body MAC, via [[Signature]]),
  * parses through [[Ingest.parse]], and appends to the partitioned
  * event log ([[EventLog.append]]).
  *
  * This is the PARITY EDGE, not the scale path: one webhook endpoint
  * feeding the same log the engine's file/stream sources read. At
  * 100 TB ingestion lands on a message bus and Structured Streaming
  * takes over (streaming/StreamingPipeline); nothing downstream knows
  * which ingress produced the log.
  */
object HttpIngress {

  final case class Server(http: HttpServer) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = http.stop(0)
  }

  /** Start the listener on `port` (0 = ephemeral). `publicUrl` is the
    * externally-visible webhook URL the signature covers — the
    * reference signs url + raw body, NOT the local bind address.
    *
    * `dev` gates whether 500 pages carry the stack trace, mirroring
    * Express's `app.get('env') === 'development'` check (app.js:57 —
    * NODE_ENV unset defaults to development, so the same env probe is
    * the default here). Production deployments get the message-only
    * error page; stacks never leak to clients. */
  def start(spark: SparkSession, authToken: String, publicUrl: String,
      logPath: String, port: Int = 0,
      dev: Boolean = sys.env.get("NODE_ENV").forall(_ == "development")): Server = {
    val http = HttpServer.create(new InetSocketAddress(port), 0)
    http.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod == "GET" &&
              ex.getRequestURI.getPath == "/stylesheets/style.css") {
            // express.static over public/ (app.js:39) — the one static
            // asset, linked by every rendered page (layout.pug:5)
            respond(ex, 200, graft.report.Report.Stylesheet,
              contentType = "text/css; charset=utf-8")
          } else if (ex.getRequestMethod == "GET") {
            // The reference's demo loop: POST events at the webhook,
            // then open the same server in a browser and read both
            // report tables (routes/index.js:5-31 renders index.pug
            // from the cached model per request). Derivation runs on
            // the log as it stands at request time — unauthenticated
            // like the reference's GET (only POST carries a signature).
            respond(ex, 200, renderReport(spark, logPath),
              contentType = "text/html; charset=utf-8")
          } else if (ex.getRequestMethod != "POST")
            respondError(ex, 404, "Not Found")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val sig =
              Option(ex.getRequestHeaders.getFirst("X-Twilio-Signature")).getOrElse("")
            val expected = Signature.hmacSha1Base64(authToken)(publicUrl, body)
            if (!java.security.MessageDigest.isEqual(
                expected.getBytes(UTF_8), sig.getBytes(UTF_8)))
              respondError(ex, 403, "Forbidden")
            else {
              val n = append(spark, body, logPath)
              respond(ex, 200, s"""{"ingested":$n}""")
            }
          }
        } catch {
          case e: Exception =>
            respondError(ex, 500,
              s"ingest error: ${e.getClass.getSimpleName}",
              if (dev)
                e.getStackTrace.take(12).mkString(s"$e\n    at ", "\n    at ", "")
              else "")
        }
    })
    http.start()
    Server(http)
  }

  /** Parse one request body (JSON array of CloudEvents; a bare object
    * is accepted as a 1-element array) and append to the log. Returns
    * the number of events that survived parse+gate and were written. */
  private def append(spark: SparkSession, body: String, logPath: String): Long = {
    import spark.implicits._
    val arrayBody = if (body.trim.startsWith("[")) body else s"[$body]"
    val envelopes = Seq(arrayBody).toDF("value")
      .select(explode(from_json($"value", ArrayType(Model.cloudEventSchema))).as("ce"))
      .select($"ce.id".as("id"), $"ce.type".as("type"), $"ce.data".as("data"))
    val parsed = Ingest.parse(envelopes).cache()
    try {
      val n = parsed.count()
      if (n > 0) EventLog.append(parsed, logPath)
      n
    } finally { parsed.unpersist(); () }
  }

  /** Render the reference's `GET /` page over everything ingressed so
    * far: read the event log, derive the agent + conversation report
    * frames, emit the two-table HTML (views/index.pug:9-83). An empty
    * or not-yet-created log renders the page with empty tables — the
    * reference does the same with an empty event cache. */
  private def renderReport(spark: SparkSession, logPath: String): String = {
    import graft.report.Report
    import graft.taskrouter.Derivation
    val parsed = scala.util.Try(EventLog.read(spark, logPath)).toOption
    parsed match {
      case Some(log) =>
        val ev = log.drop("event_date")
        Report.renderHtml(
          Report.agentsReport(Derivation.agents(ev)),
          Report.conversationsReport(Derivation.segments(ev)))
      case None =>
        Report.renderHtml(
          Report.agentsReport(Derivation.agents(emptyParsed(spark))),
          Report.conversationsReport(Derivation.segments(emptyParsed(spark))))
    }
  }

  private def emptyParsed(spark: SparkSession) =
    Ingest.parse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Model.cloudEventSchema))

  /** The reference's error page (views/error.pug via app.js:55-64):
    * HTML with the message, status and (for 500s) stack — not the
    * plain-text bodies of earlier rounds. */
  private def respondError(ex: HttpExchange, code: Int, message: String,
      stack: String = ""): Unit =
    respond(ex, code,
      graft.report.Report.renderErrorHtml(code, message, stack),
      contentType = "text/html; charset=utf-8")

  private def respond(ex: HttpExchange, code: Int, msg: String,
      contentType: String = "text/plain"): Unit = {
    val b = msg.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, b.length.toLong)
    val os = ex.getResponseBody
    try os.write(b) finally os.close()
  }
}
