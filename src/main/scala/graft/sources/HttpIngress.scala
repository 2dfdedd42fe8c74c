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
    * reference signs url + raw body, NOT the local bind address. */
  def start(spark: SparkSession, authToken: String, publicUrl: String,
      logPath: String, port: Int = 0): Server = {
    val http = HttpServer.create(new InetSocketAddress(port), 0)
    http.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod != "POST") respond(ex, 404, "not found")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val sig =
              Option(ex.getRequestHeaders.getFirst("X-Twilio-Signature")).getOrElse("")
            val expected = Signature.hmacSha1Base64(authToken)(publicUrl, body)
            if (!java.security.MessageDigest.isEqual(
                expected.getBytes(UTF_8), sig.getBytes(UTF_8)))
              respond(ex, 403, "forbidden")
            else {
              val n = append(spark, body, logPath)
              respond(ex, 200, s"""{"ingested":$n}""")
            }
          }
        } catch {
          case e: Exception =>
            respond(ex, 500, s"ingest error: ${e.getClass.getSimpleName}")
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

  private def respond(ex: HttpExchange, code: Int, msg: String): Unit = {
    val b = msg.getBytes(UTF_8)
    ex.sendResponseHeaders(code, b.length.toLong)
    val os = ex.getResponseBody
    try os.write(b) finally os.close()
  }
}
