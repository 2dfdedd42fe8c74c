package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Event-time state TTL (SURVEY §2.10): an idle key's state machine is
  * evicted once the watermark passes its newest event + TTL; an event
  * arriving after eviction is tolerated-dropped exactly like the
  * reference's missing-in-progress path (routes/events.js:308-310).
  * The reference itself keeps state forever (app.js:13-16) — the TTL
  * is our documented fix for that unbounded-state flaw. */
class StreamingTtlSpec extends SparkSpec {
  import spark.implicits._

  private def jstr(s: String): String =
    "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
  private var seq = 0
  private def ce(et: String, ts: String, fields: (String, String)*): String = {
    seq += 1
    val payload = (Seq("eventtype" -> et, "timestamp" -> ts) ++ fields)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    s"""{"id":${jstr(f"TT$seq%04d")},"type":${jstr("com.twilio.taskrouter." + et)},"data":{"payload":$payload,"publisher_metadata":{"account_sid":"AC1"}}}"""
  }

  private def task(sid: String) = Seq(
    "task_sid" -> sid, "reservation_sid" -> s"WR$sid", "worker_sid" -> "WK1",
    "task_channel_unique_name" -> "voice", "task_queue_name" -> "Support",
    "task_queue_sid" -> "WQ1", "workflow_name" -> "Main")

  private var qn = 0
  /** Run micro-batches through the changelog with the given TTL; return
    * the last-write-wins table. */
  private def run(batches: Seq[Seq[String]], ttlMs: Option[Long]): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    qn += 1
    val name = s"ttl_changelog_$qn"
    val input = MemoryStream[String]
    val changelog = StreamingPipeline.segmentsChangelog(spark,
      StreamingPipeline.parseStream(spark, input.toDF()), ttlMs)
    val q = changelog.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    StreamingPipeline.latestSegments(spark.table(name))
  }

  // the watched task: accepted at 10:00:30, then nothing for hours
  private def watched = Seq(
    ce("task-queue.entered", "2026-08-12T10:00:00.000Z", task("WTTL"): _*),
    ce("reservation.created", "2026-08-12T10:00:05.000Z", task("WTTL"): _*),
    ce("reservation.accepted", "2026-08-12T10:00:30.000Z", task("WTTL"): _*))

  test("task state evicted after TTL: late completed is tolerated-dropped") {
    // watermark delay is 1h (parseStream); TTL 1h ⇒ deadline ≈ 11:00:30.
    // b2 advances the watermark to 12:00 (13:00 event − 1h); b3 runs the
    // timeout sweep; b4's completed finds no state.
    val batches = Seq(
      watched,
      Seq(ce("task-queue.entered", "2026-08-12T13:00:00.000Z", task("WOTHER"): _*)),
      Seq(ce("task-queue.entered", "2026-08-12T13:05:00.000Z", task("WOTHER2"): _*)),
      Seq(ce("reservation.completed", "2026-08-12T13:10:00.000Z", task("WTTL"): _*)))
    val latest = run(batches, ttlMs = Some(3600L * 1000))
    val mine = latest.filter($"segment_external_id" === "WTTL")
    // the accepted pair survives, but no conversion happened
    assert(mine.filter($"segment_kind" === "QUEUE").count() == 1)
    assert(mine.filter($"segment_kind" === "CONVERSATION IN PROGRESS").count() == 1)
    assert(mine.filter($"segment_kind" === "CONVERSATION").count() == 0)
  }

  test("control: without TTL the same late completed still converts") {
    val batches = Seq(
      watched,
      Seq(ce("task-queue.entered", "2026-08-12T13:00:00.000Z", task("WOTHER3"): _*)),
      Seq(ce("task-queue.entered", "2026-08-12T13:05:00.000Z", task("WOTHER4"): _*)),
      Seq(ce("reservation.completed", "2026-08-12T13:10:00.000Z", task("WTTL"): _*)))
    val latest = run(batches, ttlMs = None)
    val mine = latest.filter($"segment_external_id" === "WTTL")
    assert(mine.filter($"segment_kind" === "CONVERSATION").count() == 1)
    assert(mine.filter($"segment_kind" === "CONVERSATION IN PROGRESS").count() == 0)
  }

  test("worker state evicted after TTL: post-TTL update opens fresh, closes nothing") {
    def wk(sid: String, act: String) = Seq(
      "worker_sid" -> sid, "worker_activity_name" -> act,
      "worker_attributes" -> "{}")
    val batches = Seq(
      Seq(ce("worker.created", "2026-08-12T10:00:00.000Z", wk("WKTTL", "Available"): _*)),
      Seq(ce("worker.created", "2026-08-12T13:00:00.000Z", wk("WKOTH1", "Available"): _*)),
      Seq(ce("worker.created", "2026-08-12T13:05:00.000Z", wk("WKOTH2", "Available"): _*)),
      Seq(ce("worker.activity.update", "2026-08-12T13:10:00.000Z", wk("WKTTL", "Busy"): _*)))
    val latest = run(batches, ttlMs = Some(3600L * 1000))
    val mine = latest.filter($"agent_uuid" === "WKTTL")
    // the original span was never closed (its closer's state expired);
    // the update opened a new in-progress span of its own
    assert(mine.filter($"segment_kind" === "AGENT STATUS").count() == 0)
    assert(mine.filter($"segment_kind" === "AGENT STATUS IN PROGRESS").count() == 2)
  }
}
