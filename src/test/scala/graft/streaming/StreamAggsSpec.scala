package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Native streaming session windows: gap merging, append-mode
  * emission on watermark passage, per-key isolation. */
class StreamAggsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gap-adjacent events merge; sessions close when the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = StreamAggs.sessionCounts(
      input.toDF().toDF("user", "ts"), "user", "ts",
      gap = "1 minute", watermark = "0 seconds")

    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // burst of two events 30s apart = one session for alice;
      // bob's lone event is its own session
      input.addData(
        ("alice", ts("2026-08-12 10:00:00")),
        ("alice", ts("2026-08-12 10:00:30")),
        ("bob", ts("2026-08-12 10:00:10")))
      q.processAllAvailable()
      // watermark jumps past both sessions' ends -> they emit
      input.addData(("carol", ts("2026-08-12 11:00:00")))
      q.processAllAvailable()
      input.addData(("carol", ts("2026-08-12 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sess")
      .select($"user", $"session_start", $"session_end", $"n_events")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSet
    // session end = last event + gap
    assert(rows.contains(("alice", ts("2026-08-12 10:00:00"), ts("2026-08-12 10:01:30"), 2L)), rows)
    assert(rows.contains(("bob", ts("2026-08-12 10:00:10"), ts("2026-08-12 10:01:10"), 1L)), rows)
    // carol's 11:00 session closed once the 12:00 event moved the watermark
    assert(rows.contains(("carol", ts("2026-08-12 11:00:00"), ts("2026-08-12 11:01:00"), 1L)), rows)
  }
}
