package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The metrics listener must capture every micro-batch's progress with
  * exact row accounting, expose state-store telemetry for stateful
  * queries, and roll up into the on-call summary. */
class StreamMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("recorder captures per-batch rows, state telemetry, and the rollup") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    val rec = new StreamMetrics.Recorder
    spark.streams.addListener(rec)
    val input = MemoryStream[(String, Timestamp)]
    // a STATEFUL query so stateOperators is populated
    val counts = input.toDF().toDF("user", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"user")
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("metrics_probe")
      .outputMode("update").start()
    try {
      input.addData(("a", ts("2026-08-12 10:00:00")), ("b", ts("2026-08-12 10:10:00")))
      q.processAllAvailable()
      input.addData(("a", ts("2026-08-12 10:20:00")))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.streams.removeListener(rec)
    }
    rec.flush(spark, dir)

    val m = StreamMetrics.metrics(spark, dir)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // exact input-row accounting across batches
    assert(m.agg(sum($"numInputRows")).as[Long].head() == 3L)
    // identity columns carry the query
    assert(rows.forall(_.getAs[String]("queryId").nonEmpty))
    assert(rows.exists(_.getAs[String]("name") == "metrics_probe"))
    // the stateful aggregate reports state rows (2 users in the window)
    assert(rows.map(_.getAs[Long]("stateRows")).max >= 2L)
    // a second flush with no new progress appends nothing
    rec.flush(spark, dir)
    assert(StreamMetrics.metrics(spark, dir).count() == m.count())

    val s = StreamMetrics.summary(StreamMetrics.metrics(spark, dir))
      .filter($"name" === "metrics_probe").collect()
    assert(s.length == 1)
    assert(s.head.getAs[Long]("total_rows") == 3L)
    assert(s.head.getAs[Long]("n_batches") >= 2L)
    assert(s.head.getAs[Long]("peak_state_rows") >= 2L)
  }
}
