package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join: correctness of the time-range match
  * and watermark acceptance (append mode requires Spark to prove the
  * state is bounded — the query would be rejected otherwise). */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("purchases join clicks of the same user within the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val purchases = MemoryStream[(String, Timestamp)]

    val l = clicks.toDF().toDF("user", "click_ts")
      .withWatermark("click_ts", "0 seconds")
    val r = purchases.toDF().toDF("p_user", "purchase_ts")
      .withWatermark("purchase_ts", "0 seconds")

    val lr = l.withColumnRenamed("user", "u")
    val rr = r.withColumnRenamed("p_user", "u")
    val joined = StreamJoins.intervalJoin(
        lr, rr, "u", "click_ts", "purchase_ts", "1 HOUR")
      .select(lr("u").as("user"), col("click_ts"), col("purchase_ts"))

    val q = joined.writeStream.format("memory").queryName("s2s_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        ("alice", ts("2026-08-12 10:00:00")),
        ("bob", ts("2026-08-12 10:30:00")))
      purchases.addData(
        ("alice", ts("2026-08-12 10:45:00")), // within 1h of alice's click
        ("alice", ts("2026-08-12 12:00:00")), // too late
        ("bob", ts("2026-08-12 10:29:00")),   // before the click
        ("carol", ts("2026-08-12 10:10:00"))) // no click at all
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("s2s_join")
      .select($"user", $"purchase_ts").as[(String, Timestamp)].collect().toSet
    assert(rows == Set(("alice", ts("2026-08-12 10:45:00"))), rows)
  }

  test("outer interval join: unmatched left rows emit NULLs only after the watermark proves the negative") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val purchases = MemoryStream[(String, Timestamp)]

    val l = clicks.toDF().toDF("user", "click_ts")
      .withWatermark("click_ts", "0 seconds")
    val r = purchases.toDF().toDF("p_user", "purchase_ts")
      .withWatermark("purchase_ts", "0 seconds")

    val lr = l.withColumnRenamed("user", "u")
    val rr = r.withColumnRenamed("p_user", "u")
    val joined = StreamJoins.intervalJoinOuter(
        lr, rr, "u", "click_ts", "purchase_ts", "1 HOUR")
      .select(lr("u").as("user"), col("click_ts"), col("purchase_ts"))

    val q = joined.writeStream.format("memory").queryName("s2s_outer")
      .outputMode("append").start()
    try {
      clicks.addData(
        ("alice", ts("2026-08-12 10:00:00")),
        ("bob", ts("2026-08-12 10:30:00"))) // will never see a purchase
      purchases.addData(("alice", ts("2026-08-12 10:45:00")))
      q.processAllAvailable()
      // bob's negative is not provable yet: the watermark has not
      // passed bob's click + horizon, so only alice's match is out
      val early = spark.table("s2s_outer").select($"user")
        .as[String].collect().toSet
      assert(early == Set("alice"), early)
      // advance BOTH watermarks past 11:30 (global watermark = min),
      // then run follow-up batches so the eviction pass emits the
      // null-augmented row
      clicks.addData(("sentinel", ts("2026-08-12 13:00:00")))
      purchases.addData(("sentinel2", ts("2026-08-12 13:00:00")))
      q.processAllAvailable()
      clicks.addData(("sentinel", ts("2026-08-12 14:00:00")))
      purchases.addData(("sentinel2", ts("2026-08-12 14:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("s2s_outer")
      .select($"user", $"purchase_ts").as[(String, Option[Timestamp])]
      .collect().toSet
    assert(rows.contains(("bob", None)), rows)
    assert(rows.contains(("alice", Some(ts("2026-08-12 10:45:00")))))
    // exactly one emission per left row: no duplicate bob
    val bobs = spark.table("s2s_outer").filter($"user" === "bob").count()
    assert(bobs == 1L)
  }

  test("stream-static enrich: stateless broadcast lookup, left-outer on misses") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[(String, Long)]
    val dim = Seq(("alice", "US"), ("bob", "DE")).toDF("user", "country")

    val enriched = StreamJoins.enrich(
      events.toDF().toDF("user", "amount"), dim, "user")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      events.addData(("alice", 10L), ("carol", 7L))
      q.processAllAvailable()
      events.addData(("bob", 3L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("enriched")
      .select($"user", $"amount", $"country")
      .as[(String, Long, Option[String])].collect().toSet
    assert(rows == Set(
      ("alice", 10L, Some("US")),
      ("carol", 7L, None),      // no dim row -> kept with NULL
      ("bob", 3L, Some("DE"))), rows)
  }
}
