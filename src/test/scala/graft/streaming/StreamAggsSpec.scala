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

  test("drift histogram: windows finalize on watermark passage and match the batch leg") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val hist = StreamAggs.driftHistogram(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", watermark = "0 seconds", period = "1 hour")

    val data = Seq(
      // hour 10: two clicks land in bin 0 (value<50), one in bin 9 (capped)
      (ts("2026-08-12 10:05:00"), "click", 12.0),
      (ts("2026-08-12 10:10:00"), "click", 49.99),
      (ts("2026-08-12 10:20:00"), "click", 700.0),
      (ts("2026-08-12 10:30:00"), "view", 75.0),
      // hour 11: shifted distribution
      (ts("2026-08-12 11:05:00"), "click", 260.0),
      (ts("2026-08-12 11:06:00"), "click", 260.5))
    val q = hist.writeStream.format("memory").queryName("drift_hist")
      .outputMode("append").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      // push the watermark past both hours so every window emits
      input.addData((ts("2026-08-12 13:00:00"), "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("drift_hist")
      .as[(Timestamp, String, Long, Long)].collect().toSet
    val want = Set(
      (ts("2026-08-12 10:00:00"), "click", 0L, 2L),
      (ts("2026-08-12 10:00:00"), "click", 9L, 1L),
      (ts("2026-08-12 10:00:00"), "view", 1L, 1L),
      (ts("2026-08-12 11:00:00"), "click", 5L, 2L))
    assert(got == want, got)

    // batch equivalence: the same frame through a batch window agg with
    // the shared bin expression produces the identical finalized rows
    import org.apache.spark.sql.functions._
    val batch = data.toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "1 hour"), $"event_type",
        least(lit(9L), floor($"value" / 50).cast("long")).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"bin", $"n")
      .as[(Timestamp, String, Long, Long)].collect().toSet
    assert(batch == want, batch)
  }

  test("trending tokens: out-of-order docs finalize per window; trends join batch-side") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamAggs.trendingTokens(
      input.toDF().toDF("ts", "text"),
      "ts", watermark = "10 minutes", period = "1 hour")
    val q = counts.writeStream.format("memory").queryName("trend_tok")
      .outputMode("append").start()
    try {
      // hour 10 arrives interleaved and out of order
      input.addData(
        (ts("2026-08-12 10:05:00"), "spark spark flink"),
        (ts("2026-08-12 10:40:00"), "spark duck"))
      q.processAllAvailable()
      // a LATE row (10:02 arrives after max event time 10:40 set the
      // watermark to 10:30) still lands: windows only reject late data
      // once the watermark passes their END (11:00), so hour 10 is open
      input.addData((ts("2026-08-12 10:02:00"), "flink"))
      q.processAllAvailable()
      // hour 11 closes hour 10; hour 12 probe closes hour 11
      input.addData(
        (ts("2026-08-12 11:15:00"), "spark spark spark duck"),
        (ts("2026-08-12 12:30:00"), "fin"))
      q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("trend_tok")
    val got = emitted.as[(Timestamp, String, Long)].collect().toSet
    // the late 10:02 "flink" counted: its window was still open
    val want = Set(
      (ts("2026-08-12 10:00:00"), "spark", 3L),
      (ts("2026-08-12 10:00:00"), "flink", 2L),
      (ts("2026-08-12 10:00:00"), "duck", 1L),
      (ts("2026-08-12 11:00:00"), "spark", 3L),
      (ts("2026-08-12 11:00:00"), "duck", 1L))
    assert(got == want, got)

    // batch trend leg: rates vs the previous window in exact permille
    val trends = StreamAggs.tokenTrends(emitted)
      .select($"token", $"period_start", $"rate_permille")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSet
    assert(trends.contains(("spark", ts("2026-08-12 11:00:00"), Some(1000L))))
    assert(trends.contains(("duck", ts("2026-08-12 11:00:00"), Some(1000L))))
    assert(trends.contains(("spark", ts("2026-08-12 10:00:00"), None)))
  }

  test("stream-fed PSI equals the batch statistic over the same corpus") {
    // the monitoring composition end to end: events stream through the
    // drift-histogram sink (watermarked, finalized windows), the landed
    // table rolls into (type, bin, ref_n, cur_n), and psiFromCounts —
    // shared verbatim with the batch query past the count frame —
    // produces the identical statistic the batch psiDrift computes
    // directly from the raw events.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val hist = StreamAggs.driftHistogram(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", watermark = "0 seconds", period = "1 hour")
    val data =
      (0 until 60).map(i => (ts(f"2024-01-10 ${i % 24}%02d:01:00"), "click", (i % 10) * 50.0 + 1)) ++
        (0 until 60).map(i => (ts(f"2024-01-20 ${i % 24}%02d:02:00"), "click", 451.0)) ++
        (0 until 40).map(i => (ts(f"2024-01-10 ${i % 24}%02d:03:00"), "view", (i % 5) * 100.0 + 1)) ++
        (0 until 40).map(i => (ts(f"2024-01-20 ${i % 24}%02d:04:00"), "view", (i % 5) * 100.0 + 1))
    val q = hist.writeStream.format("memory").queryName("psi_hist")
      .outputMode("append").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((ts("2024-02-01 00:00:00"), "view", 1.0)) // flush watermark
      q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.functions._
    val boundary = lit("2024-01-16").cast("timestamp")
    val streamedCounts = spark.table("psi_hist")
      .filter($"period_start" < lit("2024-02-01").cast("timestamp")) // drop the flush row's window
      .groupBy($"event_type", $"bin".as("vbin"))
      .agg(sum(when($"period_start" < boundary, $"n").otherwise(0L)).as("ref_n"),
        sum(when($"period_start" < boundary, 0L).otherwise($"n")).as("cur_n"))
    val streamed = graft.quality.Quality.psiFromCounts(streamedCounts)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("psi_micro_log2"), r.getAs[String]("verdict"))).toMap
    val batch = graft.quality.Quality.psiDrift(
        data.toDF("ts", "event_type", "value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("psi_micro_log2"), r.getAs[String]("verdict"))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // and the planted shift is visible through the streamed path too
    assert(streamed("click")._2 == "shifted" && streamed("view")._2 == "stable",
      streamed.toString)
  }

  test("streaming heavy hitters: state-held summaries stay a superset of the true heavies across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val hh = StreamAggs.streamingHeavyHitters(
      input.toDF().toDF("token"), buckets = 4, capacity = 8)
    val q = hh.writeStream.format("memory").queryName("hhsink")
      .outputMode("update").start()
    // 3 batches of a skewed stream: "hot" dominates, "warm" is heavy,
    // 40 cold singletons churn the summaries
    val rnd = new scala.util.Random(7)
    def batch(n: Int): Seq[String] =
      Seq.fill(n * 6)("hot") ++ Seq.fill(n * 2)("warm") ++
        Seq.tabulate(n)(i => s"cold${rnd.nextInt(40)}_$i")
    val fed = scala.collection.mutable.ArrayBuffer[String]()
    try {
      Seq(10, 12, 8).foreach { n =>
        val b = batch(n)
        fed ++= b
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // candidates = every token ever emitted (update-mode changelog ⊇
    // the final summaries); the guarantee: any token with true
    // frequency > n/capacity is in its bucket's FINAL summary, hence
    // somewhere in the changelog
    val cand = spark.table("hhsink").select($"token").as[String]
      .collect().toSet
    val exact = fed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = fed.size.toLong
    val mustHave = exact.filter(_._2 > n / 8).keySet
    assert(mustHave.nonEmpty && mustHave.subsetOf(cand),
      s"missing heavies: ${mustHave -- cand}")
    // state stayed bounded: per bucket at most `capacity` distinct
    // tokens in the LAST emission
    val lastCounts = spark.table("hhsink").groupBy($"bucket")
      .agg(org.apache.spark.sql.functions.countDistinct($"token").as("d"))
      .collect()
    assert(lastCounts.forall(_.getAs[Long]("d") <= 8 + 40),
      "changelog cardinality blew past capacity + churn bound")
    // estimates never undercount by more than the SpaceSaving error:
    // est(hot) >= true(hot) for the max-count token
    val hotEst = spark.table("hhsink").filter($"token" === "hot")
      .agg(org.apache.spark.sql.functions.max($"est")).head().getLong(0)
    assert(hotEst >= exact("hot"), s"hot est $hotEst < true ${exact("hot")}")
    // documented bucket domain holds: pmod keeps every id in
    // [0, buckets) (abs(hash) % n could emit a negative id — r10 fix)
    val bucketIds = spark.table("hhsink").select($"bucket").as[Int]
      .collect().toSet
    assert(bucketIds.forall(b => b >= 0 && b < 4), bucketIds.toString)
  }

  test("streaming quantile histogram merges to the batch sketch estimates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val hist = StreamAggs.quantileHistogram(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", watermark = "0 seconds", period = "1 hour")
    val q = hist.writeStream.format("memory").queryName("qh_sink")
      .outputMode("append").start()
    // values chosen to straddle power-of-two buckets, across 2 hours
    val data = Seq(
      (ts("2026-08-12 10:01:00"), "click", 1.0),   // 100 cents
      (ts("2026-08-12 10:02:00"), "click", 2.5),   // 250
      (ts("2026-08-12 10:03:00"), "click", 40.0),  // 4000
      (ts("2026-08-12 11:01:00"), "click", 41.0),  // 4100
      (ts("2026-08-12 11:02:00"), "click", 0.5),   // 50
      (ts("2026-08-12 11:03:00"), "view", 9.99))   // 999
    try {
      input.addData(data.take(3): _*); q.processAllAvailable()
      input.addData(data.drop(3): _*); q.processAllAvailable()
      input.addData((ts("2026-08-12 13:00:00"), "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val merged = StreamAggs.quantilesFromEmitted(spark.table("qh_sink"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50_est"), r.getAs[Long]("p99_est")))
      .toMap
    // batch leg over the SAME rows through the shared expressions
    import org.apache.spark.sql.functions.{count, expr, lit}
    val batch = graft.queries.Relational.quantileEstFromBuckets(
      data.toDF("ts", "event_type", "value")
        .withColumn("cents",
          expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
        .withColumn("bucket",
          expr(graft.queries.Relational.sketchBucketExpr))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("bc")))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50_est"), r.getAs[Long]("p99_est")))
      .toMap
    assert(merged == batch, s"stream=$merged batch=$batch")
    assert(merged("click")._1 == 5L)
    // sketch upper bounds hold: estimate >= true value per bucket rule
    assert(merged("click")._2 >= 250L && merged("click")._3 >= 4100L)
  }

  test("streaming bottom-k sample equals the batch sample over the landed corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val bk = StreamAggs.streamingBottomK(
      input.toDF().toDF("lang", "doc_id"), k = 5)
    val q = bk.writeStream.format("memory").queryName("bksink")
      .outputMode("update").start()
    // 3 batches, interleaved languages, out-of-order ids — the state
    // must absorb each batch in O(k) and stay the exact global sample
    val batches = Seq(
      (0L until 20L).map(i => ("en", i)) ++ Seq(("de", 100L), ("de", 101L)),
      (20L until 35L).map(i => ("en", i)) ++ (102L until 120L).map(i => ("de", i)),
      Seq(("en", 999L), ("de", 7L), ("de", 8L), ("zh", 1L)))
    val fed = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    try {
      batches.foreach { b =>
        fed ++= b
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // latest emission per language = the rows carrying its max n_seen
    val emitted = spark.table("bksink").collect()
    val maxSeen = emitted.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("n_seen")).max).toMap
    val a = emitted
      .filter(r => r.getAs[Long]("n_seen") == maxSeen(r.getAs[String]("lang")))
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[String]("pri")))
      .sortBy(t => (t._1, t._2)).toSeq
    val b = graft.quality.Quality.sampleBottomK(
      fed.toSeq.toDF("lang", "doc_id")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[String]("pri")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(a == b, s"stream=$a\nbatch=$b")
    // a language with fewer than k docs samples everything it has
    assert(a.count(_._1 == "zh") == 1)
  }
}
