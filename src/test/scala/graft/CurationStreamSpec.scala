package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.quality.CurationStream

/** Streaming curation: low-quality docs filtered, in-window exact
  * duplicates dropped, first copy and unique docs pass through. */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // 62 words, mean word length ~4.6, two stopwords — passes the gate
  private val goodText = "the a " + Array.fill(20)("alpha beta gamma").mkString(" ")
  private val otherGood = "the a " + Array.fill(20)("delta echo fox").mkString(" ")

  test("gate drops short docs; watermark dedup drops in-window copies") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = CurationStream.curate(
      input.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .select($"doc_id")

    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, goodText, ts("2026-08-12 10:00:00")),   // passes
        (2L, "too short", ts("2026-08-12 10:00:01")), // gated out
        (3L, goodText, ts("2026-08-12 10:00:02")),   // duplicate of 1
        (4L, otherGood, ts("2026-08-12 10:00:03")))  // passes
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("curated").as[Long].collect().toSet
    // exactly one of the duplicate pair survives, plus the unique good doc
    assert(ids.size == 2, ids)
    assert(ids.contains(4L), ids)
    assert(ids.contains(1L) ^ ids.contains(3L), ids)
  }

  test("stream-static anti join drops docs already in the stored corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._

    // stored corpus digest table holds goodText's fingerprint — built
    // with the SAME shared definition the stream side applies
    val corpusFps = Seq(goodText).toDF("text")
      .select(graft.dedup.Dedup.headFingerprint($"text").as("fp"))

    val input = MemoryStream[(Long, String)]
    val deduped = CurationStream.dedupAgainstCorpus(
      input.toDF().toDF("doc_id", "text"), corpusFps)
    // internal fp key must not leak into the output schema
    assert(deduped.columns.toSeq == Seq("doc_id", "text"))
    val out = deduped.select($"doc_id")

    val q = out.writeStream.format("memory").queryName("corpus_deduped")
      .outputMode("append").start()
    try {
      input.addData((1L, goodText), (2L, otherGood)) // 1 is already stored
      q.processAllAvailable()
      input.addData((3L, goodText), (4L, "brand new text")) // re-arrival still drops
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("corpus_deduped").as[Long].collect().toSet
    assert(ids == Set(2L, 4L), ids)
  }

  test("streaming URL dedup passes one fetch per canonical URL, matching batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.quality.Quality

    // the batch view of the same crawl: every raw fetch with its
    // canonical URL and the min-doc_id keeper verdict
    val batch = Quality.qUrlDedup(spark, sf0001)
    val fetches = batch.select($"doc_id", $"raw_url")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(fetches.length > 100)
    val batchKeptUrls = batch.filter($"keeper").select($"url")
      .as[String].collect().toSet
    val urlOf = batch.select($"doc_id", $"url")
      .as[(Long, String)].collect().toMap

    val input = MemoryStream[(Long, String, Timestamp)]
    val out = CurationStream.dedupByUrl(
      input.toDF().toDF("doc_id", "raw_url", "ts"), "ts", "1 hour")
      .select($"doc_id", $"url")
    val q = out.writeStream.format("memory").queryName("url_deduped")
      .outputMode("append").start()
    try {
      input.addData(fetches.map { case (id, raw) =>
        (id, raw, ts("2026-08-12 10:00:00")) }: _*)
      q.processAllAvailable()
      // a re-crawl of the whole frontier inside the watermark: all drop
      input.addData(fetches.map { case (id, raw) =>
        (id + 1000000L, raw, ts("2026-08-12 10:30:00")) }: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("url_deduped")
      .as[(Long, String)].collect()
    // exactly one survivor per canonical URL — the same URL SET the
    // batch keeper verdict selects (the batch keeper is min doc_id;
    // within one micro-batch any group member may win the stream race,
    // so parity is on the canonical-URL set, not the keeper ids)
    assert(got.map(_._2).toSet == batchKeptUrls)
    assert(got.length == batchKeptUrls.size, "one row per canonical URL")
    // every survivor's url must be ITS OWN normalization — the shared
    // definition applied by the stream, not an arbitrary group label
    got.foreach { case (id, url) =>
      assert(id < 1000000L, s"second-wave re-crawl $id must not pass")
      assert(urlOf(id) == url, s"$id normalized to $url")
    }
  }

  test("chained dedup->window agg: streaming per-domain pages == batch n_pages") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.quality.Quality

    val fetches = Quality.qUrlDedup(spark, sf0001)
      .select($"doc_id", $"raw_url")
      .as[(Long, String)].collect().sortBy(_._1)
    val batchPages = Quality.qDomainMix(spark, sf0001)
      .select($"domain", $"n_pages")
      .as[(String, Long)].collect().toMap

    // a sub-window watermark would let same-hour re-fetches outlive
    // dedup state and overcount — the operator must refuse it
    intercept[IllegalArgumentException] {
      CurationStream.domainPagesHourly(
        spark.readStream.format("rate").load()
          .selectExpr("value as doc_id", "'x' as raw_url",
            "timestamp as ts"), "ts", "10 minutes")
    }

    val input = MemoryStream[(Long, String, Timestamp)]
    val out = CurationStream.domainPagesHourly(
      input.toDF().toDF("doc_id", "raw_url", "ts"), "ts", "1 hour")
      .select($"window.start".as("ws"), $"domain", $"n_pages")
    val q = out.writeStream.format("memory").queryName("domain_pages")
      .outputMode("append").start()
    try {
      // the whole crawl lands inside the 10:00-11:00 window...
      input.addData(fetches.map { case (id, raw) =>
        (id, raw, ts("2026-08-12 10:00:00")) }: _*)
      q.processAllAvailable()
      // ...a same-hour whole-frontier re-crawl must dedup away...
      input.addData(fetches.map { case (id, raw) =>
        (id + 1000000L, raw, ts("2026-08-12 10:45:00")) }: _*)
      q.processAllAvailable()
      // ...and a late heartbeat advances the watermark past the
      // window end, closing it so append mode emits it
      input.addData((-1L, "https://heartbeat.example.com/x",
        ts("2026-08-12 13:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("domain_pages")
      .filter($"ws" === ts("2026-08-12 10:00:00"))
      .select($"domain", $"n_pages")
      .as[(String, Long)].collect().toMap
    // every domain's hourly distinct-page count equals the batch
    // rollup's n_pages — the shared normalization + domain definitions
    // make the two views agree exactly
    assert(got == batchPages, s"got $got want $batchPages")
  }

  test("sketch leg: hourly approx page counts within HLL error of batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.quality.Quality

    val fetches = Quality.qUrlDedup(spark, sf0001)
      .select($"doc_id", $"raw_url")
      .as[(Long, String)].collect().sortBy(_._1)
    val batchPages = Quality.qDomainMix(spark, sf0001)
      .select($"domain", $"n_pages")
      .as[(String, Long)].collect().toMap

    val input = MemoryStream[(Long, String, Timestamp)]
    val out = CurationStream.domainPagesHourlySketch(
      input.toDF().toDF("doc_id", "raw_url", "ts"), "ts", "10 minutes")
      .select($"window.start".as("ws"), $"domain", $"n_pages_approx")
    val q = out.writeStream.format("memory").queryName("domain_sketch")
      .outputMode("append").start()
    try {
      input.addData(fetches.map { case (id, raw) =>
        (id, raw, ts("2026-08-12 10:00:00")) }: _*)
      q.processAllAvailable()
      // re-crawl wave: the sketch absorbs duplicates by construction
      input.addData(fetches.map { case (id, raw) =>
        (id + 1000000L, raw, ts("2026-08-12 10:45:00")) }: _*)
      q.processAllAvailable()
      input.addData((-1L, "https://heartbeat.example.com/x",
        ts("2026-08-12 13:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("domain_sketch")
      .filter($"ws" === ts("2026-08-12 10:00:00"))
      .select($"domain", $"n_pages_approx")
      .as[(String, Long)].collect().toMap
    assert(got.keySet == batchPages.keySet)
    // rsd pinned at 2%: allow ±10% and catch both the off-by-2x
    // dedup failure mode and a sketch that counted raw fetches
    got.foreach { case (domain, approx) =>
      val exact = batchPages(domain)
      assert(math.abs(approx - exact) <= math.max(2L, exact / 10),
        s"$domain approx $approx vs exact $exact")
    }
  }

  test("dedup hour bucket stays window-aligned in a half-hour-offset timezone") {
    // date_trunc('hour') buckets in SESSION-local time; window() buckets
    // on the epoch — under +05:30 a local-hour key straddles two count
    // windows and breaks the one-row-per-(window, URL) guarantee. The
    // operator's epoch arithmetic must agree with window() boundaries
    // in ANY session timezone.
    import org.apache.spark.sql.functions._
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Asia/Kolkata")
      val rows = spark.sql(
        """SELECT ts,
          |  timestamp_seconds((unix_timestamp(ts) div 3600) * 3600) AS k,
          |  window(ts, '1 hour').start AS ws,
          |  date_trunc('hour', ts) AS local_trunc
          |FROM VALUES
          |  (timestamp'2026-08-12 04:10:00'),
          |  (timestamp'2026-08-12 04:50:00'),
          |  (timestamp'2026-08-12 05:05:00') AS t(ts)""".stripMargin)
        .collect()
      // the operator's bucket == the count window's start, always
      rows.foreach { r => assert(r.get(1) == r.get(2), r.toString) }
      // and the naive date_trunc bucket really does diverge here —
      // the regression this test pins would be invisible in UTC
      assert(rows.exists(r => r.get(3) != r.get(2)))
    } finally spark.conf.set(tzKey, prev)
  }

  test("streaming importance scores == batch scores against the same stored weights") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.quality.Quality

    // weights learned by the batch pass over the real corpus — the
    // stored artifact both halves read
    val corpus = Tables.load(spark, sf0001, "documents")
    val weights = Quality.importanceWeights(corpus).cache()

    // the stream carries a sample of the same docs; its scores must be
    // row-identical to the batch query's for those doc_ids
    val sample = corpus.select($"doc_id", $"source", $"text")
      .filter($"doc_id" % 25 === 0)
      .as[(Long, String, String)].collect().toSeq
    assert(sample.nonEmpty)

    val input = MemoryStream[(Long, String, String)]
    val scored = CurationStream.scoreImportance(
      input.toDF().toDF("doc_id", "source", "text"), weights)
      .select($"doc_id", $"n_tokens", $"imp_score", $"target_like")
    val q = scored.writeStream.format("memory").queryName("stream_scored")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_scored")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = Quality.qImportanceDsir(spark, sf0001)
      .filter($"doc_id" % 25 === 0)
      .select($"doc_id", $"n_tokens", $"imp_score", $"target_like")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want)
    assert(got.nonEmpty && got.size == sample.size)
  }
}
