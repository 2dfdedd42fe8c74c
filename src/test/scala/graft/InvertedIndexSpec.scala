package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.text.{InvertedIndex, TextAnalysis}

/** Stored inverted-index maintenance (r7): an index grown by
  * micro-batch merges is row-identical to one rebuilt from scratch,
  * merge replay is idempotent, per-bucket compaction collapses
  * accreted files without changing search results, and the
  * stored-index BM25 equals the direct corpus-scan query on the real
  * sf0.001 corpus. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic word-soup fixture docs (no RNG: hash-based). */
  private def docsDf(ids: Seq[Long]): DataFrame =
    ids.toDF("doc_id").withColumn("text", expr(
      "array_join(transform(sequence(0, 11 + cast(pmod(hash(doc_id), 9) as int)), " +
        "i -> concat('w', cast(pmod(hash(doc_id * 17 + i), 23) as string))), ' ')"))

  private def base(sub: String) = s"target/graft-test/inv-index-spec/$sub"

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(path))
  }

  // query = tokens of fixture doc 1; exclude doc 1 from candidates
  private def qterms: DataFrame =
    docsDf(Seq(1L)).select(explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)

  private def qdoc: DataFrame = Seq(1L).toDF("qid")

  private def searchRows(path: String): Seq[(Long, Long, Long, Long)] =
    InvertedIndex.search(spark, qterms, path, qdoc, k = 10).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("score_x1000"))).toSeq

  private def indexRows(path: String): Seq[(Long, String, Long)] =
    spark.read.parquet(s"$path/postings")
      .select($"doc_id", $"token", $"tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted

  test("search-after-streaming-merge == search-over-rebuilt-index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mergedPath = base("merged"); val rebuiltPath = base("rebuilt")
    rm(mergedPath); rm(rebuiltPath); rm(base("ckpt"))

    val all = (1L to 60L).toSeq
    InvertedIndex.rebuild(docsDf(all.take(30)), mergedPath)
    val input = MemoryStream[Long]
    val stream = input.toDF().toDF("doc_id").withColumn("text", expr(
      "array_join(transform(sequence(0, 11 + cast(pmod(hash(doc_id), 9) as int)), " +
        "i -> concat('w', cast(pmod(hash(doc_id * 17 + i), 23) as string))), ' ')"))
    val q = InvertedIndex.streamingMerge(stream, mergedPath, base("ckpt"))
    try {
      input.addData(all.slice(30, 45): _*); q.processAllAvailable()
      input.addData(all.slice(45, 60): _*); q.processAllAvailable()
    } finally q.stop()

    InvertedIndex.rebuild(docsDf(all), rebuiltPath)

    val merged = searchRows(mergedPath)
    assert(merged == searchRows(rebuiltPath))
    assert(merged.nonEmpty)
    // indexes are row-identical, not just search-identical
    assert(indexRows(mergedPath) == indexRows(rebuiltPath))
    // and doc lengths cover every doc exactly once in both
    val dls = spark.read.parquet(s"$mergedPath/doclens").collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(dls == all)
  }

  test("mergeBatch replay is idempotent: same batch id overwrites itself") {
    val path = base("idem")
    rm(path)
    InvertedIndex.rebuild(docsDf(1L to 20L), path)
    InvertedIndex.mergeBatch(docsDf(21L to 30L), path, batchId = 7L)
    val once = indexRows(path)
    InvertedIndex.mergeBatch(docsDf(21L to 30L), path, batchId = 7L)
    assert(indexRows(path) == once, "replayed batch must not double-append")
    InvertedIndex.mergeBatch(docsDf(31L to 35L), path, batchId = 8L)
    val withNext = indexRows(path)
    InvertedIndex.mergeBatch(docsDf(21L to 30L), path, batchId = 7L)
    assert(indexRows(path) == withNext)
    // doclens follow the same protocol: one row per doc, replay-safe
    val dls = spark.read.parquet(s"$path/doclens").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(dls == (1L to 35L).toSeq)
  }

  test("per-bucket compaction collapses micro-batch files, search unchanged") {
    val path = base("compact")
    rm(path)
    InvertedIndex.rebuild(docsDf(1L to 20L), path)
    (0 until 4).foreach(i =>
      InvertedIndex.mergeBatch(docsDf((21L + i * 5) to (25L + i * 5)), path, i.toLong))
    val before = searchRows(path)

    val touched = spark.read.parquet(s"$path/postings")
      .groupBy($"bucket").count().orderBy($"count".desc)
      .head.getAs[Number]("bucket").longValue
    val (nBefore, nAfter) =
      InvertedIndex.compactBucket(spark, path, touched, targetBytes = 1L << 30)
    assert(nBefore > 1, s"expected accreted small files, got $nBefore")
    assert(nAfter == 1, s"expected one compacted file, got $nAfter")
    assert(searchRows(path) == before)
  }

  test("sf0.001: stored-index BM25 == the direct corpus-scan query") {
    val direct = TextAnalysis.qTextBm25(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("score_x1000"))).toSeq
    val indexed = graft.text.InvertedIndex.qTextBm25Indexed(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("score_x1000"))).toSeq
    assert(indexed == direct)
    assert(indexed.nonEmpty)
  }

  test("uniform 1000-milli weights make searchWeighted identical to search; RM3 re-ranks sanely") {
    val path = base("rm3"); rm(path)
    InvertedIndex.rebuild(docsDf(1L to 60L), path)
    val plain = searchRows(path)
    val weighted = InvertedIndex.searchWeighted(spark,
      qterms.distinct().withColumn("wq", lit(1000L)), path, qdoc, k = 10)
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("score_x1000"))).toSeq
    assert(weighted == plain && plain.nonEmpty)

    // RM3 on the real corpus: a full ranking with the BM25 contract
    val rm3 = InvertedIndex.qTextRm3(spark, sf0001).collect()
    assert(rm3.length == 15)
    assert(rm3.map(_.getAs[Long]("rank")).toSeq == (1L to 15L))
    val scores = rm3.map(_.getAs[Long]("score_x1000")).toSeq
    assert(scores == scores.sorted.reverse)
    // the expanded query can only widen term coverage: the best doc
    // matches at least as many terms as the original query round did
    val bm = InvertedIndex.qTextBm25Indexed(spark, sf0001).collect()
    assert(rm3.head.getAs[Long]("n_matched") >=
      bm.find(_.getAs[Long]("doc_id") == rm3.head.getAs[Long]("doc_id"))
        .map(_.getAs[Long]("n_matched")).getOrElse(0L))
  }

  test("search plan scans the stored postings and never re-tokenizes") {
    // build once (cached per session+dir), then inspect the search plan
    graft.text.InvertedIndex.qTextBm25Indexed(spark, sf0001).collect()
    val p = graft.text.InvertedIndex.qTextBm25Indexed(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("postings"), p)
    // the corpus text is never exploded at query time — only the
    // 1-doc query side tokenizes (its explode feeds the broadcast)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
