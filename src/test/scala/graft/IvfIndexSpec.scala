package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sim.IvfIndex

/** Streaming IVF index maintenance (r7): an index grown by
  * micro-batch merges is row-identical to one rebuilt from scratch,
  * compaction collapses the accreted small files without changing
  * search results, and the shared assignment matches a direct Scala
  * argmin replay. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic pseudo-random fixture vectors (no RNG: hash-based). */
  private def vecsDf(ids: Seq[Long]): DataFrame =
    ids.toDF("vec_id").withColumn("nv", expr(
      s"transform(sequence(0, ${Dim - 1}), " +
        "i -> cast(pmod(hash(vec_id * 31 + i), 1000) as double) / 1000.0)"))

  private def scalaVecs(ids: Seq[Long]): Map[Long, Array[Double]] =
    vecsDf(ids).as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> v.toArray }.toMap

  // 4 stored centroids taken from the first vectors (cells 0..3)
  private def centsDf: DataFrame =
    vecsDf(Seq(1L, 2L, 3L, 4L))
      .select(($"vec_id" - 1).as("cell"), $"nv".as("centv"))

  private def base(sub: String) = s"target/graft-test/ivf-index-spec/$sub"

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(path))
  }

  private def queries: DataFrame =
    vecsDf(Seq(101L, 113L, 127L)).select($"vec_id".as("query_id"), $"nv".as("qv"))

  private def searchRows(path: String): Set[(Long, Long, Long, Long)] =
    IvfIndex.search(spark, queries, centsDf, path).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("cos_e6"))).toSet

  test("search-after-streaming-merge == search-over-rebuilt-index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mergedPath = base("merged"); val rebuiltPath = base("rebuilt")
    rm(mergedPath); rm(rebuiltPath); rm(base("ckpt"))

    val all = (1L to 60L).toSeq
    // bootstrap: first 30 vectors are the initial index
    IvfIndex.rebuild(vecsDf(all.take(30)), centsDf, mergedPath)
    // stream the remaining 30 in two micro-batches of 15
    val input = MemoryStream[Long]
    val stream = input.toDF().toDF("vec_id").withColumn("nv", expr(
      s"transform(sequence(0, ${Dim - 1}), " +
        "i -> cast(pmod(hash(vec_id * 31 + i), 1000) as double) / 1000.0)"))
    val q = IvfIndex.streamingMerge(stream, centsDf, mergedPath, base("ckpt"))
    try {
      input.addData(all.slice(30, 45): _*); q.processAllAvailable()
      input.addData(all.slice(45, 60): _*); q.processAllAvailable()
    } finally q.stop()

    // ground truth: one-shot rebuild over all 60
    IvfIndex.rebuild(vecsDf(all), centsDf, rebuiltPath)

    val merged = searchRows(mergedPath)
    assert(merged == searchRows(rebuiltPath))
    assert(merged.nonEmpty)
    // indexes are row-identical, not just search-identical
    val a = spark.read.parquet(mergedPath)
      .select($"vec_id", $"cell").collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val b = spark.read.parquet(rebuiltPath)
      .select($"vec_id", $"cell").collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    assert(a == b && a.size == 60)
  }

  test("per-cell compaction collapses micro-batch files, search unchanged") {
    val path = base("compact")
    rm(path)
    val cents = centsDf
    IvfIndex.rebuild(vecsDf(1L to 20L), cents, path)
    // several merges accrete one file per touched cell each
    (0 until 4).foreach(i =>
      IvfIndex.mergeBatch(vecsDf((21L + i * 5) to (25L + i * 5)), cents, path, i.toLong))
    val before = searchRows(path)

    val touchedCell = spark.read.parquet(path)
      .groupBy($"cell").count().orderBy($"count".desc)
      .head.getAs[Number]("cell").longValue
    val (nBefore, nAfter) =
      IvfIndex.compactCell(spark, path, touchedCell, targetBytes = 1L << 30)
    assert(nBefore > 1, s"expected accreted small files, got $nBefore")
    assert(nAfter == 1, s"expected one compacted file, got $nAfter")
    assert(searchRows(path) == before)
  }

  test("mergeBatch replay is idempotent: same batch id overwrites itself") {
    val path = base("idem")
    rm(path)
    val cents = centsDf
    IvfIndex.rebuild(vecsDf(1L to 20L), cents, path)
    IvfIndex.mergeBatch(vecsDf(21L to 30L), cents, path, batchId = 7L)
    def indexRows: Seq[(Long, Long)] = spark.read.parquet(path)
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSeq.sorted
    val once = indexRows
    // a foreachBatch retry replays the SAME micro-batch with the same id
    IvfIndex.mergeBatch(vecsDf(21L to 30L), cents, path, batchId = 7L)
    assert(indexRows == once, "replayed batch must not double-append")
    // and a later replay after further batches still converges
    IvfIndex.mergeBatch(vecsDf(31L to 35L), cents, path, batchId = 8L)
    val withNext = indexRows
    IvfIndex.mergeBatch(vecsDf(21L to 30L), cents, path, batchId = 7L)
    assert(indexRows == withNext)
    assert(once.map(_._1).distinct.size == 30 && withNext.map(_._1).distinct.size == 35)
  }

  test("assignCells == direct Scala L2 argmin with smallest-cell ties") {
    val ids = (1L to 40L).toSeq
    val got = IvfIndex.assignCells(vecsDf(ids), centsDf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val vs = scalaVecs(ids)
    val cs = scalaVecs(Seq(1L, 2L, 3L, 4L)).map { case (id, v) => (id - 1) -> v }
    val want = vs.map { case (id, v) =>
      val best = cs.toSeq.map { case (cell, c) =>
        val d = math.round(v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum * 1e6)
        (d, cell)
      }.minBy(identity)
      id -> best._2
    }
    assert(got == want)
  }
}
