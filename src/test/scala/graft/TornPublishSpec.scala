package graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.graph.EdgeMaintenance
import graft.sources.AggMaintenance

/** Crash-MID-publish convergence for the two newest maintenance sinks
  * (VERDICT r7 item 7): a job killed between the staging write and the
  * directory publish — or between the two publishes of a two-table
  * sink — must converge to the rebuilt-from-scratch table when the
  * batch replays. Torn states are planted by running the real merge
  * and then deleting/retaining exactly what the crash window leaves. */
class TornPublishSpec extends SparkSpec {
  import spark.implicits._

  private def fs =
    new Path("target").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(name: String): String =
    s"target/graft-stage/${spark.sparkContext.applicationId}/torn_$name"

  // --- AggMaintenance ------------------------------------------------

  private def aggRows(path: String): Set[(String, Long, Long)] =
    AggMaintenance.read(spark, path).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_orders"),
        r.getAs[Long]("revenue_cents"))).toSet

  test("agg: crash after staging, before publish — replay converges") {
    val o = Tables.load(spark, sf0001, "orders")
    val full = tmp("agg_full"); AggMaintenance.rebuild(o, full)
    val want = aggRows(full)

    val p = tmp("agg_torn")
    AggMaintenance.rebuild(o.filter($"o_orderkey" % 3 === 0), p)
    // crash window 1: batch 1 wrote its staging dir, died before the
    // rename — plant the leftover by merging batch 1 on a SCRATCH view
    // and copying its staged partial layout: equivalently, write any
    // stale content at the staging path; mergeBatch overwrites it
    o.filter($"o_orderkey" % 3 === 1).limit(5)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), lit(0L).as("revenue_cents"))
      .write.mode("overwrite").parquet(s"$p/_staging/batch=1")
    assert(fs.exists(new Path(s"$p/_staging/batch=1")))
    // replay of batch 1 must overwrite the torn staging and publish
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 === 1), p, 1L)
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 === 2), p, 2L)
    assert(aggRows(p) == want)
  }

  test("agg: publish cleans only its own staging dir (concurrent batch survives)") {
    val o = Tables.load(spark, sf0001, "orders")
    val p = tmp("agg_concurrent")
    AggMaintenance.rebuild(o.filter($"o_orderkey" % 3 === 0), p)
    // another maintenance job has batch 99 in flight
    val foreign = new Path(s"$p/_staging/batch=99")
    fs.mkdirs(foreign)
    Seq((1L, 2L)).toDF("a", "b").write.mode("overwrite")
      .parquet(s"$p/_staging/batch=99/data")
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 === 1), p, 1L)
    assert(fs.exists(foreign),
      "mergeBatch deleted a concurrent batch's in-flight staging dir")
  }

  test("agg: compaction crash mid-swap recovers from _old on next run") {
    val o = Tables.load(spark, sf0001, "orders")
    val p = tmp("agg_swapcrash")
    AggMaintenance.rebuild(o.filter($"o_orderkey" % 3 === 0), p)
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 =!= 0), p, 1L)
    val want = aggRows(p)
    // crash window: partials renamed to _old, died before tmp→partials
    assert(fs.rename(new Path(s"$p/partials"), new Path(s"$p/_old")))
    // next compact must restore _old FIRST (it holds the only copy)
    AggMaintenance.compact(spark, p)
    assert(aggRows(p) == want)
    assert(!fs.exists(new Path(s"$p/_old")))
  }

  // --- EdgeMaintenance ----------------------------------------------

  private val fixture: Seq[(Long, Long)] = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 2L), (11L, 3L), (11L, 4L),
    (12L, 7L), (13L, 5L), (13L, 6L))

  private def bruteEdges(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
    rows.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet

  private def edgeSet(path: String): Set[(Long, Long)] =
    EdgeMaintenance.edges(spark, path).as[(Long, Long)].collect().toSet

  test("edges: crash after staging, before publish — replay converges") {
    val all = fixture.toDF("l_orderkey", "l_partkey")
    val p = tmp("edge_stage_crash")
    EdgeMaintenance.rebuild(all.filter($"l_partkey" % 3 === 0), p)
    // torn staging left by a killed batch-1 run: stale garbage at both
    // staged sub-dirs; replay must overwrite, not merge it in
    Seq((999L, 999L)).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$p/_staging/batch=1/li")
    Seq((998L, 999L)).toDF("src", "dst")
      .write.mode("overwrite").parquet(s"$p/_staging/batch=1/edges")
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), p, 1L)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 2), p, 2L)
    assert(edgeSet(p) == bruteEdges(fixture))
    assert(!edgeSet(p).contains((998L, 999L)))
  }

  test("edges: crash BETWEEN the two publishes (edges landed, membership not)") {
    val all = fixture.toDF("l_orderkey", "l_partkey")
    val p = tmp("edge_mid_publish")
    EdgeMaintenance.rebuild(all.filter($"l_partkey" % 3 === 0), p)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), p, 1L)
    // simulate the crash window between publish(edges) and publish(li):
    // batch-1 edges are live, batch-1 membership vanished
    assert(fs.delete(new Path(s"$p/li/batch-1"), true))
    // replay of batch 1: edge publish must DISCARD its recomputation
    // (dest exists), membership publish must land — no duplicate edges
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), p, 1L)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 2), p, 2L)
    assert(edgeSet(p) == bruteEdges(fixture))
    // multiset check: no edge row duplicated by the replay
    assert(EdgeMaintenance.edges(spark, p).count() == bruteEdges(fixture).size)
  }
}
