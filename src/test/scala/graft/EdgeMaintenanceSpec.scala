package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.graph.{EdgeMaintenance, GraphOps}

/** Incremental edge-table maintenance: an index grown by deltas must
  * be row-identical to one rebuilt from scratch, under batch splits
  * that force every delta term (cross-batch pairs, recurring pairs),
  * replay, and the streaming foreachBatch path. */
class EdgeMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def base(name: String): String =
    s"target/graft-stage/${spark.sparkContext.applicationId}/edgespec_$name"

  private def edgeSet(path: String): Set[(Long, Long)] =
    EdgeMaintenance.edges(spark, path).as[(Long, Long)].collect().toSet

  // orders with overlapping part sets: pair (2,3) recurs in orders 10
  // and 11; order 12 is a singleton (no edges); order 13 shares part 5
  // with nothing (edge only to 6)
  private val fixture: Seq[(Long, Long)] = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 2L), (11L, 3L), (11L, 4L),
    (12L, 7L),
    (13L, 5L), (13L, 6L))

  private def bruteEdges(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
    rows.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet

  test("fixture: grown == rebuilt under a split that straddles orders") {
    val all = fixture.toDF("l_orderkey", "l_partkey")
    val pRebuilt = base("fix_rebuild")
    EdgeMaintenance.rebuild(all, pRebuilt)
    assert(edgeSet(pRebuilt) == bruteEdges(fixture))

    // part-key split: order 10's parts land in different batches, so
    // merge 1 must emit the cross-batch pairs (1,2)/(2,3)... and merge
    // of order 11's rows must NOT duplicate the recurring (2,3) edge
    val pGrown = base("fix_grown")
    EdgeMaintenance.rebuild(all.filter($"l_partkey" % 3 === 0), pGrown)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), pGrown, 1L)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 2), pGrown, 2L)
    assert(edgeSet(pGrown) == bruteEdges(fixture))
    // distinct as a MULTISET too — the recurring pair must appear once
    val rows = EdgeMaintenance.edges(spark, pGrown).collect()
    assert(rows.length == bruteEdges(fixture).size)
  }

  test("replaying a merge converges to the same table (idempotent publish)") {
    val all = fixture.toDF("l_orderkey", "l_partkey")
    val p = base("fix_replay")
    EdgeMaintenance.rebuild(all.filter($"l_partkey" % 3 === 0), p)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), p, 1L)
    // crash-retry: the same batch id runs again
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), p, 1L)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 2), p, 2L)
    assert(edgeSet(p) == bruteEdges(fixture))
    assert(EdgeMaintenance.edges(spark, p).count() == bruteEdges(fixture).size)
  }

  test("streaming foreachBatch maintenance == rebuild over the full feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = base("fix_stream")
    // seed with an empty rebuild so the stored tables exist
    EdgeMaintenance.rebuild(fixture.take(0).toDF("l_orderkey", "l_partkey"), p)
    val input = MemoryStream[(Long, Long)]
    val q = EdgeMaintenance.attach(
      input.toDF().toDF("l_orderkey", "l_partkey"), p)
    try {
      input.addData(fixture.filter(_._2 % 2 == 0): _*)
      q.processAllAvailable()
      input.addData(fixture.filter(_._2 % 2 == 1): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(edgeSet(p) == bruteEdges(fixture))
  }

  test("time travel + change feed: batch dirs are the commit log") {
    val all = fixture.toDF("l_orderkey", "l_partkey")
    val p = base("fix_tt")
    EdgeMaintenance.rebuild(all.filter($"l_partkey" % 3 === 0), p)
    val snap0 = edgeSet(p)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 1), p, 1L)
    val snap1 = edgeSet(p)
    EdgeMaintenance.mergeBatch(all.filter($"l_partkey" % 3 === 2), p, 2L)
    val snap2 = edgeSet(p)

    def asOf(id: Long): Set[(Long, Long)] =
      EdgeMaintenance.edgesAsOf(spark, p, id).as[(Long, Long)].collect().toSet
    // snapshots reproduce the table exactly as it stood after each merge
    assert(asOf(0L) == snap0)
    assert(asOf(1L) == snap1)
    assert(asOf(2L) == snap2 && snap2 == bruteEdges(fixture))
    assert(snap0.subsetOf(snap1) && snap1.subsetOf(snap2))
    // the change feed is the exact per-batch delta
    def delta(id: Long): Set[(Long, Long)] =
      EdgeMaintenance.edgeDelta(spark, p, id).as[(Long, Long)].collect().toSet
    assert(delta(1L) == snap1 -- snap0)
    assert(delta(2L) == snap2 -- snap1)
    // asking for a snapshot before any commit fails loudly
    intercept[IllegalArgumentException] {
      // base sorts as -1, so -5 selects nothing
      EdgeMaintenance.edgesAsOf(spark, p, -5L)
    }
  }

  test("sf0.001: incremental pagerank == batch pagerank, row for row") {
    val inc = GraphOps.qGraphPagerankInc(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = GraphOps.qGraphPagerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(inc.nonEmpty)
    assert(inc.toSeq == batch.toSeq)
  }
}
