package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.AggMaintenance

/** The incrementally-maintained aggregate view must be row-identical
  * to a full rebuild after any merge sequence, survive batch replays
  * without double-counting (additive partials make double-publish
  * corruption, not waste), and be invariant under partial-log
  * compaction. */
class AggMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-agg").toString + "/t"

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getAs[Long]("n_orders"),
      r.getAs[Long]("revenue_cents"))).toSet

  test("grown == rebuilt; replay is discarded; compaction is invariant") {
    val o = Tables.load(spark, sf0001, "orders")
    val full = tmp(); AggMaintenance.rebuild(o, full)
    val want = rows(AggMaintenance.read(spark, full))
    assert(want.nonEmpty)

    val inc = tmp()
    AggMaintenance.rebuild(o.filter($"o_orderkey" % 3 === 0), inc)
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 === 1), inc, 1L)
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 === 2), inc, 2L)
    assert(rows(AggMaintenance.read(spark, inc)) == want)

    // replaying an applied batch must NOT double-count: the batch dir
    // is the applied marker and the recomputation is discarded
    AggMaintenance.mergeBatch(o.filter($"o_orderkey" % 3 === 1), inc, 1L)
    assert(rows(AggMaintenance.read(spark, inc)) == want)

    // compaction folds the partial log without changing the view
    AggMaintenance.compact(spark, inc)
    assert(rows(AggMaintenance.read(spark, inc)) == want)
    // the log really collapsed: one base dir remains under partials/
    val fs = new org.apache.hadoop.fs.Path(inc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$inc/partials"))
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(dirs.sameElements(Array("base")), dirs.toSeq)
    // and merging after compaction still works
    AggMaintenance.mergeBatch(o.limit(0), inc, 3L)
    assert(rows(AggMaintenance.read(spark, inc)) == want)
  }

  test("streaming foreachBatch maintenance equals the batch rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Date, Double)]
    val path = tmp()
    val checkpoint = tmp()
    AggMaintenance.rebuild(
      Seq.empty[(Long, Date, Double)]
        .toDF("o_orderkey", "o_orderdate", "o_totalprice"), path)
    val q = AggMaintenance.streamingMerge(
      input.toDF().toDF("o_orderkey", "o_orderdate", "o_totalprice"),
      path, checkpoint)
    val data = Seq(
      (1L, Date.valueOf("2026-01-05"), 100.50),
      (2L, Date.valueOf("2026-01-20"), 49.50),
      (3L, Date.valueOf("2026-02-01"), 10.00),
      (4L, Date.valueOf("2026-02-14"), 90.00))
    try {
      input.addData(data.take(2): _*)
      q.processAllAvailable()
      input.addData(data.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val direct = tmp()
    AggMaintenance.rebuild(
      data.toDF("o_orderkey", "o_orderdate", "o_totalprice"), direct)
    assert(rows(AggMaintenance.read(spark, path)) ==
      rows(AggMaintenance.read(spark, direct)))
    assert(rows(AggMaintenance.read(spark, path)) ==
      Set(("2026-01", 2L, 15000L), ("2026-02", 2L, 10000L)))
  }
}
