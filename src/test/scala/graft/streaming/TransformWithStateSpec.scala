package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.TransformWithStateOps.{EventIn, RunningTotal}

/** transformWithState (Spark 4 arbitrary-state API) on the RocksDB
  * state store: totals accumulate across micro-batches per key. */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("running totals accumulate across batches per key (RocksDB store)") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[EventIn]
      val q = TransformWithStateOps.runningTotals(input.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      try {
        input.addData(EventIn(1L, 10.0), EventIn(1L, 5.0), EventIn(2L, 1.0))
        q.processAllAvailable()
        input.addData(EventIn(1L, 2.0), EventIn(3L, 7.0))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("tws").as[RunningTotal].collect()
      // last emission per key wins (update-mode changelog)
      val latest = rows.groupBy(_.userId).map { case (k, rs) =>
        k -> rs.maxBy(r => (r.n, r.total))
      }
      assert(latest(1L) == RunningTotal(1L, 3L, 17.0), latest)
      assert(latest(2L) == RunningTotal(2L, 1L, 1.0), latest)
      assert(latest(3L) == RunningTotal(3L, 1L, 7.0), latest)
      // batch 1 emitted the intermediate state for key 1 as well
      assert(rows.contains(RunningTotal(1L, 2L, 15.0)), rows.toSeq)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
