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

  test("event-time timers close sessions when the watermark passes the gap") {
    import TransformWithStateOps.{Click, ClosedSession}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val input = MemoryStream[Click]
      val q = TransformWithStateOps
        .timerSessions(input.toDS(), gapMs = 60000L)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        // alice: two clicks 30s apart -> one session [10:00:00, 10:00:30]
        input.addData(
          Click(1L, ts("2026-08-12 10:00:00")),
          Click(1L, ts("2026-08-12 10:00:30")))
        q.processAllAvailable()
        // a later key pushes the watermark past alice's end + gap
        input.addData(Click(2L, ts("2026-08-12 11:00:00")))
        q.processAllAvailable()
        input.addData(Click(3L, ts("2026-08-12 12:00:00")))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("tws_sessions").as[ClosedSession].collect().toSet
      val aliceStart = ts("2026-08-12 10:00:00").getTime
      val aliceEnd = ts("2026-08-12 10:00:30").getTime
      assert(rows.contains(ClosedSession(1L, aliceStart, aliceEnd, 2L)), rows)
      // key 2's session closes once key 3 moves the watermark past it
      val bobTs = ts("2026-08-12 11:00:00").getTime
      assert(rows.contains(ClosedSession(2L, bobTs, bobTs, 1L)), rows)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
