package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.TransformWithStateOps.{EventIn, EwmaAlert, Metered, RunningTotal}

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

  test("ListState top-k: k-bounded state, cross-batch merge, deterministic ties") {
    import TransformWithStateOps.{Scored, TopItem}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Scored]
      val q = TransformWithStateOps.topKByUser(input.toDS(), k = 2)
        .writeStream.format("memory").queryName("tws_topk")
        .outputMode("update").start()
      try {
        input.addData(Scored(1L, 101L, 5L), Scored(1L, 102L, 9L), Scored(1L, 103L, 1L))
        q.processAllAvailable()
        // a new high item evicts the lowest of the kept two; a rescore
        // of a kept item dedups by itemId
        input.addData(Scored(1L, 104L, 7L), Scored(1L, 102L, 9L))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("tws_topk").as[TopItem].collect()
      // final top-2: (102, 9) then (104, 7); 101/103 evicted
      assert(rows.exists(t => t.rank == 1 && t.itemId == 102L && t.score == 9L))
      assert(rows.exists(t => t.rank == 2 && t.itemId == 104L && t.score == 7L))
      // batch 1's top-2 was (102, 9), (101, 5)
      assert(rows.exists(t => t.rank == 2 && t.itemId == 101L && t.score == 5L))
      assert(!rows.exists(t => t.itemId == 103L), "beyond-k item never emitted")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state survives a checkpointed stop/restart (totals continue, not reset)") {
    import TransformWithStateOps.{EventIn, RunningTotal}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def tmp(p: String) = {
        val d = java.nio.file.Files.createTempDirectory(p).toFile
        new java.io.File(d, "x").getParentFile
      }
      val watch = tmp("tws-restart-watch")
      val ckpt = java.nio.file.Files.createTempDirectory("tws-restart-ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("tws-restart-out").toString
      def start() = {
        val src = spark.readStream
          .schema("userId LONG, value DOUBLE")
          .json(watch.toString).as[EventIn]
        TransformWithStateOps.runningTotals(src)
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[RunningTotal], _: Long) =>
            ds.write.mode("append").parquet(out)
          }
          .start()
      }
      java.nio.file.Files.write(new java.io.File(watch, "a.jsonl").toPath,
        """{"userId":1,"value":10.0}
          |{"userId":1,"value":5.0}""".stripMargin.getBytes("UTF-8"))
      start().awaitTermination(120000)
      assert(spark.read.parquet(out).as[RunningTotal].collect()
        .contains(RunningTotal(1L, 2L, 15.0)))

      // restart from the same checkpoint: only the new file is read,
      // and the totals CONTINUE from restored state
      java.nio.file.Files.write(new java.io.File(watch, "b.jsonl").toPath,
        """{"userId":1,"value":2.0}""".getBytes("UTF-8"))
      start().awaitTermination(120000)
      val after = spark.read.parquet(out).as[RunningTotal].collect()
      assert(after.contains(RunningTotal(1L, 3L, 17.0)), after.toSeq)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("top-k: a downward rescore releases the slot (latest score wins)") {
    import TransformWithStateOps.{Scored, TopItem}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Scored]
      val q = TransformWithStateOps.topKByUser(input.toDS(), k = 2)
        .writeStream.format("memory").queryName("tws_topk_down")
        .outputMode("update").start()
      try {
        input.addData(Scored(1L, 201L, 9L), Scored(1L, 202L, 5L))
        q.processAllAvailable()
        // 201 rescored DOWN below 202: must drop to rank 2 with the new score
        input.addData(Scored(1L, 201L, 3L))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_topk_down").as[TopItem].collect()
      assert(rows.exists(t => t.rank == 1 && t.itemId == 202L && t.score == 5L), rows.toSeq)
      assert(rows.exists(t => t.rank == 2 && t.itemId == 201L && t.score == 3L), rows.toSeq)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timer sessions: a gap INSIDE one micro-batch splits into two sessions") {
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
        .writeStream.format("memory").queryName("tws_split")
        .outputMode("append").start()
      try {
        // two bursts 10 minutes apart arrive in the SAME batch
        input.addData(
          Click(1L, ts("2026-08-12 10:00:00")),
          Click(1L, ts("2026-08-12 10:00:20")),
          Click(1L, ts("2026-08-12 10:10:00")))
        q.processAllAvailable()
        input.addData(Click(2L, ts("2026-08-12 12:00:00"))) // advance watermark
        q.processAllAvailable()
        input.addData(Click(3L, ts("2026-08-12 13:00:00")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_split").as[ClosedSession].collect().toSet
      val b1 = ts("2026-08-12 10:00:00").getTime
      val b1e = ts("2026-08-12 10:00:20").getTime
      val b2 = ts("2026-08-12 10:10:00").getTime
      assert(rows.contains(ClosedSession(1L, b1, b1e, 2L)), rows)
      assert(rows.contains(ClosedSession(1L, b2, b2, 1L)), rows)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("top-k: seeded random batches match a direct Scala replay of the merge rule") {
    import TransformWithStateOps.{Scored, TopItem}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rnd = new scala.util.Random(7)
      val batches = Seq.fill(4)(Seq.fill(12)(
        Scored(rnd.nextInt(3).toLong, 100L + rnd.nextInt(6), rnd.nextInt(50).toLong)))
      val input = MemoryStream[Scored]
      val q = TransformWithStateOps.topKByUser(input.toDS(), k = 3)
        .writeStream.format("memory").queryName("tws_topk_rand")
        .outputMode("update").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()

      // replay: per batch, same-item collisions resolve by max score;
      // batch overrides state per item; keep top-3 by (-score, itemId)
      var state = Map.empty[Long, Seq[Scored]] // userId -> kept
      batches.foreach { b =>
        b.groupBy(_.userId).foreach { case (u, rows) =>
          val incoming = rows.groupBy(_.itemId).map(_._2.maxBy(_.score)).toSeq
          val kept = state.getOrElse(u, Seq.empty)
            .filterNot(s => incoming.exists(_.itemId == s.itemId))
          state += u -> (kept ++ incoming)
            .sortBy(s => (-s.score, s.itemId)).take(3)
        }
      }
      val expected = state.flatMap { case (u, kept) =>
        kept.zipWithIndex.map { case (s, i) => TopItem(u, i + 1, s.itemId, s.score) }
      }.toSet
      // final emission per user = rows of the LAST batch that touched it
      val rows = spark.table("tws_topk_rand").as[TopItem].collect()
      val lastPerUser = rows.groupBy(_.userId).toSeq.flatMap { case (u, rs) =>
        // update-mode memory sink appends; reconstruct the last full
        // emission as the highest-index contiguous rank run
        val n = state(u).length
        rs.takeRight(n).toSeq
      }.toSet
      assert(lastPerUser == expected,
        s"only-got: ${lastPerUser -- expected}\nonly-exp: ${expected -- lastPerUser}")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState category counts: point updates accumulate per (key, category)") {
    import TransformWithStateOps.{Categorized, CategoryCount}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Categorized]
      val q = TransformWithStateOps.categoryCounts(input.toDS())
        .writeStream.format("memory").queryName("tws_cats")
        .outputMode("update").start()
      try {
        input.addData(Categorized(1L, "view"), Categorized(1L, "view"),
          Categorized(1L, "click"), Categorized(2L, "view"))
        q.processAllAvailable()
        input.addData(Categorized(1L, "view"), Categorized(2L, "purchase"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_cats").as[CategoryCount].collect()
      // latest emission per (key, category) carries the running count
      val latest = rows.groupBy(r => (r.userId, r.category))
        .map { case (k, rs) => k -> rs.map(_.n).max }
      assert(latest((1L, "view")) == 3L, latest)
      assert(latest((1L, "click")) == 1L)
      assert(latest((2L, "view")) == 1L)
      assert(latest((2L, "purchase")) == 1L)
      // batch 1 emitted the intermediate view count too
      assert(rows.contains(CategoryCount(1L, "view", 2L)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timer sessions == native session_window on a seeded random stream") {
    import TransformWithStateOps.{Click, ClosedSession}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rnd = new scala.util.Random(42)
      val base = java.sql.Timestamp.valueOf("2026-08-12 09:00:00").getTime
      // 4 users × ~10 events with gaps straddling the 60s session gap
      val clicks = (for {
        u <- 1L to 4L
        _ <- 1 to 10
      } yield Click(u, new java.sql.Timestamp(
        base + rnd.nextInt(40) * 20000L))).sortBy(_.ts.getTime)
      val sentinel = Click(99L, java.sql.Timestamp.valueOf("2026-08-12 12:00:00"))

      // path 1: explicit NFA with event-time timers
      val in1 = MemoryStream[Click]
      val q1 = TransformWithStateOps.timerSessions(in1.toDS(), gapMs = 60000L)
        .writeStream.format("memory").queryName("eq_tws")
        .outputMode("append").start()
      try {
        in1.addData(clicks: _*); q1.processAllAvailable()
        in1.addData(sentinel); q1.processAllAvailable()
        in1.addData(Click(98L, java.sql.Timestamp.valueOf("2026-08-12 13:00:00")))
        q1.processAllAvailable()
      } finally q1.stop()

      // path 2: native session_window
      val in2 = MemoryStream[Click]
      val q2 = StreamAggs.sessionCounts(
          in2.toDS().toDF("user", "ts"), "user", "ts",
          gap = "1 minute", watermark = "0 seconds")
        .writeStream.format("memory").queryName("eq_sw")
        .outputMode("append").start()
      try {
        in2.addData(clicks: _*); q2.processAllAvailable()
        in2.addData(sentinel); q2.processAllAvailable()
        in2.addData(Click(98L, java.sql.Timestamp.valueOf("2026-08-12 13:00:00")))
        q2.processAllAvailable()
      } finally q2.stop()

      val tws = spark.table("eq_tws").as[ClosedSession].collect()
        .filter(s => s.userId <= 4L)
        .map(s => (s.userId, s.startMs, s.endMs + 60000L, s.n)).toSet
      val sw = spark.table("eq_sw").collect()
        .map(r => (r.getAs[Long]("user"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getAs[Long]("n_events")))
        .filter(_._1 <= 4L).toSet
      assert(tws.nonEmpty && tws == sw,
        s"timer NFA != session_window\nonly-tws: ${tws -- sw}\nonly-sw: ${sw -- tws}")
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

  test("online EWMA alerts: prequential band, cross-batch state, Scala replay") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Metered]
    val q = TransformWithStateOps.ewmaAlerts(input.toDS())
      .writeStream.format("memory").queryName("ewma_alerts")
      .outputMode("append").start()
    // user 1: stable around 100 then a spike; user 2: constant (no alert,
    // zero band means any nonzero dev alerts after 2 points)
    val pts = Seq(
      Metered(1L, 1L, 100L), Metered(1L, 2L, 104L), Metered(1L, 3L, 98L),
      Metered(1L, 4L, 102L), Metered(1L, 5L, 500L),
      Metered(2L, 1L, 50L), Metered(2L, 2L, 50L), Metered(2L, 3L, 50L))
    try {
      input.addData(pts.take(4): _*)
      q.processAllAvailable()
      input.addData(pts.drop(4): _*)  // the spike arrives in batch 2
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_alerts").as[EwmaAlert].collect()
      .map(a => (a.userId, a.seq) -> a).toMap

    // direct Scala replay of the prequential semantics
    val want = pts.groupBy(_.userId).flatMap { case (u, xs) =>
      var ema = 0L; var sd = 0L; var n = 0L
      xs.sortBy(_.seq).map { m =>
        val dev = if (n == 0) 0L else math.abs(m.cents - ema)
        val band = if (n >= 2) 3L * (sd / (n - 1)) else -1L
        val alert = n >= 2 && dev > band
        val res = (u, m.seq) -> ((ema, dev, band, alert))
        if (n == 0) ema = m.cents else { sd += dev; ema = (m.cents + 3L * ema) / 4L }
        n += 1
        res
      }
    }
    assert(got.size == pts.size)
    want.foreach { case (k, (ema, dev, band, alert)) =>
      val a = got(k)
      assert((a.ema_before, a.dev, a.band, a.alert) == ((ema, dev, band, alert)), s"$k -> $a")
    }
    // the spike alerts; the stable user's small wobbles do not
    assert(got((1L, 5L)).alert)
    assert(!got((1L, 4L)).alert && !got((2L, 3L)).alert)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
