package graft

import org.apache.spark.sql.functions._

import graft.quality.Labeling

/** Round-12 continuation specs: the labeled-/preference-data family —
  * Poisson bootstrap, Bradley–Terry, Fleiss' kappa, cross-split gram
  * leakage. The DuckDB oracles are the exactness check; these pin the
  * semantic invariants and the planted fixtures. */
class LabelingSpec extends SparkSpec {
  import spark.implicits._

  test("poisson thresholds: 8 strictly increasing cumulative cuts, e^-1 head") {
    val t = Labeling.PoissonCumHex
    assert(t.length == 8)
    assert(t == t.sorted && t.distinct == t)
    // first threshold = floor(e^-1 * 16^6) — the P(X=0) mass
    assert(java.lang.Long.parseLong(t.head, 16) ==
      (math.exp(-1.0) * (1L << 24)).toLong)
    // by the 8th cut, >99.99% of the mass is below: the CASE's ELSE-8
    // arm is a tail guard, not a real branch
    assert(java.lang.Long.parseLong(t.last, 16) > ((1L << 24) * 9999L) / 10000L)
  }

  test("bootstrap: valid replicate envelope per event type, deterministic") {
    val rows = Labeling.qAbBootstrap(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_reps_valid")
      assert(n >= 0L && n <= Labeling.BootReps)
      if (n >= 4) {
        val lo = r.getAs[Long]("boot_lo_ucents")
        val hi = r.getAs[Long]("boot_hi_ucents")
        assert(lo <= hi, s"${r.getAs[String]("event_type")}: lo $lo > hi $hi")
      }
    }
    // the draw is a pure function of (replicate, user) — a second run
    // must reproduce every row (the oracle depends on it)
    val again = Labeling.qAbBootstrap(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("bradley-terry: win matrix is consistent and the fit recovers the planted order") {
    val mat = Labeling.btMatrix(
      Tables.load(spark, sf0001, "events")).collect()
      .map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        (r.getAs[Long]("n"), r.getAs[Long]("w")))).toMap
    assert(mat.nonEmpty)
    mat.foreach { case ((i, j), (n, w)) =>
      assert(i != j && n > 0 && w >= 0 && w <= n)
      val (nr, wr) = mat((j, i)) // the reverse-directed row
      assert(nr == n && w + wr == n, s"pair ($i,$j) win split")
    }
    val fit = Labeling.qPrefBradleyTerry(spark, sf0001).collect()
      .map(r => r.getAs[Long]("model") ->
        (r.getAs[Long]("strength_x1e6"), r.getAs[Long]("win_permille"))).toMap
    assert(fit.keySet == (0L until Labeling.BtModels.toLong).toSet)
    // normalization: sum pinned to M * 1e6 up to per-model truncation
    val tot = fit.values.map(_._1).sum
    assert(math.abs(tot - Labeling.BtModels * 1000000L) <= Labeling.BtModels,
      s"strengths sum $tot")
    // planted truth: strength of model i is (i+1) — the extremes are
    // separated far beyond sampling noise at any sf
    assert(fit(4L)._1 > fit(0L)._1 * 2, s"fit $fit")
    assert(fit(4L)._2 > fit(0L)._2, "raw win rate must agree with the fit")
  }

  test("kappa: perfect-agreement fixture scores exactly 1e6; noise drags below") {
    // doc_ids whose three rater draws ALL land above their flip
    // thresholds — every rater reports the true label, so P_o = 1 and
    // kappa = 1e6 exactly (pe < 1e6 because labels vary mod 3)
    val clean = (0L until 2000L).filter { id =>
      (0 to 2).forall { k =>
        md5hex(s"lab|$k|$id").substring(0, 6) >= Labeling.KappaNoiseHex(k)
      }
    }.take(30)
    assert(clean.size == 30, "fixture needs 30 flip-free doc_ids")
    assert(clean.map(_ % 3).toSet.size == 3, "fixture must span all labels")
    val df = clean.map(id => (id, "fix")).toDF("doc_id", "source")
    val r = Labeling.kappaOf(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("po_ppm") == 1000000L)
    assert(r.head.getAs[Long]("kappa_ppm") == 1000000L)
    // real corpus: three noisy raters agree well above chance but
    // below perfection (flip rates 50/150/300 permille → kappa ~0.5)
    val corpus = Labeling.qLabelKappa(spark, sf0001).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { row =>
      val k = row.getAs[Long]("kappa_ppm")
      assert(k > 200000L && k < 950000L,
        s"${row.getAs[String]("source")}: kappa $k outside the noisy band")
    }
  }

  test("streaming kappa monitor: closed window equals the batch kappa on its docs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = Timestamp.valueOf(s)
    // 40 docs labeled inside the 10:00 window, then a heartbeat far
    // enough ahead to close it (watermark 1 h)
    val inWindow = (0L until 40L)
      .map(id => (id, ts(f"2026-08-12 10:${id % 60}%02d:00")))
    val input = MemoryStream[(Long, Timestamp)]
    val out = Labeling.kappaHourly(
      input.toDF().toDF("doc_id", "ts"), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("kappa_hourly")
      .outputMode("append").start()
    try {
      input.addData(inWindow); q.processAllAvailable()
      input.addData(Seq((999L, ts("2026-08-12 12:30:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("kappa_hourly").collect()
    assert(emitted.length == 1, "exactly the closed 10:00 window emits")
    val got = emitted.head
    assert(got.getAs[Timestamp]("window_start") == ts("2026-08-12 10:00:00"))
    val batch = Labeling.kappaOf(
      inWindow.map(_._1).toDF("doc_id")
        .withColumn("source", lit("w"))).collect().head
    assert(got.getAs[Long]("n_docs") == 40L)
    Seq("po_ppm", "pe_ppm", "kappa_ppm").foreach { c =>
      assert(got.getAs[Long](c) == batch.getAs[Long](c), c)
    }
  }

  test("sft prompt conflicts: planted fixture separates conflict from exact-dup") {
    val head = "please summarize the following support ticket for me"
    val df = Seq(
      (0L, s"$head thanks a lot", "src1"),          // conflict group...
      (1L, s"$head with bullet points", "src2"),    // ...different tails
      (2L, "identical doc body here one two three", "src1"), // exact dup...
      (3L, "identical doc body here one two three", "src1"), // ...same text
      (4L, "a unique document with no twin at all", "src3")) // no group
      .toDF("doc_id", "text", "source")
    val rows = Labeling.sftPromptConflicts(df).collect()
    assert(rows.length == 2)
    val byVerdict = rows.map(r => r.getAs[String]("verdict") -> r).toMap
    assert(byVerdict("conflict").getAs[Long]("n_responses") == 2L)
    assert(byVerdict("conflict").getAs[Long]("n_sources") == 2L)
    assert(byVerdict("conflict").getAs[Long]("first_doc_id") == 0L)
    assert(byVerdict("exact_dup").getAs[Long]("n_responses") == 1L)
    // corpus: head-key collisions exist and every group's counts cohere
    val corpus = Labeling.qSftPromptConflicts(spark, sf0001).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getAs[Long]("n_responses") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_sources") <= r.getAs[Long]("n_docs"))
    }
  }

  test("streaming bootstrap cells: append-mode windows equal the batch replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = Timestamp.valueOf(s)
    val fixture = Seq(
      (0L, ts("2026-08-12 10:05:00"), 0L, "click", 10.50),
      (1L, ts("2026-08-12 10:15:00"), 1L, "click", 20.00),
      (2L, ts("2026-08-12 10:25:00"), 2L, "click", 5.25),
      (3L, ts("2026-08-12 10:35:00"), 3L, "view", 1.00),
      (4L, ts("2026-08-12 11:05:00"), 4L, "click", 7.75), // next window
      (5L, ts("2026-08-12 12:30:00"), 5L, "view", 2.00))  // closes both
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val out = Labeling.bootstrapCellsHourly(
      input.toDF().toDF(cols: _*), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("boot_cells")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(4)); q.processAllAvailable()
      input.addData(fixture.drop(4)); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("r"), r.getAs[Long]("variant")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("wc"))
    val got = spark.table("boot_cells").collect().map(key).toMap
    val batch = Labeling.bootstrapCellsBatch(
      // the final watermark is 11:30 (12:30 − 1 h): the 10:00 window
      // (end 11:00) closed and emitted; the 11:00 and 12:00 windows are
      // still open — the batch replay covers the closed window's events
      fixture.take(4).toDF(cols: _*), "ts").collect().map(key).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    // every closed (window, type) carries the full 32-replicate grid
    // for the variants that had events
    assert(got.keys.map(_._3).toSet == (0L until Labeling.BootReps.toLong).toSet)
  }

  test("transitivity audit: full triple lattice, directions consistent, linear truth near-acyclic") {
    val rows = Labeling.qPrefTransitivity(spark, sf0001).collect()
    assert(rows.length == 10) // C(5,3) triples
    var cycles = 0
    rows.foreach { r =>
      val (dij, djk, dik) = (r.getAs[Long]("dir_ij"),
        r.getAs[Long]("dir_jk"), r.getAs[Long]("dir_ik"))
      Seq(dij, djk, dik).foreach(d => assert(d >= -1 && d <= 1))
      val expectCyclic = (dij == 1 && djk == 1 && dik == -1) ||
        (dij == -1 && djk == -1 && dik == 1)
      assert(r.getAs[Boolean]("cyclic") == expectCyclic)
      if (expectCyclic) cycles += 1
    }
    // planted strengths are linear (i+1), so at most sampling-noise
    // cycles survive the majority vote
    assert(cycles <= 2, s"$cycles cycles on a linear-truth log")
  }

  test("rater quality: consensus agreement tracks true accuracy, noisiest rater last") {
    val rows = Labeling.qLabelRaterQuality(spark, sf0001).collect()
      .map(r => r.getAs[Long]("rater") -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 2L))
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_scored") + r.getAs[Long]("n_tied_excluded") == nDocs)
      val cons = r.getAs[Long]("acc_vs_consensus_ppm")
      val truth = r.getAs[Long]("acc_vs_truth_ppm")
      // the Dawid-Skene premise: consensus agreement estimates true
      // accuracy without gold labels (3-rater panel: within ~6%)
      assert(math.abs(cons - truth) < 60000L, s"rater ${r.getAs[Long]("rater")}: $cons vs $truth")
    }
    // flip rates 50/150/300 permille order the raters
    assert(rows(0L).getAs[Long]("acc_vs_truth_ppm") >
      rows(1L).getAs[Long]("acc_vs_truth_ppm"))
    assert(rows(1L).getAs[Long]("acc_vs_truth_ppm") >
      rows(2L).getAs[Long]("acc_vs_truth_ppm"))
  }

  test("majority vote: flip-free fixture is unanimous and perfectly accurate") {
    val clean = (0L until 2000L).filter { id =>
      (0 to 2).forall { k =>
        md5hex(s"lab|$k|$id").substring(0, 6) >= Labeling.KappaNoiseHex(k)
      }
    }.take(30)
    val df = clean.map(id => (id, "fix")).toDF("doc_id", "source")
    val r = Labeling.majorityOf(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_unanimous") == 30L)
    assert(r.head.getAs[Long]("n_tied") == 0L)
    assert(r.head.getAs[Long]("acc_ppm") == 1000000L)
    // corpus: partition identity holds and majority beats any single
    // noisy rater's expected floor
    Labeling.qLabelMajority(spark, sf0001).collect().foreach { row =>
      val n = row.getAs[Long]("n_docs")
      assert(row.getAs[Long]("n_unanimous") + row.getAs[Long]("n_split_2_1") +
        row.getAs[Long]("n_tied") == n, "margin partition")
      assert(row.getAs[Long]("n_correct") <= n)
      assert(row.getAs[Long]("acc_ppm") > 700000L,
        s"${row.getAs[String]("source")}: majority accuracy too low")
    }
  }

  test("temporal split overlap: matches a brute-force replay at sf0.001") {
    val ev = Tables.load(spark, sf0001, "events")
      .select($"event_type", $"user_id", unix_micros($"ts").as("us"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[Long]("us")))
    val tMin = ev.map(_._3).min
    val cut = tMin + ((ev.map(_._3).max - tMin) * 4) / 5
    val expected = ev.groupBy(_._1).map { case (tpe, rows) =>
      // .values.map to a Seq — mapping the Map itself would collapse
      // users into the (Boolean, Long) tuple keyspace
      val perUser = rows.groupBy(_._2).values.toSeq.map { es =>
        (es.exists(_._3 < cut), es.count(_._3 >= cut).toLong)
      }
      val testU = perUser.count(_._2 > 0).toLong
      val overlapU = perUser.count(p => p._2 > 0 && p._1).toLong
      tpe -> (perUser.count(_._1).toLong, testU, overlapU,
        perUser.map(_._2).sum,
        perUser.collect { case (true, te) => te }.sum)
    }
    val got = Labeling.qTimeSplitOverlap(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_train_users"), r.getAs[Long]("n_test_users"),
          r.getAs[Long]("n_overlap_users"), r.getAs[Long]("n_test_events"),
          r.getAs[Long]("n_leaky_test_events"))).toMap
    assert(got == expected, s"got $got expected $expected")
    // the audit must bite: with 15 users over the whole span, returning
    // users dominate the holdout
    assert(got.values.exists(v => v._3 > 0), "expected overlap at sf0.001")
  }

  test("streaming win matrix: last-write-wins state equals the batch matrix") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ids = Tables.load(spark, sf0001, "events")
      .select($"event_id").as[Long].collect().sorted
    val input = MemoryStream[Long]
    val out = Labeling.prefMatrixStream(input.toDF().toDF("event_id"))
    val q = out.writeStream.format("memory").queryName("pref_matrix")
      .outputMode("update").start()
    try {
      // two micro-batches: the second must UPDATE the first's counts,
      // not restart them — the running-total state contract
      val (first, second) = ids.splitAt(ids.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    // last write per pair wins; the running count n only grows, so the
    // latest emission is the max-n row — order-independent extraction
    val got = spark.table("pref_matrix").collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("w_lo")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    val batch = Labeling.btMatrix(Tables.load(spark, sf0001, "events"))
      .filter($"i" < $"j").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("w"))).toMap
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("split leakage: matches a brute-force shingle replay at sf0.001") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def split(text: String): String = {
      val b = "0123456789abcdef".indexOf(
        md5hex("split|" + md5hex(text)).charAt(0))
      if (b < 13) "train" else if (b < 15) "val" else "test"
    }
    def grams(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val trainG = docs.collect { case (_, t) if split(t) == "train" => grams(t) }
      .fold(Set.empty)(_ ++ _)
    val expected = docs.collect {
      case (id, t) if split(t) == "test" && grams(t).nonEmpty =>
        val g = grams(t)
        id -> (g.size.toLong, g.count(trainG.contains).toLong)
    }
    val got = graft.dedup.Dedup.qSplitLeakage(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("leaked"),
          r.getAs[Long]("leak_permille"))).toMap
    assert(got.keySet == expected.keySet, "test-split doc set")
    expected.foreach { case (id, (nSh, leaked)) =>
      val (gn, gl, gp) = got(id)
      assert(gn == nSh, s"doc $id n_sh")
      assert(gl == leaked, s"doc $id leaked")
      assert(gp == leaked * 1000 / nSh, s"doc $id permille")
    }
    // the audit must measure something: real corpora leak
    assert(got.values.exists(_._2 > 0L), "expected nonzero leakage at sf0.001")
  }

  private def hex6(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(6), 16)

  test("pass@k: matches a brute-force replay at sf0.001 and is monotone in k") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.size.toLong
      val sums = Labeling.PassKs.map { k =>
        k -> ds.map { case (id, _) =>
          val c = (0 until Labeling.PassAttempts).count { a =>
            hex6(s"pass|$a|$id") * 8 < (1L << 24) * (id % 4 + 1)
          }
          Labeling.comb(Labeling.PassAttempts - c, k)
        }.sum
      }.toMap
      src -> (n, Labeling.PassKs.map { k =>
        val cnk = Labeling.comb(Labeling.PassAttempts, k)
        ((n * cnk - sums(k)) * 1000000L) / (n * cnk)
      })
    }
    val got = Labeling.qEvalPassAtK(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_tasks"),
        Labeling.PassKs.map(k => r.getAs[Long](s"pass${k}_ppm"))))
    assert(got.toSeq.sortBy(_._1) == expected, s"got ${got.toSeq}")
    // pass@k is monotone in k per task, hence per source
    got.foreach { case (src, (_, Seq(p1, p5, p10))) =>
      assert(p1 <= p5 && p5 <= p10, s"$src: $p1/$p5/$p10 not monotone")
      assert(p1 >= 0L && p10 <= 1000000L, src)
    }
  }

  test("length bias: matches a brute-force replay and detects the planted confound") {
    val ids = Tables.load(spark, sf0001, "events")
      .select($"event_id").as[Long].collect()
    val games = ids.flatMap { id =>
      val a = id % 5; val b = (id / 5) % 5
      if (a == b) None
      else {
        val lo = math.min(a, b); val hi = math.max(a, b)
        val loWins = hex6(s"pref|$id") * (lo + hi + 2) < (1L << 24) * (lo + 1)
        def len(m: Long) = 100L + m * 50L + hex6(s"len|$m|$id") % 200L
        val (ll, lh) = (len(lo), len(hi))
        Some((math.abs(ll - lh) / 50, ll == lh,
          (ll > lh && loWins) || (lh > ll && !loWins)))
      }
    }
    val expected = games.groupBy(_._1).toSeq.sortBy(_._1).map { case (bk, gs) =>
      (bk, gs.length.toLong, gs.count(_._2).toLong, gs.count(_._3).toLong)
    }
    val got = Labeling.qPrefLengthBias(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("gap_bucket"), r.getAs[Long]("n_games"),
        r.getAs[Long]("n_len_ties"), r.getAs[Long]("n_longer_wins")))
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
    // planted confound: at gap >= 200 chars the longer response is
    // always the higher-indexed (stronger) model, so the longer-win
    // rate must sit well above the 500 null
    val far = games.filter(g => g._1 >= 4 && !g._2)
    assert(far.nonEmpty, "fixture needs far-gap games")
    val rate = far.count(_._3).toLong * 1000 / far.length
    assert(rate > 550, s"far-gap longer-win rate $rate should expose the confound")
  }

  test("token F1: matches a brute-force replay at sf0.001") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    val perDoc = docs.map { case (id, src, text) =>
      val ref = text.split(" ", -1).take(Labeling.F1RefTokens)
      val pred = ref.zipWithIndex.flatMap { case (t, p) =>
        md5hex(s"f1|$id|$p").charAt(0) match {
          case '0' | '1' => None
          case '2' => Some("xx")
          case _ => Some(t)
        }
      }
      val rc = ref.groupBy(identity).map { case (t, v) => t -> v.length }
      val pc = pred.groupBy(identity).map { case (t, v) => t -> v.length }
      val overlap = rc.map { case (t, n) => math.min(n, pc.getOrElse(t, 0)) }.sum
      (src, overlap.toLong, ref.length.toLong, pred.length.toLong)
    }
    val expected = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val (o, r, p) = (ds.map(_._2).sum, ds.map(_._3).sum, ds.map(_._4).sum)
      val macroSum = ds.map(d => 2L * d._2 * 1000000L / (d._3 + d._4)).sum
      (src, ds.length.toLong, 2L * o * 1000000L / (r + p),
        macroSum / ds.length)
    }
    val got = Labeling.qEvalTokenF1(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("micro_f1_ppm"), r.getAs[Long]("macro_f1_ppm")))
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
    // the noise model keeps ~13/16 of tokens: F1 must sit in a sane band
    got.foreach { case (src, _, micro, _) =>
      assert(micro > 700000L && micro < 980000L, s"$src micro $micro")
    }
  }

  test("best-of-n: matches a brute-force replay; curve monotone, n=1 is the mean") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.size.toLong
      val sums = Labeling.BonNs.map { bn =>
        bn -> ds.map { case (id, _) =>
          val rs = (0 until Labeling.BonSamples)
            .map(a => hex6(s"bon|$a|$id") % 600 + (id % 4) * 100).sorted
          (bn to Labeling.BonSamples)
            .map(i => rs(i - 1) * Labeling.comb(i - 1, bn - 1)).sum
        }.sum
      }.toMap
      src -> (n, Labeling.BonNs.map(bn =>
        sums(bn) * 1000L / (n * Labeling.comb(Labeling.BonSamples, bn))))
    }
    val got = Labeling.qEvalBestOfN(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_tasks"),
        Labeling.BonNs.map(bn => r.getAs[Long](s"bon${bn}_milli"))))
    assert(got.toSeq.sortBy(_._1) == expected, s"got ${got.toSeq}")
    got.foreach { case (src, (_, curve)) =>
      // E[max of n] is monotone in n — the whole point of the curve
      assert(curve == curve.sorted, s"$src: $curve not monotone")
      assert(curve.head >= 0L && curve.last <= 999000L, src)
    }
  }

  test("sft turn audit: matches a brute-force sessionize/role replay at sf0.001") {
    val ev = Tables.load(spark, sf0001, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("us")))
    val convs = ev.groupBy(_._2).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      // fold into conversations on the 30-min gap
      val groups = sorted.foldLeft(Vector.empty[Vector[(Long, Long, Long)]]) {
        (acc, r) =>
          if (acc.isEmpty || r._3 - acc.last.last._3 > Labeling.TurnGapUs)
            acc :+ Vector(r)
          else acc.init :+ (acc.last :+ r)
      }
      groups.map { g =>
        val roles = g.zipWithIndex.map { case ((id, _, _), i) =>
          val turn = i + 1
          if (hex6(s"role|$id") % 8 == 0) turn % 2 else (turn + 1) % 2
        }
        (g.length.toLong,
          roles.sliding(2).count(p => p.length == 2 && p(0) == p(1)).toLong,
          roles.head, roles.last)
      }
    }.toSeq
    val expected = convs.groupBy(c => math.min(c._1, 10L)).toSeq.sortBy(_._1)
      .map { case (bk, cs) =>
        (bk, cs.length.toLong, cs.map(_._2).sum,
          cs.count(_._3 == 1).toLong, cs.count(_._4 == 0).toLong,
          cs.map(_._1).sum)
      }
    val got = Labeling.qSftTurnAudit(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("len_bucket"), r.getAs[Long]("n_convs"),
        r.getAs[Long]("n_violations"), r.getAs[Long]("n_assistant_first"),
        r.getAs[Long]("n_dangling_user"), r.getAs[Long]("n_turns_total")))
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
    // planted flip rate 1/8 -> a non-first turn is a violation iff
    // exactly one of the adjacent turns flipped: p = 2*(1/8)*(7/8)
    val (viol, turns, nConvs) =
      (convs.map(_._2).sum, convs.map(_._1).sum, convs.length.toLong)
    val rate = viol * 1000 / (turns - nConvs)
    assert(rate > 140 && rate < 300, s"violation rate $rate vs ~219 expected")
  }

  test("cons@k: matches a brute-force replay; cons@1 is exactly pass@1") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.size.toLong
      val sums = Labeling.ConsKs.map { k =>
        k -> ds.map { case (id, _) =>
          val c = (0 until Labeling.PassAttempts).count { a =>
            hex6(s"pass|$a|$id") * 8 < (1L << 24) * (id % 4 + 1)
          }
          Labeling.consNum(c, k)
        }.sum
      }.toMap
      src -> (n, Labeling.ConsKs.map(k =>
        sums(k) * 1000000L / (n * Labeling.comb(Labeling.PassAttempts, k))))
    }
    val got = Labeling.qEvalConsAtK(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_tasks"),
        Labeling.ConsKs.map(k => r.getAs[Long](s"cons${k}_ppm"))))
    assert(got.toSeq.sortBy(_._1) == expected, s"got ${got.toSeq}")
    // with one sample, majority vote IS the sample: cons@1 = pass@1
    val pass1 = Labeling.qEvalPassAtK(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("pass1_ppm")).toMap
    got.foreach { case (src, (_, curve)) =>
      assert(curve.head == pass1(src), s"$src: cons@1 != pass@1")
    }
  }

  test("judge position bias: matches a brute-force replay; bias detected, debias identity holds") {
    val ids = Tables.load(spark, sf0001, "events")
      .select($"event_id").as[Long].collect()
    val games = ids.flatMap { id =>
      val a = id % 5; val b = (id / 5) % 5
      if (a == b) None
      else {
        val lo = math.min(a, b); val hi = math.max(a, b)
        val loFirst = hex6(s"pos|$id") % 2 == 0
        val first = if (loFirst) lo else hi
        val firstWins =
          hex6(s"jout|$id") * (lo + hi + 3) < (1L << 24) * (first + 2)
        Some((lo, hi, loFirst, firstWins))
      }
    }
    val expected = games.groupBy(g => (g._1, g._2)).toSeq.sortBy(_._1)
      .map { case ((lo, hi), gs) =>
        (lo, hi, gs.length.toLong, gs.count(_._3).toLong,
          gs.count(_._4).toLong,
          gs.count(g => g._3 && g._4).toLong,
          gs.count(g => !g._3 && !g._4).toLong)
      }
    val rows = Labeling.qJudgePositionBias(spark, sf0001).collect()
    val got = rows.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"),
      r.getAs[Long]("n_games"), r.getAs[Long]("n_lo_first"),
      r.getAs[Long]("n_first_wins"), r.getAs[Long]("lo_wins_when_first"),
      r.getAs[Long]("lo_wins_when_second")))
    assert(got.toSeq == expected, s"got ${got.toSeq}")
    // the planted +1 seat bonus must read as a corpus-wide first-win
    // rate well above the unbiased 500
    val (fw, n) = (games.count(_._4).toLong, games.length.toLong)
    assert(fw * 1000 / n > 520, s"first-win rate ${fw * 1000 / n}")
    rows.foreach { r =>
      val d = ((r.getAs[Long]("lo_wins_when_first") * 1000
        / r.getAs[Long]("n_lo_first"))
        + (r.getAs[Long]("lo_wins_when_second") * 1000
          / (r.getAs[Long]("n_games") - r.getAs[Long]("n_lo_first")))) / 2
      assert(r.getAs[Long]("debiased_lo_permille") == d, "debias identity")
    }
  }

  test("reward correlation: matches a brute-force replay; planted signal vs noise control") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val scored = ds.map { case (id, _, text) =>
        val q = text.split(" ", -1).length.toLong
        (id, q, q * 3 + hex6(s"rew|$id") % 200, hex6(s"rnz|$id") % 1000)
      }
      def ranks(key: ((Long, Long, Long, Long)) => Long): Map[Long, Long] =
        scored.sortBy(d => (key(d), d._1)).zipWithIndex
          .map { case (d, i) => d._1 -> (i + 1).toLong }.toMap
      val (rq, rc, rn) = (ranks(_._2), ranks(_._3), ranks(_._4))
      val n = scored.size.toLong
      def rho(other: Map[Long, Long]): Long = {
        val d2 = scored.map(d => {
          val diff = rq(d._1) - other(d._1); diff * diff
        }).sum
        (BigInt(1000000) - BigInt(d2) * 6000000L / (BigInt(n) * n * n - n)).toLong
      }
      src -> (n, rho(rc), rho(rn))
    }
    val got = Labeling.qRewardCorrelation(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("rho_corr_ppm"), r.getAs[Long]("rho_noise_ppm")))
    assert(got.toSeq.sortBy(_._1) == expected, s"got ${got.toSeq}")
    // planted 3x-token reward correlates strongly everywhere; the
    // pure-noise control hovers near zero ON AVERAGE (per-source n is
    // ~30 at sf0.001, so single sources legitimately wander ~2 sd)
    got.foreach { case (src, (_, corr, noise)) =>
      assert(corr > 600000L, s"$src: planted rho $corr too weak")
      assert(math.abs(noise) < 650000L, s"$src: control rho $noise")
    }
    val meanNoise = got.map(_._2._3).sum / got.length
    val meanCorr = got.map(_._2._2).sum / got.length
    assert(math.abs(meanNoise) < 200000L, s"mean control rho $meanNoise")
    assert(meanCorr - meanNoise > 400000L, "signal/control separation")
  }

  test("streaming pass@k monitor: closed window equals the batch replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = Timestamp.valueOf(s)
    // 40 finished eval tasks across two sources inside the 10:00
    // window, then a heartbeat closing it (watermark 1 h)
    val inWindow = (0L until 40L).map(id =>
      (id, if (id % 2 == 0) "srcA" else "srcB",
        ts(f"2026-08-12 10:${id % 60}%02d:00")))
    val cols = Seq("doc_id", "source", "ts")
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = Labeling.passAtKHourly(input.toDF().toDF(cols: _*), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("pass_at_k_hourly")
      .outputMode("append").start()
    try {
      input.addData(inWindow); q.processAllAvailable()
      input.addData(Seq((999L, "srcA", ts("2026-08-12 12:30:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("pass_at_k_hourly").collect()
    assert(emitted.length == 2, "one row per source for the closed window")
    val batch = Labeling.passAtKHourlyBatch(inWindow.toDF(cols: _*), "ts")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    emitted.foreach { got =>
      assert(got.getAs[Timestamp]("window_start") == ts("2026-08-12 10:00:00"))
      val b = batch(got.getAs[String]("source"))
      (Seq("n_tasks") ++ Labeling.PassKs.map(k => s"pass${k}_ppm"))
        .foreach(c => assert(got.getAs[Long](c) == b.getAs[Long](c), c))
    }
  }

  test("streaming length-bias monitor: closed window equals the batch replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = Timestamp.valueOf(s)
    // 40 preference events inside the 10:00 window (self-pair ids drop
    // identically in stream and batch), then a heartbeat closing it
    val inWindow = (0L until 40L)
      .map(id => (id, ts(f"2026-08-12 10:${id % 60}%02d:00")))
    val cols = Seq("event_id", "ts")
    val input = MemoryStream[(Long, Timestamp)]
    val out = Labeling.lengthBiasHourly(input.toDF().toDF(cols: _*), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("len_bias_hourly")
      .outputMode("append").start()
    try {
      input.addData(inWindow); q.processAllAvailable()
      // heartbeat id 999 is a SELF-PAIR (models 4 vs 4): the monitor
      // excludes non-games with an aggregate predicate instead of a
      // filter operator (a pushed-down filter would drop the row
      // below the watermark node), so a micro-batch of only non-game
      // events still advances event time and closes the 10:00 window
      // — the review-found stall this pins
      input.addData(Seq((999L, ts("2026-08-12 12:30:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("len_bias_hourly").collect()
    assert(emitted.length == 1, "exactly the closed 10:00 window emits")
    val got = emitted.head
    assert(got.getAs[Timestamp]("window_start") == ts("2026-08-12 10:00:00"))
    val batch = Labeling.lengthBiasHourlyBatch(
      inWindow.toDF(cols: _*), "ts").collect().head
    Seq("n_games", "n_len_ties", "n_longer_wins", "longer_win_permille")
      .foreach(c => assert(got.getAs[Long](c) == batch.getAs[Long](c), c))
  }
}
