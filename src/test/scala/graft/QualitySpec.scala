package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{expr, unix_micros}

import graft.quality.Quality

/** Quality-module semantics + the plan shapes that make each operator
  * viable at 100 TB (zero-shuffle gates/samples, single-exchange
  * funnel, map-side-combinable repetition counts). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("gopher gate: flags follow the rule bounds") {
    val rows = Quality.qQualityGopher(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_words")
      val okWc = r.getAs[Boolean]("ok_word_count")
      assert(okWc == (n >= 50 && n <= 100000), s"doc ${r.get(0)}: n=$n okWc=$okWc")
      val pass = r.getAs[Boolean]("quality_pass")
      assert(pass == (okWc && r.getAs[Boolean]("ok_mean_wlen") &&
        r.getAs[Boolean]("ok_stopwords")))
      // mean word length sanity: permille of chars per word
      val mean = r.getAs[Long]("mean_wlen_permille")
      assert(mean > 0 && mean == r.getAs[Long]("sum_wlen") * 1000 / n)
    }
  }

  test("gopher gate and hash sample are narrow plans (no exchange before the sort)") {
    assert(!plan(Quality.qQualityGopher(spark, sf0001)).contains("Exchange hashpartitioning"))
    assert(!plan(Quality.qSampleHash(spark, sf0001)).contains("Exchange hashpartitioning"))
  }

  test("repetition: bigram identities hold per document") {
    Quality.qQualityRepetition(spark, sf0001).collect().foreach { r =>
      val nW = r.getAs[Long]("n_words")
      val nB = r.getAs[Long]("n_bigrams")
      assert(nB == math.max(nW - 1, 0L), s"doc ${r.get(0)}: words=$nW bigrams=$nB")
      val dup = r.getAs[Long]("n_dup_bigrams")
      assert(dup >= 0 && dup <= nB)
      assert(r.getAs[Long]("top_word_n") <= nW)
      assert(r.getAs[Long]("n_distinct_words") <= nW)
    }
  }

  test("hash sample is deterministic and roughly a tenth") {
    val a = Quality.qSampleHash(spark, sf0001).collect().map(_.getLong(0))
    val b = Quality.qSampleHash(spark, sf0001).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    val total = Tables.load(spark, sf0001, "documents").count()
    // 26/256 expected ≈ 10.2%; allow wide slack on the small sf
    assert(a.length > total / 30 && a.length < total / 3,
      s"sampled ${a.length} of $total")
  }

  test("stratified sample: exactly k per stratum (or all when smaller), ranks contiguous") {
    val rows = Quality.qSampleStratified(spark, sf0001).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val langSizes = Tables.load(spark, sf0001, "documents")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(20L, langSizes(lang)))
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }

  test("canonicalization dedup groups whitespace/punctuation variants") {
    import org.apache.spark.sql.functions._
    // build a tiny frame through the same normalize+digest shape
    val df = Seq((1L, "Hello,  world!"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = df
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), "\\s+", " ")))
      .groupBy(md5($"norm".cast("binary")).as("norm_fp"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical_doc_id"))
      .collect()
    assert(out.length == 2)
    val dupGroup = out.find(_.getAs[Long]("n_docs") == 2).get
    assert(dupGroup.getAs[Long]("canonical_doc_id") == 1L)
  }

  test("funnel: stages are ordered and monotone") {
    val rows = Quality.qFunnel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = Option(r.getAs[java.lang.Long]("view_ep"))
      val c = Option(r.getAs[java.lang.Long]("click_ep"))
      val p = Option(r.getAs[java.lang.Long]("purchase_ep"))
      val stage = r.getAs[Int]("stage")
      // a later stage implies every earlier stage, in time order
      if (p.isDefined) { assert(c.isDefined && p.get >= c.get) }
      if (c.isDefined) { assert(v.isDefined && c.get >= v.get) }
      assert(stage == (if (p.isDefined) 3 else if (c.isDefined) 2
                       else if (v.isDefined) 1 else 0))
    }
  }

  test("funnel plan: the three stage lookups share one user_id exchange") {
    val p = plan(Quality.qFunnel(spark, sf0001))
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id hash exchange, got $exchanges\n$p")
  }

  test("pii scrub: fixture texts redact and count exactly") {
    val fixtures = Seq(
      // (input, expected clean, n_email, n_ip, n_phone)
      ("mail me at jane.doe+spam@sub.example.co.uk today",
        "mail me at [EMAIL] today", 1L, 0L, 0L),
      ("two contacts: a@b.io and c_d%x@ex.org.",
        "two contacts: [EMAIL] and [EMAIL].", 2L, 0L, 0L),
      ("server 192.168.0.1 fell over; failover 10.0.0.255 took it",
        "server [IP] fell over; failover [IP] took it", 0L, 2L, 0L),
      ("call 555-123-4567 or 555 987 6543 now",
        "call [PHONE] or [PHONE] now", 0L, 0L, 2L),
      ("all three: bob@x.dev from 8.8.8.8 tel 123-456-7890",
        "all three: [EMAIL] from [IP] tel [PHONE]", 1L, 1L, 1L),
      ("10.1.2.3", "[IP]", 0L, 1L, 0L), // entire string is the match
      ("no pii here at all", "no pii here at all", 0L, 0L, 0L),
      // a bare 4-dot-group version string matches the IPv4 shape (a
      // documented false-positive class of the pattern); a letter
      // prefix blocks the \b, a 3-group version lacks a 4th octet
      ("release 1.2.3.4 shipped; v1.2.3.4 and 1.2.3 do not match",
        "release [IP] shipped; v1.2.3.4 and 1.2.3 do not match", 0L, 1L, 0L))
    val df = fixtures.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val got = graft.quality.Quality.withPiiScrub(df)
      .select($"doc_id", $"clean_text", $"n_email", $"n_ip", $"n_phone")
      .collect().sortBy(_.getLong(0))
    fixtures.zip(got).foreach { case ((in, clean, ne, ni, np), r) =>
      assert(r.getString(1) == clean, s"input: $in")
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((ne, ni, np)), s"input: $in")
    }
  }

  test("pii scrub query: every doc gets its synthetic header scrubbed; raw text stays clean") {
    val rows = Quality.qPiiScrub(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the appended header contributes exactly one of each; the raw
      // corpus text none
      assert(r.getAs[Long]("n_email") == 1L)
      assert(r.getAs[Long]("n_ip") == 1L)
      assert(r.getAs[Long]("n_phone") == 1L)
      val clean = r.getAs[String]("clean_text")
      // "user<id>" is consumed by the email local part
      assert(clean.endsWith(" contact [EMAIL] from [IP] tel [PHONE]"),
        clean.takeRight(80))
    }
    // scan-speed contract: no shuffle anywhere in the scrub
    assert(!plan(Quality.qPiiScrub(spark, sf0001))
      .contains("Exchange hashpartitioning"))
  }

  test("code detect: real code scores high, prose scores low") {
    val fixtures = Seq(
      ("""def fib(n): return n if n < 2 else fib(n-1) + fib(n-2)""", true),
      ("""for (i = 0; i < 10; i++) { sum += a[i]; }""", true),
      ("""import os; class Foo: pass""", true),
      ("the quick brown fox jumps over the lazy dog and keeps running", false),
      ("we discussed the quarterly report over coffee this morning", false))
    val df = fixtures.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val got = Quality.withCodeScore(df)
      .select($"doc_id", $"is_code", $"code_score_ppm", $"sym_ppm", $"kw_ppm",
        $"n_sym", $"n_chars", $"kw_hits", $"n_words")
      .collect().sortBy(_.getLong(0))
    fixtures.zip(got).foreach { case ((in, isCode), r) =>
      assert(r.getBoolean(1) == isCode, s"input: $in score=${r.getLong(2)}")
      // score identities hold row by row
      assert(r.getLong(3) == r.getLong(5) * 1000000L / r.getLong(6))
      assert(r.getLong(4) == r.getLong(7) * 1000000L / r.getLong(8))
      assert(r.getLong(2) == (r.getLong(3) + r.getLong(4)) / 2)
    }
  }

  test("code detect query: two-class output with consistent threshold") {
    val rows = Quality.qCodeDetect(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_code") == (r.getAs[Long]("code_score_ppm") >= 15000L))
      assert(r.getAs[Long]("code_score_ppm") ==
        (r.getAs[Long]("sym_ppm") + r.getAs[Long]("kw_ppm")) / 2)
    }
    val (code, prose) = rows.partition(_.getAs[Boolean]("is_code"))
    assert(code.nonEmpty && prose.nonEmpty)
    assert(!plan(Quality.qCodeDetect(spark, sf0001))
      .contains("Exchange hashpartitioning"))
  }

  test("drift: shares sum to ~1e6 per side, deltas consistent, totals broadcast") {
    val rows = Quality.qQualityDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("drift_ppm") ==
        math.abs(r.getAs[Long]("ref_ppm") - r.getAs[Long]("cur_ppm")))
      assert(r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 9)
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      // integral-div floors: each side's ppm shares sum to 1e6 minus at
      // most one ulp-per-bin of rounding
      val refSum = rs.map(_.getAs[Long]("ref_ppm")).sum
      val curSum = rs.map(_.getAs[Long]("cur_ppm")).sum
      assert(refSum <= 1000000L && refSum > 1000000L - rs.length, s"$et refSum=$refSum")
      assert(curSum <= 1000000L && curSum > 1000000L - rs.length, s"$et curSum=$curSum")
    }
    // the 5-row totals frame must ride a broadcast, not shuffle the counts
    val p = plan(Quality.qQualityDrift(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  /** md5("imp|" + token) first byte — the engine's DSIR hash bucket. */
  private def impBucket(token: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("imp|" + token).getBytes("UTF-8"))
    (d(0) & 0xff).toLong
  }

  test("DSIR importance: engine == direct Scala replay of the exact arithmetic") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val toks = docs.map { case (id, src, text) =>
      (id, src, text.split(" ").filter(_.nonEmpty).toSeq)
    }
    val bucketed = toks.flatMap { case (_, src, ts) => ts.map(t => (src, impBucket(t))) }
    val rB = bucketed.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val tB = bucketed.filter(x => Set("src0", "src1", "src2")(x._1))
      .groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val rtot = rB.values.sum; val ttot = tB.values.sum
    val w = rB.map { case (b, r) =>
      b -> (((tB.getOrElse(b, 0L) + 1) * 1000000L) / (ttot + 256) -
        ((r + 1) * 1000000L) / (rtot + 256))
    }
    val want = toks.map { case (id, src, ts) =>
      id -> ((src, ts.size.toLong, ts.map(t => w(impBucket(t))).sum))
    }.toMap
    val rows = Quality.qImportanceDsir(spark, sf0001).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (src, n, score) = want(id)
      assert(r.getAs[String]("source") == src)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id")
      assert(r.getAs[Long]("imp_score") == score, s"doc $id")
      assert(r.getAs[Boolean]("target_like") == (score > 0), s"doc $id")
    }
    // the target tier must skew positive vs the rest — the operator's point
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val tgtPos = bySrc.filter(_._1 <= "src2").values.flatten
      .count(_.getAs[Boolean]("target_like"))
    val restPos = bySrc.filter(_._1 > "src2").values.flatten
      .count(_.getAs[Boolean]("target_like"))
    assert(tgtPos > restPos)
  }

  test("temperature mixture: engine == replay; flattens toward small sources") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val nTok = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
    }
    val wRaw = nTok.map { case (s, n) => s -> math.sqrt(n.toDouble).floor.toLong }
    val ttot = nTok.values.sum; val wtot = wRaw.values.sum
    val rows = Quality.qMixTemperature(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length == nTok.size)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("n_tokens") == nTok(s), s)
      val rawPpm = nTok(s) * 1000000L / ttot
      val samplePpm = wRaw(s) * 1000000L / wtot
      assert(r.getAs[Long]("raw_ppm") == rawPpm, s)
      assert(r.getAs[Long]("sample_ppm") == samplePpm, s)
      assert(r.getAs[Long]("boost_permille") == samplePpm * 1000L / rawPpm, s)
    }
    // α = 1/2 flattens: the smallest source is boosted at least as much
    // as the largest (strictly more when sizes genuinely differ)
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    val (small, large) = (bySize.head, bySize.last)
    if (small.getAs[Long]("n_tokens") < large.getAs[Long]("n_tokens"))
      assert(small.getAs[Long]("boost_permille") > large.getAs[Long]("boost_permille"))
    // shares each sum to ~1e6 (integral-div floors)
    val rawSum = rows.map(_.getAs[Long]("raw_ppm")).sum
    val sampleSum = rows.map(_.getAs[Long]("sample_ppm")).sum
    assert(rawSum <= 1000000L && rawSum > 1000000L - rows.length)
    assert(sampleSum <= 1000000L && sampleSum > 1000000L - rows.length)
  }

  test("DSIR importance plan: stats broadcast back — no doc-keyed shuffle or join") {
    val p = plan(Quality.qImportanceDsir(spark, sf0001))
    // totals and the 1-row weight map both ride 1-row broadcasts (the
    // constant join key folds to a nested loop — same shape as a cross
    // join, build side is one row); never a doc_id-keyed exchange
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("hashpartitioning(doc_id"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ab z-test equals a direct Scala replay of the pooled statistic") {
    val ev = Tables.load(spark, sf0001, "events")
      .select($"event_type", $"user_id", $"value".cast("decimal(18,2)").as("v"))
      .collect()
    val conv = ev.groupBy(r => (r.getString(0), r.getLong(1))).map { case ((t, u), rs) =>
      val s = rs.map(r => BigDecimal(r.getDecimal(2))).sum
      (t, u, s * 100 > BigDecimal(4500) * rs.length)
    }
    val expected = conv.groupBy(_._1).map { case (t, cs) =>
      val a = cs.filter(_._2 % 2 == 0); val b = cs.filter(_._2 % 2 == 1)
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val (xa, xb) = (a.count(_._3).toLong, b.count(_._3).toLong)
      val num = BigInt(xa * nb - xb * na)
      val z2 =
        if (xa + xb == 0 || xa + xb == na + nb) BigInt(0)
        else num * num * BigInt(na + nb) * 1000000 /
          (BigInt(na) * nb * (xa + xb) * (na + nb - xa - xb))
      val z = num.signum * math.floor(math.sqrt(z2.toDouble)).toLong
      t -> (na, nb, xa, xb, xa * 1000000L / na, xb * 1000000L / nb,
        z2.toLong, z, math.abs(z) > 1960)
    }
    val got = Quality.qAbZtest(spark, sf0001).collect().map { r =>
      r.getAs[String]("event_type") -> (
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b"),
        r.getAs[Long]("p_a_ppm"), r.getAs[Long]("p_b_ppm"),
        r.getAs[Long]("z2_x1e6"), r.getAs[Long]("z_x1000"),
        r.getAs[Boolean]("significant"))
    }.toMap
    assert(got == expected)
    // delta is consistent with the per-arm rates
    Quality.qAbZtest(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("delta_ppm") ==
        r.getAs[Long]("p_a_ppm") - r.getAs[Long]("p_b_ppm"))
    }
  }

  test("quantile normalization equals a direct Scala replay") {
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "on")
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val scored = docs.map { case (id, src, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val score =
        if (ws.isEmpty) ws.count(stop) * 100000L
        else ws.count(stop) * 100000L + ws.map(_.length.toLong).sum * 1000L / ws.length
      (id, src, score)
    }
    val nAll = scored.length.toLong
    val pooledSorted = scored.sortBy { case (id, _, s) => (s, id) }
    val gridScore = (0L to 1000L).map { p =>
      p -> pooledSorted(((nAll - 1) * p / 1000).toInt)._3
    }.toMap
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val inOrder = ds.toSeq.sortBy { case (id, _, s) => (s, id) }
      val nSrc = inOrder.length.toLong
      inOrder.zipWithIndex.map { case ((id, src, s), i) =>
        val q = if (nSrc == 1) 0L else i.toLong * 1000L / (nSrc - 1)
        id -> ((src, s, i + 1L, q, gridScore(q)))
      }
    }.toMap
    val got = Quality.qQuantileNorm(spark, sf0001).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[String]("source"),
        r.getAs[Long]("score"), r.getAs[Long]("s_rank"),
        r.getAs[Long]("q_permille"), r.getAs[Long]("norm_score")))
    }.toMap
    assert(got == expected)
    // normalized scores are monotone in the within-source quantile
    got.values.groupBy(_._1).foreach { case (_, vs) =>
      vs.toSeq.sortBy(_._4).sliding(2).foreach {
        case Seq(lo, hi) => assert(lo._5 <= hi._5)
        case _ =>
      }
    }
  }

  test("pps sampling equals a direct Scala replay; grid accounting holds") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).count(_.nonEmpty).toLong)
      .sortBy(_._1)
    val wtot = docs.map(_._2).sum
    val step = wtot / 50
    var cum = 0L
    val expected = docs.map { case (id, w) =>
      cum += w
      val hits = cum / step - (cum - w) / step
      (id, w, cum, hits, hits >= 1)
    }.toSeq
    val got = Quality.qSamplePps(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Long]("cum"),
        r.getAs[Long]("n_hits"), r.getAs[Boolean]("selected"))).toSeq
    assert(got == expected)
    // every grid point lands on exactly one doc: hits sum to the grid size
    assert(got.map(_._4).sum == wtot / step)
    // the draw is weighted: selected docs are longer on average
    val (sel, unsel) = got.partition(_._5)
    assert(sel.nonEmpty && unsel.nonEmpty)
    assert(sel.map(_._2).sum / sel.size > unsel.map(_._2).sum / unsel.size)
  }

  test("cuped equals a direct BigInt Scala replay of the moment arithmetic") {
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = Tables.load(spark, sf0001, "events")
      .select($"event_type", $"user_id", $"ts", $"value".cast("decimal(18,2)").as("v"))
      .collect()
    val per = ev.groupBy(r => (r.getString(0), r.getLong(1))).map { case ((t, u), rs) =>
      def cents(pre: Boolean) = rs.filter { r =>
        val isPre = r.getTimestamp(2).before(split)
        if (pre) isPre else !isPre
      }.map(r => BigDecimal(r.getDecimal(3)) * 100).sum.toLongExact
      (t, u, cents(pre = true), cents(pre = false))
    }
    val expected = per.groupBy(_._1).map { case (t, us) =>
      val a = us.filter(_._2 % 2 == 0); val b = us.filter(_._2 % 2 == 1)
      val (na, nb) = (BigInt(a.size), BigInt(b.size))
      val (sxa, sxb) = (BigInt(a.map(_._3).sum), BigInt(b.map(_._3).sum))
      val (sya, syb) = (BigInt(a.map(_._4).sum), BigInt(b.map(_._4).sum))
      val sxx = us.map(u => BigInt(u._3) * u._3).sum
      val sxy = us.map(u => BigInt(u._3) * u._4).sum
      val n = na + nb
      val covN = n * sxy - (sxa + sxb) * (sya + syb)
      val varN = n * sxx - (sxa + sxb) * (sxa + sxb)
      val dyn = sya * nb - syb * na
      val dxn = sxa * nb - sxb * na
      val theta = if (varN == 0) BigInt(0) else covN * 1000000 / varN
      val raw = dyn * 1000000 / (na * nb)
      val cuped =
        if (varN == 0) raw
        else (dyn * varN - dxn * covN) * 1000000 / (na * nb * varN)
      t -> ((na.toLong, nb.toLong, sxa.toLong, sxb.toLong, sya.toLong, syb.toLong,
        theta.toLong, raw.toLong, cuped.toLong))
    }
    val got = Quality.qAbCuped(spark, sf0001).collect().map { r =>
      r.getAs[String]("event_type") -> ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("sx_a"), r.getAs[Long]("sx_b"),
        r.getAs[Long]("sy_a"), r.getAs[Long]("sy_b"),
        r.getAs[Long]("theta_x1e6"), r.getAs[Long]("delta_raw_x1e6"),
        r.getAs[Long]("delta_cuped_x1e6")))
    }.toMap
    assert(got == expected)
  }

  test("funnel latency distribution replays from the funnel's own epochs") {
    val lats = Quality.qFunnel(spark, sf0001).collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getAs[Long]("purchase_ep") - r.getAs[Long]("view_ep")) / 1000000L)
      .sorted
    assert(lats.nonEmpty)
    val n = lats.length
    val median = (lats((n + 1) / 2 - 1) + lats(n / 2)) / 2.0
    val p90 = lats(((9 * n + 9) / 10 - 1).toInt)
    val r = Quality.qFunnelLatency(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_converted") == n.toLong)
    assert(r.getAs[Long]("min_sec") == lats.head)
    assert(r.getAs[Long]("max_sec") == lats.last)
    assert(r.getAs[Double]("median_sec") == median)
    assert(r.getAs[Long]("p90_sec") == p90)
  }

  test("deadline funnel replays from the funnel's epochs and never exceeds it") {
    val deadline = 7L * 24 * 3600 * 1000000L
    val epochs = Quality.qFunnel(spark, sf0001).collect().map { r =>
      (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getAs[Int]("stage"))
    }
    val stages = epochs.map { case (v, c, p, _) =>
      val cOk = for (ve <- v; ce <- c if ce - ve <= deadline) yield ce
      val pOk = for (ve <- v; pe <- p if pe - ve <= deadline) yield pe
      if (pOk.nonEmpty && cOk.nonEmpty) 3
      else if (cOk.nonEmpty) 2
      else if (v.nonEmpty) 1 else 0
    }
    val expectedCounts = stages.groupBy(identity)
      .map { case (s, xs) => s -> xs.length.toLong }
    val rows = Quality.qFunnelDeadline(spark, sf0001).collect()
    val gotCounts = rows.map(r =>
      r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(gotCounts == expectedCounts)
    // the deadline can only demote stages vs the unconstrained funnel
    epochs.map(_._4).zip(stages).foreach { case (unconstrained, bounded) =>
      assert(bounded <= unconstrained)
    }
    // reached/rate accounting
    val entered = stages.count(_ >= 1).toLong
    rows.filter(_.getAs[Int]("stage") >= 1).foreach { r =>
      val s = r.getAs[Int]("stage")
      assert(r.getAs[Long]("reached") == stages.count(_ >= s).toLong)
      assert(r.getAs[Long]("rate_ppm") ==
        stages.count(_ >= s).toLong * 1000000L / entered)
    }
  }

  test("ab z-test plan: two aggregate exchanges, no join") {
    val p = plan(Quality.qAbZtest(spark, sf0001))
    assert(!p.contains("Join"), p)
    // (metric, user) combine then the per-metric rollup — nothing else
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("curation pipeline: verdicts partition the corpus, stage precedence holds") {
    val nCorpus = Tables.load(spark, sf0001, "documents")
      .filter($"source" =!= "src0").count()
    val v = Quality.qPipelineCuration(spark, sf0001).collect()
    assert(v.length.toLong == nCorpus)
    assert(v.map(_.getAs[Long]("doc_id")).distinct.length == v.length)
    // the sf0.001 fixture exercises every stage
    assert(v.map(_.getAs[String]("verdict")).toSet ==
      Set("gate_fail", "dup", "contaminated", "sampled_out", "kept"))
    // stage 1 agrees with the standalone gopher gate, and later stages
    // only ever see docs the earlier ones passed
    val gatePass = Quality.qQualityGopher(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("quality_pass")).toMap
    v.foreach { r =>
      val verdict = r.getAs[String]("verdict")
      assert((verdict == "gate_fail") == !gatePass(r.getAs[Long]("doc_id")))
      if (verdict == "contaminated")
        assert(r.getAs[Long]("contam_permille") >= Quality.PipelineContamThreshold)
      if (verdict == "kept" || verdict == "sampled_out")
        assert(r.getAs[Long]("contam_permille") < Quality.PipelineContamThreshold)
    }
  }

  test("curation pipeline: every dup has a smaller gate-passing doc with its head fingerprint") {
    val fp = Tables.load(spark, sf0001, "documents")
      .filter($"source" =!= "src0")
      .select($"doc_id", graft.dedup.Dedup.headFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v = Quality.qPipelineCuration(spark, sf0001).collect()
    val passers = v.filter(_.getAs[String]("verdict") != "gate_fail")
      .map(_.getAs[Long]("doc_id")).toSet
    val dups = v.filter(_.getAs[String]("verdict") == "dup").map(_.getAs[Long]("doc_id"))
    assert(dups.nonEmpty)
    dups.foreach { id =>
      assert(passers.exists(o => o < id && fp(o) == fp(id)),
        s"dup doc $id has no smaller surviving doc sharing its fingerprint")
    }
  }

  test("pipeline funnel equals the per-doc rollup") {
    val doc = Quality.qPipelineCuration(spark, sf0001).collect()
      .groupBy(r => (r.getAs[String]("source"), r.getAs[String]("verdict")))
      .map { case ((s, vd), rs) =>
        (s, vd, rs.length.toLong, rs.map(_.getAs[Long]("n_words")).sum) }
      .toList.sorted
    val fun = Quality.qPipelineFunnel(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("verdict"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_words"))).toList
    assert(fun == fun.sorted, "funnel output must be ordered by (source, verdict)")
    assert(doc == fun)
  }

  test("mix divergence: TV identity, shares sum, ties to the pipeline verdicts") {
    val rows = Quality.qMixDivergence(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("achieved_ppm"), r.getAs[Long]("target_ppm"),
          r.getAs[Long]("abs_gap_ppm"), r.getAs[Long]("tv_ppm"))))
      .toMap
    assert(rows.nonEmpty)
    // kept counts tie to the composed pipeline's own verdicts
    val kept = Quality.qPipelineCuration(spark, sf0001).collect()
      .filter(_.getAs[String]("verdict") == "kept")
      .groupBy(_.getAs[String]("source")).map { case (s, xs) => s -> xs.length.toLong }
    rows.foreach { case (s, v) => assert(v._2 == kept.getOrElse(s, 0L), s) }
    // shares each sum to ~1e6 (integral-div truncation only)
    val aSum = rows.values.map(_._3).sum; val tSum = rows.values.map(_._4).sum
    assert(aSum <= 1000000L && aSum > 1000000L - rows.size)
    assert(tSum <= 1000000L && tSum > 1000000L - rows.size)
    // the TV half-sum identity, repeated on every row
    val tv = rows.values.map(_._5).sum / 2
    assert(rows.values.forall(_._6 == tv))
    assert(rows.values.forall(v => v._5 == math.abs(v._3 - v._4)))
    // curation losses genuinely move the mix off target
    assert(tv > 0L)
  }

  test("calibration bins: accounting consistent with the AUC frame") {
    val rows = Quality.qCalibration(spark, sf0001).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("mean_score_ppm"),
          r.getAs[Long]("pos_rate_ppm"))))
      .toMap
    assert(rows.nonEmpty && rows.keys.forall(b => b >= 0 && b <= 9))
    val auc = Quality.qClassifierAuc(spark, sf0001).collect().head
    // bins partition the same scored corpus the AUC reads
    assert(rows.values.map(_._1).sum ==
      auc.getAs[Long]("n_pos") + auc.getAs[Long]("n_neg"))
    rows.foreach { case (b, (_, mean, rate)) =>
      assert(rate >= 0 && rate <= 1000000L)
      if (b < 9) assert(mean >= b * 5000 && mean < (b + 1) * 5000, s"bin $b mean $mean")
    }
    // perfect separation shows up as monotone purity at the extremes
    val minBin = rows.keys.min; val maxBin = rows.keys.max
    assert(rows(minBin)._3 < rows(maxBin)._3)
  }

  test("exact AUC: midrank identity == brute pair counting on randomized fixtures") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 8) {
      // small score domain forces heavy ties and class interleaving
      val rows = (1 to 120).map(_ =>
        (rnd.nextInt(6).toLong, rnd.nextBoolean()))
      if (rows.exists(_._2) && rows.exists(!_._2)) {
        // brute AUC: wins + half-ties over all (pos, neg) pairs, x2 to
        // stay integral
        val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
        val twice = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        val wantPpm = twice * 1000000L / (2L * pos.length * neg.length)
        val r = Quality.aucOf(rows.toDF("score", "label")).collect().head
        assert(r.getAs[Long]("n_pos") == pos.length.toLong)
        assert(r.getAs[Long]("n_neg") == neg.length.toLong)
        assert(r.getAs[Long]("auc_ppm") == wantPpm)
      }
    }
    // the corpus query: perfect separation by construction
    val corpus = Quality.qClassifierAuc(spark, sf0001).collect().head
    assert(corpus.getAs[Long]("auc_ppm") == 1000000L)
    assert(corpus.getAs[Long]("n_neg") > 0)
  }

  test("expectations: clean corpus passes the standard suite; violations are counted") {
    import graft.quality.Expectations
    val rows = Expectations.standardSuite(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
          r.getAs[Boolean]("pass"))))
      .toMap
    assert(rows.size == 10)
    // the synthetic corpus satisfies its own contracts
    rows.foreach { case (name, (n, v, pass)) =>
      assert(n > 0, name); assert(v == 0L && pass, s"$name: $v violations")
    }
    val nLi = Tables.load(spark, sf0001, "lineitem").count()
    assert(rows("lineitem_quantity_range")._1 == nLi)
    assert(rows("lineitem_orders_ri")._1 == nLi)
    // a deliberately-broken contract is detected and counted exactly
    val broken = Expectations.run(spark, sf0001,
      rows = Seq(
        Expectations.RowCheck("impossible_quantity", "lineitem",
          org.apache.spark.sql.functions.col("l_quantity") >= 1),
        Expectations.RowCheck("quantity_over_10", "lineitem",
          org.apache.spark.sql.functions.col("l_quantity") > 10)),
      uniques = Seq.empty, refs = Seq.empty).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("pass")))).toMap
    assert(broken("impossible_quantity")._1 == nLi && !broken("impossible_quantity")._2)
    val over10 = Tables.load(spark, sf0001, "lineitem")
      .filter($"l_quantity" > 10).count()
    assert(broken("quantity_over_10")._1 == over10)
    // an EMPTY suite returns an empty report, not an exception
    val empty = Expectations.run(spark, sf0001,
      rows = Seq.empty, uniques = Seq.empty, refs = Seq.empty)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq ==
      Seq("check_name", "n_rows", "n_violations", "pass"))
  }

  test("SRM gate: engine == Scala replay of the even-split chi-square") {
    val ev = Tables.load(spark, sf0001, "events")
      .select($"user_id").as[Long].collect()
    val na = ev.filter(_ % 2 == 0).distinct.length.toLong
    val nb = ev.filter(_ % 2 == 1).distinct.length.toLong
    val ea = ev.count(_ % 2 == 0).toLong
    val eb = ev.count(_ % 2 == 1).toLong
    val chi2 = (na - nb) * (na - nb) * 1000000L / (na + nb)
    val r = Quality.qAbSrm(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Long]("events_a") == ea && row.getAs[Long]("events_b") == eb)
    assert(row.getAs[Long]("chi2_x1e6") == chi2)
    assert(row.getAs[Boolean]("srm_flag") == (chi2 > 3840000L))
    // a parity split of sequential user ids must NOT trip the gate
    assert(!row.getAs[Boolean]("srm_flag"))
  }

  test("epoch shuffle: engine == MD5 replay; partition exact, permutations differ") {
    def shard(epoch: Long, docId: Long): Long = {
      val h = md5hex(s"ep$epoch|$docId").substring(0, 2)
      java.lang.Long.parseLong(h, 16) % 32
    }
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val want = (for { e <- Seq(0L, 1L); (id, nc) <- docs } yield
      ((e, shard(e, id)), nc))
      .groupBy(_._1).map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val got = Quality.qEpochShard(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"))))
      .toMap
    assert(got == want)
    // every doc lands in exactly one shard per epoch
    Seq(0L, 1L).foreach { e =>
      assert(got.collect { case ((`e`, _), (n, _)) => n }.sum == docs.length.toLong)
    }
    assert(got.keys.forall { case (_, s) => s >= 0 && s < 32 })
    // the two epochs are genuinely different permutations
    assert(docs.exists { case (id, _) => shard(0L, id) != shard(1L, id) })
  }

  test("k-anonymity audit: coarse level is the rollup of the fine level") {
    val rows = Quality.qKanonAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getAs[Long]("n"), r.getAs[Boolean]("k_ok"))))
      .toMap
    val nCust = Tables.load(spark, sf0001, "customer").count()
    val fine = rows.filter(_._1._1 == "nation_segment")
    val coarse = rows.filter(_._1._1 == "region_segment")
    assert(fine.values.map(_._1).sum == nCust)
    assert(coarse.values.map(_._1).sum == nCust)
    // coarse cells aggregate fine cells via the nation→region map
    val region = Tables.load(spark, sf0001, "nation")
      .select($"n_name", $"n_regionkey").as[(String, Long)].collect().toMap
    val rolled = fine.groupBy { case ((_, nation, seg), _) =>
      (region(nation).toString, seg)
    }.map { case (k, cells) => k -> cells.values.map(_._1).sum }
    assert(coarse.map { case ((_, k1, k2), (n, _)) => (k1, k2) -> n } == rolled)
    // verdicts follow the threshold; generalization only helps
    rows.foreach { case (_, (n, ok)) => assert(ok == (n >= 10L)) }
    val coarseOk = coarse.collect { case ((_, k1, _), (_, true)) => k1 }.toSet
    assert(coarse.nonEmpty && fine.nonEmpty && coarseOk.nonEmpty)
  }

  test("corpus datasheet == composition of gopher gate + head fingerprints") {
    val gop = Quality.qQualityGopher(spark, sf0001).collect()
      .map { r =>
        val mwl = if (r.isNullAt(r.fieldIndex("mean_wlen_permille"))) 0L
          else r.getAs[Long]("mean_wlen_permille")
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_words"), r.getAs[Boolean]("quality_pass"),
            r.getAs[Long]("stop_hits") * 100000L + mwl))
      }.toMap
    val meta = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"lang",
        graft.dedup.Dedup.headFingerprint($"text").as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val fpn = meta.groupBy(_._4).map { case (k, v) => k -> v.size }
    val want = meta.groupBy(m => (m._2, m._3)).map { case ((src, lang), ms) =>
      val n = ms.length.toLong
      (src, lang) -> ((n,
        ms.map(m => gop(m._1)._1).sum,
        ms.count(m => gop(m._1)._2).toLong * 1000000L / n,
        ms.count(m => fpn(m._4) > 1).toLong * 1000000L / n,
        ms.map(m => gop(m._1)._3).sum / n))
    }
    val got = Quality.qCorpusDatasheet(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_words"),
          r.getAs[Long]("gate_pass_ppm"), r.getAs[Long]("dup_ppm"),
          r.getAs[Long]("mean_score"))))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("multi-touch attribution: engine == Scala replay; credits conserve per purchase") {
    val ev = Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type",
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // replay: suffix purchase count per user = the touch→purchase group key
    val groups = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val pgrps = ordered.scanRight(0L)((r, acc) =>
        acc + (if (r._4 == "purchase") 1L else 0L)).init
      ordered.zip(pgrps).map { case (r, g) => (u, g, r._4, r._5) }
    }
    val purchases = groups.collect { case (u, g, "purchase", c) => (u, g) -> c }.toMap
    val touches = groups.filter(t => t._3 != "purchase" && t._2 > 0)
      .groupBy(t => (t._1, t._2))
      .filter { case (key, _) => purchases.contains(key) }
    def credit(pos: Long, k: Long): Long =
      if (k == 1) 1000000L else if (k == 2) 500000L
      else if (pos == 1 || pos == k) 400000L
      else 200000L / (k - 2) +
        (if (pos == 2) 200000L - (k - 2) * (200000L / (k - 2)) else 0L)
    val want = touches.toSeq.flatMap { case (key, ts) =>
      ts.zipWithIndex.map { case (t, i) =>
        val c = credit(i + 1L, ts.size.toLong)
        (t._3, c, c * purchases(key))
      }
    }.groupBy(_._1).map { case (typ, rows) =>
      typ -> ((rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum))
    }
    // conservation: every attributed purchase's credits sum to exactly 1e6
    touches.foreach { case (_, ts) =>
      val total = ts.zipWithIndex.map { case (_, i) =>
        credit(i + 1L, ts.size.toLong) }.sum
      assert(total == 1000000L)
    }
    val got = Quality.qAttrMultitouch(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("credit_ppm_sum"),
          r.getAs[Long]("value_microcents"))))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
