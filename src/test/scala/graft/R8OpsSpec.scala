package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Invariant specs for the r8 analytical additions (the oracle gate
  * carries the exact-value check; these pin the structural properties
  * that make each operator correct by construction). */
class R8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ts_decompose: additive identity and full-window trimming") {
    val rows = Relational.qTsDecompose(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // trend + seasonal + remainder reassembles the (scaled) series exactly
    rows.foreach { r =>
      assert(r.getAs[Long]("n") * 100 ==
        r.getAs[Long]("trend_x100") + r.getAs[Long]("seas_x100") +
          r.getAs[Long]("remainder_x100"),
        s"additive identity broken at ${r.getAs[Long]("hour")}")
    }
    // the seasonal component sums to ~0 per type (mean deviation,
    // integral division leaves at most |hod set| of residue per type)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val hodSeas = rs.map(r =>
        (r.getAs[Long]("hour") % 24, r.getAs[Long]("seas_x100"))).distinct
      assert(hodSeas.size <= 24, t)
    }
    // edge trimming: per type, hours with a trend = span − 24 exactly
    val hourly = Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", expr("unix_timestamp(ts) div 3600L").as("hour"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(((max($"hour") - min($"hour")) + 1).as("span"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("span")).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.length == hourly(t) - 24, s"$t: ${rs.length} vs ${hourly(t)}")
    }
  }

  test("weighted_median: half the money sits at or below it (Scala replay)") {
    val got = Relational.qWeightedMedian(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("wmedian_qty")).toMap
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_returnflag", $"l_quantity",
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)").as("w"))
      .collect().map(r => (r.getString(0), r.getAs[Double](1), r.getAs[Long](2)))
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      val med = byV.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(got(flag) == med, s"$flag: ${got(flag)} vs $med")
    }
  }

  test("quantile_sketch: estimate brackets the exact value within the 2x envelope") {
    Relational.qQuantileSketch(spark, sf0001).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      for (p <- Seq("p50", "p99")) {
        val est = r.getAs[Long](s"${p}_est")
        val exact = r.getAs[Long](s"${p}_exact")
        // est is the covering bucket's UPPER bound: >= exact, and the
        // bucket's lower bound (est+1)/2 cannot exceed exact
        assert(est >= exact, s"$t $p: est $est < exact $exact")
        assert((est + 1) / 2 <= exact || exact == 0,
          s"$t $p: est $est outside 2x envelope of $exact")
      }
    }
  }

  test("ppjoin: exact — equals the unblocked brute-force Jaccard join (recall AND precision 1)") {
    import graft.dedup.Dedup
    val got = Dedup.qDedupPpjoin(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jac_permille"))).toSet
    // brute force with the same shingle definition and threshold
    val sh = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("sh", expr(
        "CASE WHEN size(toks) < 3 THEN CAST(array() AS array<string>) " +
          "ELSE array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2)))) END"))
      .select($"doc_id", $"sh").collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    val want = (for {
      i <- sh.indices.iterator; j <- (i + 1) until sh.length
      (ida, a) = sh(i); (idb, b) = sh(j)
      (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
      inter = (a & b).size if inter > 0
      jac = inter.toLong * 1000 / (a.size + b.size - inter) if jac >= 500
    } yield (lo, hi, jac)).toSet
    assert(got == want, s"ppjoin ${got.size} vs brute ${want.size}")
    assert(want.nonEmpty, "no qualifying pairs at sf0.001 — weak test")
  }

  test("trend_mk: replay on planted monotone and flat fixtures") {
    // strictly increasing series: S = n(n-1)/2, verdict 'increasing'
    val inc = (1 to 30).map(i => ("up", i.toLong, i.toLong * 3))
    val flat = (1 to 30).map(i => ("fl", i.toLong, 7L))
    val daily = (inc ++ flat).toDF("event_type", "day", "n")
    val a = daily.select($"event_type", $"day".as("da"), $"n".as("na"))
    val b = daily.select($"event_type", $"day".as("db"), $"n".as("nb"))
    val s = a.join(b, Seq("event_type")).filter($"da" < $"db")
      .groupBy($"event_type")
      .agg(sum(signum($"nb" - $"na").cast("long")).as("s_stat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s("up") == 30L * 29 / 2)
    assert(s("fl") == 0L)
    // corpus query runs and emits one verdict per type
    val out = Relational.qTrendMk(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(Set("increasing", "decreasing", "none")(r.getAs[String]("trend")))
      assert(r.getAs[Long]("var18") > 0)
    }
  }

  test("tagging: accounting identities and dominant-category membership") {
    val rows = graft.text.TextAnalysis.qTextTagging(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cats = r.getAs[String]("categories").split(",").toSeq
      assert(cats.length == r.getAs[Long]("n_categories"))
      assert(cats.contains(r.getAs[String]("top_category")))
      assert(r.getAs[Long]("n_matches") >= r.getAs[Long]("top_hits"))
      assert(cats == cats.sorted)
    }
  }

  test("active_users: WAU dominates DAU and replays as distinct users over the window") {
    val rows = Relational.qActiveUsers(spark, sf0001).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau")))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (d, (dau, wau)) => assert(wau >= dau, s"day $d") }
    val ud = Tables.load(spark, sf0001, "events")
      .select($"user_id", expr("unix_timestamp(ts) div 86400L").as("day"))
      .distinct().as[(Long, Long)].collect()
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    rows.foreach { case (d, (dau, wau)) =>
      assert(dau == byDay.getOrElse(d, Set.empty[Long]).size)
      val window = (d - 6 to d).flatMap(byDay.getOrElse(_, Set.empty[Long])).toSet
      assert(wau == window.size, s"day $d: $wau vs ${window.size}")
    }
  }

  test("cusum: corpus output replays from a plain Scala fold") {
    val daily = Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", expr("unix_timestamp(ts) div 86400L").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    val got = Relational.qCusum(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val pts = rows.map(x => (x._2, x._3)).sortBy(_._1)
      val total = pts.map(_._2).sum
      val mu20 = total * 20 / pts.length
      val k20 = mu20 / 20; val h20 = 4 * mu20
      var sp = 0L; var sn = 0L; var peak = 0L
      var up: Option[Long] = None; var dn: Option[Long] = None
      pts.foreach { case (day, n) =>
        sp = math.max(0L, sp + (n * 20 - mu20 - k20))
        sn = math.max(0L, sn + (mu20 - k20 - n * 20))
        if (up.isEmpty && sp > h20) up = Some(day)
        if (dn.isEmpty && sn > h20) dn = Some(day)
        peak = math.max(peak, math.max(sp, sn))
      }
      val r = got(t)
      assert(r.getAs[Long]("mu20") == mu20 && r.getAs[Long]("h20") == h20)
      assert(Option(r.getAs[java.lang.Long]("up_alarm_day")).map(_.toLong) == up, t)
      assert(Option(r.getAs[java.lang.Long]("dn_alarm_day")).map(_.toLong) == dn, t)
      assert(r.getAs[Long]("peak_stat20") == peak, t)
    }
  }

  test("cusum detects a planted level shift via the same fold (sanity of the statistic)") {
    // flat 100/day for 20 days then 200/day for 10: the up-side alarm
    // must fire shortly after the shift, never before it
    val pts = ((1 to 20).map(d => (d.toLong, 100L)) ++
      (21 to 30).map(d => (d.toLong, 200L)))
    val total = pts.map(_._2).sum
    val mu20 = total * 20 / pts.length
    val k20 = mu20 / 20; val h20 = 4 * mu20
    var sp = 0L; var up: Option[Long] = None
    pts.foreach { case (day, n) =>
      sp = math.max(0L, sp + (n * 20 - mu20 - k20))
      if (up.isEmpty && sp > h20) up = Some(day)
    }
    // increment per shifted day = 200·20 − μ20 − k20 ≈ 1200; h20 ≈ 10666
    // → the alarm needs ~9 shifted days: fires at day 29, never before 21
    assert(up.exists(_ >= 21L), s"alarm before the shift: $up")
    assert(up.exists(_ <= 30L), s"alarm never fired in the series: $up")
  }

  test("phrase_search: positional-index occurrences == direct text scan") {
    val rows = graft.text.InvertedIndex.qTextPhraseSearch(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val phrase = rows.head.getAs[String]("phrase")
    val Array(w1, w2) = phrase.split(" ")
    val texts = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val want = texts.view.mapValues { t =>
      val ws = t.split(" ")
      ws.indices.dropRight(1).count(i => ws(i) == w1 && ws(i + 1) == w2).toLong
    }.filter(_._2 > 0).toMap
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occ")).toMap
    assert(got == want, s"${got.size} vs ${want.size}")
  }

  test("seq_patterns: containment == per-user subsequence scan; lift identity") {
    val ev = Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val contains = (a: String, b: String) => byUser.count { case (_, es) =>
      val as = es.filter(_._2 == a).map(_._3)
      val bs = es.filter(_._2 == b).map(_._3)
      as.nonEmpty && bs.nonEmpty && as.min < bs.max
    }.toLong
    val got = Relational.qSeqPatterns(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("first_type"), r.getAs[String]("then_type"))
      assert(r.getAs[Long]("n_users_ab") == contains(a, b), s"$a->$b")
      // support never exceeds either marginal
      assert(r.getAs[Long]("n_users_ab") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("n_users_ab") <= r.getAs[Long]("n_b"))
    }
  }

  test("ts_acf: lag-0 identity, bounds, and a Scala replay per (type, lag)") {
    val rows = Relational.qTsAcf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // |r| <= 1 (scaled): the Cauchy-Schwarz bound survives the scaling
    rows.foreach(r => assert(math.abs(r.getAs[Long]("acf_ppm")) <= 1000000L))
    // replay: dense daily series per type, n-scaled deviations
    val daily = Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", expr("unix_timestamp(ts) div 86400L").as("day"))
      .agg(count(lit(1)).as("n")).as[(String, Long, Long)].collect()
    val got = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("lag")) -> r.getAs[Long]("acf_ppm")).toMap
    daily.groupBy(_._1).foreach { case (t, rs) =>
      val byDay = rs.map(x => x._2 -> x._3).toMap
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      val xs = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val n = xs.length.toLong; val sx = xs.sum
      val dev = xs.map(x => BigInt(n * x - sx))
      val c0 = dev.map(d => d * d).sum
      for (lag <- 1 to 7; if xs.length > lag) {
        val cl = (0 until xs.length - lag).map(i => dev(i) * dev(i + lag)).sum
        val want =
          if (c0 == 0) BigInt(0)
          else if (cl >= 0) cl * 1000000 / c0
          else -((-cl) * 1000000 / c0)
        assert(BigInt(got((t, lag.toLong))) == want, s"$t lag $lag")
      }
    }
  }

  test("chi2: contributions sum to the statistic; margins reproduce expectations") {
    val rows = Relational.qChi2Independence(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val chi2 = rows.map(_.getAs[Long]("chi2_x1e6")).distinct
    assert(chi2.length == 1)
    assert(rows.map(_.getAs[Long]("contrib_x1e6")).sum == chi2.head)
    // expectation margins: sum of E over a row ~= row total (integral
    // division loses < |cells| millionths)
    val o = rows.map(_.getAs[Long]("o")).sum
    val e = rows.map(_.getAs[Long]("e_x1e6")).sum
    assert(math.abs(e - o * 1000000L) <= rows.length.toLong * 1000000L)
  }

  test("benford: shares account for all orders; uniform-ish corpus deviates as expected") {
    val rows = Relational.qBenfordAudit(spark, sf0001).collect()
    assert(rows.length == 9)
    val nOrders = Tables.load(spark, sf0001, "orders").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
    val maxDev = rows.map(_.getAs[Long]("max_dev_permille")).distinct
    assert(maxDev.length == 1)
    assert(maxDev.head == rows.map(_.getAs[Long]("dev_permille")).max)
    // the audit WORKS: this corpus is not Benford-distributed
    assert(maxDev.head > 20, s"suspiciously Benford-like: $maxDev")
  }

  test("curriculum: rank is a bijection, stages are balanced quartiles, score-monotone") {
    val rows = graft.quality.Quality.qCurriculum(spark, sf0001).collect()
    val n = rows.length
    assert(n > 0)
    // bijection 1..n
    assert(rows.map(_.getAs[Long]("global_rank")).sorted.toSeq == (1L to n).toSeq)
    // monotone: a doc with higher score never has a later rank
    val byRank = rows.sortBy(_.getAs[Long]("global_rank"))
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("score") > b.getAs[Long]("score") ||
        (a.getAs[Long]("score") == b.getAs[Long]("score") &&
          a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ => ()
    }
    // stages are rank quartiles: sizes differ by at most 1, ordered
    val sizes = rows.groupBy(_.getAs[Long]("stage")).view.mapValues(_.length)
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toMap.toString)
    // shuffle key is the md5 convention (deterministic, 32 hex chars)
    rows.foreach(r =>
      assert(r.getAs[String]("shuffle_key").matches("[0-9a-f]{32}")))
  }
}
