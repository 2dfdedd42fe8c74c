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
