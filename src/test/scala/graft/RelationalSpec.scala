package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg returns grouped rows with expected schema and totals") {
    val df = Relational.q1Agg(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus",
      "sum_qty", "sum_base_price", "sum_disc_price", "count_order"))
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val n = Tables.load(spark, sf0001, "lineitem").count()
    assert(total == n)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("as-of join: entry is strictly before the purchase, wait >= 0") {
    val rows = Relational.qAsofJoin(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wait_secs") >= 0, s"negative wait: $r")
      assert(r.getAs[Long]("entry_ep") <= r.getAs[Long]("purchase_ep"))
    }
  }

  test("max_by/min_by: last is never before first per user") {
    val lastDf = Relational.qAggMaxBy(spark, sf0001)
      .select(col("user_id"), col("last_ep"))
    val firstDf = Relational.qAggMinBy(spark, sf0001)
      .select(col("user_id"), col("first_ep"))
    val joined = lastDf.join(firstDf, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getAs[Long]("first_ep") <= r.getAs[Long]("last_ep")))
  }

  test("sessionization: session bounds ordered, counts sum to table size") {
    val df = Relational.qWindowSession(spark, sf0001)
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("sess_start") <= r.getAs[Long]("sess_end"))
      assert(r.getAs[Long]("n_events") >= 1)
    }
    val n = Tables.load(spark, sf0001, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == n)
  }

  test("session KPIs equal the rollup of the raw session listing") {
    val sessions = Relational.qWindowSession(spark, sf0001).collect()
    val expected = sessions.groupBy(_.getAs[Long]("user_id")).map { case (u, ss) =>
      val n = ss.length.toLong
      val b = ss.count(_.getAs[Long]("n_events") == 1).toLong
      val dur = ss.map(r =>
        r.getAs[Long]("sess_end") - r.getAs[Long]("sess_start")).sum
      val ev = ss.map(_.getAs[Long]("n_events")).sum
      u -> ((n, b, dur, ev, b * 1000000L / n, dur * 100L / n, ev * 100L / n))
    }
    val got = Relational.qSessionKpis(spark, sf0001).collect().map { r =>
      r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_sessions"),
        r.getAs[Long]("n_bounces"), r.getAs[Long]("total_duration_sec"),
        r.getAs[Long]("total_events"), r.getAs[Long]("bounce_ppm"),
        r.getAs[Long]("avg_duration_x100"), r.getAs[Long]("avg_events_x100")))
    }.toMap
    assert(got == expected && got.nonEmpty)
  }

  test("monthly revenue: totals account for all orders, growth consistent") {
    val rows = Relational.qRevenueMonthly(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("month")).toSeq ==
      rows.map(_.getAs[String]("month")).toSeq.sorted)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.load(spark, sf0001, "orders").count())
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Long]("growth_permille") ==
          cur.getAs[Long]("revenue_cents") * 1000L /
            prev.getAs[Long]("revenue_cents"))
      case _ =>
    }
    assert(rows.head.isNullAt(rows.head.fieldIndex("growth_permille")))
  }

  test("tpch5: revenue positive per nation; tpch6 consistent with manual filter") {
    val q5 = Relational.qSqlTpch5(spark, sf0001).collect()
    assert(q5.nonEmpty)
    q5.foreach(r => assert(r.getAs[Double]("revenue") > 0))
    val q6 = Relational.qSqlTpch6(spark, sf0001).collect()(0)
    val manual = Tables.load(spark, sf0001, "lineitem").collect().count { r =>
      val d = r.getAs[Double]("l_discount")
      val sd = r.get(r.fieldIndex("l_shipdate")).toString // NTZ -> LocalDateTime
      sd >= "1998-01-01" && sd < "1999-01-01" &&
        d >= 0.05 && d <= 0.07 && r.getAs[Double]("l_quantity") < 24
    }
    assert(q6.getAs[Long]("n_items") == manual)
  }

  test("ivf ann: cells partition the corpus; results come only from probed cells") {
    val n = Tables.load(spark, sf0001, "embeddings").count()
    val rows = graft.sim.Similarity.qSimAnnIvf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // every query returns at most 3 ranked neighbors, ranks contiguous from 1
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.length <= 3 && ranks.head == 1L)
      assert(ranks.zipWithIndex.forall { case (rk, i) => rk == i + 1 })
      // at most NProbe distinct cells contribute
      assert(rs.map(_.getAs[Long]("cell")).distinct.length <= 2)
    }
    assert(n > 0)
  }

  test("bpe tokenizer: piece count bounds and distinct <= total") {
    val rows = graft.text.TextAnalysis.qTextBpe(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_pieces") <= r.getAs[Long]("n_pieces"))
      // every piece contributes at least one BPE merge
      assert(r.getAs[Long]("n_bpe") >= r.getAs[Long]("n_pieces"))
    }
  }

  test("semi + anti partition customer set under same predicate shape") {
    val c = Tables.load(spark, sf0001, "customer").count()
    val semi = Relational.qJoinSemi(spark, sf0001).count()
    val anti = Tables.load(spark, sf0001, "customer")
      .join(Tables.load(spark, sf0001, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(semi + anti == c)
  }

  test("setops: both + cust_only partitions distinct customer nations") {
    val rows = Relational.qSetOps(spark, sf0001).collect()
    val nCustNations = Tables.load(spark, sf0001, "customer")
      .select("c_nationkey").distinct().count()
    assert(rows.length == nCustNations)
  }

  test("rollup has grand-total row equal to table count") {
    val rows = Relational.qAggRollup(spark, sf0001).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.load(spark, sf0001, "lineitem").count())
  }

  test("every query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
