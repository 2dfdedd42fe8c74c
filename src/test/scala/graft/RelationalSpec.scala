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
