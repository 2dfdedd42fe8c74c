package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg returns grouped rows with expected schema and totals") {
    val df = Relational.q1Agg(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus",
      "sum_qty", "sum_base_price", "sum_disc_price", "count_order"))
    // group counts must sum to the table row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val n = Tables.load(spark, sf0001, "lineitem").count()
    assert(total == n)
    // discounted price never exceeds base price
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("every query has a runnable DataFrame and every oracle key exists") {
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
