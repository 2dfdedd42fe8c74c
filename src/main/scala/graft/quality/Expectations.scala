package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative DATA CONTRACTS — the dbt-test / Great-Expectations
  * pattern as a Spark-native runner: a suite of named checks
  * (per-row predicates, key uniqueness, referential integrity) is
  * declared once and evaluated into a violations report that gates a
  * release. The reference validates nothing at ingest (any JSON shape
  * lands in Loki, routes/events.js:487-501); a production pipeline
  * runs exactly this suite between landing and publishing.
  *
  * Execution shape is the point: all per-row checks against one table
  * fold into ONE scan of that table (conditional sums + count
  * distincts in a single aggregate — never a scan per check), and
  * each referential check is one left-anti join keyed on the FK. Cost
  * is O(one pass per table + one anti-join per FK edge) no matter how
  * many checks pile onto a table. */
object Expectations {

  /** A named per-row contract: `violation` evaluates true on rows that
    * BREAK the contract. */
  final case class RowCheck(name: String, table: String, violation: Column)

  /** Key-uniqueness contract over one column. */
  final case class UniqueCheck(name: String, table: String, col: String)

  /** Referential contract: every child key must exist in the parent. */
  final case class RefCheck(name: String, childTable: String,
      childCol: String, parentTable: String, parentCol: String)

  /** Evaluate a suite into (check_name, n_rows, n_violations, pass) —
    * one scan per touched table, one anti join per RefCheck. */
  def run(spark: SparkSession, dir: String,
      rows: Seq[RowCheck], uniques: Seq[UniqueCheck],
      refs: Seq[RefCheck]): DataFrame = {
    val perTable = (rows.map(_.table) ++ uniques.map(_.table)).distinct.map { t =>
      val df = Tables.load(spark, dir, t)
      val rowAggs = rows.filter(_.table == t).map(c =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"v_${c.name}"))
      val uniqAggs = uniques.filter(_.table == t).map(c =>
        (count(lit(1)) - countDistinct(col(c.col))).as(s"v_${c.name}"))
      val agg = df.agg(count(lit(1)).as("n_rows"),
        (rowAggs ++ uniqAggs): _*)
      val names = rows.filter(_.table == t).map(_.name) ++
        uniques.filter(_.table == t).map(_.name)
      // melt the 1-row aggregate into one row per check — the table is
      // scanned ONCE no matter how many checks it carries
      agg.unpivot(Array(col("n_rows")),
          names.map(n => col(s"v_$n")).toArray,
          "check_name", "n_violations")
        .select(expr("substring(check_name, 3)").as("check_name"),
          col("n_rows"), col("n_violations"))
    }
    val refFrames = refs.map { r =>
      val child = Tables.load(spark, dir, r.childTable)
      val orphans = child.join(
        Tables.load(spark, dir, r.parentTable)
          .select(col(r.parentCol).as(r.childCol)),
        Seq(r.childCol), "left_anti")
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_violations"))))
        .select(lit(r.name).as("check_name"), col("n_rows"), col("n_violations"))
    }
    (perTable ++ refFrames).reduceOption(_.unionByName(_))
      .getOrElse(spark.emptyDataset[(String, Long, Long)](
        org.apache.spark.sql.Encoders.product[(String, Long, Long)])
        .toDF("check_name", "n_rows", "n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  /** The standard release suite over the corpus. */
  def standardSuite(spark: SparkSession, dir: String): DataFrame = run(
    spark, dir,
    rows = Seq(
      RowCheck("lineitem_quantity_range", "lineitem",
        col("l_quantity").isNull || col("l_quantity") < 1 || col("l_quantity") > 50),
      RowCheck("lineitem_discount_range", "lineitem",
        col("l_discount").isNull || col("l_discount") < 0.0 || col("l_discount") > 0.1),
      RowCheck("lineitem_price_positive", "lineitem",
        col("l_extendedprice").isNull || col("l_extendedprice") <= 0.0),
      RowCheck("orders_date_not_null", "orders", col("o_orderdate").isNull),
      RowCheck("orders_price_positive", "orders",
        col("o_totalprice").isNull || col("o_totalprice") <= 0.0),
      RowCheck("events_type_enum", "events",
        !col("event_type").isin("view", "click", "signup", "purchase", "error"))),
    uniques = Seq(
      UniqueCheck("customer_key_unique", "customer", "c_custkey"),
      UniqueCheck("orders_key_unique", "orders", "o_orderkey")),
    refs = Seq(
      RefCheck("lineitem_orders_ri", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      RefCheck("orders_customer_ri", "orders", "o_custkey",
        "customer", "c_custkey")))
}
