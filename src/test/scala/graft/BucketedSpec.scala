package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.sources.Bucketed

/** Bucketed-layout evidence for SCALE.md: two tables bucketed on the
  * join key join with ZERO Exchange — the shuffle was paid once at
  * write time. Broadcast is disabled for the assertion so the planner
  * would otherwise have to shuffle both sides. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed join plans without any exchange") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    Bucketed.write(Tables.load(spark, sf0001, "orders"),
      "orders_b", s"$dir/orders_b", "o_custkey", 8)
    Bucketed.write(
      Tables.load(spark, sf0001, "customer")
        .withColumnRenamed("c_custkey", "join_key"),
      "customer_b", s"$dir/customer_b", "join_key", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "orders_b")
        .join(Bucketed.read(spark, "customer_b"),
          col("o_custkey") === col("join_key"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)
      // groupBy on the bucket key piggybacks on the same distribution
      assert(joined.collect().map(_.getAs[Long]("n")).sum ==
        Tables.load(spark, sf0001, "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
