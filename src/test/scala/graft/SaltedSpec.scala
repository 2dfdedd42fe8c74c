package graft

import org.apache.spark.sql.functions._

import graft.operators.Salted

class SaltedSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct groupBy on a skewed key") {
    // simulate skew: one user holds most events
    val ev = Tables.load(spark, sf0001, "events")
      .withColumn("skew_key", when($"user_id" < 12, lit(0L)).otherwise($"user_id"))
    val direct = ev.groupBy($"skew_key")
      .agg(
        sum(dec($"value")).cast("double").as("total"),
        count($"event_id").as("n"),
        min($"event_id").as("first_id"),
        max($"event_id").as("last_id"))
      .orderBy($"skew_key")
    val saltedDf = Salted.aggregate(ev, $"skew_key", $"event_id", salts = 8,
      Seq(
        ("total", dec($"value"), "sum"),
        ("n", $"event_id", "count"),
        ("first_id", $"event_id", "min"),
        ("last_id", $"event_id", "max")))
      .withColumn("total", $"total".cast("double"))
      .withColumnRenamed("__key", "skew_key")
      .select("skew_key", "total", "n", "first_id", "last_id")
      .orderBy($"skew_key")
    assert(saltedDf.collect().toSeq == direct.collect().toSeq)
  }

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 2))

  test("salted join equals the plain join on a skewed fact") {
    val fact = Tables.load(spark, sf0001, "events")
      .withColumn("skew_key", when($"user_id" < 12, lit(1L)).otherwise($"user_id"))
      .select($"skew_key", $"event_id", $"value")
    val dim = Tables.load(spark, sf0001, "events")
      .select($"user_id".as("skew_key")).distinct()
      .withColumn("dim_tag", concat(lit("d"), $"skew_key"))
    val plain = fact.join(dim, Seq("skew_key"))
      .groupBy($"skew_key").agg(count(lit(1)).as("n"), max($"dim_tag").as("t"))
      .orderBy($"skew_key").collect().toSeq
    val salted = Salted.join(fact, dim, "skew_key", rowId = $"event_id", salts = 8)
      .groupBy($"skew_key").agg(count(lit(1)).as("n"), max($"dim_tag").as("t"))
      .orderBy($"skew_key").collect().toSeq
    assert(salted == plain)
  }

  test("salt actually fans the hot key across partial groups") {
    val ev = Tables.load(spark, sf0001, "events")
      .withColumn("skew_key", lit(0L)) // everything one key
      .withColumn("__salt", pmod(hash($"event_id"), lit(8)))
    val groups = ev.groupBy($"skew_key", $"__salt").count().count()
    assert(groups > 1, "salting failed to split the hot key")
  }
}
