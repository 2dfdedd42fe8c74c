package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase groupBy with a deterministic
  * salt. A hot key (one task/user/bucket holding a disproportionate
  * share of 100 TB) otherwise lands on a single reducer; salting fans
  * its partial aggregation across `salts` reducers, then a second,
  * tiny aggregation merges the partials.
  *
  * Only works for decomposable aggregates (sum/count/min/max — anything
  * with a merge step). The salt is hash-derived from a caller-supplied
  * row-identity column, so results are deterministic and the transform
  * is a drop-in equal to the direct groupBy (proved in SaltedSpec).
  */
object Salted {

  /** Salted aggregation over one key column.
    *
    * @param rowId any column (or tuple of columns via struct) that
    *              varies within a key — its hash spreads the hot key
    * @param aggs  (outputName, valueColumn, "sum"|"count"|"min"|"max")
    */
  def aggregate(df: DataFrame, key: Column, rowId: Column, salts: Int,
      aggs: Seq[(String, Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(rowId), lit(salts)))
    val partialCols = aggs.map {
      case (n, c, "sum") => sum(c).as(n)
      case (n, c, "count") => count(c).as(n)
      case (n, c, "min") => min(c).as(n)
      case (n, c, "max") => max(c).as(n)
      case (_, _, other) =>
        throw new IllegalArgumentException(s"non-decomposable aggregate: $other")
    }
    val partial = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map {
      case (n, _, "sum") => sum(col(n)).as(n)
      case (n, _, "count") => sum(col(n)).as(n) // counts merge by sum
      case (n, _, "min") => min(col(n)).as(n)
      case (n, _, "max") => max(col(n)).as(n)
      case (_, _, other) =>
        throw new IllegalArgumentException(s"non-decomposable aggregate: $other")
    }
    partial.groupBy(col("__key"))
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Skew-resistant equi-join: the fact side's hot key otherwise lands
    * on one reducer; salting spreads it over `salts` reducers while
    * the (small) dim side is replicated once per salt value. Join key
    * becomes (key, salt) — a drop-in equal to the plain join (proved
    * in SaltedSpec). Use when the dim is too big to broadcast but the
    * fact is skewed; AQE's skew-split handles the sort-merge case,
    * this handles the deliberate-layout case (e.g. pre-partitioned
    * outputs that must keep their partitioning). */
  def join(fact: DataFrame, dim: DataFrame, key: String, rowId: Column,
      salts: Int): DataFrame = {
    val fs = fact.withColumn("__salt", pmod(hash(rowId), lit(salts)))
    val ds = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    fs.join(ds, Seq(key, "__salt")).drop("__salt")
  }
}
