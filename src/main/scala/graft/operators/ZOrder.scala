package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

/** Z-order (Morton) clustering — the multi-dimensional sort key behind
  * min-max data skipping: interleaving the bits of two dimensions
  * makes rows that are close in EITHER dimension land close in the
  * sort, so fixed-size file blocks carry tight min/max ranges on BOTH
  * columns and a predicate on either one prunes most blocks at the
  * footer level (the effect `q_zorder`'s block stats make visible and
  * the oracle checks exactly).
  *
  * At 100 TB this is a write-time layout choice: sort the table by
  * `zValue(x, y)` before writing and every engine that reads parquet
  * min/max stats (Spark, DuckDB, Trino) skips for free — no index
  * structure, no service. Pure integer bit math, identical in any
  * SQL engine.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: x takes the even bit positions, y the odd. */
  def zValue(x: String, y: String, bits: Int = 10): Column = {
    val terms = (0 until bits).flatMap { k =>
      Seq(s"((($x >> $k) & 1) << ${2 * k})", s"((($y >> $k) & 1) << ${2 * k + 1})")
    }
    expr(terms.mkString(" + "))
  }

  /** The same expression as SQL text (for the DuckDB oracle). */
  def zValueSql(x: String, y: String, bits: Int = 10): String =
    (0 until bits).flatMap { k =>
      Seq(s"((($x >> $k) & 1) << ${2 * k})", s"((($y >> $k) & 1) << ${2 * k + 1})")
    }.mkString(" + ")

  /** PRODUCTION write path: cluster `df` by the Morton value of
    * (x, y) and write `numFiles` parquet files whose footer min/max
    * stats are tight on BOTH dimensions. `repartitionByRange` range-
    * partitions on z (a distributed sample-based partitioner — no
    * global row_number, no single-task sort) and
    * `sortWithinPartitions` orders each file internally so row groups
    * inherit the same locality. The z column itself is dropped before
    * the write: the layout, not an extra column, carries the benefit
    * (ZOrderSpec reads the real footers and asserts the pruning
    * effect vs a single-dimension sort). */
  def writeClustered(df: DataFrame, x: String, y: String, dir: String,
      numFiles: Int, bits: Int = 10): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
