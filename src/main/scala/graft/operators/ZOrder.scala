package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

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
}
