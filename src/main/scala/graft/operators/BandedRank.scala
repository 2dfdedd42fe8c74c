package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums over value-keyed frames — the band protocol
  * shared by qTokenBudget / qQuantileNorm / qSamplePps / mannWhitney /
  * qParetoRevenue and (through this helper) the RFM quintile cuts,
  * funnel-latency percentiles and the z-order block numbering.
  *
  * A `Window.orderBy(...)` with no partition sorts its WHOLE input on
  * one task — fine for a 10-row decile frame, fatal for anything
  * corpus- or user-proportional at 100 TB. The fix is always the same
  * shape: rows band on `floor(value / bandWidth)` (sign-safe floor
  * division via pmod, so band order equals value order), per-band
  * totals are a tiny aggregate whose running offsets broadcast back,
  * and each row's running sum is its band offset plus a window WITHIN
  * its band. No stage ever sees more than one band in one task; the
  * only unpartitioned window left runs over the one-row-per-band
  * offsets frame, whose size is value-range/bandWidth — independent of
  * the row count.
  *
  * PlanSpec's whole-surface audit rejects any unpartitioned window
  * outside a justified bounded-frame allowlist; this helper is the
  * sanctioned route for everything else.
  */
object BandedRank {

  /** `floor(v / bandWidth)` for any sign: pmod keeps the remainder
    * non-negative, so the division is exact and monotone in `v`
    * (Spark's `div` alone truncates toward zero and breaks band
    * ordering for negatives). The identifier is backtick-quoted so a
    * column name carrying dots/spaces/reserved words parses as one
    * attribute, not a field path. */
  def bandOf(value: String, bandWidth: Long): Column = {
    val v = "`" + value.replace("`", "``") + "`"
    expr(s"($v - pmod($v, ${bandWidth}L)) div ${bandWidth}L")
  }

  /** Adds `cumName` = inclusive running sum of `weight` by ascending
    * `value` (which must be unique per row — e.g. a value-count
    * frame's distinct value) without a global-order window. */
  def inclusiveCum(df: DataFrame, value: String, weight: String,
      bandWidth: Long, cumName: String): DataFrame = {
    val banded = df.withColumn("__band", bandOf(value, bandWidth))
    val totals = banded.groupBy(col("__band"))
      .agg(sum(col(weight)).as("__bw"))
    val wBand = Window.orderBy(col("__band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals // one row per band — tiny by construction
      .withColumn("__off", coalesce(sum(col("__bw")).over(wBand), lit(0L)))
      .select(col("__band"), col("__off"))
    val wIn = Window.partitionBy(col("__band")).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offs), Seq("__band"))
      .withColumn(cumName, col("__off") + sum(col(weight)).over(wIn))
      .drop("__band", "__off")
  }

  /** Adds `rankName` = the global 1-based row_number by ascending
    * `value` with `tiebreak` ascending inside equal values, banded the
    * same way. */
  def ascRank(df: DataFrame, value: String, tiebreak: String,
      bandWidth: Long, rankName: String): DataFrame = {
    val banded = df.withColumn("__band", bandOf(value, bandWidth))
    val counts = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bn"))
    val wBand = Window.orderBy(col("__band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__bn")).over(wBand), lit(0L)))
      .select(col("__band"), col("__off"))
    val wIn = Window.partitionBy(col("__band"))
      .orderBy(col(value).asc, col(tiebreak).asc)
    banded.join(broadcast(offs), Seq("__band"))
      .withColumn(rankName,
        (col("__off") + row_number().over(wIn)).cast("long"))
      .drop("__band", "__off")
  }
}
