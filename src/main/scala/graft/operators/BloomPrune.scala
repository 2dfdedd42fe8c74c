package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge

/** Bloom-filter join pruning — the runtime-filter technique made
  * explicit as an operator (Spark's AQE `InjectRuntimeFilter` builds
  * exactly this plan shape when it fires; here it is deterministic and
  * composable instead of heuristic).
  *
  * Shape: the build side aggregates its join keys into ONE Bloom
  * sketch (`BloomFilterAggregate` over xxhash64, the same expressions
  * AQE uses); the sketch reaches the probe side as a scalar subquery
  * — a broadcast of a few-KB binary, never a shuffle — and
  * `might_contain` drops probe rows map-side BEFORE they pay the join
  * shuffle. False positives are then removed by the exact join, so the
  * composition is semantically a drop-in: the oracle for
  * `q_bloom_semi` is the PLAIN semi-join.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only the ~selectivity fraction that can match:
  * the sketch costs one scan of the (small, pre-filtered) build side,
  * and the probe-side filter is a codegen'd hash + bit-probe per row.
  */
object BloomPrune {

  /** Bloom-aggregate column over `key` (xxhash64'd, as AQE does). */
  private def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftSqlBridge.expression(key))),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
    GraftSqlBridge.column(agg.toAggregateExpression())
  }

  /** Probe-side predicate: `might_contain(<scalar-subquery sketch>,
    * xxhash64(key))`. The subquery executes once; its binary result is
    * broadcast into every probe task. */
  private def mightContain(sketch: DataFrame, key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      ScalarSubquery(sketch.queryExecution.analyzed),
      new XxHash64(Seq(GraftSqlBridge.expression(key)))))

  /** Semi-join `fact` to `dim` with a Bloom pre-filter on the fact
    * side: sketch-prune first (map-side, no shuffle), exact left-semi
    * join second (kills sketch false positives). Result == plain
    * `fact.join(dim, key, "left_semi")`. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 100000L, numBits: Long = 1L << 21): DataFrame = {
    val sketch = dim.agg(bloomAgg(col(dimKey), expectedItems, numBits).as("bf"))
    // Alias the dim key: with factKey == dimKey the unqualified
    // references in the join condition would be ambiguous (error or a
    // trivially-true self-comparison depending on resolution).
    fact.filter(mightContain(sketch, col(factKey)))
      .join(dim.select(col(dimKey).as("__bp_key")).distinct(),
        col(factKey) === col("__bp_key"), "left_semi")
  }
}
