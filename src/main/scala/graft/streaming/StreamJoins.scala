package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation operators.
  *
  * The reference correlates events by scanning its in-memory tables on
  * every arrival (routes/events.js:74-127 — unbounded state, O(n) per
  * event). Structured Streaming's interval join is the bounded-state
  * form: with watermarks on BOTH inputs and a time-range join
  * condition, Spark derives exactly how long each side's rows must be
  * buffered and evicts them once the other side's watermark passes
  * (left rows expire when the right watermark passes their ts +
  * horizon; right rows symmetrically) — state is O(events per horizon
  * window), not O(history).
  */
object StreamJoins {

  /** Interval join of two watermarked streams on a shared key: a right
    * row matches left rows of the same key with
    * `rightTs ∈ [leftTs, leftTs + horizon]` — the streaming analog of
    * the hour-bucketed batch range join (`Relational.qJoinRange`,
    * which bounds the same correlation by bucketing instead of
    * watermark eviction).
    *
    * Both inputs must already carry `withWatermark` on their timestamp
    * column, or Spark rejects the append-mode query (unbounded state).
    * Key columns may share a name — the join disambiguates by parent
    * frame; project/rename downstream as needed.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, horizon: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $horizon"))

  /** LEFT OUTER interval join — the "did anything respond within the
    * horizon?" form: every left row is emitted exactly once, either
    * with its matches or (once the RIGHT watermark passes
    * `leftTs + horizon`, proving no match can still arrive) with NULL
    * right columns. Same bounded state as the inner form; the outer
    * row's emission is watermark-gated, so unmatched results trail the
    * data by one watermark horizon — the price of a correct negative.
    * The reference cannot express this at all: its "no match"
    * (routes/events.js:161-182) is an exception that silently drops
    * the event's writes rather than a first-class unmatched row. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, horizon: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $horizon"),
      "left_outer")

  /** Stream-static enrichment: every micro-batch broadcast-joins the
    * (small) static dimension — the streaming analog of the agents dim
    * lookup (J7). NO streaming state is involved: the dim is re-read
    * per batch (so a replaced dim table is picked up), the join is a
    * stateless map-side hash probe, and left-outer keeps stream rows
    * whose key has no dim entry yet — the reference instead scans its
    * in-heap agents collection per event (routes/events.js:149-157). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")
}
