package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed aggregations beyond the keyed state machines:
  * native session windows with watermark-based closing.
  *
  * The batch sessionizer (`Relational.qWindowSession`) derives session
  * ids with a lag-gap window; in streaming the same semantics come
  * from `session_window` — Spark's state store merges gap-adjacent
  * events per key and an append-mode session emits exactly once, when
  * the watermark passes its end. State is O(open sessions), eviction
  * is automatic — the reference holds every event forever and
  * re-scans (app.js:13-16).
  */
object StreamAggs {

  /** Per-key session aggregates over a watermarked event stream:
    * events of the same key with gaps ≤ `gap` merge into one session
    * row [session_start, session_end) with an event count. */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming leg of the drift monitor (`Quality.qQualityDrift`):
    * per-period value histograms as a watermarked tumbling-window
    * aggregate — one finalized row per (period, event_type, bin) once
    * the watermark passes the window end (append mode, state evicted).
    * The bin assignment is `Quality.valueBin`, the SAME expression the
    * batch monitor uses, so the two legs cannot disagree. Downstream,
    * consecutive emitted periods feed the batch ppm compare unchanged.
    * State is O(open windows × types × bins) — bounded, tiny. */
  def driftHistogram(events: DataFrame, tsCol: String, watermark: String,
      period: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .withColumn("bin", graft.quality.Quality.valueBin)
      .groupBy(window(col(tsCol), period), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("period_start"),
        col("event_type"), col("bin"), col("n"))

  /** STREAMING HEAVY HITTERS: the SpaceSaving summary
    * ([[graft.functions.SpaceSavingSummary]]) as keyed stream state —
    * the frequent-items feed maintained incrementally instead of
    * recomputed per batch. Tokens hash into `buckets` groups, each
    * group holds ONE capacity-bounded summary (state is
    * O(buckets·capacity) FOREVER, independent of stream length or
    * vocabulary); because buckets partition the token space, a token's
    * bucket count IS its global count, so the union of per-bucket
    * candidates is a superset of every token with frequency >
    * n/capacity — the same guarantee as the batch aggregate, sharded.
    * Each batch emits the bucket's refreshed candidate estimates in
    * update mode (batch_seq rises, a sink keeps last-write-wins); the
    * exact re-count stays a batch job over the landed corpus, exactly
    * like [[graft.text.TextAnalysis.qHeavyHitters]].
    * State serializes through the summary's own byte codec (an opaque
    * binary blob to the store — RocksDB-friendly). */
  def streamingHeavyHitters(tokens: DataFrame, buckets: Int = 16,
      capacity: Int = 64): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = tokens.sparkSession
    import spark.implicits._
    def flat(bucket: Int, it: Iterator[(Int, String)],
        state: GroupState[Array[Byte]]): Iterator[(Int, String, Long)] = {
      val s = state.getOption
        .map(graft.functions.SpaceSavingSummary.fromBytes)
        .getOrElse(graft.functions.SpaceSavingSummary(capacity))
      it.foreach { case (_, tok) => s.add(tok, 1L) }
      state.update(graft.functions.SpaceSavingSummary.toBytes(s))
      s.counts.iterator.map { case (t, c) => (bucket, t, c) }.toSeq.iterator
    }
    tokens
      // pmod, not abs(..)%: abs(Long.MinValue) IS Long.MinValue, so the
      // abs form could emit a negative bucket id outside the documented
      // 0..buckets-1 domain (ADVICE r9). pmod is total and non-negative.
      .select(pmod(xxhash64(col("token")), lit(buckets.toLong)).cast("int").as("bucket"),
        col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(flat)
      .toDF("bucket", "token", "est")
  }

  /** STREAMING BOTTOM-K SAMPLE: the mergeable uniform sample
    * (`Quality.qSampleBottomK`) maintained as keyed stream state —
    * bottom-k of a union is the bottom-k of the parts' bottom-ks, so
    * a per-language state of the k smallest (priority, doc_id) pairs
    * absorbs each micro-batch in O(k) and IS at every moment the
    * exact sample the batch query would draw from everything landed
    * so far (the spec proves equality). Priorities come from the SAME
    * shared expression as the batch leg; state is O(langs · k)
    * forever. Each batch re-emits the refreshed sample in update mode
    * with a monotone n_seen so a sink (or test) can pick the latest
    * emission per language. */
  def streamingBottomK(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    def flat(lang: String, it: Iterator[(String, Long, String)],
        state: GroupState[(Seq[(String, Long)], Long)])
        : Iterator[(String, Long, String, Long, Long)] = {
      val (cur, seen) = state.getOption.getOrElse((Seq.empty, 0L))
      val arrived = it.map { case (_, id, pri) => (pri, id) }.toSeq
      val merged = (cur ++ arrived).distinct.sorted.take(k)
      val nSeen = seen + arrived.size
      state.update((merged, nSeen))
      merged.iterator.zipWithIndex.map { case ((pri, id), i) =>
        (lang, id, pri, i + 1L, nSeen)
      }
    }
    docs.select(col("lang"), col("doc_id"),
        graft.quality.Quality.bottomKPri.as("pri"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(flat)
      .toDF("lang", "doc_id", "pri", "rank", "n_seen")
  }

  /** STREAMING QUANTILE SKETCH: the power-of-two bucket histogram
    * (`Relational.qQuantileSketch`'s sketch leg) as a watermarked
    * tumbling-window aggregate — the quantile member of the
    * mergeable-sketch streaming trio (heavy hitters, bottom-k,
    * quantiles). Finalized (period, type, bucket) counts emit exactly
    * once on watermark passage (append mode, state O(open windows ×
    * types × buckets)); because bucket counts merge by ADDITION,
    * summing the emitted periods is the whole-stream sketch, and
    * `Relational.quantileEstFromBuckets` reads estimates off it with
    * the SAME rank rule as the batch query (the spec proves
    * equality). The bucket id is the shared expression. */
  def quantileHistogram(events: DataFrame, tsCol: String, watermark: String,
      period: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .withColumn("cents",
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .withColumn("bucket", expr(graft.queries.Relational.sketchBucketExpr))
      .groupBy(window(col(tsCol), period), col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("bc"))
      .select(col("window.start").as("period_start"),
        col("event_type"), col("bucket"), col("bc"))

  /** The batch read over the emitted histogram table: merge periods
    * by addition, then the shared quantile-estimate read. */
  def quantilesFromEmitted(emitted: DataFrame): DataFrame =
    graft.queries.Relational.quantileEstFromBuckets(
      emitted.groupBy(col("event_type"), col("bucket"))
        .agg(sum(col("bc")).as("bc")))

  /** Trending tokens: tumbling-window token counts over a stream of
    * timestamped documents — the "what is spiking right now" feed.
    * Tokens explode BEFORE the watermarked window aggregate (state is
    * one counter per (open window, token) — bounded by window span ×
    * live vocabulary), finalized rows emit on watermark passage
    * (append mode), and the rate-vs-previous-window comparison is a
    * BATCH join over the emitted table (finalized windows are
    * immutable, so trend math never sits in stream state). Shares the
    * TextAnalysis token semantics (whitespace split, empties
    * dropped). */
  def trendingTokens(docs: DataFrame, tsCol: String, watermark: String,
      period: String): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(window(col(tsCol), period), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("period_start"), col("token"), col("n"))

  /** The batch leg over the emitted (period_start, token, n) table:
    * per token, each window's count vs the previous window's, rate in
    * permille (1000 = flat; absent-previous rows surface as new
    * arrivals with NULL rate). */
  def tokenTrends(emitted: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("period_start"))
    emitted
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("rate_permille", expr("(n * 1000) div prev_n"))
  }
}
