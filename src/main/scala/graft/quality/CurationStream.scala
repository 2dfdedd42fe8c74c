package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation pipeline as a STREAM: quality-gate then content-dedup
  * documents as they arrive — the online front half of the batch
  * dedup/quality surface, for ingestion-time filtering before anything
  * lands in the corpus.
  *
  * Dedup state is bounded by `dropDuplicatesWithinWatermark` on the
  * content digest: an exact duplicate arriving within the watermark
  * window is dropped; state for older digests is evicted with the
  * watermark. Cross-window duplicates are the batch layer's job (the
  * landed table re-runs digest dedup — `Dedup.qDedupExact` — exactly
  * as a production lakehouse compacts). The gate itself is stateless
  * scan-speed expressions, so the stream's only state is the digest
  * window.
  */
object CurationStream {

  /** Gate + watermarked digest-dedup over a streaming frame with
    * `text` and an event-time column. Emits passing, first-seen
    * documents with their gate metrics and content fingerprint.
    *
    * The gate filter sits upstream of the watermark ON PURPOSE:
    * rejected docs must never occupy dedup state (a failing doc's
    * fingerprint would otherwise swallow a later identical passing
    * doc). The priced-in consequence is that an all-rejected
    * micro-batch does not advance the watermark, so state EVICTION
    * (never emission — dedup emits immediately) lags until the next
    * passing doc; where every event must tick the clock, the
    * length-bias monitor's predicate-inside-aggregate shape is the
    * pattern (`Labeling.lengthBiasWindowed`). */
  def curate(docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    Quality.withQualityGate(docs)
      .filter(col("quality_pass"))
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("ws")

  /** Streaming incremental corpus dedup: drop arriving documents whose
    * head fingerprint already exists in the STORED corpus digest
    * table — the online half of `Dedup.qDedupIncremental`, using the
    * SAME `Dedup.headFingerprint` definition so batch and stream agree
    * on what counts as a duplicate. The stream-static LEFT ANTI join
    * is stateless on the stream side (Spark re-reads the static digest
    * table per micro-batch, so a corpus compaction between batches is
    * picked up automatically); within-stream duplicates are
    * [[curate]]'s watermark state. At 100 TB the digest table is
    * bucketed on fp (`sources.Bucketed`) and the anti join prunes to
    * matching buckets. The internal fp key is dropped — output schema
    * is the input schema. */
  def dedupAgainstCorpus(docs: DataFrame, corpusFps: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.dedup.Dedup.headFingerprint(col("text")))
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
      .drop("fp")

  /** Streaming URL-level dedup — the crawl-frontier half of
    * [[Quality.qUrlDedup]]: normalize each arriving fetch's `raw_url`
    * with the SAME [[Quality.normalizeUrl]] definition the batch
    * queries apply, and pass only the FIRST fetch of each canonical
    * URL within the watermark window; re-crawls (scheme/www/slash/
    * tracking-query/fragment drift included) drop at ingest, before
    * any content download or hashing. State is one entry per DISTINCT
    * canonical URL seen inside the watermark, evicted as event time
    * advances — re-crawls arriving later than the watermark are the
    * batch layer's job (`qUrlDedup` over the landed table), exactly
    * the [[curate]] contract at the URL level. The canonical `url`
    * column stays in the output: the downstream content pipeline keys
    * on it. */
  def dedupByUrl(docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    docs
      .withColumn("url", Quality.normalizeUrl(col("raw_url")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url")

  /** Streaming per-domain distinct-page counts — the online half of
    * [[Quality.qDomainMix]]'s `n_pages` metric, as CHAINED stateful
    * operators: a watermarked dedup keyed on (hour window, canonical
    * URL) feeds an event-time-windowed per-domain count, so each
    * emitted row is the number of DISTINCT canonical pages a domain
    * served in the hour — the input a reputation scorer needs,
    * computed without `count_distinct` (unsupported in streaming)
    * because the dedup stage made rows unique per (hour, URL). The
    * dedup key must include the hour: [[dedupByUrl]]'s plain-URL
    * key has frontier semantics (one fetch per URL per watermark
    * LIFETIME), which both undercounts a page legitimately re-served
    * in a later hour and overcounts when dedup state for an
    * early-hour fetch is evicted while its window is still open. The
    * hour key is a plain epoch-aligned bucket, NOT the `window()`
    * struct: the windowing rule tags its output as the stream's
    * event-time column, and a dedup whose event-time column is the
    * window struct silently loses cross-batch state (measured: every
    * re-fetch passed), while keeping BOTH columns is rejected as two
    * event times — the raw ts must stay the one event-time column
    * through the dedup, and the agg derives its window from it.
    * The watermark delay must be AT LEAST the window length: two
    * same-hour fetches are at most an hour apart, so a ≥ 1 h delay
    * guarantees the first fetch's dedup state is still live when the
    * duplicate arrives; a shorter delay would reopen the overcount.
    * Enforced, since a silent overcount is a wrong reputation score.
    * Domain extraction and URL normalization are the SAME definitions
    * as the batch rollup. Append mode: a window's row emits once,
    * when the watermark passes the window end — the downstream
    * reputation table can merge-upsert it idempotently. State: one
    * dedup entry per in-window (window, URL) plus one agg row per
    * open (window, domain) — frontier-sized, evicted by one
    * watermark. */
  def domainPagesHourly(docs: DataFrame, tsCol: String,
      watermark: String): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(watermark))
    // lower bound: count a month as its shortest calendar length
    val delayMicros = iv.microseconds +
      (iv.days + 28L * iv.months) * 86400L * 1000 * 1000
    require(delayMicros >= 3600L * 1000 * 1000,
      s"watermark '$watermark' shorter than the 1 hour window: " +
        "same-hour re-fetches could outlive dedup state and overcount")
    docs
      .withColumn("url", Quality.normalizeUrl(col("raw_url")))
      // epoch-aligned hour bucket, the SAME boundaries window() uses —
      // date_trunc truncates in the SESSION timezone, so under a
      // non-whole-hour UTC offset (e.g. +05:30) its buckets straddle
      // the count windows: one window sees two dedup buckets
      // (overcount) and one local hour straddles two windows
      // (undercount across the boundary)
      .withColumn("hour_key", timestamp_seconds(
        // identifier backtick-quoted (the bandOf rule): a ts column
        // named with a dot would otherwise parse as a field path
        expr(s"(unix_timestamp(`$tsCol`) div 3600) * 3600")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("hour_key", "url")
      .withColumn("domain", Quality.domainOf(col("url")))
      .groupBy(window(col(tsCol), "1 hour"), col("domain"))
      .agg(count(lit(1)).as("n_pages"))
  }

  /** [[domainPagesHourly]]'s constant-state sibling: hourly distinct
    * pages per domain as an HLL sketch (`approx_count_distinct` runs
    * fine in streaming — it is a mergeable partial aggregate, not a
    * `count_distinct`), ONE stateful operator whose state is a
    * fixed-size sketch per open (window, domain) — no per-URL entry
    * anywhere. This is the 100 TB arm of the pair: the exact chained
    * leg keeps one dedup entry per in-window canonical URL (fine
    * while the hourly frontier fits state), the sketch leg keeps
    * kilobytes per domain regardless of crawl rate, at 2% relative
    * standard deviation (passed explicitly — the HLL++ default is
    * 5%). Same normalization + domain definitions. */
  def domainPagesHourlySketch(docs: DataFrame, tsCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("url", Quality.normalizeUrl(col("raw_url")))
      .withColumn("domain", Quality.domainOf(col("url")))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col("domain"))
      .agg(approx_count_distinct(col("url"), 0.02).as("n_pages_approx"))

  /** Streaming DSIR importance scoring: score arriving documents
    * against the STORED bucket-weight table that the batch pass
    * ([[Quality.qImportanceDsir]] via [[Quality.importanceWeights]])
    * learned over the corpus — the online half of importance
    * resampling, for routing docs at ingest time (keep/downsample by
    * `target_like` before anything lands).
    *
    * Shares [[Quality.withImportanceScore]] VERBATIM with the batch
    * query (the shared-definition rule: batch and stream must agree on
    * what the score IS), so the only moving part is where the weights
    * come from. The weight table is static and 256 rows: it collapses
    * to a 1-row map and rides a broadcast equi-join on a constant key —
    * stateless per micro-batch, stream rows never shuffle, and a
    * weight-table refresh between batches is picked up automatically
    * (Spark re-plans the static side each micro-batch). */
  def scoreImportance(docs: DataFrame, weights: DataFrame): DataFrame =
    Quality.withImportanceScore(docs, weights)
}
