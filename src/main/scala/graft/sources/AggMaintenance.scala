package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained AGGREGATE view — the materialized-view
  * analog of the edge-table / IVF-index / inverted-index maintenance
  * family: a stored rollup (here the monthly revenue summary) kept
  * current by appending MERGEABLE PARTIALS per batch instead of
  * re-scanning history. Sums and counts are algebraic, so each batch
  * writes only its own |groups|-sized partial frame; the read side
  * folds partials with one tiny groupBy, and [[compact]] periodically
  * collapses the partial log. This is exactly the write path a 100 TB
  * fact stream needs: per-batch cost is O(|batch| + |touched groups|),
  * never O(history) — where the reference recomputes nothing and
  * simply re-reads its whole in-memory table per render
  * (routes/index.js:9-10).
  *
  * Replay safety follows the EdgeMaintenance protocol: a batch's
  * partial is computed under an invisible `_staging/batch=<id>` dir
  * and ATOMICALLY renamed to `partials/batch-<id>`; the batch dir's
  * existence is the applied marker, so a replayed batch discards its
  * recomputation instead of double-counting (additive partials make
  * double-publish CORRUPTION, not just waste — the marker is
  * load-bearing here). [[compact]] uses the Compaction swap with
  * recovery-first ordering. Single-writer maintenance job, like every
  * table-maintenance path in this repo.
  */
object AggMaintenance {

  private def partialsDir(path: String) = s"$path/partials"

  /** Monthly partial: (month, n_orders, revenue_cents) — both
    * aggregates algebraic/mergeable. ONE definition shared by rebuild,
    * merge, and the batch query's oracle semantics. */
  private def partials(orders: DataFrame): DataFrame =
    orders.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("revenue_cents"))

  private def readPartials(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(partialsDir(path))

  /** Full rebuild — the baseline the incremental path must stay
    * row-identical to. Clears any previous layout. */
  def rebuild(orders: DataFrame, path: String): Unit = {
    val spark = orders.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    partials(orders).write.mode("overwrite")
      .parquet(s"${partialsDir(path)}/base")
  }

  /** Merge one batch of fact rows, idempotent per batch id. */
  def mergeBatch(batch: DataFrame, path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val staging = s"$path/_staging/batch=$batchId"
    partials(batch).write.mode("overwrite").parquet(staging)
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(staging)
    val fs = src.getFileSystem(hconf)
    val dest = new org.apache.hadoop.fs.Path(
      s"${partialsDir(path)}/batch-$batchId")
    if (fs.exists(dest)) { fs.delete(src, true); () }
    else {
      fs.delete(new org.apache.hadoop.fs.Path(src, "_SUCCESS"), false)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(src, dest))
        sys.error(s"agg merge publish failed: $src -> $dest")
    }
    // clean up only THIS batch's staging dir — deleting the _staging
    // root would wipe a concurrently-staged batch's in-flight dir
    fs.delete(src, true)
    ()
  }

  /** The current aggregate: fold the partial log with one tiny
    * groupBy (|months| rows). */
  def read(spark: SparkSession, path: String): DataFrame =
    readPartials(spark, path)
      .groupBy(col("month"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("revenue_cents")).as("revenue_cents"))

  /** Collapse the partial log into a single base dir (run when the
    * batch-dir count grows): Compaction's atomic swap with the
    * recovery-first ordering — if the partials dir is missing and
    * `_old` exists, a previous compaction crashed mid-swap and `_old`
    * holds the only copy; restore it BEFORE anything else. */
  def compact(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(partialsDir(path))
    val fs = p.getFileSystem(hconf)
    val old = new org.apache.hadoop.fs.Path(s"$path/_old")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_compact-tmp")
    if (!fs.exists(p) && fs.exists(old)) {
      if (!fs.rename(old, p)) sys.error(s"agg crash recovery failed: $old -> $p")
    }
    fs.delete(tmp, true)
    fs.delete(old, true)
    read(spark, path).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/base")
    if (!fs.rename(p, old)) sys.error(s"agg compaction swap failed: $p -> $old")
    if (!fs.rename(tmp, p)) { fs.rename(old, p); sys.error(s"swap failed: $tmp -> $p") }
    fs.delete(old, true)
  }

  /** Streaming maintenance: each micro-batch of fact rows lands as one
    * partial via the same idempotent mergeBatch — foreachBatch retries
    * replay into the same batch dir and are discarded by the applied
    * marker (exactly-once for the additive sink). */
  def streamingMerge(stream: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, path, id)
      }
      .start()
}
