package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental MERGE-by-uuid sink for the segment changelog — the
  * streaming equivalent of the reference's update-in-place tables
  * (routes/events.js:298-315, :225-256): `GET /` can read the latest
  * state at any moment without re-aggregating an ever-growing
  * changelog.
  *
  * Each micro-batch folds its delta into a persisted latest-segments
  * table keyed by uuid:
  *
  *  1. reduce the batch to its per-uuid winner (max emit_seq) — a
  *     map-side-combined aggregation over the DELTA only;
  *  2. read back ONLY the table partitions the delta touches (the
  *     table is hash-partitioned by a 2-hex-char uuid prefix, so
  *     partition pruning skips everything else);
  *  3. last-write-wins per uuid between existing rows and delta;
  *  4. dynamic partition overwrite rewrites just the touched
  *     partitions.
  *
  * Per-batch work is O(|delta| + |touched partitions|), independent of
  * changelog history length — the property `latestSegments` over the
  * full changelog lacks. On a lakehouse table format this step is
  * literally `MERGE INTO latest USING delta ON uuid` with file-level
  * pruning; the partitioned-parquet form here is the same algorithm
  * expressed against plain files. Deterministic uuids (sha2 seeds) make
  * the merge idempotent: replaying a batch converges to the same table.
  */
object MergeSink {

  private val PartCol = "uuid_p"

  /** Fold one changelog delta into the latest-segments table. */
  def mergeBatch(spark: SparkSession, tablePath: String, batch: DataFrame): Unit = {
    if (batch.isEmpty) return
    val dataCols = batch.columns // segment columns + emit_seq
    // per-uuid winner within the delta
    val delta = batch
      .groupBy(col("uuid"))
      .agg(max_by(struct(dataCols.filter(_ != "uuid").map(col): _*),
        col("emit_seq")).as("r"))
      .select(Seq(col("uuid")) ++ dataCols.filter(_ != "uuid").map(n => col(s"r.$n").as(n)): _*)
      .withColumn(PartCol, substring(col("uuid"), 1, 2))
      .localCheckpoint() // small; also frees the self-overwrite path check below

    val touched = delta.select(PartCol).distinct()
      .collect().map(_.getString(0)).toSeq

    val existing =
      if (new java.io.File(tablePath).exists())
        spark.read.parquet(tablePath)
          .filter(col(PartCol).isin(touched: _*)) // partition-pruned scan
          .select(delta.columns.map(col): _*)
      else delta.limit(0)

    val merged = existing.unionByName(delta)
      .groupBy(col("uuid"))
      .agg(max_by(struct(delta.columns.filter(_ != "uuid").map(col): _*),
        col("emit_seq")).as("r"))
      .select(Seq(col("uuid")) ++ delta.columns.filter(_ != "uuid").map(n => col(s"r.$n").as(n)): _*)
      // truncate lineage so the write below isn't "overwriting a path
      // being read from" (merged is bounded by the touched partitions)
      .localCheckpoint()

    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(PartCol)
      .parquet(tablePath)
  }

  /** Start the changelog stream into an incrementally-merged
    * latest-segments table. */
  def start(changelog: DataFrame, tablePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changelog.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, tablePath, batch)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Read the maintained table as plain segment rows. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath)
      .select(graft.taskrouter.Model.segmentColumns.map(col): _*)
}
