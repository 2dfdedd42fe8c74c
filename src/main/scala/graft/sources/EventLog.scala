package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-event append sink/source (reference S3 `cacheTaskRouterEvent`,
  * routes/events.js:487-501 — an unbounded in-heap collection there;
  * here the at-scale layout from SCALE.md):
  *
  *  - parquet, partitioned by event DATE → partition pruning turns
  *    time-bounded derivations into partial scans;
  *  - append mode: the log is immutable, replays are handled by the
  *    reader-side event-id dedup (Ingest) rather than sink locking.
  */
object EventLog {

  /** Append a parsed event frame (Ingest.parse output) to the log.
    * Clustered on the partition date before the write: un-clustered,
    * every shuffle task writes one file per date it holds (tasks ×
    * dates small files per append — the fan-out measured at 8192
    * files/batch on the merge sink before the same fix). One file per
    * date per append here; a day too large for one task at 100 TB
    * adds a within-day split key to the repartition, not more tasks
    * per date. */
  def append(parsed: DataFrame, path: String): Unit =
    parsed
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write
      .partitionBy("event_date")
      .mode("append")
      .parquet(path)

  /** Read the log back; date predicates prune partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
