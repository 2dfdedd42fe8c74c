package graft.taskrouter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CloudEvent ingest: raw JSON → typed, deduplicated TaskRouter event
  * log (the reference's `cacheTaskRouterEvent`, routes/events.js:487-501,
  * plus the product-family gate :508 and — our documented improvement,
  * SURVEY §2.10 — exactly-once via event-id dedup).
  */
object Ingest {

  /** Parse a dataset of CloudEvent JSON documents (one per row). */
  def parseJson(spark: SparkSession, raw: Dataset[String],
      dedup: Boolean = true): DataFrame = {
    import spark.implicits._
    parse(raw.toDF("value")
      .select(from_json($"value", Model.cloudEventSchema).as("ce"))
      .select($"ce.id".as("id"), $"ce.type".as("type"), $"ce.data".as("data")),
      dedup)
  }

  /** Parse a DataFrame already shaped as the CloudEvent envelope
    * (columns id/type/data). Output: one row per unique TaskRouter
    * event with typed payload columns:
    *   event_id, ts (timestamp), ts_sec (second-truncated, F2),
    *   ts_us (epoch micros, window-range ordering key), eventtype,
    *   sids, scalar payload fields, task_attr (struct), wattr (map),
    *   custom_data precursors.
    */
  def parse(envelopes: DataFrame, dedup: Boolean = true): DataFrame = {
    val gated = envelopes
      .filter(col("type").startsWith(Model.TaskRouterPrefix))
    val typed = gated
      .select(
        col("id").as("event_id"),
        col("data.payload.eventtype").as("eventtype"),
        // try_to_timestamp: a malformed timestamp must drop one event,
        // not fail the job under ANSI mode (the reference silently
        // produces NaN math for Invalid Date; we drop + keep going)
        expr("try_to_timestamp(data.payload.timestamp)").as("ts"),
        col("data.payload.task_sid").as("task_sid"),
        col("data.payload.reservation_sid").as("reservation_sid"),
        col("data.payload.worker_sid").as("worker_sid"),
        from_json(coalesce(col("data.payload.task_attributes"), lit("{}")),
          Model.taskAttributesSchema).as("task_attr"),
        from_json(coalesce(col("data.payload.worker_attributes"), lit("{}")),
          MapType(StringType, StringType)).as("wattr"),
        col("data.payload.task_completed_reason").as("task_completed_reason"),
        col("data.payload.task_canceled_reason").as("task_canceled_reason"),
        col("data.payload.task_channel_unique_name").as("task_channel_unique_name"),
        col("data.payload.workflow_name").as("workflow_name"),
        col("data.payload.task_queue_name").as("task_queue_name"),
        col("data.payload.task_queue_sid").as("task_queue_sid"),
        col("data.payload.worker_activity_name").as("worker_activity_name"),
        col("data.payload.worker_time_in_previous_activity")
          .as("worker_time_in_previous_activity"),
        col("data.publisher_metadata.account_sid").as("account_sid"))
      // drop unusable rows BEFORE dedup: otherwise (a) a replayed event
      // whose corrupt-timestamp copy happens to win the dedup loses a
      // perfectly parseable copy (partition-order-dependent data loss),
      // and (b) distinct id-less events collapse into one survivor.
      .filter(col("ts").isNotNull && col("event_id").isNotNull)
    // reference replays duplicate rows (non-unique event_id index);
    // we dedup deterministically — documented divergence (SURVEY §2.10).
    // Streaming callers pass dedup=false and apply
    // dropDuplicatesWithinWatermark instead (bounded state). Deduping
    // the typed projection also shuffles narrow rows, not raw JSON.
    (if (dedup) typed.dropDuplicates(Seq("event_id")) else typed)
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .withColumn("ts_us", unix_micros(col("ts")))
  }
}
