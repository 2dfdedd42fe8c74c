package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.EventLog
import graft.streaming.StreamingPipeline
import graft.taskrouter.{Derivation, Ingest}

/** End-to-end façade — what a user of the reference app switches to:
  *
  * {{{
  * // batch: CloudEvent JSON → event log → reporting tables
  * Pipeline.ingestJson(spark, jsonLines, logPath)
  * Pipeline.deriveTables(spark, logPath, outPath)
  * val segments = Pipeline.segments(spark, outPath)
  * val report   = graft.report.Report.conversationsReport(segments)
  *
  * // streaming: file-source CloudEvents → changelog → latest tables
  * val q = Pipeline.startStreaming(spark, watchDir, checkpoint, outPath)
  * }}}
  */
object Pipeline {

  /** Parse raw CloudEvent JSON lines and append to the date-partitioned
    * event log (dedup happens at read/derive time — the log is an
    * immutable append store). */
  def ingestJson(spark: SparkSession, json: Dataset[String], logPath: String): Unit =
    EventLog.append(Ingest.parseJson(spark, json), logPath)

  /** Derive and persist the reporting model from the event log. */
  def deriveTables(spark: SparkSession, logPath: String, outPath: String): Unit = {
    val parsed = EventLog.read(spark, logPath)
      .dropDuplicates("event_id") // replays across appended batches
    Derivation.segments(parsed).write.mode("overwrite")
      .parquet(s"$outPath/segments")
    Derivation.agents(parsed).write.mode("overwrite")
      .parquet(s"$outPath/agents")
  }

  def segments(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/segments")

  def agents(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/agents")

  /** Continuous mode: watch a directory of CloudEvent JSON files, emit
    * the segment changelog (append), maintaining `latest` on demand via
    * [[latestSegments]]. Checkpointed — restart-safe, exactly-once into
    * the changelog sink. */
  def startStreaming(spark: SparkSession, watchDir: String,
      checkpointDir: String, outPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream.text(watchDir)
    val changelog = StreamingPipeline.segmentsChangelog(spark,
      StreamingPipeline.parseStream(spark, raw))
    changelog.writeStream
      .format("parquet")
      .option("path", s"$outPath/segments_changelog")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** Latest state of the streamed changelog (MERGE-by-uuid view,
    * recomputed over the full changelog — fine for bounded runs; long
    * streams should use [[startStreamingMerged]]). */
  def latestSegments(spark: SparkSession, outPath: String): DataFrame =
    StreamingPipeline.latestSegments(
      spark.read.parquet(s"$outPath/segments_changelog"))

  /** Continuous mode with an incrementally-maintained latest table (the
    * reference's update-in-place behavior, routes/events.js:298-315):
    * each micro-batch MERGEs its delta by uuid into
    * `outPath/segments_latest`, so reads never re-aggregate history.
    * `stateTtlMs` bounds per-key state machine memory (event-time
    * eviction once the watermark passes newest-event + TTL). */
  def startStreamingMerged(spark: SparkSession, watchDir: String,
      checkpointDir: String, outPath: String,
      stateTtlMs: Option[Long] = Some(24L * 3600 * 1000),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream.text(watchDir)
    val changelog = StreamingPipeline.segmentsChangelog(spark,
      StreamingPipeline.parseStream(spark, raw), stateTtlMs)
    graft.streaming.MergeSink.start(changelog,
      s"$outPath/segments_latest", checkpointDir, trigger)
  }

  /** The incrementally-merged latest-segments table. */
  def mergedSegments(spark: SparkSession, outPath: String): DataFrame =
    graft.streaming.MergeSink.read(spark, s"$outPath/segments_latest")

  /** Continuous agents dimension (the reference's SCD-1 upsert,
    * routes/events.js:225-256): each micro-batch's per-agent partial
    * aggregate MERGEs into `outPath/agents_latest` by agent_uuid. */
  def startStreamingAgents(spark: SparkSession, watchDir: String,
      checkpointDir: String, outPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream.text(watchDir)
    graft.streaming.MergeSink.startAgents(
      StreamingPipeline.parseStream(spark, raw),
      s"$outPath/agents_latest", checkpointDir, trigger)
  }

  /** The incrementally-merged agents dimension. */
  def mergedAgents(spark: SparkSession, outPath: String): DataFrame =
    graft.streaming.MergeSink.readAgents(spark, s"$outPath/agents_latest")
}
