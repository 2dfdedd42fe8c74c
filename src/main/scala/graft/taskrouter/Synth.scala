package graft.taskrouter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deterministic TaskRouter CloudEvent synthesis from the driver's
  * generic `events` table, so the full derivation pipeline can be
  * verified against an independent analytic DuckDB oracle (the oracle
  * recomputes expected segments from the same formulas without running
  * any of our join/window machinery).
  *
  * Scenario mapping (v = floor(value), t0 = event ts):
  *  - purchase → task happy path WTP<event_id>: entered(t0),
  *    created(+c), accepted(+a); if v%5≠0 also completed(+cp) and,
  *    when v%3≠0, wrapup(+wp);  c = v%7+1, a = c+v%13+5,
  *    wp = a+v%50+10, cp = hasWrapup ? wp+v%20+3 : a+v%50+13.
  *  - error → abandoned task WTA<event_id>: entered(t0),
  *    task.canceled(+d), d = v%60+5.
  *  - click → failed reservation WTF<event_id>: entered(t0),
  *    created(+c), then per v%4 rejected/timeout/canceled/rescinded
  *    at +c+r, r = v%11+2.
  *  - signup → worker WA<user_id>: first signup per user =
  *    worker.created, later ones worker.activity.update
  *    (activity ACT<v%5>, worker_time_in_previous_activity = v);
  *    users with user_id%5==0 get worker.deleted at last signup +60s.
  */
object Synth {

  private val SEC = 1000000L // µs per second

  /** Envelope descriptor: a 3-field struct (idPrefix, et, offSec) —
    * the ONLY thing that varies per envelope within a scenario row.
    * Exploding these tiny structs and building the full 15-field
    * payload once after the family union keeps the synthesized plan's
    * expression tree ~13× smaller than building a full envelope struct
    * per event type (the wide form spent more time in Catalyst
    * analysis + janino compilation than in execution: ~19s of the
    * ~24s sf0.1 staging was data-independent). */
  private def envDesc(idPrefix: String, et: String, offSec: Column): Column =
    struct(lit(idPrefix).as("pfx"), lit(et).as("et"), offSec.cast(LongType).as("off"))

  /** Payload-field columns a family contributes (absent → null). */
  private val payloadFieldNames: Seq[String] =
    Model.payloadSchema.fields.toSeq.map(_.name)
      .filterNot(n => n == "eventtype" || n == "timestamp")

  /** Explode a per-row bundle of (conditionally null) envelope
    * descriptors; carry the family's payload field values alongside as
    * plain columns so the envelope struct can be built once, after the
    * 4-way family union. */
  private def explodeEnvelopes(df: DataFrame, fields: Map[String, Column],
      envs: Seq[Column]): DataFrame = {
    val fieldCols = payloadFieldNames.map { n =>
      fields.getOrElse(n,
        lit(null).cast(Model.payloadSchema(n).dataType)).as("f_" + n)
    }
    df.select(Seq(col("event_id"), col("us"),
        explode(array(envs: _*)).as("e")) ++ fieldCols: _*)
      .filter(col("e").isNotNull)
  }

  /** One CloudEvent envelope projection over the unioned descriptor
    * frame — the single payload-struct construction in the whole plan.
    * Envelope ids zero-pad the numeric source id so STRING ordering of
    * ids (the engine's generic window tiebreak) equals NUMERIC ordering
    * of source ids (the analytic oracles' tiebreak) under timestamp
    * ties. */
  private def buildEnvelopes(descriptors: DataFrame): DataFrame = {
    val payload = struct(Model.payloadSchema.fields.toSeq.map { f =>
      (f.name match {
        case "eventtype" => col("e.et")
        case "timestamp" =>
          timestamp_micros(col("us") + col("e.off") * SEC).cast(StringType)
        case n => col("f_" + n)
      }).as(f.name)
    }: _*)
    descriptors.select(
      concat(col("e.pfx"), lpad(col("event_id").cast(StringType), 12, "0")).as("id"),
      concat(lit(Model.TaskRouterPrefix + "."), col("e.et")).as("type"),
      struct(
        payload.as("payload"),
        struct(lit("AC1").as("account_sid")).as("publisher_metadata"),
        lit(null).cast(StringType).as("test_id")).as("data"))
  }

  private def loaded(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("v", floor(col("value")).cast(LongType))
      .withColumn("us", unix_micros(col("ts")))

  /** Envelope-shaped CloudEvents for all synthesized scenarios. */
  def cloudEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = loaded(spark, dir)
    val v = col("v")

    // ---- task-side shared fields
    def taskFields(prefix: String): Map[String, Column] = Map(
      "task_sid" -> concat(lit(prefix), col("event_id")),
      "reservation_sid" -> concat(lit("WR" + prefix.drop(2)), col("event_id")),
      "worker_sid" -> concat(lit("WK"), col("user_id")),
      "task_channel_unique_name" -> when(v % 2 === 0, "voice").otherwise("chat"),
      "task_queue_name" -> concat(lit("Q"), v % 4),
      "task_queue_sid" -> concat(lit("WQ"), v % 4),
      "workflow_name" -> lit("Main"),
      "task_attributes" -> concat(lit("""{"direction":""""),
        when(v % 3 === 0, "inbound").when(v % 3 === 1, "outbound").otherwise("internal"),
        lit("""","from":"+1555","to":"+1666"}""")))

    // ---- purchase → happy path (one exploded plan). Every 6th
    // scenario carries CUSTOM conversations attributes — including an
    // empty-string `queue` that must fall through JS-falsy coalescing
    // (SURVEY §7.4.1) — so custom-data precedence is oracle-checked.
    val hasCustom = col("v") % 6 === 0
    val customAttr = concat(
      lit("{\"conversations\":{\"conversation_id\":\"CX"), col("event_id"),
      lit("\",\"abandoned\":\"Yes\",\"queue\":\"\"},\"direction\":\""),
      when(v % 3 === 0, "inbound").when(v % 3 === 1, "outbound").otherwise("internal"),
      lit("\",\"from\":\"+1555\",\"to\":\"+1666\"}"))
    val pf = taskFields("WTP") + ("task_attributes" ->
      when(hasCustom, customAttr).otherwise(taskFields("WTP")("task_attributes")))
    val c = v % 7 + 1
    val a = c + v % 13 + 5
    val hasCp = v % 5 =!= 0
    val hasW = hasCp && v % 3 =!= 0
    val wp = a + v % 50 + 10
    val cp = when(hasW, wp + v % 20 + 3).otherwise(a + v % 50 + 13)
    val purchase = explodeEnvelopes(
      ev.filter(col("event_type") === "purchase"), pf,
      Seq(
        envDesc("EPE", Model.EtTaskQueueEntered, lit(0L)),
        envDesc("EPC", Model.EtReservationCreated, c),
        envDesc("EPA", Model.EtReservationAccepted, a),
        when(hasW, envDesc("EPW", Model.EtReservationWrapup, wp)),
        when(hasCp, envDesc("EPD", Model.EtReservationCompleted, cp))))

    // ---- error → abandoned in queue
    val ef = taskFields("WTA")
    val d = v % 60 + 5
    val abandoned = explodeEnvelopes(
      ev.filter(col("event_type") === "error"), ef,
      Seq(
        envDesc("EAE", Model.EtTaskQueueEntered, lit(0L)),
        envDesc("EAC", Model.EtTaskCanceled, d)))

    // ---- click → failed reservation (outcome kind by v%4)
    val ff = taskFields("WTF")
    val r = c + v % 11 + 2
    val failKind = v % 4
    val failed = explodeEnvelopes(
      ev.filter(col("event_type") === "click"), ff,
      Seq(
        envDesc("EFE", Model.EtTaskQueueEntered, lit(0L)),
        envDesc("EFC", Model.EtReservationCreated, c),
        when(failKind === 0, envDesc("EFR", Model.EtReservationRejected, r)),
        when(failKind === 1, envDesc("EFT", Model.EtReservationTimeout, r)),
        when(failKind === 2, envDesc("EFX", Model.EtReservationCanceled, r)),
        when(failKind === 3, envDesc("EFS", Model.EtReservationRescinded, r))))

    // ---- signup → worker lifecycle (one windowed + exploded plan)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val s = ev.filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(w))
      .withColumn("last_us", max(col("us")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
    def workerFields: Map[String, Column] = Map(
      "worker_sid" -> concat(lit("WA"), col("user_id")),
      "worker_activity_name" -> concat(lit("ACT"), v % 5),
      "worker_time_in_previous_activity" -> v,
      "worker_attributes" -> concat(
        lit("""{"email":"u"""), col("user_id"),
        lit("""@x.co","roles":["agent"],"team_name":"T"""), col("user_id") % 3,
        lit("\"}")))
    val workers = explodeEnvelopes(s, workerFields,
      Seq(
        when(col("rn") === 1, envDesc("EWC", Model.EtWorkerCreated, lit(0L)))
          .otherwise(envDesc("EWU", Model.EtWorkerActivityUpdated, lit(0L))),
        when(col("user_id") % 5 === 0 && col("us") === col("last_us"),
          envDesc("EWD", Model.EtWorkerDeleted, lit(60L)))))

    buildEnvelopes(
      Seq(purchase, abandoned, failed, workers).reduce(_ unionByName _))
  }

  // Materialize parse + derivation once per (session, dir): the five
  // driver queries share one pipeline run (the production shape — the
  // derived segment table is written once and queried many times).
  // Synth → parse → windows → base projection run fused in ONE job
  // whose output is the single staged event table both the segment
  // branches and the agent dimension read; parquet staging truncates
  // the 13-way synth-union lineage so downstream plans scan the stage
  // table instead of re-deriving the whole tree. (An earlier shape
  // staged parsed events AND the task-event frame separately — one
  // extra full write+read cycle and a second janino pass for zero
  // reuse, ~25% of the driver-measured staging cost.)
  def parsedEvents(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"synth.parsed|$dir")(
      Ingest.parse(cloudEvents(spark, dir)))

  /** The one staged event frame (base projection + as-of lookups). */
  private def stagedAll(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"synth.stagedall|$dir")(
      Derivation.stagedEvents(Ingest.parse(cloudEvents(spark, dir))))

  /** Derived segment table for the synthesized scenario set. */
  def segments(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"synth.segments|$dir")(
      Derivation.segmentsFromStaged(stagedAll(spark, dir)))

  def agents(spark: SparkSession, dir: String): DataFrame =
    Derivation.agentsFromStaged(stagedAll(spark, dir))
}
