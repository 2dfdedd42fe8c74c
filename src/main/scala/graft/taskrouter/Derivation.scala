package graft.taskrouter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Model._

/** Batch derivation of the Flex-Insights-style reporting model from the
  * TaskRouter event log — the reference's analytical core
  * (routes/events.js:503-667) re-expressed as declarative Spark
  * dataflow so Catalyst/Tungsten handle planning:
  *
  *  - J1 queue-entry as-of lookup → one window over events partitioned
  *    by task_sid with a RANGE frame on epoch-micros (strict `ts <
  *    exit_ts`, reference :74-87), instead of the reference's O(n)
  *    per-event scan (O(n²) total);
  *  - J2/J3/J4 reservation lookups → a single groupBy(reservation_sid)
  *    aggregation producing created/wrapup/accepted timestamps in one
  *    shuffle (reference :89-127 scans per event);
  *  - J5 in-progress update (EP2) → in-progress rows LEFT JOIN the
  *    latest completed-derived delta per reservation (reference
  *    :298-315, :572-586);
  *  - J6/W1 agent-status machine → lead() over per-worker openers
  *    (reference :639-664);
  *  - S5 agent upsert → last-write-wins max_by per worker
  *    (reference :225-256).
  *
  * Scale notes (100 TB): each correlation is exactly one shuffle on its
  * natural key (task_sid / reservation_sid / worker_sid); no driver-side
  * loops, no collects; the wide projection is a single codegen'd select.
  * Event-time ordering replaces the reference's arrival-order dependence
  * (documented divergence, SURVEY §7.4.3); surrogate ids are
  * deterministic sha2 hashes instead of uuid() (F12).
  */
object Derivation {

  // ---------------------------------------------------------------
  // custom-data helpers (reference :353-356 merge + JS `||` falsiness)
  // ---------------------------------------------------------------

  /** JS object-spread semantics: worker_attributes key wins when
    * present, else task_attributes.conversations (reference :353-356). */
  private def cdRaw(key: String): Column =
    when(map_contains_key(col("wattr"), lit(key)), col("wattr")(key))
      .otherwise(col("task_attr.conversations")(key))

  /** JS `||` treats '' as falsy; SQL coalesce only skips NULL — so
    * normalize '' → NULL before coalescing (SURVEY §7.4.1). */
  private def cdOr(key: String): Column = nullif(cdRaw(key), lit(""))

  private def nz(c: Column): Column = nullif(c, lit(""))

  /** Custom-data numeric fact: digits-guarded cast (ANSI mode would
    * throw on junk; the reference stores raw JS values untyped). */
  private def cdNum(key: String): Column =
    when(cdRaw(key).rlike("^-?[0-9]+$"), cdRaw(key).cast(LongType))

  /** reference Array.isArray(x) ? x.join(sep) : fallback — array-typed
    * custom values survive as JSON text in the string map. */
  private def joinIfArray(c: Column, sep: String, fallback: Column): Column =
    when(c.startsWith("["), array_join(from_json(c, ArrayType(StringType)), sep))
      .otherwise(fallback)

  /** Deterministic surrogate id (F12) replacing reference uuid() (:217). */
  private def detUuid(parts: Column*): Column =
    sha2(concat_ws("|", parts: _*), 256)

  /** Whole-second duration (F3): exact after second truncation. */
  private def secDiff(end: Column, start: Column): Column =
    unix_timestamp(end) - unix_timestamp(start)

  // ---------------------------------------------------------------
  // base projection (P1, reference :337-485)
  // ---------------------------------------------------------------

  /** Shared with the streaming layer: per-event base projection frame. */
  private[graft] def baseFrame(parsed: DataFrame): DataFrame =
    withBase(prepared(parsed))

  /** Rename payload correlation keys so base output columns
    * (reservation_sid/agent_uuid) don't collide. */
  private def prepared(parsed: DataFrame): DataFrame =
    parsed
      .withColumnRenamed("task_sid", "p_task_sid")
      .withColumnRenamed("reservation_sid", "p_reservation_sid")
      .withColumnRenamed("worker_sid", "p_worker_sid")

  /** Adds every base segment column (reference :357-484) to a prepared
    * frame; per-branch overrides replace individual values later. */
  private def withBase(ev: DataFrame): DataFrame = {
    val ta = col("task_attr")
    var out = ev
    val base: Seq[(String, Column)] =
      Seq(
        "conversation_id" -> coalesce(cdOr("conversation_id"), nz(col("p_task_sid")),
          nz(col("p_worker_sid")), detUuid(col("event_id"), lit("cid"))),
        "segment_external_id" -> coalesce(nz(col("p_task_sid")), nz(col("p_worker_sid")),
          detUuid(col("event_id"), lit("seid"))),
        "reservation_sid" -> coalesce(col("p_reservation_sid"), lit("")),
        "agent_uuid" -> coalesce(col("p_worker_sid"), lit("")),
        // facts (:369-408)
        "activity_time" -> col("worker_time_in_previous_activity"),
        "date" -> col("ts_sec"),
        "time" -> col("ts_sec"),
        "abandoned" -> coalesce(cdOr("abandoned"), lit("N")),
        "activity" -> coalesce(cdOr("activity"), col("worker_activity_name")),
        "channel" -> when(cdOr("channel").isNotNull, cdOr("channel"))
          .when(col("task_channel_unique_name") === "voice", lit("Call"))
          .when(col("task_channel_unique_name") === "chat", lit("Chat"))
          .otherwise(col("task_channel_unique_name")),
        "direction" -> when(cdOr("direction").isNotNull, cdOr("direction"))
          .when(ta("direction") === "inbound", lit("Inbound"))
          .when(ta("direction") === "internal", lit("Internal"))
          .when(ta("direction") === "outbound", lit("Outbound"))
          .otherwise(lit("Inbound")),
        "external_contact" -> coalesce(cdOr("external_contact"),
          when(ta("direction") === "outbound", ta("from")).otherwise(ta("to"))),
        "handling_department_id" -> cdRaw("department_id"),
        "handling_department_name" -> cdRaw("department_name"),
        "handling_department_name_in_hierarchy" ->
          joinIfArray(cdRaw("handling_department_name_in_hierarchy"), " ▸ ",
            cdRaw("handling_department_name_in_hierarchy")),
        "handling_team_id" -> coalesce(cdOr("team_id"), cdOr("team"), col("task_queue_sid")),
        "handling_team_name" -> coalesce(cdOr("team_name"), cdOr("team"), col("task_queue_name")),
        "handling_team_name_in_hierarchy" ->
          joinIfArray(cdRaw("team_name_in_hierarchy"), " ▸ ",
            cdRaw("team_name_in_hierarchy")),
        "outcome" -> coalesce(cdOr("outcome"), nz(ta("reason")),
          nz(col("task_completed_reason")), col("task_canceled_reason")),
        "queue" -> coalesce(cdOr("queue"), col("task_queue_name")),
        "workflow" -> coalesce(cdOr("workflow"), col("workflow_name"))
      ) ++
        factColumns.filterNot(_ == "activity_time").map(n => n -> cdNum(n)) ++
        passthroughCustomColumns.map(n => n -> cdRaw(n))
    out.withColumns(base.toMap)
  }

  /** Final per-branch projection in canonical column order. */
  private def selectSegment(df: DataFrame, overrides: Map[String, Column],
      extra: Seq[Column] = Nil): DataFrame =
    df.select(segmentColumns.map(n => overrides.getOrElse(n, col(n)).as(n)) ++ extra: _*)

  // ---------------------------------------------------------------
  // correlations
  // ---------------------------------------------------------------

  private def isEntryEvent: Column =
    col("eventtype").isin(EtTaskQueueEntered, EtTaskTransferInitiated)

  /** J1: strictly-prior latest entry event per task (reference :74-87).
    * RANGE frame over epoch-micros gives the strict `timestamp <
    * exitTimestamp` bound (ties excluded), one shuffle per task_sid. */
  private def withQueueEntry(taskEv: DataFrame): DataFrame = {
    // Null-safe key: worker rows (no task_sid) partition per worker so
    // no null-key skew partition forms; their entry lookup is null.
    val w = Window
      .partitionBy(coalesce(col("p_task_sid"), concat(lit("W|"), col("p_worker_sid"))))
      .orderBy(col("ts_us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    taskEv.withColumn("entry_ts_sec",
      last(when(isEntryEvent, col("ts_sec")), ignoreNulls = true).over(w))
  }

  /** J2/J3/J4 as STRICTLY-PRIOR per-reservation window lookups
    * (reference :89-127 scans what has arrived before the consuming
    * event; under in-order delivery arrived == prior-by-event-time):
    *  - created: latest prior (reference :89-102 desc sort, first)
    *  - wrapup:  latest prior (reference :104-117)
    *  - accepted: first prior by event-time (reference :119-127 is
    *    arrival-order; event-time is our documented divergence).
    * An unbounded (whole-history) aggregate here would let a created/
    * wrapup event that POSTDATES the consumer produce negative
    * durations and diverge from the streaming machine. The frame is a
    * ROWS frame over the canonical (ts_us, event_id) event order — the
    * exact order the streaming machine processes events — so same-
    * timestamp lookups resolve identically in batch and stream
    * (reference :89-127 has no time predicate at all: it scans
    * whatever has arrived). Non-reservation rows get a per-task
    * partition key so no null-key skew partition forms. */
  private def withReservationLookup(taskEv: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(coalesce(col("p_reservation_sid"),
        concat(lit("T|"), col("p_task_sid")),
        concat(lit("W|"), col("p_worker_sid"))))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    taskEv
      .withColumn("created_ts_sec",
        last(when(col("eventtype") === EtReservationCreated, col("ts_sec")),
          ignoreNulls = true).over(w))
      .withColumn("wrapup_ts_sec",
        last(when(col("eventtype") === EtReservationWrapup, col("ts_sec")),
          ignoreNulls = true).over(w))
      .withColumn("accepted_ts_sec",
        min(when(col("eventtype") === EtReservationAccepted,
          struct(col("ts_us"), col("ts_sec")))).over(w).getField("ts_sec"))
  }

  // ---------------------------------------------------------------
  // public API
  // ---------------------------------------------------------------

  /** Full segments ("conversations") fact table from parsed events.
    * `stage` materializes the shared task-event frame consumed by the
    * five derivation branches; production callers (Synth) pass a
    * parquet stage table, in-memory callers keep the localCheckpoint
    * default. */
  def segments(parsed: DataFrame,
      stage: DataFrame => DataFrame = _.localCheckpoint()): DataFrame =
    segmentsFromStaged(stage(stagedEvents(parsed)))

  /** The shared staged event frame (as-of windows + the ~70-column base
    * projection), built once: three task branches (accepted, failed,
    * abandoned) filter it on non-partition columns, the worker-span
    * branch needs the same base projection, and the agent dimension
    * needs the worker rows — so task and worker events are unioned
    * (tagged by `side`) BEFORE the base projection and the whole frame
    * is materialized ONCE for all consumers. Besides saving
    * recomputation, this keeps exactly ONE copy of the giant base
    * expression tree in the plan (two copies doubled the
    * data-independent Catalyst/janino cost) and ONE parquet
    * write+read cycle where there used to be two (parsed + task-event
    * stage tables).
    * At scale this is the staged "events + base" table written once
    * per batch window (SCALE.md storage layout).
    * uuid/segment_kind are always branch overrides, and no branch
    * reads the parsed attribute blobs after the base projection — so
    * the staged frame keeps only base columns + correlation fields
    * (roughly halves the materialized width); `wattr` survives for the
    * agent dimension's last-write-wins attribute select. */
  private[graft] def stagedEvents(parsed: DataFrame): DataFrame = {
    val ev = prepared(parsed)
    val stagedCols = segmentColumns.filterNot(Set("uuid", "segment_kind")).map(col) ++
      Seq(col("side"), col("eventtype"), col("event_id"), col("ts_sec"), col("ts_us"),
        col("p_reservation_sid"), col("p_worker_sid"), col("wattr"),
        col("worker_activity_name"), col("worker_time_in_previous_activity"),
        col("entry_ts_sec"),
        col("created_ts_sec"), col("wrapup_ts_sec"), col("accepted_ts_sec"),
        // completed-update link comes from the completed event's
        // task_attributes.conversations ONLY (:578-583), not the
        // wattr-merged custom-data column
        col("task_attr.conversations")("segment_link").as("segment_link_src"))
    // Single pass over the parsed stream — NO task/worker union. A
    // union would plant two copies of the upstream parse tree in the
    // plan and recompute the whole ingest per branch (scans are not
    // exchange-reused); instead `side` is a computed column and the
    // as-of windows use null-safe partition keys so worker rows ride
    // along in their own per-worker partitions (their window values
    // are null — worker events are never entry/reservation events —
    // and nothing downstream reads them).
    val sided = ev
      .filter(col("p_task_sid").isNotNull ||
        (col("p_worker_sid").isNotNull &&
          col("eventtype").isin(EtWorkerCreated, EtWorkerActivityUpdated,
            EtWorkerDeleted, EtWorkerAttributesUpdated)))
      .withColumn("side",
        when(col("p_task_sid").isNotNull, lit("T")).otherwise(lit("W")))
    withBase(withReservationLookup(withQueueEntry(sided)))
      .select(stagedCols: _*)
  }

  /** Segment branches over an already-materialized [[stagedEvents]]
    * frame (production path: Synth stages it to parquet once and both
    * this and [[agentsFromStaged]] read it). */
  def segmentsFromStaged(stagedAll: DataFrame): DataFrame = {
    val taskEv = stagedAll.filter(col("side") === "T")

    // --- reservation.accepted (EP1, reference :514-538): requires both
    // J1 entry and J2 created (exception-as-inner-join, :161,:171,:672).
    val acc = taskEv.filter(col("eventtype") === EtReservationAccepted)
      .filter(col("entry_ts_sec").isNotNull && col("created_ts_sec").isNotNull)
      .withColumn("queue_time_c", secDiff(col("ts_sec"), col("entry_ts_sec")))
      .withColumn("ring_time_c", secDiff(col("ts_sec"), col("created_ts_sec")))

    val queueRows = selectSegment(acc, Map(
      "uuid" -> detUuid(col("event_id"), lit(QueueSegment)),
      "segment_kind" -> lit(QueueSegment),
      "queue_time" -> col("queue_time_c"),
      "date" -> col("entry_ts_sec"),
      "time" -> col("entry_ts_sec")))

    // in-progress rows keep the reservation key + emission order for
    // the completed join: the reference's completed handler updates the
    // FIRST stored in-progress row (getConversationInProgressSegment
    // :129-137 takes data()[0], insertion order), so with duplicate
    // accepted events only the earliest in-progress row converts.
    val inProgRows = selectSegment(acc, Map(
      "uuid" -> detUuid(col("event_id"), lit(ConvoInProgSeg)),
      "segment_kind" -> lit(ConvoInProgSeg),
      "queue_time" -> col("queue_time_c"),
      "ring_time" -> col("ring_time_c")),
      extra = Seq(col("p_reservation_sid").as("join_res_sid"),
        row_number().over(Window.partitionBy(col("p_reservation_sid"))
          .orderBy(col("ts_us"), col("event_id"))).as("ip_rank")))

    // --- reservation.completed (EP2, reference :572-586): FIRST
    // completed per reservation converts the in-progress row — a second
    // completed finds no in-progress (kind already changed) and is
    // tolerated-dropped (:308-310), so first-wins, not last-wins.
    // accepted/wrapup lookups are the strictly-prior window values.
    val compUpd = taskEv.filter(col("eventtype") === EtReservationCompleted)
      .filter(col("accepted_ts_sec").isNotNull) // J4 required (:182)
      .withColumn("talk_time_c",
        when(col("wrapup_ts_sec").isNotNull,
          secDiff(col("wrapup_ts_sec"), col("accepted_ts_sec")))
          .otherwise(secDiff(col("ts_sec"), col("accepted_ts_sec"))))
      .withColumn("wrapup_time_c",
        when(col("wrapup_ts_sec").isNull, lit(0L))
          .otherwise(secDiff(col("ts_sec"), col("wrapup_ts_sec"))))
      .withColumn("segment_link_c", col("segment_link_src"))
      .groupBy(col("p_reservation_sid").as("upd_res_sid"))
      .agg(min_by(
        struct(col("talk_time_c"), col("wrapup_time_c"), col("segment_link_c")),
        struct(col("ts_us"), col("event_id"))).as("upd"))
      .select(col("upd_res_sid"), col("upd.talk_time_c").as("talk_time_c"),
        col("upd.wrapup_time_c").as("wrapup_time_c"),
        col("upd.segment_link_c").as("segment_link_c"), lit(true).as("has_upd"))

    // JS spread {...in_progress, ...update}: only the four delta fields
    // change, segment_link even when the new value is undefined (:578-583)
    val converts = col("has_upd") && col("ip_rank") === 1
    val convoRows = inProgRows
      .join(compUpd, col("join_res_sid") === col("upd_res_sid"), "left")
      .withColumn("segment_kind",
        when(converts, lit(ConvoSeg)).otherwise(col("segment_kind")))
      .withColumn("talk_time",
        when(converts, col("talk_time_c")).otherwise(col("talk_time")))
      .withColumn("wrapup_time",
        when(converts, col("wrapup_time_c")).otherwise(col("wrapup_time")))
      .withColumn("segment_link",
        when(converts, col("segment_link_c")).otherwise(col("segment_link")))
      .select(segmentColumns.map(col): _*)

    // --- failed reservations (reference :541-571): J2 required —
    // created_ts_sec is the staged strictly-prior window lookup.
    val failed = taskEv.filter(col("eventtype").isin(
        EtReservationRejected, EtReservationTimeout,
        EtReservationCanceled, EtReservationRescinded))
      .filter(col("created_ts_sec").isNotNull)
      .withColumn("ring_time_c", secDiff(col("ts_sec"), col("created_ts_sec")))
      .withColumn("kind_c",
        when(col("eventtype") === EtReservationRejected, ConvoRejected)
          .when(col("eventtype") === EtReservationRescinded, ConvoRevoked)
          .otherwise(ConvoMissed))
    val failedRows = selectSegment(failed, Map(
      "uuid" -> detUuid(col("event_id"), col("kind_c")),
      "segment_kind" -> col("kind_c"),
      "ring_time" -> col("ring_time_c")))

    // --- task abandoned in queue (reference :589-618): J1 required.
    val aband = taskEv.filter(col("eventtype").isin(EtTaskCanceled, EtTaskTransferFailed))
      .filter(col("entry_ts_sec").isNotNull)
      .withColumn("queue_time_c", secDiff(col("ts_sec"), col("entry_ts_sec")))
    val abandCommon: Map[String, Column] = Map(
      "queue_time" -> col("queue_time_c"),
      "abandon_time" -> col("queue_time_c"),
      "abandoned_phase" -> lit("Queue"),
      "abandoned" -> lit("Yes"))
    val abandQueueRows = selectSegment(aband, abandCommon ++ Map(
      "uuid" -> detUuid(col("event_id"), lit(QueueSegment)),
      "segment_kind" -> lit(QueueSegment),
      "date" -> col("entry_ts_sec"),
      "time" -> col("entry_ts_sec")))
    val abandConvoRows = selectSegment(aband, abandCommon ++ Map(
      "uuid" -> detUuid(col("event_id"), lit(ConvoSeg)),
      "segment_kind" -> lit(ConvoSeg)))

    // --- agent status machine (W1, reference :619-664): every
    // worker.created / worker.activity.update opens an in-progress span;
    // the next activity.update closes it, stamping the upstream-supplied
    // duration (activity_time := next event's
    // worker_time_in_previous_activity — trusted, not recomputed :646).
    // W side also carries deleted/attributes-updated rows for the agent
    // dimension; only created/activity.update open spans (reference :639).
    val openers = stagedAll.filter(col("side") === "W" &&
      col("eventtype").isin(EtWorkerCreated, EtWorkerActivityUpdated))
    val wW = Window.partitionBy(col("p_worker_sid"))
      .orderBy(col("ts_us"), col("event_id"))
    val spans = openers
      .withColumn("next_et", lead(col("eventtype"), 1).over(wW))
      .withColumn("next_atime", lead(col("worker_time_in_previous_activity"), 1).over(wW))
      .withColumn("closed", col("next_et") === EtWorkerActivityUpdated)
    val spanRows = selectSegment(spans, Map(
      "uuid" -> detUuid(col("event_id"), lit(AgentStatusInProgress)),
      "segment_kind" -> when(col("closed"), AgentStatus).otherwise(AgentStatusInProgress),
      "activity" -> col("worker_activity_name"),
      "activity_time" -> when(col("closed"), col("next_atime"))
        .when(col("eventtype") === EtWorkerActivityUpdated, lit(null).cast(LongType))
        .otherwise(col("worker_time_in_previous_activity"))))

    queueRows
      .unionByName(convoRows)
      .unionByName(failedRows)
      .unionByName(abandQueueRows)
      .unionByName(abandConvoRows)
      .unionByName(spanRows)
  }

  /** Agent dimension (SCD-1 current state): last-write-wins per worker
    * with date_joined = first touching event (reference :225-295). */
  def agents(parsed: DataFrame): DataFrame =
    agentsKeyed(parsed).select(agentColumns.map(col): _*)

  /** Agent dimension over an already-materialized [[stagedEvents]]
    * frame — the W side carries exactly the four worker lifecycle
    * event types plus `wattr`, so the SCD-1 select runs off the same
    * staged table the segment branches read (no second pipeline). */
  def agentsFromStaged(stagedAll: DataFrame): DataFrame =
    agentsSelect(stagedAll.filter(col("side") === "W"))
      .select(agentColumns.map(col): _*)

  /** [[agents]] plus the winning event's (last_ts_us, last_event_id)
    * order key — an incremental sink merges partial aggregates by
    * re-running the same min/max_by over (existing ∪ delta), which
    * needs the key persisted alongside the row. */
  private[graft] def agentsKeyed(parsed: DataFrame): DataFrame =
    agentsSelect(prepared(parsed).filter(col("p_worker_sid").isNotNull &&
      col("eventtype").isin(EtWorkerCreated, EtWorkerDeleted,
        EtWorkerActivityUpdated, EtWorkerAttributesUpdated)))

  /** Last-write-wins SCD-1 select shared by the parsed-frame and
    * staged-frame entry points; `ev` must expose p_worker_sid,
    * eventtype, ts_sec, ts_us, event_id, wattr. */
  private def agentsSelect(ev: DataFrame): DataFrame = {
    val last = ev.groupBy(col("p_worker_sid").as("agent_uuid"))
      .agg(
        min(col("ts_sec")).as("date_joined"),
        max_by(struct(col("eventtype"), col("ts_sec"), col("wattr"),
            col("ts_us"), col("event_id")),
          struct(col("ts_us"), col("event_id"))).as("lastev"))
    val wa: String => Column = k => col("lastev.wattr")(k)
    last.select(
      col("agent_uuid"),
      wa("agent_attribute_1").as("attribute_1"),
      wa("agent_attribute_2").as("attribute_2"),
      wa("agent_attribute_3").as("attribute_3"),
      wa("email").as("email"),
      wa("agent_id").as("agent_id"),
      wa("location").as("location"),
      wa("phone").as("phone"),
      joinIfArray(wa("roles"), ", ", wa("role")).as("role"),
      when(col("lastev.eventtype") === EtWorkerDeleted, AgentDeleted)
        .otherwise(AgentActive).as("state"),
      wa("team_id").as("team_id"),
      wa("team_name").as("team_name"),
      wa("team_name_in_hierarchy").as("team_name_in_hierarchy"),
      wa("manager").as("manager"),
      wa("department_id").as("department_id"),
      wa("department_name").as("department_name"),
      wa("department_name_in_hierarchy").as("department_name_in_hierarchy"),
      col("date_joined"),
      when(col("lastev.eventtype") === EtWorkerDeleted, col("lastev.ts_sec"))
        .otherwise(lit(null).cast(TimestampType)).as("date_left"),
      col("lastev.ts_us").as("last_ts_us"),
      col("lastev.event_id").as("last_event_id"))
      .select(agentColumns.map(col) ++
        Seq(col("last_ts_us"), col("last_event_id")): _*)
  }
}
