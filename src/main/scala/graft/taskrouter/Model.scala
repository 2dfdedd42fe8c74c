package graft.taskrouter

import org.apache.spark.sql.types._

/** Schemas + constants for the TaskRouter CloudEvent reporting model.
  *
  * Mirrors the reference's implicit schemas: event-type constants
  * (reference routes/events.js:41-56), segment kinds (:26-35), agent
  * states (:58-60), the CloudEvent envelope (:487-501) and the
  * TaskRouter payload fields actually read (:338-352).
  */
object Model {

  // Segment kinds (reference routes/events.js:26-35)
  val QueueSegment = "QUEUE"
  val ConvoSeg = "CONVERSATION"
  val ConvoInProgSeg = "CONVERSATION IN PROGRESS"
  val ConvoRejected = "REJECTED CONVERSATION"
  val ConvoMissed = "MISSED CONVERSATION"
  val ConvoRevoked = "REVOKED CONVERSATION"
  val AgentStatus = "AGENT STATUS"
  val AgentStatusInProgress = "AGENT STATUS IN PROGRESS"

  // Product family gate (reference routes/events.js:38)
  val TaskRouterPrefix = "com.twilio.taskrouter"

  // Event types (reference routes/events.js:41-56)
  val EtTaskQueueEntered = "task-queue.entered"
  val EtTaskTransferInitiated = "task.transfer-initiated"
  val EtReservationCreated = "reservation.created"
  val EtReservationAccepted = "reservation.accepted"
  val EtReservationRejected = "reservation.rejected"
  val EtReservationTimeout = "reservation.timeout"
  val EtReservationCanceled = "reservation.canceled"
  val EtReservationRescinded = "reservation.rescinded"
  val EtReservationWrapup = "reservation.wrapup"
  val EtReservationCompleted = "reservation.completed"
  val EtTaskCanceled = "task.canceled"
  val EtTaskTransferFailed = "task.transfer-failed"
  val EtWorkerCreated = "worker.created"
  val EtWorkerDeleted = "worker.deleted"
  val EtWorkerActivityUpdated = "worker.activity.update"
  val EtWorkerAttributesUpdated = "worker.attributes.update"

  // Agent states (reference routes/events.js:58-60)
  val AgentActive = "Active"
  val AgentDeleted = "Deleted"

  /** Payload fields the reference reads (routes/events.js:338-352; the
    * two *_attributes fields arrive as JSON strings — :492-497). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("eventtype", StringType),
    StructField("timestamp", StringType), // ISO-8601
    StructField("task_sid", StringType),
    StructField("reservation_sid", StringType),
    StructField("worker_sid", StringType),
    StructField("task_attributes", StringType),   // JSON blob
    StructField("worker_attributes", StringType), // JSON blob
    StructField("task_completed_reason", StringType),
    StructField("task_canceled_reason", StringType),
    StructField("task_channel_unique_name", StringType),
    StructField("workflow_name", StringType),
    StructField("task_queue_name", StringType),
    StructField("task_queue_sid", StringType),
    StructField("worker_activity_name", StringType),
    StructField("worker_time_in_previous_activity", LongType)
  ))

  /** CloudEvent envelope (reference routes/events.js:678-687, FIXTURES §A.1). */
  val cloudEventSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("data", StructType(Seq(
      StructField("payload", payloadSchema),
      StructField("publisher_metadata", StructType(Seq(
        StructField("account_sid", StringType)))),
      StructField("test_id", StringType)
    )))
  ))

  /** Known keys inside task_attributes beyond `conversations`
    * (reference routes/events.js:443-444, :473, :582). */
  val taskAttributesSchema: StructType = StructType(Seq(
    StructField("conversations", MapType(StringType, StringType)),
    StructField("direction", StringType),
    StructField("from", StringType),
    StructField("to", StringType),
    StructField("reason", StringType)
  ))

  /** Numeric ("fact") segment columns — custom-data values are cast to
    * long (reference keeps raw JS values; we pin LongType, SURVEY §1.3). */
  val factColumns: Seq[String] = Seq(
    "activity_time", "abandon_time", "queue_time", "ring_time",
    "talk_time", "wrapup_time", "time_in_seconds", "agent_talk_time",
    "longest_silence_before_agent", "longest_talk_by_agent",
    "silence_time", "cross_talk_time", "customer_talk_time",
    "longest_silence_before_customer", "longest_talk_by_customer",
    "hold_time", "average_response_time", "first_response_time",
    "focus_time", "ivr_time", "priority")

  /** String attribute columns fed straight from custom data with no
    * fallback (reference routes/events.js:357-484). */
  val passthroughCustomColumns: Seq[String] = Seq(
    "abandoned_phase", "campaign", "case",
    "content",
    "conversation_attribute_1", "conversation_attribute_2",
    "conversation_attribute_3", "conversation_attribute_4",
    "conversation_attribute_5", "conversation_attribute_6",
    "conversation_attribute_7", "conversation_attribute_8",
    "conversation_attribute_9", "conversation_attribute_10",
    "conversation_label_1", "conversation_label_2",
    "conversation_label_3", "conversation_label_4",
    "conversation_label_5", "conversation_label_6",
    "conversation_label_7", "conversation_label_8",
    "conversation_label_9", "conversation_label_10",
    "destination", "followed_by",
    "hang_up_by", "in_business_hours", "initiated_by", "initiative",
    "ivr_path", "language", "order", "preceded_by", "productive",
    "segment_link", "service_level", "source", "virtual")

  /** Full ordered segment column list (uuid first, then the reference's
    * projection order routes/events.js:357-484). */
  val segmentColumns: Seq[String] =
    Seq("uuid", "segment_kind",
      "conversation_id", "segment_external_id", "reservation_sid", "agent_uuid") ++
      factColumns ++
      Seq("date", "time", "abandoned", "activity", "channel", "direction",
        "external_contact",
        "handling_department_id", "handling_department_name",
        "handling_department_name_in_hierarchy",
        "handling_team_id", "handling_team_name",
        "handling_team_name_in_hierarchy",
        "outcome", "queue", "workflow") ++
      passthroughCustomColumns

  /** Base segment row schema (segmentColumns minus uuid/segment_kind) —
    * used by the streaming layer's JSON round-trip of the base
    * projection through typed state machines. */
  lazy val baseSchema: StructType = StructType(segmentColumns.drop(2).map {
    case n if factColumns.contains(n) => StructField(n, LongType)
    case n @ ("date" | "time") => StructField(n, TimestampType)
    case n => StructField(n, StringType)
  })

  /** Agent dimension columns (reference routes/events.js:263-295 +
    * date_joined/date_left/state :230-246). */
  val agentColumns: Seq[String] = Seq(
    "agent_uuid", "attribute_1", "attribute_2", "attribute_3", "email",
    "agent_id", "location", "phone", "role", "state", "team_id",
    "team_name", "team_name_in_hierarchy", "manager", "department_id",
    "department_name", "department_name_in_hierarchy",
    "date_joined", "date_left")
}
