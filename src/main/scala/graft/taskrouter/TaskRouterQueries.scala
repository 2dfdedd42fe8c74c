package graft.taskrouter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries running the FULL TaskRouter derivation
  * pipeline (Synth → Ingest → Derivation) with analytic DuckDB oracles
  * that recompute the expected segments/agents directly from the
  * scenario formulas — none of our window/join machinery appears in the
  * oracle, so a hash match verifies the machinery itself.
  */
object TaskRouterQueries {

  private def ep(c: org.apache.spark.sql.Column) = unix_timestamp(c)

  /** Happy-path conversations: QUEUE + CONVERSATION [IN PROGRESS].
    * Filter on segment_external_id (always the task sid) because
    * conversation_id may be overridden by custom attributes. */
  def qTrConversations(spark: SparkSession, dir: String): DataFrame =
    Synth.segments(spark, dir)
      .filter(col("segment_external_id").startsWith("WTP"))
      .select(col("conversation_id"), col("segment_kind"),
        col("queue_time"), col("ring_time"), col("talk_time"), col("wrapup_time"),
        ep(col("date")).as("date_ep"),
        col("channel"), col("direction"), col("external_contact"),
        col("queue"), col("workflow"), col("abandoned"))
      .orderBy(col("conversation_id"), col("segment_kind"))

  /** Abandoned-in-queue pairs. */
  def qTrAbandoned(spark: SparkSession, dir: String): DataFrame =
    Synth.segments(spark, dir)
      .filter(col("segment_external_id").startsWith("WTA"))
      .select(col("conversation_id"), col("segment_kind"),
        col("queue_time"), col("abandon_time"),
        col("abandoned"), col("abandoned_phase"), ep(col("date")).as("date_ep"))
      .orderBy(col("conversation_id"), col("segment_kind"))

  /** Failed reservations: REJECTED / MISSED / REVOKED. */
  def qTrFailed(spark: SparkSession, dir: String): DataFrame =
    Synth.segments(spark, dir)
      .filter(col("segment_external_id").startsWith("WTF"))
      .select(col("conversation_id"), col("segment_kind"),
        col("ring_time"), ep(col("date")).as("date_ep"), col("queue"))
      .orderBy(col("conversation_id"), col("segment_kind"))

  /** Agent status spans (W1 machine). */
  def qTrAgentSpans(spark: SparkSession, dir: String): DataFrame =
    Synth.segments(spark, dir)
      .filter(col("agent_uuid").startsWith("WA") &&
        col("segment_kind").isin(Model.AgentStatus, Model.AgentStatusInProgress))
      .select(col("agent_uuid"), col("segment_kind"), col("activity"),
        col("activity_time"), ep(col("date")).as("date_ep"))
      .orderBy(col("agent_uuid"), col("date_ep"), col("activity"),
        coalesce(col("activity_time"), lit(-1L)))

  /** Agent dimension (SCD-1 last state). */
  def qTrAgents(spark: SparkSession, dir: String): DataFrame =
    Synth.agents(spark, dir)
      .select(col("agent_uuid"), col("email"), col("role"), col("team_name"),
        col("state"), ep(col("date_joined")).as("date_joined_ep"),
        ep(col("date_left")).as("date_left_ep"))
      .orderBy(col("agent_uuid"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tr_conversations" -> qTrConversations,
    "q_tr_abandoned" -> qTrAbandoned,
    "q_tr_failed" -> qTrFailed,
    "q_tr_agent_spans" -> qTrAgentSpans,
    "q_tr_agents" -> qTrAgents
  )

  /** Shared scenario-parameter CTE prologue for the oracles. */
  private def base(eventType: String, prefix: String): String =
    s"""WITH p AS (
       |  SELECT '$prefix' || event_id AS conversation_id,
       |         user_id,
       |         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t0,
       |         CAST(floor(value) AS BIGINT) AS v
       |  FROM events WHERE event_type = '$eventType')""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_tr_conversations" -> (base("purchase", "WTP") +
      """, d AS (
        |  SELECT *, v%7+1 AS c, v%7+1 + v%13+5 AS a,
        |         (v%5 <> 0) AS has_cp, (v%5 <> 0 AND v%3 <> 0) AS has_w,
        |         (v%6 = 0) AS has_custom
        |  FROM p),
        |e AS (
        |  SELECT *, a + v%50+10 AS wp,
        |         CASE WHEN has_w THEN a + v%50+10 + v%20+3 ELSE a + v%50+13 END AS cp,
        |         CASE WHEN has_custom THEN replace(conversation_id, 'WTP', 'CX')
        |              ELSE conversation_id END AS conv_id_out,
        |         CASE WHEN v%2=0 THEN 'Call' ELSE 'Chat' END AS channel,
        |         CASE WHEN v%3=0 THEN 'Inbound' WHEN v%3=1 THEN 'Outbound' ELSE 'Internal' END AS direction,
        |         CASE WHEN v%3=1 THEN '+1555' ELSE '+1666' END AS external_contact,
        |         -- custom queue is '' → JS-falsy → falls back to queue name
        |         'Q' || (v%4) AS queue, 'Main' AS workflow,
        |         CASE WHEN has_custom THEN 'Yes' ELSE 'N' END AS abandoned
        |  FROM d)
        |SELECT conv_id_out AS conversation_id, 'QUEUE' AS segment_kind,
        |       a AS queue_time, CAST(NULL AS BIGINT) AS ring_time,
        |       CAST(NULL AS BIGINT) AS talk_time, CAST(NULL AS BIGINT) AS wrapup_time,
        |       t0 AS date_ep, channel, direction, external_contact, queue, workflow, abandoned
        |FROM e
        |UNION ALL
        |SELECT conv_id_out,
        |       CASE WHEN has_cp THEN 'CONVERSATION' ELSE 'CONVERSATION IN PROGRESS' END,
        |       a, a - c,
        |       CASE WHEN has_cp THEN (CASE WHEN has_w THEN wp - a ELSE cp - a END) END,
        |       CASE WHEN has_cp THEN (CASE WHEN has_w THEN cp - wp ELSE 0 END) END,
        |       t0 + a, channel, direction, external_contact, queue, workflow, abandoned
        |FROM e
        |ORDER BY conversation_id, segment_kind""".stripMargin),

    "q_tr_abandoned" -> (base("error", "WTA") +
      """, d AS (SELECT *, v%60+5 AS dd FROM p)
        |SELECT conversation_id, 'QUEUE' AS segment_kind,
        |       dd AS queue_time, dd AS abandon_time,
        |       'Yes' AS abandoned, 'Queue' AS abandoned_phase, t0 AS date_ep
        |FROM d
        |UNION ALL
        |SELECT conversation_id, 'CONVERSATION', dd, dd, 'Yes', 'Queue', t0 + dd
        |FROM d
        |ORDER BY conversation_id, segment_kind""".stripMargin),

    "q_tr_failed" -> (base("click", "WTF") +
      """, d AS (
        |  SELECT *, v%7+1 AS c, v%7+1 + v%11+2 AS r,
        |         CASE v%4 WHEN 0 THEN 'REJECTED CONVERSATION'
        |                  WHEN 1 THEN 'MISSED CONVERSATION'
        |                  WHEN 2 THEN 'MISSED CONVERSATION'
        |                  ELSE 'REVOKED CONVERSATION' END AS segment_kind
        |  FROM p)
        |SELECT conversation_id, segment_kind,
        |       r - c AS ring_time, t0 + r AS date_ep, 'Q' || (v%4) AS queue
        |FROM d
        |ORDER BY conversation_id, segment_kind""".stripMargin),

    "q_tr_agent_spans" ->
      """WITH s AS (
        |  SELECT 'WA' || user_id AS agent_uuid,
        |         CAST(floor(value) AS BIGINT) AS v,
        |         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t0,
        |         row_number() OVER w AS rn,
        |         lead(CAST(floor(value) AS BIGINT)) OVER w AS next_v,
        |         (lead(ts) OVER w IS NOT NULL) AS closed
        |  FROM events WHERE event_type = 'signup'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT agent_uuid,
        |       CASE WHEN closed THEN 'AGENT STATUS' ELSE 'AGENT STATUS IN PROGRESS' END AS segment_kind,
        |       'ACT' || (v%5) AS activity,
        |       CASE WHEN closed THEN next_v WHEN rn = 1 THEN v END AS activity_time,
        |       t0 AS date_ep
        |FROM s
        |ORDER BY agent_uuid, date_ep, activity, coalesce(CASE WHEN closed THEN next_v WHEN rn = 1 THEN v END, -1)""".stripMargin,

    "q_tr_agents" ->
      """SELECT 'WA' || user_id AS agent_uuid,
        |       'u' || user_id || '@x.co' AS email,
        |       'agent' AS role,
        |       'T' || (user_id % 3) AS team_name,
        |       CASE WHEN user_id % 5 = 0 THEN 'Deleted' ELSE 'Active' END AS state,
        |       min(CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)) AS date_joined_ep,
        |       CASE WHEN user_id % 5 = 0
        |            THEN max(CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)) + 60 END AS date_left_ep
        |FROM events WHERE event_type = 'signup'
        |GROUP BY user_id
        |ORDER BY agent_uuid""".stripMargin
  )
}
