package graft.report

import java.time.ZoneId
import java.time.format.{DateTimeFormatter, FormatStyle}
import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Presentation layer (reference GET / — routes/index.js:5-31,
  * views/index.pug:9-83): locale/timezone-aware short date/time
  * formatting (the Intl.DateTimeFormat equivalents, F10/F11) and the
  * two report projections with 10-char sid display slices (F9/P4).
  *
  * These are the only UDFs in the engine — java.time localized SHORT
  * styles have no builtin expression equivalent; they live strictly at
  * the presentation edge, never in a derivation or oracle path.
  */
object Report {

  /** Intl.DateTimeFormat(locale, {dateStyle:"short", timeZone}). */
  def localeShortDate(locale: String, tz: String): Column => Column = {
    val fmtUdf = udf { ts: java.sql.Timestamp =>
      if (ts == null) null
      else DateTimeFormatter.ofLocalizedDate(FormatStyle.SHORT)
        .withLocale(Locale.forLanguageTag(locale))
        .withZone(ZoneId.of(tz))
        .format(ts.toInstant)
    }
    c => fmtUdf(c)
  }

  /** Intl.DateTimeFormat(locale, {timeStyle:"short", hour12:false,
    * timeZone}) — hour12:false forced via HH:mm pattern over the
    * localized field order. */
  def localeShortTime(locale: String, tz: String): Column => Column = {
    val fmtUdf = udf { ts: java.sql.Timestamp =>
      if (ts == null) null
      else DateTimeFormatter.ofPattern("HH:mm")
        .withLocale(Locale.forLanguageTag(locale))
        .withZone(ZoneId.of(tz))
        .format(ts.toInstant)
    }
    c => fmtUdf(c)
  }

  private def slice10(c: Column): Column = substring(c, 1, 10)

  /** Conversations table (views/index.pug:46-82). */
  def conversationsReport(segments: DataFrame,
      locale: String = "en-US", tz: String = "UTC"): DataFrame = {
    val d = localeShortDate(locale, tz)
    val t = localeShortTime(locale, tz)
    segments.select(
      // raw timestamp + FULL id as sort keys: formatted strings order
      // lexically, and the 10-char display slice is not identifying
      col("date").as("event_ts"),
      col("conversation_id").as("full_conv_id"),
      slice10(col("conversation_id")).as("conv_id"),
      col("segment_kind").as("kind"),
      slice10(col("segment_external_id")).as("seg_id"),
      slice10(col("reservation_sid")).as("res_sid"),
      d(col("date")).as("date"),
      t(col("time")).as("time"),
      col("activity"),
      col("activity_time"),
      col("abandoned").as("aband"),
      col("abandoned_phase").as("aband_phase"),
      col("abandon_time").as("aband_time"),
      col("queue_time"), col("ring_time"), col("talk_time"), col("wrapup_time"))
      // Loki renders insertion order; Spark has none → deterministic
      // CHRONOLOGICAL sort on the raw timestamp, then drop the keys
      .orderBy(col("event_ts"), col("full_conv_id"), col("kind"))
      .drop("event_ts", "full_conv_id")
  }

  private def esc(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** Default row cap for rendered tables — the reference's GET /
    * full-scans both tables per request (routes/index.js:9-10), which
    * is only survivable because LokiJS is in-memory and tiny; here the
    * driver-side collect is bounded BY CONSTRUCTION so no caller can
    * accidentally pull an unbounded frame onto the driver. */
  val DefaultMaxRows: Int = 10000

  private def htmlTable(df: DataFrame, maxRows: Int): String = {
    val cols = df.columns
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    // limit(n+1) so truncation is detectable without a second count job
    val collected = df.limit(maxRows + 1).collect()
    val truncated = collected.length > maxRows
    val rows = collected.take(maxRows).map { r =>
      cols.indices.map(i =>
        s"<td>${esc(Option(r.get(i)).map(_.toString).getOrElse(""))}</td>").mkString
    }.map(cells => s"    <tr>$cells</tr>")
    val note =
      if (truncated)
        s"\n    <tr><td colspan=\"${cols.length}\"><em>truncated at $maxRows rows</em></td></tr>"
      else ""
    val body = if (rows.isEmpty) "    <tr><td><h3>no data yet...</h3></td></tr>"
      else rows.mkString("\n") + note
    s"""  <table style="width:100%" border="1">
       |    <tr>$head</tr>
       |$body
       |  </table>""".stripMargin
  }

  /** The reference's static stylesheet (public/stylesheets/style.css,
    * served by `express.static` — app.js:39 — and linked from every
    * page by views/layout.pug:5). Same three rules, verbatim
    * presentation parity. */
  val Stylesheet: String =
    """body {
      |  padding: 50px;
      |  font: 14px "Lucida Grande", Helvetica, Arial, sans-serif;
      |}
      |
      |a {
      |  color: #00B7FF;
      |}
      |""".stripMargin

  /** layout.pug:5 — every rendered page links the static stylesheet. */
  private val StylesheetLink =
    """<link rel="stylesheet" href="/stylesheets/style.css">"""

  /** The reference's index view (views/index.pug:9-83) as a static
    * HTML document: agent table + conversations table. `maxRows` caps
    * the per-table driver collect; over-cap tables render a visible
    * truncation note row. */
  def renderHtml(agents: DataFrame, conversations: DataFrame,
      title: String = "Express", maxRows: Int = DefaultMaxRows): String =
    s"""<!DOCTYPE html>
       |<html><head><title>${esc(title)}</title>$StylesheetLink</head><body>
       |  <h1>${esc(title)}</h1>
       |  <h2>agent data</h2>
       |${htmlTable(agents, maxRows)}
       |  <h2>conversations data</h2>
       |${htmlTable(conversations, maxRows)}
       |</body></html>
       |""".stripMargin

  /** The reference's error view (views/error.pug under
    * views/layout.pug — h1 message, h2 status, pre stack; app.js:55-64
    * populates the error object in the development env, Express's
    * default when NODE_ENV is unset, so status+stack render). The
    * layout's `title= title` is undefined on the error path — an empty
    * title, reproduced. */
  def renderErrorHtml(status: Int, message: String,
      stack: String = ""): String =
    s"""<!DOCTYPE html>
       |<html><head><title></title>$StylesheetLink</head><body>
       |  <h1>${esc(message)}</h1>
       |  <h2>$status</h2>
       |  <pre>${esc(stack)}</pre>
       |</body></html>
       |""".stripMargin

  /** Agents table (views/index.pug:9-40). */
  def agentsReport(agents: DataFrame,
      locale: String = "en-US", tz: String = "UTC"): DataFrame = {
    val d = localeShortDate(locale, tz)
    agents.select(
      col("agent_uuid").as("full_agent_uuid"),
      slice10(col("agent_uuid")).as("agent_id_display"),
      d(col("date_joined")).as("joined"),
      col("date_left"),
      col("email"),
      col("agent_id").as("external_id"),
      col("role").as("roles"),
      col("team_name"),
      col("department_name"),
      col("manager"),
      col("state").as("status"))
      .orderBy(col("full_agent_uuid"))
      .drop("full_agent_uuid")
  }
}
