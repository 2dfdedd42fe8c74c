package graft

import org.apache.spark.sql.functions._

import graft.report.Report
import graft.taskrouter.Synth

class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("locale short date/time formatting matches Intl semantics") {
    val df = Seq(java.sql.Timestamp.from(java.time.Instant.parse("2026-08-12T14:05:00Z")))
      .toDF("ts")
    val us = df.select(
      Report.localeShortDate("en-US", "UTC")($"ts").as("d"),
      Report.localeShortTime("en-US", "UTC")($"ts").as("t")).head
    assert(us.getString(0) == "8/12/26")   // en-US short date
    assert(us.getString(1) == "14:05")     // hour12:false
    val de = df.select(
      Report.localeShortDate("de-DE", "Europe/Berlin")($"ts").as("d"),
      Report.localeShortTime("de-DE", "Europe/Berlin")($"ts").as("t")).head
    assert(de.getString(0) == "12.08.26")  // de-DE short date
    assert(de.getString(1) == "16:05")     // UTC+2 in August
  }

  test("conversations report has the pug column set with sliced sids") {
    val rep = Report.conversationsReport(Synth.segments(spark, sf0001))
    assert(rep.columns.toSeq == Seq("conv_id", "kind", "seg_id", "res_sid",
      "date", "time", "activity", "activity_time", "aband", "aband_phase",
      "aband_time", "queue_time", "ring_time", "talk_time", "wrapup_time"))
    val rows = rep.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("conv_id").length <= 10)
      assert(r.getAs[String]("res_sid").length <= 10)
    }
  }

  test("agents report mirrors the pug agent table") {
    val rep = Report.agentsReport(Synth.agents(spark, sf0001))
    assert(rep.columns.contains("joined") && rep.columns.contains("status"))
    val rows = rep.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(Set("Active", "Deleted").contains(r.getAs[String]("status"))))
  }

  test("renderHtml writes both pug tables with one row per record, escaped") {
    val agents = Report.agentsReport(Synth.agents(spark, sf0001))
    val convos = Report.conversationsReport(Synth.segments(spark, sf0001))
    val html = Report.renderHtml(agents, convos)
    assert(html.contains("<h2>agent data</h2>"))
    assert(html.contains("<h2>conversations data</h2>"))
    assert(html.contains("<th>queue_time</th>") && html.contains("<th>status</th>"))
    val rows = html.split("<tr>").length - 1
    // 2 header rows + a data row per agent/segment
    assert(rows == 2 + agents.count() + convos.count())
    assert(!html.contains("<script"))
  }

  test("renderHtml maxRows bounds the driver collect with a visible note") {
    val big = spark.range(100).select(
      $"id".cast("string").as("a"), lit("x").as("b"))
    val html = Report.renderHtml(big, big, maxRows = 7)
    assert(html.contains("truncated at 7 rows"))
    // 2 header rows + 7 data rows per table + 1 note row per table
    assert(html.split("<tr>").length - 1 == 2 + 2 * (7 + 1))
    // under the cap: no note
    val small = Report.renderHtml(big.limit(3), big.limit(3), maxRows = 7)
    assert(!small.contains("truncated"))
  }
}
