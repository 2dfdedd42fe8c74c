package graft.report

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.taskrouter.{Derivation, Ingest, Synth}

/** Runnable equivalent of the reference's report page (`GET /`,
  * routes/index.js:5-31 + views/index.pug): derive the reporting model
  * and write the agent + conversations tables as a static HTML file.
  *
  * Usage:
  *   runMain graft.report.ReportMain <input> <out.html> [locale] [tz]
  *
  * `<input>` is either a directory of CloudEvent JSON lines (what the
  * reference receives over HTTP) or a testdata sf directory
  * (`events.parquet` present — the synthesized scenario set is derived
  * instead, handy for a demo render).
  */
object ReportMain {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val locale = args.lift(2).getOrElse("en-US")
    val tz = args.lift(3).getOrElse("UTC")
    val spark = graft.GraftSession.build()
    val (segments, agents) =
      if (new java.io.File(in, "events.parquet").exists())
        (Synth.segments(spark, in), Synth.agents(spark, in))
      else {
        import spark.implicits._
        val parsed = Ingest.parseJson(spark, spark.read.textFile(in))
        (Derivation.segments(parsed), Derivation.agents(parsed))
      }
    val html = Report.renderHtml(
      Report.agentsReport(agents, locale, tz),
      Report.conversationsReport(segments, locale, tz))
    Files.write(Paths.get(out), html.getBytes(StandardCharsets.UTF_8))
    println(s"[report] wrote $out")
    spark.stop()
  }
}
