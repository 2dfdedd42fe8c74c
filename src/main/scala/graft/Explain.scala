package graft

/** Dev-only: dump `.explain("formatted")` for named queries to files —
  * the plan-shape evidence the optimization rounds commit under
  * `plans/` (Exchange count, join strategy, PushedFilters/ReadSchema,
  * WholeStageCodegen spans). Usage:
  *   runMain graft.Explain <sfDir> <outDir> <name> [<name> ...]
  * A name of `all` dumps every declared query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names =
      if (args.drop(2).contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val spark = GraftSession.build()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // same rendering as df.explain("formatted"), captured to a file
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $outDir/$name.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[explain] $name failed: $e")
      }
    }
    spark.stop()
  }
}
