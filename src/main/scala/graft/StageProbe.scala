package graft

/** Dev-only: phase-by-phase timing of the TaskRouter staging pipeline. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build()
    sys.env.get("PROBE_WSCG").foreach(v =>
      spark.conf.set("spark.sql.codegen.wholeStage", v))
    sys.env.get("PROBE_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"[job] ${e.jobId}: ${(System.nanoTime() - jobStarts.get(e.jobId)) / 1e9}%.2f s")
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.taskrouter._
    val ce = t("cloudEvents plan")(Synth.cloudEvents(spark, dir))
    val parsed = t("parse plan")(Ingest.parse(ce))
    val stagedPlan = t("stagedEvents plan")(Derivation.stagedEvents(parsed))
    t("stagedAll analyzed")(stagedPlan.queryExecution.analyzed)
    t("stagedAll optimized")(stagedPlan.queryExecution.optimizedPlan)
    t("stagedAll executedPlan")(stagedPlan.queryExecution.executedPlan)
    // same cache key as Synth.stagedAll → Synth.segments below reuses it
    val staged = t("stagedAll exec+write")(
      SessionCache.checkpointed(spark, s"synth.stagedall|$dir")(stagedPlan))
    val segPlan = t("segments plan")(Derivation.segmentsFromStaged(staged))
    val seg = t("segments exec+write")(Synth.segments(spark, dir))
    t("segments count")(seg.count())
    t("agents")(Synth.agents(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
