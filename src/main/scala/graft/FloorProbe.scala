package graft

/** Dev-only: dissect the per-query fixed cost ("the 0.9 s floor") of a
  * named query into construct / analyze / optimize / physical-plan /
  * execute phases, with repeats to separate first-touch (JIT, codegen,
  * session staging) from steady state. Usage:
  *   runMain graft.FloorProbe <sfDir> <repeats> <name> [<name> ...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.build()
    // env-driven config sweeps, StageProbe-style (dev-only)
    // split("=", 2): conf VALUES may themselves contain '=' (ADVICE r15)
    sys.env.get("PROBE_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k, v)
        case _ => System.err.println(s"[floor] ignoring malformed PROBE_CONF entry: $kv")
      }
    })
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobT0.put(e.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        // Option-guard: a missed start event would NPE on unboxing and
        // the listener bus would swallow it, corrupting the probe output
        Option(jobT0.remove(e.jobId)).foreach { t0 =>
          println(f"[floor-job] job ${e.jobId}: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
        }
      }
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); ()
      }
    })
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    for (name <- names; i <- 1 to repeats) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tConstruct = ms(t0)
      val qe = df.queryExecution
      val t1 = System.nanoTime(); qe.analyzed; val tAnalyze = ms(t1)
      val t2 = System.nanoTime(); qe.optimizedPlan; val tOptimize = ms(t2)
      val t3 = System.nanoTime(); qe.executedPlan; val tPhysical = ms(t3)
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t4 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = ms(t4)
      println(f"[floor] $name run#$i construct=$tConstruct%.0f analyze=$tAnalyze%.0f optimize=$tOptimize%.0f physical=$tPhysical%.0f exec=$tExec%.0f total=${ms(t0)}%.0f ms jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
    }
    spark.stop()
  }
}
