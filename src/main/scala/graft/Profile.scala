package graft


/** Dev profiling entry point: time named queries with repeats to
  * separate one-time materialization (shared caches, codegen) from
  * steady-state cost. Usage:
  *   runMain graft.Profile <sfDir> <repeats> <name> [<name> ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.build()
    for (name <- names; i <- 1 to repeats) {
      val t0 = System.nanoTime()
      // same noop write as Bench: count() would let Catalyst prune the
      // projections and sorts being profiled
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run#$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
