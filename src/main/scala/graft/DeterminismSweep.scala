package graft

/** Determinism sweep half A: dump the full query surface TWICE on one
  * session — pass 1 cold (stage tables built as it goes), pass 2 warm
  * (every SessionCache memoization hit). `scripts/determinism_sweep.sh`
  * pairs this with a separate fresh-JVM `graft.Verify` run and diffs
  * all three dumps per query: the staging/memoization layer is
  * load-bearing for bench numbers AND driver hashes, so cold-vs-warm
  * and JVM-cold reproducibility are proven artifacts, not assumptions.
  *
  * Usage: runMain graft.DeterminismSweep <sfDir> <outBase>
  * writes <outBase>/cold and <outBase>/warm.
  */
object DeterminismSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outBase = args(1)
    val spark = GraftSession.build()
    Verify.dump(spark, sfDir, s"$outBase/cold")
    Verify.dump(spark, sfDir, s"$outBase/warm")
    spark.stop()
  }
}
