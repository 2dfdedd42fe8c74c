package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump every selected query's result to `outDir/<name>` — the loop
    * shared by the driver-contract main and [[DeterminismSweep]]
    * (which calls it twice on ONE session to compare a cold and a
    * memoization-warm pass). */
  private[graft] def dump(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String, only: Set[String] = Set.empty): Unit = {
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Manifest of INTENDED queries, written before anything runs: the
    // determinism compare checks every dump against it, so a query
    // that throws in EVERY pass (and so has no result dir anywhere)
    // still surfaces as missing instead of silently shrinking the
    // compared surface — the q_mix_divergence failure mode.
    Files.writeString(Paths.get(s"$outDir/_manifest.json"),
      selected.keys.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]"))
    // One retry per query, both attempts logged AND recorded in the
    // _failures.json artifact: a DETERMINISTIC defect fails twice and
    // still zeroes the query (the gate is preserved), but a one-off
    // environmental blip recovers with a visible record instead of
    // silently costing the round a correctness cell. The artifact also
    // makes "did anything fail?" answerable from the dump dir alone —
    // in r15 an hour went to reconstructing exactly that from lost
    // scrollback (the answer was no; a stale dump dir had been read
    // mid-run).
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      def attempt(): Unit = fn(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      try attempt()
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed (attempt 1): $e")
        failures += s"""{"q":"$name","attempt":1,"error":${jsonStr(e.toString)}}"""
        try attempt()
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name failed (attempt 2): $e2")
          failures += s"""{"q":"$name","attempt":2,"error":${jsonStr(e2.toString)}}"""
        }
      }
    }
    Files.writeString(Paths.get(s"$outDir/_failures.json"),
      failures.mkString("[", ",", "]"))
  }

  /** JSON string escape shared by the failure record and oracle dump. */
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // Optional extra args: run only the named queries (dev loop); the
    // driver always passes exactly (sfDir, outDir) and gets the full dump.
    val only = args.drop(2).toSet
    val spark = GraftSession.build()
    dump(spark, sfDir, outDir, only)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
