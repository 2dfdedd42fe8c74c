package graft

import java.nio.file.Files

import graft.sources.Compaction

/** Compaction: file count shrinks to the byte-sized target, content is
  * preserved exactly, and the swap leaves no temp debris. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compacts many small files into one; rows preserved; no debris") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = spark.range(10000).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.expr("id * 3"))
    df.repartition(20).write.parquet(dir)
    assert(Compaction.parquetFileCount(spark, dir) == 20)

    val (before, after) = Compaction.compact(spark, dir) // target >> data
    assert(before == 20 && after == 1, s"$before -> $after")

    val back = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    assert(back == (0L until 10000L).map(i => (i, i * 3)).toSet)
    // no temp/old dirs left behind
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName).toSet
    assert(parent == Set("t"), parent)
  }

  test("recovers from a crash between the swap renames (live dir missing)") {
    val dir = Files.createTempDirectory("graft-compact3").toString + "/t"
    spark.range(1000).toDF("id").repartition(4).write.parquet(dir)
    // Simulate a run that died after `live -> old` but before
    // `tmp -> live`: data only under .compact-old, stale compacted
    // copy under .compact-tmp, live dir gone.
    val live = new java.io.File(dir)
    val old = new java.io.File(dir + ".compact-old")
    val tmp = new java.io.File(dir + ".compact-tmp")
    assert(live.renameTo(old))
    tmp.mkdirs()
    Files.writeString(tmp.toPath.resolve("part-stale.parquet"), "junk")
    assert(!live.exists())

    // compact() must restore old -> live, discard tmp, then compact.
    val (before, after) = Compaction.compact(spark, dir)
    assert(before == 4 && after == 1, s"$before -> $after")
    assert(spark.read.parquet(dir).count() == 1000)
    val parent = live.getParentFile.listFiles().map(_.getName).toSet
    assert(parent == Set("t"), parent)
  }

  test("target size splits output into multiple files") {
    val dir = Files.createTempDirectory("graft-compact2").toString + "/t"
    spark.range(50000).toDF("id").repartition(10).write.parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (_, after) = Compaction.compact(spark, dir, targetBytes = bytes / 3)
    assert(after >= 2 && after <= 6, s"after=$after")
    assert(spark.read.parquet(dir).count() == 50000)
  }
}
