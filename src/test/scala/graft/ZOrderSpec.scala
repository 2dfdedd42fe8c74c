package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.operators.ZOrder

/** The Z-order PRODUCTION write path: real parquet files, real footer
  * statistics. `q_zorder`'s block stats prove the math against the
  * DuckDB oracle; this spec proves the files on disk carry tight
  * min/max on BOTH dimensions — the property every footer-stats reader
  * (Spark, DuckDB, Trino) prunes on — and that a one-dimensional sort
  * does not. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Per-file (min, max) of an int64 column from the parquet footers. */
  private def footerRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column)
            .map(_.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
        } finally r.close()
      }
  }

  test("z-clustered files: footer min/max tight on BOTH dims; 1-d sort is not") {
    val base = Files.createTempDirectory("graft-zorder").toString
    // x: hash-spread over the full 10-bit domain (sf0.001 has only ~15
    // users, too few to exercise the interleave); y: event hour.
    val df = Tables.load(spark, sf0001, "events")
      .select($"event_id",
        org.apache.spark.sql.functions.expr(
          "abs(hash(event_id)) % 1024").cast("long").as("x"),
        org.apache.spark.sql.functions.expr(
          "(unix_timestamp(ts) div 3600) % 1024").as("y"))

    val zDir = s"$base/z"
    ZOrder.writeClustered(df, "x", "y", zDir, numFiles = 8)
    // baseline: same data, same file count, sorted on x alone
    val xDir = s"$base/x"
    df.repartitionByRange(8, $"x").sortWithinPartitions($"x")
      .write.parquet(xDir)

    // layout must not lose rows, and the write ran without a global
    // row-number (repartitionByRange is the whole ordering machinery)
    assert(spark.read.parquet(zDir).count() == df.count())

    def avgWidth(rs: Seq[(Long, Long)]): Double =
      rs.map { case (lo, hi) => (hi - lo + 1).toDouble }.sum / rs.size
    val zx = footerRanges(zDir, "x"); val zy = footerRanges(zDir, "y")
    val xx = footerRanges(xDir, "x"); val xy = footerRanges(xDir, "y")
    assert(zx.size == 8 && xy.size == 8, s"${zx.size} / ${xy.size} files")

    // occupied domains from the data (x is bounded by the user count,
    // y by the corpus' hour span — not the full 0..1023)
    val Seq(gx, gy) = Seq("x", "y").map { c =>
      val r = df.agg(org.apache.spark.sql.functions.min(c),
        org.apache.spark.sql.functions.max(c)).head
      (r.getLong(1) - r.getLong(0) + 1).toDouble
    }

    // 1-d sort: tight on x, but each file's y spans ~the whole domain
    assert(avgWidth(xy) > 0.85 * gy, s"x-sorted y width ${avgWidth(xy)} vs domain $gy")
    // z-order: BOTH dims well under their domains, and the combined
    // footprint beats the 1-d layout's by a real margin
    assert(avgWidth(zx) < 0.7 * gx, s"z x width ${avgWidth(zx)} vs domain $gx")
    assert(avgWidth(zy) < 0.7 * gy, s"z y width ${avgWidth(zy)} vs domain $gy")
    // worst-dimension exposure (what a point predicate on the bad
    // dimension pays): the 1-d layout leaves one dim ~fully exposed,
    // z-order must cap BOTH well below that
    assert(math.max(avgWidth(zx) / gx, avgWidth(zy) / gy) <
      0.75 * math.max(avgWidth(xx) / gx, avgWidth(xy) / gy),
      s"z ${avgWidth(zx)}/${avgWidth(zy)} vs x-sort ${avgWidth(xx)}/${avgWidth(xy)}")
    // and the combined footprint still beats the 1-d layout's
    assert(avgWidth(zx) / gx + avgWidth(zy) / gy <
      avgWidth(xx) / gx + avgWidth(xy) / gy,
      s"z ${avgWidth(zx)}/${avgWidth(zy)} vs x-sort ${avgWidth(xx)}/${avgWidth(xy)}")

    // the pruning effect: a predicate on EITHER dimension must skip
    // files by footer range alone (probe the lowest quartile)
    def hits(rs: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      rs.count { case (mn, mx) => mx >= lo && mn <= hi }
    val x0 = zx.map(_._1).min; val y0 = zy.map(_._1).min
    assert(hits(zx, x0, x0 + (gx / 4).toLong) < 8, "x quartile should skip z files")
    assert(hits(zy, y0, y0 + (gy / 4).toLong) < 8, "y quartile should skip z files")
  }
}
