package graft

import org.apache.spark.sql.functions._

import graft.operators.ZoneMap

/** Zone-map file skipping: the pruned read must be row-identical to
  * the full-scan filter AND actually skip files — the manifest is only
  * worth storing if both hold. */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  test("pruned read == full scan filter, with files actually skipped") {
    val path = SessionCache.scratchDir(spark, "zonemap-spec")
    Tables.load(spark, sf0001, "orders")
      .repartitionByRange(16, col("o_orderdate"))
      .write.mode("overwrite").parquet(path)

    val manifest = ZoneMap.buildManifest(spark, path, "o_orderdate").collect()
    assert(manifest.length == 16, s"expected 16 files, got ${manifest.length}")
    // range-clustered layout: zones are tight (each file's span is a
    // fraction of the table's) — the precondition for useful skipping
    manifest.foreach { r =>
      assert(r.getAs[Any]("zmin").toString <= r.getAs[Any]("zmax").toString)
    }

    val (df, read, total) =
      ZoneMap.prunedRead(spark, path, "o_orderdate", "1995-01-01", "1995-03-31")
    assert(read < total, s"no files skipped: $read of $total read")
    assert(read > 0)

    val want = Tables.load(spark, sf0001, "orders")
      .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" <= "1995-03-31")
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    val got = df.select($"o_orderkey").as[Long].collect().sorted.toSeq
    assert(got == want, s"pruned read lost/gained rows: ${got.size} vs ${want.size}")
  }

  test("a coarse (single-file) layout degrades to a full read, never wrong rows") {
    val path = SessionCache.scratchDir(spark, "zonemap-spec-coarse")
    Tables.load(spark, sf0001, "orders").coalesce(1)
      .write.mode("overwrite").parquet(path)
    val (df, read, total) =
      ZoneMap.prunedRead(spark, path, "o_orderdate", "1995-01-01", "1995-03-31")
    assert(read == total) // one file spanning everything: nothing to skip
    val want = Tables.load(spark, sf0001, "orders")
      .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" <= "1995-03-31")
      .count()
    assert(df.count() == want)
  }
}
