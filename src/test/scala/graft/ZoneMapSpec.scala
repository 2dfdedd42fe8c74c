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

  test("incremental manifest == scan-based rebuild; replay discarded; pruning intact") {
    val base = SessionCache.scratchDir(spark, "zonemap-spec-inc")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    val o = Tables.load(spark, sf0001, "orders")
      .repartitionByRange(4, col("o_orderdate"))
    ZoneMap.appendBatch(o.filter($"o_orderkey" % 2 === 0), base, "o_orderdate", 0L)
    ZoneMap.appendBatch(o.filter($"o_orderkey" % 2 === 1), base, "o_orderdate", 1L)
    // replay of an applied batch: discarded, no duplicate stats rows
    ZoneMap.appendBatch(o.filter($"o_orderkey" % 2 === 1), base, "o_orderdate", 1L)

    // maintained manifest == scan-based backfill over the same data
    val stored = ZoneMap.readManifest(spark, base).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Any]("zmin").toString,
        r.getAs[Any]("zmax").toString, r.getAs[Long]("n_rows"))).toSet
    val rebuilt = ZoneMap.buildManifest(spark, s"$base/data", "o_orderdate")
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Any]("zmin").toString,
        r.getAs[Any]("zmax").toString, r.getAs[Long]("n_rows"))).toSet
    assert(stored == rebuilt,
      s"stored ${stored.size} vs rebuilt ${rebuilt.size}")

    // stored-manifest pruning: same rows as the direct filter
    val (df, read, total) =
      ZoneMap.prunedReadStored(spark, base, "o_orderdate",
        "1995-01-01", "1995-03-31")
    assert(read > 0 && read <= total)
    val want = Tables.load(spark, sf0001, "orders")
      .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" <= "1995-03-31")
      .count()
    assert(df.count() == want)
  }

  test("streaming foreachBatch maintenance: stored manifest == rebuild over the fed data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = SessionCache.scratchDir(spark, "zonemap-spec-stream")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    val input = MemoryStream[(Long, String)]
    val q = ZoneMap.streamingAppend(
      input.toDF().toDF("o_orderkey", "o_orderdate"),
      base, "o_orderdate", s"$base-ckpt")
    try {
      input.addData((1L, "1995-01-10"), (2L, "1995-02-20"))
      q.processAllAvailable()
      input.addData((3L, "1995-06-15"), (4L, "1996-01-05"))
      q.processAllAvailable()
    } finally q.stop()
    val stored = ZoneMap.readManifest(spark, base).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Any]("zmin").toString,
        r.getAs[Any]("zmax").toString, r.getAs[Long]("n_rows"))).toSet
    val rebuilt = ZoneMap.buildManifest(spark, s"$base/data", "o_orderdate")
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Any]("zmin").toString,
        r.getAs[Any]("zmax").toString, r.getAs[Long]("n_rows"))).toSet
    assert(stored == rebuilt && stored.nonEmpty)
    val (df, read, total) = ZoneMap.prunedReadStored(
      spark, base, "o_orderdate", "1995-01-01", "1995-03-31")
    assert(read < total, s"$read of $total")
    assert(df.select($"o_orderkey").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("headline path plans from the stored manifest: a vanished non-overlapping file is never opened") {
    // qZonemapScan's exact staging + read path: write-time manifest,
    // prunedReadFlat. Moving a non-surviving data file OUT of the
    // table after staging proves the query never scans the table to
    // plan (a scan-based build would fail or silently lose the file's
    // stats; the stored manifest never opens the vanished file).
    val path = ZoneMap.clusteredOrders(spark, sf0001)
    val (lo, hi) = ("1995-01-01", "1995-03-31")
    val manifest = spark.read.parquet(ZoneMap.flatManifestDir(path)).collect()
    val nonSurvivor = manifest
      .filter(r => r.getAs[Any]("zmax").toString < lo ||
        r.getAs[Any]("zmin").toString > hi)
      .map(r => r.getAs[String]("file")).head
    val f = new java.io.File(new java.net.URI(nonSurvivor))
    val hidden = new java.io.File(f.getParent, ".vanished-" + f.getName)
    assert(f.renameTo(hidden), s"couldn't move $f")
    try {
      val (df, read, total) =
        ZoneMap.prunedReadFlat(spark, path, "o_orderdate", lo, hi)
      assert(read < total)
      val want = Tables.load(spark, sf0001, "orders")
        .filter($"o_orderdate" >= lo && $"o_orderdate" <= hi)
        .select($"o_orderkey").as[Long].collect().sorted.toSeq
      val got = df.select($"o_orderkey").as[Long].collect().sorted.toSeq
      assert(got == want)
    } finally { hidden.renameTo(f); () }
  }

  test("torn staging heals: a table dir without its manifest is rebuilt, not wedged") {
    // the r9 ADVICE hazard: parquet write and manifest write are two
    // non-atomic steps — a crash between them used to leave a dir that
    // forever skipped the rebuild while prunedReadFlat threw. The r10
    // guard checks BOTH artifacts.
    val path = ZoneMap.clusteredOrders(spark, sf0001)
    val manifestDir = new java.io.File(ZoneMap.flatManifestDir(path))
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    deleteRec(manifestDir) // simulate the crash window
    assert(!manifestDir.exists())
    val healed = ZoneMap.clusteredOrders(spark, sf0001) // must rebuild
    assert(healed == path)
    assert(manifestDir.exists(), "manifest not rebuilt after torn state")
    val (df, read, total) = ZoneMap.prunedReadFlat(
      spark, path, "o_orderdate", "1995-01-01", "1995-03-31")
    assert(read <= total && df.count() > 0)
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
