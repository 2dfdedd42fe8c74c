package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.sources.WarcLite
import graft.text.{HtmlExtract, TextAnalysis}

/** Round-13 operators: HTML main-content extraction (planted fixtures
  * + whole-corpus brute replay), the WARC-lite container round trip,
  * and the four audit twins' invariants re-derived brute-force. */
class R13OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- Scala brute replay of the extraction rule ---------------------

  // md5hex comes from SparkSpec (shared across specs since r12)

  /** The extractor's semantics, independently: strip tags per line,
    * keep iff >=30 visible chars and <=1 link per 25 chars. */
  private def extractScala(page: String): (Long, Long, Long, Long, Long, String) = {
    val parsed = page.split("\n", -1).toSeq.map { l =>
      val txt = l.replaceAll("<[^>]*>", "")
      val nLinks = (l.length - l.replace("<a href", "").length) / 7
      (txt, nLinks)
    }
    val kept = parsed.filter { case (t, n) => t.length >= 30 && n * 25 <= t.length }
    val total = parsed.map(_._1.length.toLong).sum
    val keptChars = kept.map(_._1.length.toLong).sum
    val ppm = if (total > 0) (total - keptChars) * 1000000L / total else 0L
    (parsed.size.toLong, kept.size.toLong, total, keptChars, ppm,
      md5hex(kept.map(_._1).mkString(" ")))
  }

  /** The synthesized page, independently (mirrors [[HtmlExtract.htmlView]]). */
  private def synthScala(id: Long, text: String): String = {
    val nav = "<a href=\"/home\">home</a> <a href=\"/about\">about</a> <a href=\"/tags\">tags</a> " * (1 + id % 4).toInt
    val content =
      if (id % 97 == 0) ""
      else text.split("\\. ", -1).map(s => s"<p>$s</p>").mkString("\n")
    s"""<html><head><title>Doc $id</title><style>.x{color:red}</style></head><body>""" + "\n" +
      s"<nav>$nav</nav>" + "\n" +
      """<div class="ad"><a href="/buy">buy now</a> <a href="/offer">offer</a> sponsored</div>""" + "\n" +
      content + "\n" +
      """<footer><a href="/tos">terms</a> <a href="/privacy">privacy</a> (c) example.org</footer></body></html>"""
  }

  private def runExtract(pages: Seq[(Long, String)]) =
    HtmlExtract.extract(pages.toDF("doc_id", "page"), "doc_id", "page")
      .orderBy($"doc_id").collect()

  test("html extract: planted fixtures — nav-heavy, prose, inline-link, empty") {
    val navHeavy = "<nav>" + "<a href=\"/x\">item number longer</a> " * 8 + "</nav>"
    val prose = "<p>" + "word " * 20 + "final sentence of the paragraph</p>"
    // one link INSIDE long prose: low density, must be kept
    val inline = "<p>" + "word " * 20 +
      "see <a href=\"/ref\">the reference</a> for details in the appendix</p>"
    val short = "<p>too short</p>"
    val rows = runExtract(Seq(
      1L -> navHeavy, 2L -> prose, 3L -> inline, 4L -> short, 5L -> ""))
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("boilerplate_ppm"),
          r.getAs[String]("content_md5")))).toMap
    // nav-heavy: 8 links x 25 chars demanded >> ~200 visible chars? No:
    // visible = 8*19=152 < 200 -> dropped by density
    assert(rows(1L)._1 == 0L && rows(1L)._2 == 1000000L, rows(1L))
    assert(rows(2L)._1 == 1L && rows(2L)._2 == 0L)
    assert(rows(3L)._1 == 1L, "inline link in long prose must survive")
    assert(rows(4L)._1 == 0L, "short fragment drops on length")
    // empty page: one empty line, zero totals, ppm 0 by the guard,
    // md5 of the empty string
    assert(rows(5L)._1 == 0L && rows(5L)._2 == 0L &&
      rows(5L)._3 == md5hex(""))
    // every fixture agrees with the independent Scala replay
    Seq(1L -> navHeavy, 2L -> prose, 3L -> inline, 4L -> short, 5L -> "")
      .foreach { case (id, page) =>
        val got = runExtract(Seq(id -> page)).head
        val (nl, nk, tc, kc, ppm, m) = extractScala(page)
        assert((got.getAs[Long]("n_lines"), got.getAs[Long]("n_kept"),
          got.getAs[Long]("total_chars"), got.getAs[Long]("kept_chars"),
          got.getAs[Long]("boilerplate_ppm"), got.getAs[String]("content_md5"))
          == ((nl, nk, tc, kc, ppm, m)), s"fixture $id")
      }
  }

  test("html extract: whole-corpus brute replay at sf0.001") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.map { case (id, text) =>
      val (nl, nk, tc, kc, ppm, m) = extractScala(synthScala(id, text))
      id -> ((nl, nk, tc, kc, ppm, m))
    }.toMap
    val got = HtmlExtract.qHtmlExtract(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("total_chars"), r.getAs[Long]("kept_chars"),
          r.getAs[Long]("boilerplate_ppm"), r.getAs[String]("content_md5"))))
      .toMap
    assert(got == want)
    // the corpus exercises both classes: boilerplate-only (empty body)
    // and content-dominant pages
    assert(got.values.exists(_._2 == 0L))
    assert(got.values.exists(v => v._5 < 500000L),
      "most pages should keep the majority of their text")
  }

  // --- WARC-lite container -------------------------------------------

  test("warc-lite: adversarial payload round trip, file-count layout") {
    val dir = java.nio.file.Files.createTempDirectory("warc-rt").toString
    val recs = Seq(
      WarcLite.WarcRecord(1L, "https://x/1", "plain text".getBytes(UTF_8)),
      WarcLite.WarcRecord(2L, "https://x/2", Array.emptyByteArray),
      // payload that CONTAINS the frame marker + header-shaped lines:
      // length-prefixed framing must not be fooled
      WarcLite.WarcRecord(3L, "https://x/3",
        "GRAFT-WARC/1\ndoc-id: 99\ncontent-length: 0\n\n\n".getBytes(UTF_8)),
      WarcLite.WarcRecord(4L, "https://x/4",
        Array.tabulate(4096)(i => ((i * 31 + 7) % 256 - 128).toByte)))
    WarcLite.write(recs.toDS().repartition(2), dir)
    val back = WarcLite.read(spark, dir).collect().sortBy(_.doc_id)
    assert(back.map(_.doc_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(back.map(_.url).toSeq == recs.map(_.url))
    back.zip(recs).foreach { case (b, w) =>
      assert(java.util.Arrays.equals(b.payload, w.payload), s"doc ${w.doc_id}")
    }
    // parallelism = container files: 2 non-empty partitions -> 2 files
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".warc"))
    assert(files.length == 2, files.map(_.getName).mkString(","))
  }

  test("warc-lite: corrupt containers fail loudly") {
    intercept[IllegalArgumentException] {
      WarcLite.parse("NOT-A-WARC\n".getBytes(UTF_8), "t").toSeq
    }
    // truncated payload: content-length larger than remaining bytes
    intercept[IllegalArgumentException] {
      WarcLite.parse(
        "GRAFT-WARC/1\ndoc-id: 1\nurl: u\ncontent-length: 100\n\nabc"
          .getBytes(UTF_8), "t").toSeq
    }
  }

  test("warc extract == direct html extract, bit for bit (sf0.001)") {
    val a = HtmlExtract.qHtmlExtract(spark, sf0001).collect().toSeq
    val b = HtmlExtract.qWarcExtract(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  // --- streaming extraction-share monitor ------------------------------

  test("extraction monitor: closed hourly windows == batch replay on all sums") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String): Timestamp = Timestamp.valueOf(s)

    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    // split the corpus across two event-time hours
    def hourOf(id: Long): String =
      if (id % 2 == 0) "2026-08-12 10:15:00" else "2026-08-12 11:15:00"

    val input = MemoryStream[(Long, String, Timestamp)]
    val out = graft.text.HtmlExtract.extractionShareHourly(
      input.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .select($"window.start".as("ws"), $"n_docs", $"total_chars",
        $"kept_chars", $"n_empty", $"boilerplate_ppm")
    val q = out.writeStream.format("memory").queryName("extract_hourly")
      .outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => (id, t, ts(hourOf(id))) }: _*)
      q.processAllAvailable()
      // heartbeat far past both windows closes them for append emission
      input.addData((-1L, "x", ts("2026-08-12 15:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("extract_hourly")
      .as[(Timestamp, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // batch replay: the SAME batch query's per-doc accounting, grouped
    // by the planted hour
    val batch = graft.text.HtmlExtract.qHtmlExtract(spark, sf0001)
      .select($"doc_id", $"total_chars", $"kept_chars", $"n_kept")
      .as[(Long, Long, Long, Long)].collect()
    val want = batch.groupBy { case (id, _, _, _) =>
      hourOf(id).substring(0, 13) + ":00:00.0"
    }.map { case (h, rs) =>
      val tot = rs.map(_._2).sum; val kept = rs.map(_._3).sum
      h -> ((rs.length.toLong, tot, kept,
        rs.count(_._4 == 0L).toLong,
        if (tot > 0) (tot - kept) * 1000000L / tot else 0L))
    }
    assert(got.size == 2, got.keySet)
    assert(got == want)
  }

  // --- PDF-lite container ----------------------------------------------

  test("pdf-lite: build → extract round trip, escapes, pagination, empty doc") {
    import graft.multimodal.PdfLite
    // escape-heavy text: parens and backslashes must survive the
    // PDF-string escaping round trip
    val tricky = "a(b)c\\d" + ("x" * 70) + "(()" // spans 2 chunks
    val r = PdfLite.extract(1L, PdfLite.build(tricky))
    assert(r.xref_valid && r.n_pages == 1L && r.n_text_ops == 2L)
    assert(r.extract_md5 == md5hex(tricky))
    // pagination: 41 chunks -> 2 pages, 7 objects
    val long = "y" * (64 * 40 + 1)
    val r2 = PdfLite.extract(2L, PdfLite.build(long))
    assert(r2.n_pages == 2L && r2.n_objects == 7L && r2.n_text_ops == 41L)
    assert(r2.extract_md5 == md5hex(long))
    // empty doc: one empty page, zero show ops, md5 of ""
    val r0 = PdfLite.extract(0L, PdfLite.build(""))
    assert(r0.n_pages == 1L && r0.n_text_ops == 0L && r0.xref_valid)
    assert(r0.extract_md5 == md5hex(""))
  }

  test("pdf-lite: the container is structurally real (header, xref offsets, EOF)") {
    import graft.multimodal.PdfLite
    val bytes = PdfLite.build("hello pdf world")
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4\n") && s.endsWith("%%EOF\n"))
    // every xref offset addresses its own object header (also checked
    // in-extractor; duplicated here against raw bytes)
    val xrefOff = s.substring(s.lastIndexOf("\nstartxref\n") + 11).trim
      .split("\n")(0).toInt
    assert(s.startsWith("xref", xrefOff))
    // corrupting one xref digit must flip xref_valid
    val corrupt = s.replaceFirst("\n0000000009", "\n0000000008")
    val rc = PdfLite.extract(9L,
      corrupt.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(!rc.xref_valid)
    // truncating a stream must fail loudly
    intercept[IllegalArgumentException] {
      val cut = s.replaceFirst("endstream", "endstrea_")
      PdfLite.extract(9L,
        cut.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  test("pdf-lite: whole-corpus extraction reproduces every document (sf0.001)") {
    val got = graft.multimodal.PdfLite.qPdfExtract(spark, sf0001).collect()
    val texts = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.length == texts.size)
    got.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("xref_valid"))
      assert(r.getAs[String]("extract_md5") == md5hex(text))
      val chunks = if (text.isEmpty) 0 else (text.length + 63) / 64
      assert(r.getAs[Long]("n_text_ops") == chunks.toLong)
    }
  }

  // --- audit twins ----------------------------------------------------

  private def allBoolsTrue(rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val boolCols = schema.fields.filter(_.dataType.typeName == "boolean").map(_.name)
    rows.foreach(r => boolCols.foreach(c =>
      assert(r.getAs[Boolean](c), s"$c false in $r")))
  }

  test("approx-distinct audit: bound holds, exact side matches brute") {
    val df = graft.queries.Relational.qApproxDistinctAudit(spark, sf0001)
    val rows = df.collect()
    allBoolsTrue(rows, df.schema)
    val brute = Tables.load(spark, sf0001, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("exact_parts") == brute(r.getAs[String]("l_returnflag"))))
  }

  test("sketch-distinct audit: band holds per source and for the merged ALL row") {
    val df = TextAnalysis.qSketchDistinctAudit(spark, sf0001)
    val rows = df.collect()
    assert(rows.length >= 2 && rows.exists(_.getString(0) == "ALL"))
    allBoolsTrue(rows, df.schema)
  }

  test("winsorize-approx audit: invariants re-derived from the raw values") {
    val df = graft.queries.Relational.qWinsorizeApproxAudit(spark, sf0001)
    val rows = df.collect()
    allBoolsTrue(rows, df.schema)
    // independent check of the rank band using the approx thresholds
    // from the ORIGINAL query's output
    val approx = graft.queries.Relational.qWinsorizeApprox(spark, sf0001)
      .collect()
    approx.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val n = rs.length
      val p05 = rs.head.getAs[Double]("p05"); val p95 = rs.head.getAs[Double]("p95")
      val eps = n / 10000.0 + 1
      assert(math.abs(rs.count(_.getAs[Double]("value") < p05) - 0.05 * n) <= eps)
      assert(math.abs(rs.count(_.getAs[Double]("value") > p95) - 0.05 * n) <= eps)
      assert(rs.exists(_.getAs[Double]("value") == p05), "p05 must be a datum")
      assert(rs.exists(_.getAs[Double]("value") == p95), "p95 must be a datum")
    }
  }

  // --- Goertzel filterbank --------------------------------------------

  /** The five integer-coefficient folds, independently. */
  private def goertzelScala(samples: Seq[Long]): (Long, Long, Long, Long, Long) = {
    var sdc = 0L; var salt = 0L
    var t1 = 0L; var t2 = 0L; var q1 = 0L; var q2 = 0L
    var m1 = 0L; var m2 = 0L
    samples.zipWithIndex.foreach { case (x, i) =>
      sdc += x; salt += (if (i % 2 == 0) x else -x)
      val t = x + t1 - t2; t2 = t1; t1 = t
      val q = x - q2; q2 = q1; q1 = q
      val m = x - m1 - m2; m2 = m1; m1 = m
    }
    (sdc * sdc, t1 * t1 + t2 * t2 - t1 * t2, q1 * q1 + q2 * q2,
      m1 * m1 + m2 * m2 + m1 * m2, salt * salt)
  }

  private def goertzelOf(mediaId: Long, samples: Array[Short]) = {
    val media = Seq(graft.multimodal.Multimodal.EncodedMedia(
      mediaId, "audio/wav",
      graft.multimodal.Codec.encodeWav(samples, 8000))).toDS()
    graft.multimodal.Multimodal.audioGoertzel(media).collect().head
  }

  test("goertzel: pure tones concentrate energy in their own bin (DTMF shape)") {
    val a = 10000
    // ω=π/2 tone: A, 0, −A, 0, … — everything else must read ~zero
    val tonePi2 = Array.tabulate[Short](64)(i =>
      (Seq(a, 0, -a, 0)(i % 4)).toShort)
    val r2 = goertzelOf(1L, tonePi2)
    assert(r2.e_dc == 0L && r2.e_nyq == 0L)
    assert(r2.e_pi2 > 100L * math.max(r2.e_pi3, r2.e_2pi3), r2.toString)
    // ω=π/3 tone: A, A/2, −A/2, −A, −A/2, A/2, … (period 6, exact ints)
    val tonePi3 = Array.tabulate[Short](60)(i =>
      (Seq(a, a / 2, -a / 2, -a, -a / 2, a / 2)(i % 6)).toShort)
    val r3 = goertzelOf(2L, tonePi3)
    assert(r3.e_dc == 0L && r3.e_nyq == 0L)
    assert(r3.e_pi3 > 100L * math.max(r3.e_pi2, r3.e_2pi3), r3.toString)
    // DC-only signal: constant A — all AC bins after full periods stay
    // small relative to the DC spike
    val dc = Array.fill[Short](64)(a.toShort)
    val rd = goertzelOf(3L, dc)
    assert(rd.e_dc > 100L * Seq(rd.e_pi3, rd.e_pi2, rd.e_2pi3, rd.e_nyq).max)
  }

  test("goertzel: whole-corpus brute replay through the real WAV codec (sf0.001)") {
    val got = graft.multimodal.Multimodal.qMmAudioGoertzel(spark, sf0001)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("e_dc"),
          r.getAs[Long]("e_pi3"), r.getAs[Long]("e_pi2"),
          r.getAs[Long]("e_2pi3"), r.getAs[Long]("e_nyq")))).toMap
    val ids = Tables.load(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect()
    assert(got.size == ids.length)
    ids.foreach { id =>
      val n = (64 + id % 65).toInt
      val samples = Seq.tabulate(n)(i =>
        (id * 7919L + i * 104729L) % 65536L - 32768L)
      val (edc, e3, e2, e23, eny) = goertzelScala(samples)
      assert(got(id) == ((n.toLong, edc, e3, e2, e23, eny)), s"media $id")
    }
  }

  test("compress audit: deflate invariants + published-output cross-check") {
    val df = TextAnalysis.qTextCompressAudit(spark, sf0001)
    val rows = df.collect()
    allBoolsTrue(rows, df.schema)
    // n_bytes really is the UTF-8 byte length, row for row
    val texts = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach(r => assert(r.getAs[Long]("n_bytes") ==
      texts(r.getAs[Long]("doc_id")).getBytes(UTF_8).length.toLong))
  }
}
