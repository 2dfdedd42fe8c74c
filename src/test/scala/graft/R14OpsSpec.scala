package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import graft.multimodal.PdfLite
import graft.sources.WarcLite
import graft.text.HtmlExtract

/** Round-14 operators: gzip-member WARC-lite containers (the shape
  * real crawl archives ship in, ISO 28500 §6), FlateDecode PDF content
  * streams, non-Latin-1 PDF text via octal-escaped UTF-8 bytes, and
  * the tightened audit/load invariants from the r13 advice sweep. */
class R14OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- gzip-member WARC-lite -------------------------------------------

  private val gzRecs = Seq(
    WarcLite.WarcRecord(1L, "https://x/1", "plain text".getBytes(UTF_8)),
    WarcLite.WarcRecord(2L, "https://x/2", Array.emptyByteArray),
    // payload that CONTAINS the frame marker + a gzip magic sequence:
    // member framing must not be fooled by payload content
    WarcLite.WarcRecord(3L, "https://x/3",
      ("GRAFT-WARC/1\ndoc-id: 99\ncontent-length: 0\n\n\n" +
        new String(Array[Byte](0x1f, 0x8b.toByte, 8, 0), ISO_8859_1))
        .getBytes(ISO_8859_1)),
    WarcLite.WarcRecord(4L, "https://x/4",
      Array.tabulate(4096)(i => ((i * 31 + 7) % 256 - 128).toByte)))

  test("warc-gz: adversarial payload round trip, per-record member alignment") {
    val dir = java.nio.file.Files.createTempDirectory("warc-gz-rt").toString
    WarcLite.writeGz(gzRecs.toDS().repartition(2), dir)
    val back = WarcLite.readGz(spark, dir).collect().sortBy(_.doc_id)
    assert(back.map(_.doc_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(back.map(_.url).toSeq == gzRecs.map(_.url))
    back.zip(gzRecs).foreach { case (b, w) =>
      assert(java.util.Arrays.equals(b.payload, w.payload), s"doc ${w.doc_id}")
    }
    // member alignment (the ISO 28500 §6 invariant): every gzip member
    // of every container inflates independently to EXACTLY one record
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
    assert(files.length == 2, files.map(_.getName).mkString(","))
    val memberCounts = files.map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      WarcLite.gzMembers(bytes, f.getName).map { m =>
        val it = WarcLite.parse(m, f.getName)
        val r = it.next()
        assert(!it.hasNext, "one record per member")
        r.doc_id
      }.size
    }
    assert(memberCounts.sum == 4)
  }

  test("warc-gz: corruption fails loudly — magic, FLG, CRC, truncation, alignment") {
    // one well-formed member, frame bytes rebuilt by hand (same
    // framing contract as the writer)
    def oneMember: Array[Byte] = WarcLite.gzWrap(
      (WarcLite.Magic + "\ndoc-id: 7\nurl: u\ncontent-length: 3\n\nabc\n")
        .getBytes(UTF_8))
    // bad magic
    intercept[IllegalArgumentException] {
      val b = oneMember; b(0) = 0x1e
      WarcLite.gzMembers(b, "t").toSeq
    }
    // reserved FLG bits (5-7) mean a format we don't know — rejected
    intercept[IllegalArgumentException] {
      val b = oneMember; b(3) = 0x80.toByte
      WarcLite.gzMembers(b, "t").toSeq
    }
    // a truncated FNAME field (bit set, no zero terminator before the
    // container ends) is loud
    intercept[IllegalArgumentException] {
      val hdr = Array[Byte](0x1f, 0x8b.toByte, 8, 0x08, 0, 0, 0, 0, 0, 0) ++
        Array.fill[Byte](12)(0x41) // "AAAA…" — FNAME never terminates
      WarcLite.gzMembers(hdr, "t").toSeq
    }
    // flipped byte in the deflate body: DataFormatException or CRC — loud
    intercept[IllegalArgumentException] {
      val b = oneMember
      b(b.length - 12) = (b(b.length - 12) ^ 0x55).toByte
      WarcLite.gzMembers(b, "t").toSeq
    }
    // flipped CRC trailer byte
    intercept[IllegalArgumentException] {
      val b = oneMember
      b(b.length - 8) = (b(b.length - 8) ^ 0x01).toByte
      WarcLite.gzMembers(b, "t").toSeq
    }
    // truncated member (trailer cut off)
    intercept[IllegalArgumentException] {
      val b = oneMember
      WarcLite.gzMembers(java.util.Arrays.copyOf(b, b.length - 5), "t").toSeq
    }
    // a member holding TWO records breaks the alignment contract at read
    val two = {
      val f = new java.io.ByteArrayOutputStream()
      val rec = (WarcLite.Magic + "\ndoc-id: 7\nurl: u\ncontent-length: 3\n\nabc\n")
        .getBytes(UTF_8)
      f.write(rec); f.write(rec)
      WarcLite.gzWrap(f.toByteArray)
    }
    val dir = java.nio.file.Files.createTempDirectory("warc-gz-two").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.warc.gz"), two)
    val e = intercept[Exception] {
      WarcLite.readGz(spark, dir).collect()
    }
    assert(e.getMessage != null)
  }

  test("warc-gz: foreign writers' optional header fields are read per RFC 1952") {
    // a member as another archiver might write it: FTEXT hint, FEXTRA,
    // FNAME, FCOMMENT and FHCRC all present — our reader must skip each
    // field per spec and still land exactly on the deflate data
    val frame = (WarcLite.Magic + "\ndoc-id: 11\nurl: u\ncontent-length: 5\n\nhello\n")
      .getBytes(UTF_8)
    val ours = WarcLite.gzWrap(frame)
    val deflateAndTrailer = java.util.Arrays.copyOfRange(ours, 10, ours.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8,
      (0x01 | 0x04 | 0x08 | 0x10 | 0x02).toByte, // FTEXT|FEXTRA|FNAME|FCOMMENT|FHCRC
      1, 2, 3, 4, // MTIME (arbitrary)
      0, 3)) // XFL, OS
    out.write(Array[Byte](4, 0)) // FEXTRA: xlen=4 LE
    out.write(Array[Byte](0x41, 0x42, 0x43, 0x44))
    out.write("crawl-00001.warc".getBytes(UTF_8)); out.write(0) // FNAME
    out.write("made elsewhere".getBytes(UTF_8)); out.write(0) // FCOMMENT
    out.write(Array[Byte](0x77, 0x66)) // FHCRC (not verified, just skipped)
    out.write(deflateAndTrailer)
    val members = WarcLite.gzMembers(out.toByteArray, "foreign").toSeq
    assert(members.length == 1)
    val r = WarcLite.parse(members.head, "foreign").next()
    assert(r.doc_id == 11L && new String(r.payload, UTF_8) == "hello")
  }

  test("warc-lite: a record missing its doc-id header fails loudly") {
    intercept[IllegalArgumentException] {
      WarcLite.parse(
        (WarcLite.Magic + "\nurl: u\ncontent-length: 3\n\nabc\n").getBytes(UTF_8),
        "t").toSeq
    }
    intercept[IllegalArgumentException] {
      WarcLite.parse(
        (WarcLite.Magic + "\ndoc-id: 1\ncontent-length: 3\n\nabc\n").getBytes(UTF_8),
        "t").toSeq
    }
  }

  test("warc-gz/cdx extract == plain warc extract == direct extract, bit for bit") {
    val a = HtmlExtract.qHtmlExtract(spark, sf0001).collect().toSeq
    val b = HtmlExtract.qWarcExtract(spark, sf0001).collect().toSeq
    val c = HtmlExtract.qWarcExtractGz(spark, sf0001).collect().toSeq
    val d = HtmlExtract.qWarcExtractCdx(spark, sf0001).collect().toSeq
    assert(a == b)
    assert(a == c)
    assert(a == d)
  }

  test("warc-cdx: index addresses every member; selective fetch reads only its rows") {
    val dir = java.nio.file.Files.createTempDirectory("warc-cdx").toString
    WarcLite.writeGz(gzRecs.toDS().repartition(2), dir)
    val idx = WarcLite.readCdx(spark, dir)
    val rows = idx.collect()
    assert(rows.length == 4, "one index row per member")
    // every indexed (offset, length) range holds exactly its record
    val all = WarcLite.fetchGz(idx).collect().sortBy(_.doc_id)
    assert(all.map(_.doc_id).toSeq == Seq(1L, 2L, 3L, 4L))
    all.zip(gzRecs).foreach { case (b, w) =>
      assert(java.util.Arrays.equals(b.payload, w.payload), s"doc ${w.doc_id}")
    }
    // the fan-out is real: fetch runs on the repartitioned index, not
    // on the ~1 coalesced partition the tiny cdx text files scan as
    assert(WarcLite.fetchGz(idx).rdd.getNumPartitions > 1)
    // container-level pushdown: a filtered index fetches ONLY the
    // selected members (here: one doc), bit-exact
    val one = WarcLite.fetchGz(idx.filter($"doc_id" === 4L)).collect()
    assert(one.length == 1 && one.head.doc_id == 4L)
    assert(java.util.Arrays.equals(one.head.payload, gzRecs(3).payload))
    // an index row pointing at the WRONG member is loud, not a wrong row
    val lied = idx.withColumn("doc_id",
      org.apache.spark.sql.functions.when($"doc_id" === 4L, 99L)
        .otherwise($"doc_id"))
    val e = intercept[Exception] { WarcLite.fetchGz(lied).collect() }
    assert(e.getMessage != null)
    // a corrupted offset lands mid-member and fails the gzip magic check
    val skewed = idx.withColumn("offset",
      org.apache.spark.sql.functions.when($"doc_id" === 1L, $"offset" + 3L)
        .otherwise($"offset"))
    intercept[Exception] { WarcLite.fetchGz(skewed).collect() }
  }

  // --- FlateDecode PDF content streams ----------------------------------

  test("pdf flate: round trip, mixed dispatch, corruption fails loudly") {
    val tricky = "a(b)c\\d" + ("x" * 70) + "(()"
    val r = PdfLite.extract(1L, PdfLite.build(tricky, flate = true))
    assert(r.xref_valid && r.n_pages == 1L && r.n_text_ops == 2L)
    assert(r.extract_md5 == md5hex(tricky))
    // flate and plain builds publish the SAME deterministic surface
    assert(r == PdfLite.extract(1L, PdfLite.build(tricky)))
    // the flate container genuinely declares the filter
    val s = new String(PdfLite.build(tricky, flate = true), ISO_8859_1)
    assert(s.contains("/Filter /FlateDecode"))
    assert(!new String(PdfLite.build(tricky), ISO_8859_1)
      .contains("/FlateDecode"))
    // in-place corruption of a compressed stream byte: zlib's adler32
    // (or the deflate structure itself) must make extraction throw, not
    // return wrong text
    val streamAt = s.indexOf("stream\n", s.indexOf("/FlateDecode")) + 7
    val corrupt = s.substring(0, streamAt + 4) +
      ((s.charAt(streamAt + 4) ^ 0x55).toChar) + s.substring(streamAt + 5)
    intercept[IllegalArgumentException] {
      PdfLite.extract(9L, corrupt.getBytes(ISO_8859_1))
    }
    // truncated deflate data (stream bytes zeroed from some point on)
    val cut = s.substring(0, streamAt + 2) + "    " +
      s.substring(streamAt + 6)
    intercept[IllegalArgumentException] {
      PdfLite.extract(9L, cut.getBytes(ISO_8859_1))
    }
  }

  test("pdf flate: whole-corpus mixed query == plain query (sf0.001)") {
    val a = PdfLite.qPdfExtract(spark, sf0001).collect().toSeq
    val b = PdfLite.qPdfExtractFlate(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  // --- non-Latin-1 PDF text ---------------------------------------------

  test("pdf: non-ASCII text round-trips via octal-escaped UTF-8 bytes") {
    // Latin-1 range, BMP CJK, an astral-plane char (surrogate pair),
    // and an emoji — none of which the r13 Latin-1 carrier could hold
    val uni = "héllo wörld — 日本語のテキスト, 𝄞 clef and 🎵 note; " +
      "ASCII tail with (parens) and \\backslash"
    val r = PdfLite.extract(1L, PdfLite.build(uni))
    assert(r.extract_md5 == md5hex(uni), "UTF-8 byte-exact round trip")
    assert(r.xref_valid)
    val rf = PdfLite.extract(2L, PdfLite.build(uni, flate = true))
    assert(rf.extract_md5 == md5hex(uni), "flate + non-ASCII round trip")
    // the container itself stays pure ASCII bytes whatever the script
    PdfLite.build(uni).foreach(b => assert((b & 0xff) < 0x80))
    // chunking counts CODE POINTS (the oracle's length()), never
    // splitting a surrogate pair: 63 ASCII + astral char + 1 more cp =
    // 65 code points -> 2 chunks, both valid on their own
    val astral = ("a" * 63) + "𝄞" + "z"
    val r2 = PdfLite.extract(3L, PdfLite.build(astral))
    assert(r2.n_text_ops == 2L, r2.toString)
    assert(r2.extract_md5 == md5hex(astral))
    // a content stream ENDING in a lone backslash fails loudly, not
    // with a StringIndexOutOfBounds (r13 advice). Same-length patch so
    // every xref offset stays valid: the body's trailing "ET\n" becomes
    // "(a\" — an open string whose escape has nothing to consume.
    val plain = new String(PdfLite.build("abc"), ISO_8859_1)
    val streamAt0 = plain.indexOf("stream\n") + 7
    val len0 = "/Length (\\d+)".r.findFirstMatchIn(plain).get.group(1).toInt
    val bodyEnd = streamAt0 + len0
    assert(plain.substring(bodyEnd - 3, bodyEnd) == "ET\n")
    val lone = plain.substring(0, bodyEnd - 3) + "(a\\" + plain.substring(bodyEnd)
    val e = intercept[IllegalArgumentException] {
      PdfLite.extract(4L, lone.getBytes(ISO_8859_1))
    }
    assert(e.getMessage.contains("unterminated"))
  }

  // a structurally-valid single-page PDF around an ARBITRARY content
  // stream body (pure ASCII) — the fixture for foreign-writer content
  // syntax our own build() never emits
  private def miniPdf(body: String, filter: String = ""): Array[Byte] = {
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      s"4 0 obj << /Length ${body.length}$filter >> stream\n$body" + "endstream endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val head = "%PDF-1.4\n"
    val offsets = objs.scanLeft(head.length)((o, s) => o + s.length)
    val xref = new StringBuilder("xref\n0 6\n0000000000 65535 f \n")
    offsets.dropRight(1).foreach(o => xref.append(f"$o%010d 00000 n \n"))
    (head + objs.mkString + xref +
      s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n${offsets.last}\n%%EOF\n")
      .getBytes(ISO_8859_1)
  }

  test("pdf: wild-writer string syntax — escape table, continuation, hex strings") {
    // the PDF 1.4 §3.2.3 escape table our writer never emits but wild
    // content streams use: \n \r \t \b \f, backslash-ignored chars,
    // and \<EOL> line continuation
    val esc = PdfLite.extract(1L, miniPdf(
      "BT (a\\nb\\tc\\rd\\be\\ff) Tj (g\\qh) Tj (wr\\\napped) Tj ET\n"))
    assert(esc.n_text_ops == 3L)
    assert(esc.extract_md5 == md5hex("a\nb\tc\rd\be\ffgqhwrapped"))
    // hex strings: pairs, embedded whitespace, odd trailing digit
    // padded with 0 — <48 656C6C 6F> = "Hello", <7> = 0x70 = "p"
    val hex = PdfLite.extract(2L, miniPdf(
      "BT <48 656C6C 6F> Tj <7> Tj ET\n"))
    assert(hex.n_text_ops == 2L)
    assert(hex.extract_md5 == md5hex("Hellop"))
    // a dict token inside the stream (<< … >>) is not a hex string
    val dict = PdfLite.extract(3L, miniPdf(
      "BT /X << /K 1 >> BDC (ok) Tj EMC ET\n"))
    assert(dict.n_text_ops == 1L)
    assert(dict.extract_md5 == md5hex("ok"))
    // corruption in the new form stays loud
    intercept[IllegalArgumentException] {
      PdfLite.extract(4L, miniPdf("BT <48ZZ> Tj ET\n"))
    }
    intercept[IllegalArgumentException] {
      PdfLite.extract(5L, miniPdf("BT <48 Tj ET\n"))
    }
    // §3.2.3 balanced unescaped parens are literal string content
    val bal = PdfLite.extract(6L, miniPdf("BT (a(b)c) Tj ((x)) Tj ET\n"))
    assert(bal.n_text_ops == 2L)
    assert(bal.extract_md5 == md5hex("a(b)c(x)"))
    // whitespace between string and operator is optional-and-variable
    val ws = PdfLite.extract(7L, miniPdf("BT (a)Tj (b)\nTj (c)  Tj <64>Tj ET\n"))
    assert(ws.n_text_ops == 4L)
    assert(ws.extract_md5 == md5hex("abcd"))
    // ...but TJ (the array op) and Tj-prefixed names must NOT match
    val notTj = PdfLite.extract(8L, miniPdf("BT [(a)] TJ (b) Tjx (c) Tj ET\n"))
    assert(notTj.n_text_ops == 1L)
    assert(notTj.extract_md5 == md5hex("c"))
  }

  test("pdf: wild-writer FlateDecode spellings all inflate") {
    val plain = "BT (flated text content) Tj ET\n"
    val comp = new String(
      Zlib.deflate(plain.getBytes(ISO_8859_1), 6, nowrap = false), ISO_8859_1)
    for (decl <- Seq(" /Filter /FlateDecode", " /Filter/FlateDecode",
        " /Filter [/FlateDecode]", " /Filter [ /FlateDecode ]")) {
      val r = PdfLite.extract(1L, miniPdf(comp, decl))
      assert(r.n_text_ops == 1L, decl)
      assert(r.extract_md5 == md5hex("flated text content"), decl)
    }
  }

  test("pdf: ASCII corpus hashes are unchanged by the encoding overhaul (sf0.001)") {
    val got = PdfLite.qPdfExtract(spark, sf0001).collect()
    val texts = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    got.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("xref_valid"))
      assert(r.getAs[String]("extract_md5") == md5hex(text))
      val chunks = if (text.isEmpty) 0 else (text.codePointCount(0, text.length) + 63) / 64
      assert(r.getAs[Long]("n_text_ops") == chunks.toLong)
    }
  }

  // --- property sweeps (seeded, deterministic) --------------------------

  test("pdf: 200 random unicode documents round-trip, plain and flate") {
    val rnd = new scala.util.Random(4242)
    // alphabet spanning every class the encoder must survive: ASCII,
    // PDF delimiters, escapes, control chars, Latin-1, BMP CJK,
    // astral (surrogate pairs), emoji
    val alphabet = ("ab c(d)e\\f\n\t\r" + "é漢字ツ𝄞🎵").toCharArray
    def randText(): String = {
      val n = rnd.nextInt(300)
      val sb = new StringBuilder
      var k = 0
      while (k < n) {
        val c = alphabet(rnd.nextInt(alphabet.length))
        // never emit a lone surrogate: pick pairs atomically
        if (Character.isHighSurrogate(c)) ()
        else if (Character.isLowSurrogate(c)) {
          sb.append('\ud834').append(c) // the 𝄞 pair
        } else sb.append(c)
        k += 1
      }
      sb.toString
    }
    (1 to 200).foreach { t =>
      val text = randText()
      val r = PdfLite.extract(t.toLong, PdfLite.build(text))
      assert(r.extract_md5 == md5hex(text), s"trial $t plain: ${text.take(40)}")
      assert(r.xref_valid, s"trial $t xref")
      val rf = PdfLite.extract(t.toLong,
        PdfLite.build(text, flate = t % 2 == 0))
      assert(rf.extract_md5 == md5hex(text), s"trial $t flate")
      val cps = text.codePointCount(0, text.length)
      val wantOps = if (cps == 0) 0L else ((cps + 63) / 64).toLong
      assert(r.n_text_ops == wantOps, s"trial $t ops")
    }
  }

  test("warc-gz: 100 random binary payloads round-trip through members + cdx math") {
    val rnd = new scala.util.Random(777)
    val recs = (1 to 100).map { i =>
      val payload = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(payload)
      WarcLite.WarcRecord(i.toLong, s"https://r/$i", payload)
    }
    // frame+wrap every record into one container byte stream by hand,
    // tracking offsets the way the writer's cdx does
    val out = new java.io.ByteArrayOutputStream()
    val offsets = recs.map { r =>
      val f = new java.io.ByteArrayOutputStream()
      f.write((WarcLite.Magic + s"\ndoc-id: ${r.doc_id}\nurl: ${r.url}\n" +
        s"content-length: ${r.payload.length}\n\n").getBytes(UTF_8))
      f.write(r.payload); f.write('\n')
      val member = WarcLite.gzWrap(f.toByteArray)
      val off = out.size()
      out.write(member)
      (off, member.length)
    }
    val container = out.toByteArray
    // linear walk reproduces every record
    val walked = WarcLite.gzMembers(container, "prop").map(m =>
      WarcLite.parse(m, "prop").next()).toSeq
    assert(walked.map(_.doc_id) == recs.map(_.doc_id))
    walked.zip(recs).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.payload, b.payload), s"doc ${b.doc_id}")
    }
    // every tracked (offset, length) range is independently readable —
    // the random-access property the cdx fetch path relies on
    offsets.zip(recs).foreach { case ((off, len), want) =>
      val slice = java.util.Arrays.copyOfRange(container, off, off + len)
      val got = WarcLite.parse(
        WarcLite.gzMembers(slice, "slice").next(), "slice").next()
      assert(got.doc_id == want.doc_id &&
        java.util.Arrays.equals(got.payload, want.payload))
    }
  }

  // --- audit-bound + load-sentinel invariants ---------------------------

  test("deflate bound is size-proportional: 1 MiB incompressible input") {
    // seeded-random bytes don't compress: zlib emits ~16 KiB stored
    // blocks (~5 bytes each + the wrapper) — over the old flat n+64
    // bound, inside zlib's own compressBound-shaped one
    val rnd = new scala.util.Random(42)
    val raw = new Array[Byte](1 << 20)
    rnd.nextBytes(raw)
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
    d.end()
    val n = raw.length.toLong
    val nd = out.size().toLong
    assert(nd > n + 64L, s"old flat bound would not even bind: $nd vs ${n + 64}")
    assert(nd <= n + n / 4096L + n / 16384L + 64L,
      s"size-proportional bound must hold: $nd")
  }

  test("bench load: failed /proc sample reads as absent evidence, not a loaded box") {
    val ok = Bench.Load.Cpu(1000L, 600L, 10L)
    val ok2 = Bench.Load.Cpu(2000L, 1200L, 20L)
    assert(Bench.Load.deltaFields(ok, ok2).contains("\"busy_pct\":40.0"))
    val bad = Bench.Load.Cpu(-1L, -1L, -1L)
    assert(Bench.Load.deltaFields(bad, ok2) == """"busy_pct":-1.0,"steal_pct":-1.0""")
    assert(Bench.Load.deltaFields(ok, bad) == """"busy_pct":-1.0,"steal_pct":-1.0""")
  }
}
