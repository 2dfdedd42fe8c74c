package graft.multimodal

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PDF-LITE — real (if minimal) PDF 1.4 documents and the text
  * extraction a pretraining pipeline runs over PDF corpora. The writer
  * emits genuinely conformant single-generation PDFs: catalog → pages
  * → page → content stream + Type1 font objects, a byte-exact xref
  * table, and a trailer — a spec-following PDF reader opens these. The
  * extractor is the pdftotext-lite path: locate `N 0 obj`, read
  * streams by their /Length (length-prefixed, the WarcLite discipline
  * — stream bytes are never scanned for delimiters), FlateDecode them
  * when the stream dict declares the filter, tokenize both PDF string
  * forms' `Tj` show-text operators (literal with the full §3.2.3
  * escape table, hex with whitespace/odd-digit tolerance — wild PDFs
  * use both), and validate every
  * xref offset against the object header it points at — so the query
  * round-trips REAL container bytes and any writer/parser/offset
  * defect flips the driver hash.
  *
  * Text encoding: document text is chunked into fixed 64-CODE-POINT
  * show ops (40 per page); each chunk's UTF-8 bytes become a PDF
  * string with `\(`/`\)`/`\\` escapes and 3-digit `\ooo` octal escapes
  * for every byte outside printable ASCII — so the container is pure
  * ASCII bytes regardless of the document's script (PDF 1.4 string
  * syntax, public spec §3.2.3), and ANY Unicode text round-trips
  * byte-exactly. The extraction must reproduce the text's UTF-8 bytes
  * EXACTLY, which is what the oracle (md5 of the original text) checks.
  *
  * Compression: real PDFs FlateDecode their content streams; [[build]]
  * takes a `flate` flag that zlib-compresses the page body
  * (`/Filter /FlateDecode`, /Length = compressed byte count) and the
  * extractor inflates — loud on truncated or damaged deflate data.
  *
  * Scale shape: PDFs are born in batched mapPartitions from the
  * documents scan and parsed the same way — payload bytes never
  * shuffle; only (doc_id, counters, md5) leave the executor. */
object PdfLite {

  private val ChunkLen = 64
  private val OpsPerPage = 40

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  /** 64-code-point chunks, never splitting a surrogate pair — the
    * count a code-point-aware length() (the oracle's) predicts. */
  private[graft] def chunksOf(text: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < text.length) {
      val start = i
      var cps = 0
      while (i < text.length && cps < ChunkLen) {
        i = text.offsetByCodePoints(i, 1); cps += 1
      }
      buf += text.substring(start, i)
    }
    buf.toSeq
  }

  /** One chunk's UTF-8 bytes as a PDF string body: printable ASCII
    * verbatim (with the three delimiter escapes), everything else as a
    * fixed-width 3-digit octal escape — the resulting body is pure
    * ASCII whatever the input script. */
  private[graft] def escape(chunk: String): String = {
    val sb = new StringBuilder(chunk.length + 8)
    chunk.getBytes(UTF_8).foreach { x =>
      val c = x & 0xff
      c match {
        case '\\' => sb.append("\\\\")
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case _ if c >= 0x20 && c < 0x7f => sb.append(c.toChar)
        case _ =>
          // always 3 octal digits so a following literal digit can't
          // extend the escape (PDF 1.4 §3.2.3 allows 1–3; 3 is exact)
          sb.append('\\').append(f"${Integer.toOctalString(c)}%3s".replace(' ', '0'))
      }
    }
    sb.toString
  }

  /** zlib-compress (RFC 1950 — PDF's FlateDecode) a body's bytes. */
  private def flateBytes(raw: Array[Byte]): Array[Byte] =
    graft.Zlib.deflate(raw, 6, nowrap = false)

  /** Build one PDF's bytes: `nPages` pages of ≤ [[OpsPerPage]] show
    * ops each over the 64-code-point chunks of `text`; content streams
    * zlib-compressed (`/Filter /FlateDecode`) when `flate` is set.
    * Object layout: 1 catalog, 2 pages, 3..(2+n) page,
    * (3+n)..(2+2n) content, (3+2n) font. */
  private[graft] def build(text: String, flate: Boolean = false): Array[Byte] = {
    val chunks = chunksOf(text)
    val pagesOps = if (chunks.isEmpty) Seq(Seq.empty[String])
      else chunks.grouped(OpsPerPage).toSeq
    val n = pagesOps.length
    val fontObj = 3 + 2 * n
    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    objs += s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    objs += s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n"
    (0 until n).foreach { i =>
      objs += (s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >> endobj\n")
    }
    (0 until n).foreach { i =>
      val body = new StringBuilder("BT /F1 10 Tf 72 760 Td\n")
      pagesOps(i).foreach { c =>
        body.append('(').append(escape(c)).append(") Tj 0 -12 Td\n")
      }
      body.append("ET\n")
      // the escaped body is pure ASCII; ISO_8859_1 is the byte-
      // transparent carrier for the (possibly binary) stream content
      val raw = body.toString.getBytes(ISO_8859_1)
      val (streamBytes, filter) =
        if (flate) (flateBytes(raw), " /Filter /FlateDecode") else (raw, "")
      objs += (s"${3 + n + i} 0 obj << /Length ${streamBytes.length}$filter >> " +
        s"stream\n" + new String(streamBytes, ISO_8859_1) + "endstream endobj\n")
    }
    objs += s"$fontObj 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
    val head = "%PDF-1.4\n"
    val offsets = objs.scanLeft(head.getBytes(ISO_8859_1).length)(
      (off, o) => off + o.getBytes(ISO_8859_1).length)
    val xrefOff = offsets.last
    val xref = new StringBuilder(s"xref\n0 ${objs.length + 1}\n")
    xref.append("0000000000 65535 f \n")
    offsets.dropRight(1).foreach(o => xref.append(f"$o%010d 00000 n \n"))
    val trailer = (s"trailer << /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    (head + objs.mkString + xref.toString + trailer).getBytes(ISO_8859_1)
  }

  final case class PdfExtract(doc_id: Long, n_objects: Long,
      n_pages: Long, n_text_ops: Long, xref_valid: Boolean,
      extract_md5: String)

  private def fail(id: Long, why: String): Nothing =
    throw new IllegalArgumentException(s"pdf $id: $why")

  /** Inflate a FlateDecode stream's bytes — loud on truncation or
    * damaged data (zlib's adler32 makes in-place corruption fail). */
  private def inflateBytes(id: Long, in: Array[Byte]): Array[Byte] =
    graft.Zlib.inflate(in, 0, in.length, nowrap = false,
      s"pdf $id FlateDecode stream")._1

  /** Wild writers spell the filter `/Filter /FlateDecode`,
    * `/Filter/FlateDecode` (no space) or `/Filter [/FlateDecode]` —
    * all three declare the same decode. */
  private val FlateRe = "/Filter\\s*\\[?\\s*/FlateDecode".r

  private def isPdfWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0

  /** PDF whitespace between a string operand and its operator is
    * optional-and-variable (`(x) Tj`, `(x)Tj`, `(x)\nTj` are all the
    * same show op — §3.1): skip it, then demand `Tj` followed by a
    * delimiter/whitespace/EOF so `TJ`/`Tjx` never match. */
  private def tjFollows(body: String, i0: Int): Boolean = {
    var i = i0
    while (i < body.length && isPdfWs(body.charAt(i))) i += 1
    body.startsWith("Tj", i) && (i + 2 >= body.length ||
      isPdfWs(body.charAt(i + 2)) ||
      "()<>[]{}/%".indexOf(body.charAt(i + 2)) >= 0)
  }

  /** End (exclusive) of the top-level dictionary of the object starting
    * at `off` — a depth-tracked scan (wild dicts nest: /DecodeParms,
    * /Resources…) that skips literal and hex strings, so a `>>` inside a
    * string value can't truncate the dict (the first-`>>` cut hid a
    * nested dict's trailing /Filter and tokenized compressed bytes as
    * text — silent wrong md5). Returns -1 when the object has no
    * dictionary (a bare number/name object — legal, nothing to read). */
  private def dictEnd(id: Long, s: String, off: Int): Int = {
    var i = off
    // the dict (if any) opens before the object's body keyword
    while (i < s.length && !s.startsWith("<<", i) &&
        !s.startsWith("stream", i) && !s.startsWith("endobj", i)) i += 1
    if (i >= s.length || !s.startsWith("<<", i)) return -1
    var depth = 0
    while (i < s.length) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else if (s.charAt(i) == '(') {
        var d = 0; i += 1
        var run = true
        while (run) {
          if (i >= s.length) fail(id, "unterminated string in object dict")
          s.charAt(i) match {
            case '\\' => i += 2
            case '(' => d += 1; i += 1
            case ')' => (if (d == 0) run = false else d -= 1); i += 1
            case _ => i += 1
          }
        }
      } else if (s.charAt(i) == '<') { // lone '<': hex string — skip it
        val j = s.indexOf('>', i + 1)
        if (j < 0) fail(id, "unterminated hex string in object dict")
        i = j + 1
      } else i += 1
    }
    fail(id, s"unbalanced dictionary in object at byte $off")
  }

  /** Parse one PDF-lite's bytes: xref-driven object walk (every offset
    * validated against the `N 0 obj` header it addresses), streams
    * read by /Length and inflated when /Filter /FlateDecode is
    * declared, `(…) Tj` string bytes unescaped and concatenated in
    * page order. Loud on any structural corruption. */
  private[graft] def extract(id: Long, bytes: Array[Byte]): PdfExtract = {
    val s = new String(bytes, ISO_8859_1)
    if (!s.startsWith("%PDF-1.4\n")) fail(id, "bad header")
    val xrefAt = s.lastIndexOf("\nstartxref\n")
    if (xrefAt < 0) fail(id, "no startxref")
    val xrefOff = s.substring(xrefAt + 11, s.indexOf('\n', xrefAt + 11)).trim.toInt
    if (!s.startsWith("xref", xrefOff)) fail(id, "startxref does not address xref")
    // the trailer dict sits between the xref table and startxref
    val sizeM = "/Size (\\d+)".r.findFirstMatchIn(s.substring(xrefOff, xrefAt))
      .getOrElse(fail(id, "no /Size"))
    val nObjs = sizeM.group(1).toInt - 1 // minus the free object 0
    // xref entries: fixed 20-byte rows after "xref\n0 N\n"
    val tableAt = s.indexOf('\n', s.indexOf('\n', xrefOff) + 1) + 1
    var xrefValid = true
    val offsets = (1 to nObjs).map { i =>
      val row = s.substring(tableAt + 20 * i, tableAt + 20 * i + 20)
      val off = row.substring(0, 10).toInt
      if (!s.startsWith(s"$i 0 obj", off)) xrefValid = false
      off
    }
    // text extraction: walk content streams by /Length, in object order
    var nPages = 0L
    var nOps = 0L
    val out = new java.io.ByteArrayOutputStream()
    offsets.foreach { off =>
      val hdrEnd = dictEnd(id, s, off)
      val hdr = if (hdrEnd < 0) "" else s.substring(off, hdrEnd)
      if (hdr.contains("/Type /Page ")) nPages += 1
      "/Length (\\d+)".r.findFirstMatchIn(hdr).foreach { m =>
        val len = m.group(1).toInt
        val streamAt = s.indexOf("stream\n", off)
        if (streamAt < 0) fail(id, s"object at $off declares /Length but has no stream")
        if (!s.startsWith("endstream", streamAt + 7 + len))
          fail(id, s"stream at $streamAt overruns its /Length")
        val streamRaw = s.substring(streamAt + 7, streamAt + 7 + len)
          .getBytes(ISO_8859_1)
        val body = new String(
          if (FlateRe.findFirstIn(hdr).isDefined) inflateBytes(id, streamRaw)
          else streamRaw, ISO_8859_1)
        // tokenize string Tj show ops — both PDF 1.4 string forms
        // (§3.2.3): literal `(…)` with the FULL escape table (octal,
        // \n\r\t\b\f, line continuation, backslash-ignored), and hex
        // `<…>` (whitespace-tolerant, odd trailing digit padded) — so
        // the extractor reads wild PDFs' show ops, not just ours (our
        // writer emits only literal strings with octal escapes)
        var i = 0
        while (i < body.length) {
          if (body.charAt(i) == '(') {
            val sb = new java.io.ByteArrayOutputStream()
            i += 1
            var depth = 0 // §3.2.3: BALANCED unescaped parens are literal
            var done = false
            while (!done) {
              if (i >= body.length) fail(id, "unterminated string")
              body.charAt(i) match {
                case '\\' =>
                  if (i + 1 >= body.length) fail(id, "unterminated escape")
                  val c1 = body.charAt(i + 1)
                  if (c1 >= '0' && c1 <= '7') {
                    var v = 0; var j = i + 1; var n = 0
                    while (j < body.length && n < 3 &&
                        body.charAt(j) >= '0' && body.charAt(j) <= '7') {
                      v = v * 8 + (body.charAt(j) - '0'); j += 1; n += 1
                    }
                    sb.write(v); i = j
                  } else c1 match {
                    case 'n' => sb.write('\n'); i += 2
                    case 'r' => sb.write('\r'); i += 2
                    case 't' => sb.write('\t'); i += 2
                    case 'b' => sb.write('\b'); i += 2
                    case 'f' => sb.write('\f'); i += 2
                    case '\r' => // \<EOL> line continuation: CR or CRLF
                      i += 2
                      if (i < body.length && body.charAt(i) == '\n') i += 1
                    case '\n' => i += 2
                    // any other escaped char: the backslash is ignored
                    case c => sb.write(c.toInt); i += 2
                  }
                case '(' => depth += 1; sb.write('('); i += 1
                case ')' =>
                  if (depth == 0) { done = true; i += 1 }
                  else { depth -= 1; sb.write(')'); i += 1 }
                case '\r' =>
                  // §3.2.3: an unescaped end-of-line inside a literal
                  // string is RECORDED as a single LF, whatever form the
                  // writer used (CR or CRLF; bare LF is already LF)
                  sb.write('\n'); i += 1
                  if (i < body.length && body.charAt(i) == '\n') i += 1
                case c => sb.write(c.toInt); i += 1
              }
            }
            if (tjFollows(body, i)) { sb.writeTo(out); nOps += 1 }
          } else if (body.charAt(i) == '<' &&
              i + 1 < body.length && body.charAt(i + 1) == '<') {
            i += 2 // dict open inside a content stream — not a string
          } else if (body.charAt(i) == '<') {
            val sb = new java.io.ByteArrayOutputStream()
            i += 1
            var hi = -1
            var done = false
            while (!done) {
              if (i >= body.length) fail(id, "unterminated hex string")
              val c = body.charAt(i)
              if (c == '>') {
                if (hi >= 0) sb.write(hi << 4) // odd digit: low nibble 0
                done = true; i += 1
              } else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') {
                i += 1
              } else {
                val v = Character.digit(c, 16)
                if (v < 0) fail(id, s"bad hex digit '$c' in hex string")
                if (hi < 0) hi = v else { sb.write((hi << 4) | v); hi = -1 }
                i += 1
              }
            }
            if (tjFollows(body, i)) { sb.writeTo(out); nOps += 1 }
          } else i += 1
        }
      }
    }
    PdfExtract(id, nObjs.toLong, nPages, nOps, xrefValid,
      md5hex(out.toByteArray))
  }

  /** Documents → real PDF bytes → xref-validated parse → text
    * fingerprint. The extract md5 must equal md5(text) — the oracle's
    * one-hop check that the whole container round trip is lossless. */
  def qPdfExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        extract(id, build(text))
      })
      .toDF()
      .orderBy($"doc_id")
  }

  /** The FLATE twin: a mixed corpus where doc_id parity picks the
    * filter — even docs get `/Filter /FlateDecode` content streams
    * (the way real PDFs ship), odd docs stay uncompressed — so one
    * query exercises compression, inflation, AND the extractor's
    * per-object filter dispatch. The deterministic surface (counters,
    * xref validity, text md5) is filter-independent, so the SAME
    * oracle hash-checks both paths. */
  def qPdfExtractFlate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        extract(id, build(text, flate = id % 2 == 0))
      })
      .toDF()
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pdf_extract" -> qPdfExtract,
    "q_pdf_extract_flate" -> qPdfExtractFlate
  )

  /** The oracle derives every structural counter from the text length
    * (chunks of 64 code points, 40 show ops per page, 3 + 2·pages
    * objects — DuckDB length() counts code points, matching
    * [[chunksOf]]) and demands the extraction reproduce the text
    * byte-exactly (md5(text)) with a valid xref — the deterministic
    * surface of a container round trip whose bytes the oracle does not
    * rebuild. Filter-independent: the flate twin shares it. */
  private val extractOracle: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(text) = 0 THEN 1
      |         ELSE (length(text) + 63) // 64 END AS n_chunks
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(text) = 0 THEN 0
      |         ELSE (length(text) + 63) // 64 END AS n_ops,
      |    (n_chunks + 39) // 40 AS n_pages
      |  FROM m)
      |SELECT doc_id,
      |  CAST(3 + 2 * n_pages AS BIGINT) AS n_objects,
      |  CAST(n_pages AS BIGINT) AS n_pages,
      |  CAST(n_ops AS BIGINT) AS n_text_ops,
      |  TRUE AS xref_valid,
      |  md5(text) AS extract_md5
      |FROM p ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pdf_extract" -> extractOracle,
    "q_pdf_extract_flate" -> extractOracle
  )
}
