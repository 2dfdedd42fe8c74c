package graft.multimodal

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PDF-LITE — real (if minimal) PDF 1.4 documents and the text
  * extraction a pretraining pipeline runs over PDF corpora. The writer
  * emits genuinely conformant single-generation PDFs: catalog → pages
  * → page → uncompressed content stream + Type1 font objects, a
  * byte-exact xref table, and a trailer — a spec-following PDF reader
  * opens these. The extractor is the pdftotext-lite path: locate
  * `N 0 obj`, read streams by their /Length (length-prefixed, the
  * WarcLite discipline — stream bytes are never scanned for
  * delimiters), tokenize `(string) Tj` show-text operators inside
  * content streams with full escape handling, and validate every xref
  * offset against the object header it points at — so the query
  * round-trips REAL container bytes and any writer/parser/offset
  * defect flips the driver hash.
  *
  * Text placement: the doc text is chunked into fixed 64-char show ops
  * (40 per page), PDF-escaped on write and unescaped on read — the
  * extraction must reproduce the document text BYTE-EXACTLY, which is
  * what the oracle (md5 of the original text) checks.
  *
  * Scale shape: PDFs are born in batched mapPartitions from the
  * documents scan and parsed the same way — payload bytes never
  * shuffle; only (doc_id, counters, md5) leave the executor. */
object PdfLite {

  private val ChunkLen = 64
  private val OpsPerPage = 40

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Build one PDF's bytes: `nPages` pages of ≤ [[OpsPerPage]] show
    * ops each over the 64-char chunks of `text`. Object layout:
    * 1 catalog, 2 pages, 3..(2+n) page, (3+n)..(2+2n) content,
    * (3+2n) font. */
  private[graft] def build(text: String): Array[Byte] = {
    val chunks =
      if (text.isEmpty) Seq.empty
      else text.grouped(ChunkLen).toSeq
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
      val b = body.toString
      objs += (s"${3 + n + i} 0 obj << /Length ${b.getBytes(ISO_8859_1).length} >> " +
        s"stream\n$b" + "endstream endobj\n")
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

  /** Parse one PDF-lite's bytes: xref-driven object walk (every offset
    * validated against the `N 0 obj` header it addresses), streams
    * read by /Length, `(…) Tj` tokens unescaped and concatenated in
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
    val out = new StringBuilder
    offsets.foreach { off =>
      val hdrEnd = s.indexOf(">>", off)
      val hdr = s.substring(off, if (hdrEnd < 0) off else hdrEnd + 2)
      if (hdr.contains("/Type /Page ")) nPages += 1
      "/Length (\\d+)".r.findFirstMatchIn(hdr).foreach { m =>
        val len = m.group(1).toInt
        val streamAt = s.indexOf("stream\n", off)
        if (streamAt < 0) fail(id, s"object at $off declares /Length but has no stream")
        val body = s.substring(streamAt + 7, streamAt + 7 + len)
        if (!s.startsWith("endstream", streamAt + 7 + len))
          fail(id, s"stream at $streamAt overruns its /Length")
        // tokenize (…) Tj with escape handling
        var i = 0
        while (i < body.length) {
          if (body.charAt(i) == '(') {
            val sb = new StringBuilder
            i += 1
            var done = false
            while (!done) {
              if (i >= body.length) fail(id, "unterminated string")
              body.charAt(i) match {
                case '\\' =>
                  sb.append(body.charAt(i + 1)); i += 2
                case ')' => done = true; i += 1
                case c => sb.append(c); i += 1
              }
            }
            if (body.startsWith(" Tj", i)) { out.append(sb); nOps += 1 }
          } else i += 1
        }
      }
    }
    PdfExtract(id, nObjs.toLong, nPages, nOps, xrefValid,
      md5hex(out.toString))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pdf_extract" -> qPdfExtract
  )

  /** The oracle derives every structural counter from the text length
    * (chunks of 64 chars, 40 show ops per page, 3 + 2·pages objects)
    * and demands the extraction reproduce the text byte-exactly
    * (md5(text)) with a valid xref — the deterministic surface of a
    * container round trip whose bytes the oracle does not rebuild. */
  val oracles: Map[String, String] = Map(
    "q_pdf_extract" ->
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
  )
}
