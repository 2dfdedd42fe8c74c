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
    * (3+n)..(2+2n) content, (3+2n) font. With `indirectLen` each
    * content stream declares `/Length L 0 R` and the integer lives in
    * its own object after the font (L = 3+2n+1+i) — the form writers
    * that stream their output emit, since the byte count isn't known
    * until the stream is written (PDF 1.4 §3.2.7). */
  private[graft] def build(text: String, flate: Boolean = false,
      indirectLen: Boolean = false): Array[Byte] = {
    val chunks = chunksOf(text)
    val pagesOps = if (chunks.isEmpty) Seq(Seq.empty[String])
      else chunks.grouped(OpsPerPage).toSeq
    val n = pagesOps.length
    val fontObj = 3 + 2 * n
    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    val lengths = scala.collection.mutable.ArrayBuffer.empty[Int]
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
      val lenDecl =
        if (indirectLen) s"${fontObj + 1 + i} 0 R" else s"${streamBytes.length}"
      objs += (s"${3 + n + i} 0 obj << /Length $lenDecl$filter >> " +
        s"stream\n" + new String(streamBytes, ISO_8859_1) + "endstream endobj\n")
      if (indirectLen) lengths += streamBytes.length
    }
    objs += s"$fontObj 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
    lengths.zipWithIndex.foreach { case (len, i) =>
      objs += s"${fontObj + 1 + i} 0 obj $len endobj\n"
    }
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

  /** Build an INCREMENTALLY-UPDATED PDF (PDF 1.4 §3.4.5: a save
    * appends new objects plus a new xref section whose trailer /Prev
    * links the previous one — the original bytes are never touched):
    * the base document is `build(draft)`, and the update REPLACES its
    * page tree with `text`'s — the pages object (2) is rewritten, the
    * draft's page/content objects are marked FREE in the update's
    * xref (deleted objects must shadow the originals), and fresh
    * page/content objects are appended. The final document surface
    * (objects, pages, ops, text md5) is therefore IDENTICAL to
    * `build(text)`'s, so the same oracle hash-checks the /Prev
    * chain-walking read path: a reader that misses the update, walks
    * sections oldest-first, or resurrects the deleted draft flips the
    * hash or the counters. */
  private[graft] def buildIncremental(text: String,
      draft: String = "DRAFT — superseded by the incremental update",
      flate: Boolean = false): Array[Byte] =
    buildIncrementalChain(Seq(draft, text), flate)

  /** The general form: a CHAIN of incremental saves. `texts.head` is
    * the base document; every later element is one more save that
    * replaces the then-current page tree (frees its page/content
    * objects, appends fresh ones, /Prev-links the previous xref). The
    * final surface equals `build(texts.last)`'s, however long the
    * chain — so a reader defect at ANY depth of the newest-first walk
    * (missed section, wrong precedence, resurrected intermediate
    * draft) flips the same oracle. */
  private[graft] def buildIncrementalChain(texts: Seq[String],
      flate: Boolean = false): Array[Byte] = {
    require(texts.length >= 2, "a chain needs a base and >= 1 update")
    var bytes = build(texts.head, flate)
    val n1 = {
      val c = chunksOf(texts.head)
      if (c.isEmpty) 1 else c.grouped(OpsPerPage).length
    }
    val fontObj = 3 + 2 * n1 // the base's font object is REUSED forever
    // the live page/content object range of the current page tree
    var liveFirst = 3
    var liveCount = 2 * n1
    var maxObj = fontObj
    texts.tail.foreach { text =>
      val baseStr = new String(bytes, ISO_8859_1)
      val prevAt = baseStr.lastIndexOf("\nstartxref\n")
      val prevXref = baseStr.substring(prevAt + 11,
        baseStr.indexOf('\n', prevAt + 11)).trim.toInt
      val chunks = chunksOf(text)
      val pagesOps = if (chunks.isEmpty) Seq(Seq.empty[String])
        else chunks.grouped(OpsPerPage).toSeq
      val n2 = pagesOps.length
      val firstNew = maxObj + 1
      // update body: rewritten pages tree + n2 new page+content objects
      val objs = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      val kids = (0 until n2).map(i => s"${firstNew + i} 0 R").mkString(" ")
      objs += 2 ->
        s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n2 >> endobj\n"
      (0 until n2).foreach { i =>
        objs += (firstNew + i) -> (s"${firstNew + i} 0 obj << /Type /Page " +
          s"/Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Contents ${firstNew + n2 + i} 0 R " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> >> endobj\n")
      }
      (0 until n2).foreach { i =>
        val body = new StringBuilder("BT /F1 10 Tf 72 760 Td\n")
        pagesOps(i).foreach { c =>
          body.append('(').append(escape(c)).append(") Tj 0 -12 Td\n")
        }
        body.append("ET\n")
        val raw = body.toString.getBytes(ISO_8859_1)
        val (streamBytes, filter) =
          if (flate) (flateBytes(raw), " /Filter /FlateDecode") else (raw, "")
        objs += (firstNew + n2 + i) -> (s"${firstNew + n2 + i} 0 obj " +
          s"<< /Length ${streamBytes.length}$filter >> stream\n" +
          new String(streamBytes, ISO_8859_1) + "endstream endobj\n")
      }
      val offsets = scala.collection.mutable.Map.empty[Int, Int]
      var off = bytes.length
      objs.foreach { case (num, body) =>
        offsets(num) = off
        off += body.getBytes(ISO_8859_1).length
      }
      val xrefOff = off
      // three subsections: the rewritten pages tree, the freed
      // previous page/content range, and the appended objects
      val x = new StringBuilder("xref\n")
      x.append("2 1\n").append(f"${offsets(2)}%010d 00000 n \n")
      x.append(s"$liveFirst $liveCount\n")
      (0 until liveCount).foreach(_ => x.append("0000000000 65535 f \n"))
      x.append(s"$firstNew ${2 * n2}\n")
      (0 until 2 * n2).foreach(i =>
        x.append(f"${offsets(firstNew + i)}%010d 00000 n \n"))
      val trailer = (s"trailer << /Size ${firstNew + 2 * n2} /Root 1 0 R " +
        s"/Prev $prevXref >>\nstartxref\n$xrefOff\n%%EOF\n")
      bytes = bytes ++ (objs.map(_._2).mkString + x.toString + trailer)
        .getBytes(ISO_8859_1)
      liveFirst = firstNew
      liveCount = 2 * n2
      maxObj = firstNew + 2 * n2 - 1
    }
    bytes
  }

  /** Build one PDF 1.5 container for the same document: identical page
    * content to [[build]], but the non-stream objects (catalog, pages
    * tree, page dicts, font) live inside a compressed OBJECT STREAM
    * (/Type /ObjStm) and the cross-reference is an XREF STREAM
    * (/Type /XRef, /W [1 4 2], FlateDecode binary entries) — the
    * layout the majority of wild PDFs have shipped since Acrobat 6
    * (PDF 1.5 spec §3.4.6–3.4.7, public). Content streams stay direct
    * FlateDecode'd objects (the spec forbids streams inside object
    * streams). The deterministic surface (document-object count,
    * pages, show ops, text md5) matches [[build]]'s exactly, so the
    * same oracle hash-checks both generations. */
  private[graft] def build15(text: String): Array[Byte] = {
    val chunks = chunksOf(text)
    val pagesOps = if (chunks.isEmpty) Seq(Seq.empty[String])
      else chunks.grouped(OpsPerPage).toSeq
    val n = pagesOps.length
    val fontObj = 3 + 2 * n
    val objStmNum = fontObj + 1
    val xrefNum = fontObj + 2
    // members of the object stream: objNum -> body (no obj wrapper)
    val inStm = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    inStm += 1 -> "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    inStm += 2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>"
    (0 until n).foreach { i =>
      inStm += (3 + i) -> (s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>")
    }
    inStm += fontObj ->
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    // ObjStm payload: "num off …\n" pair header, then bodies at
    // /First + off (PDF 1.5 §3.4.6)
    val bodyBuf = new StringBuilder
    val pairs = inStm.map { case (num, body) =>
      val off = bodyBuf.length
      bodyBuf.append(body).append('\n')
      (num, off)
    }
    val pairHeader = pairs.map { case (num, off) => s"$num $off" }
      .mkString(" ") + "\n"
    val stmComp = flateBytes((pairHeader + bodyBuf).getBytes(ISO_8859_1))

    val head = "%PDF-1.5\n"
    var off = head.length
    val directs = scala.collection.mutable.ArrayBuffer.empty[String]
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def add(num: Int, body: String): Unit = {
      offsets(num) = off; directs += body; off += body.length
    }
    (0 until n).foreach { i =>
      val b = new StringBuilder("BT /F1 10 Tf 72 760 Td\n")
      pagesOps(i).foreach(c =>
        b.append('(').append(escape(c)).append(") Tj 0 -12 Td\n"))
      b.append("ET\n")
      val comp = flateBytes(b.toString.getBytes(ISO_8859_1))
      add(3 + n + i,
        s"${3 + n + i} 0 obj << /Length ${comp.length} /Filter /FlateDecode >> stream\n" +
          new String(comp, ISO_8859_1) + "endstream endobj\n")
    }
    add(objStmNum,
      s"$objStmNum 0 obj << /Type /ObjStm /N ${inStm.length} /First ${pairHeader.length} " +
        s"/Length ${stmComp.length} /Filter /FlateDecode >> stream\n" +
        new String(stmComp, ISO_8859_1) + "endstream endobj\n")
    // xref stream: /W [1 4 2] entries for objects 0..xrefNum; its own
    // offset is known before serialization (it is `off` right now)
    val xrefOff = off
    val size = xrefNum + 1
    val stmIndex = pairs.zipWithIndex.map { case ((num, _), i) => num -> i }.toMap
    val entryData = new java.io.ByteArrayOutputStream()
    def ent(t: Int, a: Long, b: Int): Unit = {
      entryData.write(t)
      (3 to 0 by -1).foreach(i => entryData.write(((a >> (8 * i)) & 0xffL).toInt))
      entryData.write((b >> 8) & 0xff); entryData.write(b & 0xff)
    }
    ent(0, 0L, 0xffff) // the free object 0
    (1 until size).foreach { num =>
      if (stmIndex.contains(num)) ent(2, objStmNum.toLong, stmIndex(num))
      else if (num == xrefNum) ent(1, xrefOff.toLong, 0)
      else ent(1, offsets(num).toLong, 0)
    }
    val xdata = flateBytes(entryData.toByteArray)
    add(xrefNum,
      s"$xrefNum 0 obj << /Type /XRef /Size $size /W [1 4 2] /Root 1 0 R " +
        s"/Length ${xdata.length} /Filter /FlateDecode >> stream\n" +
        new String(xdata, ISO_8859_1) + "endstream endobj\n")
    (head + directs.mkString + s"startxref\n$xrefOff\n%%EOF\n")
      .getBytes(ISO_8859_1)
  }

  /** Build a HYBRID-REFERENCE file for the same document (PDF 1.5
    * §3.4.7 / ISO 32000-1 §7.5.8.4 — the layout Acrobat 6+ emits for
    * backward compatibility): the non-stream objects live in an
    * object stream exactly as in [[build15]], but `startxref`
    * addresses a CLASSIC table whose rows mark those hidden members
    * FREE, and the trailer's /XRefStm points at the side xref stream
    * that really defines them. A reader that uses the table alone
    * sees the catalog and page tree as deleted — the side stream's
    * entries must win — so the surface-equality oracle (identical to
    * [[build]]'s) is exactly the hybrid-precedence check. */
  private[graft] def buildHybrid(text: String): Array[Byte] = {
    val chunks = chunksOf(text)
    val pagesOps = if (chunks.isEmpty) Seq(Seq.empty[String])
      else chunks.grouped(OpsPerPage).toSeq
    val n = pagesOps.length
    val fontObj = 3 + 2 * n
    val objStmNum = fontObj + 1
    val xrefNum = fontObj + 2
    val inStm = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    inStm += 1 -> "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    inStm += 2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>"
    (0 until n).foreach { i =>
      inStm += (3 + i) -> (s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + n + i} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>")
    }
    inStm += fontObj ->
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val bodyBuf = new StringBuilder
    val pairs = inStm.map { case (num, body) =>
      val off = bodyBuf.length
      bodyBuf.append(body).append('\n')
      (num, off)
    }
    val pairHeader = pairs.map { case (num, off) => s"$num $off" }
      .mkString(" ") + "\n"
    val stmComp = flateBytes((pairHeader + bodyBuf).getBytes(ISO_8859_1))

    val head = "%PDF-1.5\n"
    var off = head.length
    val directs = scala.collection.mutable.ArrayBuffer.empty[String]
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def add(num: Int, body: String): Unit = {
      offsets(num) = off; directs += body; off += body.length
    }
    (0 until n).foreach { i =>
      val b = new StringBuilder("BT /F1 10 Tf 72 760 Td\n")
      pagesOps(i).foreach(c =>
        b.append('(').append(escape(c)).append(") Tj 0 -12 Td\n"))
      b.append("ET\n")
      val comp = flateBytes(b.toString.getBytes(ISO_8859_1))
      add(3 + n + i,
        s"${3 + n + i} 0 obj << /Length ${comp.length} /Filter /FlateDecode >> stream\n" +
          new String(comp, ISO_8859_1) + "endstream endobj\n")
    }
    add(objStmNum,
      s"$objStmNum 0 obj << /Type /ObjStm /N ${inStm.length} /First ${pairHeader.length} " +
        s"/Length ${stmComp.length} /Filter /FlateDecode >> stream\n" +
        new String(stmComp, ISO_8859_1) + "endstream endobj\n")
    // the side xref stream defines ONLY what the table hides (plus
    // itself): type-2 entries for the ObjStm members, via /Index runs
    val xrefStmOff = off
    val size = xrefNum + 1
    val stmIndex = pairs.zipWithIndex.map { case ((num, _), i) => num -> i }.toMap
    val memberNums = pairs.map(_._1).sorted
    val runs = memberNums.foldLeft(List.empty[(Int, Int)]) {
      case ((f, c) :: t, num) if num == f + c => (f, c + 1) :: t
      case (acc, num) => (num, 1) :: acc
    }.reverse ++ List((xrefNum, 1))
    val entryData = new java.io.ByteArrayOutputStream()
    def ent(t: Int, a: Long, b: Int): Unit = {
      entryData.write(t)
      (3 to 0 by -1).foreach(i => entryData.write(((a >> (8 * i)) & 0xffL).toInt))
      entryData.write((b >> 8) & 0xff); entryData.write(b & 0xff)
    }
    runs.foreach { case (first, count) =>
      (first until first + count).foreach { num =>
        if (num == xrefNum) ent(1, xrefStmOff.toLong, 0)
        else ent(2, objStmNum.toLong, stmIndex(num))
      }
    }
    val xdata = flateBytes(entryData.toByteArray)
    val indexStr = runs.map { case (f, c) => s"$f $c" }.mkString(" ")
    add(xrefNum,
      s"$xrefNum 0 obj << /Type /XRef /Size $size /W [1 4 2] " +
        s"/Index [$indexStr] /Root 1 0 R " +
        s"/Length ${xdata.length} /Filter /FlateDecode >> stream\n" +
        new String(xdata, ISO_8859_1) + "endstream endobj\n")
    // the classic table: object 0 free, hidden members free, direct
    // objects (content streams, ObjStm, XRef) at their real offsets
    val tableOff = off
    val x = new StringBuilder("xref\n")
    x.append(s"0 $size\n")
    x.append("0000000000 65535 f \n")
    (1 until size).foreach { num =>
      if (stmIndex.contains(num)) x.append("0000000000 00000 f \n")
      else x.append(f"${offsets(num)}%010d 00000 n \n")
    }
    val trailer = (s"trailer << /Size $size /Root 1 0 R " +
      s"/XRefStm $xrefStmOff >>\nstartxref\n$tableOff\n%%EOF\n")
    (head + directs.mkString + x.toString + trailer).getBytes(ISO_8859_1)
  }

  // ---- Standard security handler, RC4 generations (PDF 1.4 §3.5 /
  // ISO 32000-1 §7.6.3, public spec) -------------------------------
  // The overwhelmingly common encrypted wild PDF is "owner-locked":
  // /Filter /Standard with an EMPTY user password (V1/R2 RC4-40 or
  // V2/R3 RC4-128) — readers open it without prompting. That class is
  // supported end to end; a real user password, AES (/V 4+), or a
  // non-Standard handler fails loudly.

  /** The 32-byte padding string of §7.6.3.3 Algorithm 2 (an empty
    * password pads to exactly these bytes). */
  private val PadBytes: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (public design; symmetric, so this is encrypt AND decrypt). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0; var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Algorithm 2: the file encryption key for the EMPTY user password
    * (padded password = [[PadBytes]] verbatim). `p` is signed 32-bit,
    * serialized little-endian. */
  private def fileKey(r: Int, keyLen: Int, o: Array[Byte], p: Int,
      fileId: Array[Byte]): Array[Byte] = {
    val pBytes = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    var h = md5(PadBytes, o, pBytes, fileId)
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h.take(keyLen)))
    h.take(keyLen)
  }

  /** Algorithm 3: the /O value when owner and user passwords are both
    * empty (the owner-locked writer's degenerate-but-conformant case
    * is /P restrictions with empty passwords). */
  private def ownerBytes(r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(PadBytes)
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h))
    val key = h.take(keyLen)
    var o = rc4(key, PadBytes)
    if (r >= 3) (1 to 19).foreach { i =>
      o = rc4(key.map(b => (b ^ i).toByte), o)
    }
    o
  }

  /** Algorithms 4 (R2) / 5 (R3): the /U value for the empty user
    * password; R3's trailing 16 bytes are arbitrary padding (zeros). */
  private def userBytes(r: Int, key: Array[Byte],
      fileId: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(key, PadBytes)
    else {
      var u = rc4(key, md5(PadBytes, fileId))
      (1 to 19).foreach(i => u = rc4(key.map(b => (b ^ i).toByte), u))
      u ++ new Array[Byte](16)
    }

  /** Algorithm 1: the per-object key — MD5(file key ‖ objnum low 3 LE
    * ‖ gen low 2 LE ‖ [the AES salt "sAlT" when the crypt filter is
    * AESV2]), truncated to min(keyLen+5, 16). */
  private def objectKey(key: Array[Byte], num: Int, gen: Int,
      aes: Boolean = false): Array[Byte] = {
    val tail = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
      else Array.emptyByteArray
    md5(key ++ tail ++ salt).take(math.min(key.length + 5, 16))
  }

  /** AES-128-CBC with PKCS#5 padding — the AESV2 crypt filter's cipher
    * (§7.6.2: stored stream = 16-byte IV ‖ ciphertext). */
  private def aesCbc(id: Long, key: Array[Byte], data: Array[Byte],
      encrypt: Boolean, iv: Array[Byte] = null): Array[Byte] = {
    if (!encrypt && data.length < 16)
      fail(id, s"AES stream shorter than its IV (${data.length} bytes)")
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    val k = new javax.crypto.spec.SecretKeySpec(key, "AES")
    if (encrypt) {
      c.init(javax.crypto.Cipher.ENCRYPT_MODE, k,
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    } else {
      c.init(javax.crypto.Cipher.DECRYPT_MODE, k,
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      try c.doFinal(data, 16, data.length - 16)
      catch {
        case e: javax.crypto.BadPaddingException =>
          fail(id, s"AES padding invalid (wrong key or corrupt stream): $e")
        case e: javax.crypto.IllegalBlockSizeException =>
          fail(id, s"AES stream length not a block multiple: $e")
      }
    }
  }

  private def hexStr(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  // ---- AES-256 generation (/V 5 /R 6, ISO 32000-2 §7.6.4.3 — the
  // modern Standard-handler form; "AESV3" crypt filter) ------------

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  /** Raw-block AES — CBC/NoPadding (for the /UE //OE key unwrap, zero
    * IV) and ECB/NoPadding (for /Perms), per §7.6.4.3.3. */
  private def aesRaw(key: Array[Byte], data: Array[Byte], encrypt: Boolean,
      cbcZeroIv: Boolean): Array[Byte] = {
    val mode = if (cbcZeroIv) "AES/CBC/NoPadding" else "AES/ECB/NoPadding"
    val c = javax.crypto.Cipher.getInstance(mode)
    val k = new javax.crypto.spec.SecretKeySpec(key, "AES")
    val dir = if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE
    if (cbcZeroIv)
      c.init(dir, k, new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    else c.init(dir, k)
    c.doFinal(data)
  }

  /** The R6 password hash ("Algorithm 2.B"): SHA-256 seeded, then an
    * iterated AES-128-CBC + SHA-256/384/512 mix — ≥64 rounds, stopping
    * when the last byte of the round's ciphertext ≤ rounds−32. */
  private def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, password, salt, udata)
    var round = 0
    var lastByte = 0
    while (round < 64 || lastByte > round - 32) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      (0 until 64).foreach(i =>
        System.arraycopy(block, 0, k1, i * block.length, block.length))
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val mod = (0 until 16).map(i => e(i) & 0xff).sum % 3
      k = sha(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
      lastByte = e(e.length - 1) & 0xff
      round += 1
    }
    k.take(32)
  }

  /** Build an RC4-ENCRYPTED document (Standard handler, empty user
    * password — the owner-locked class): same layout as [[build]] plus
    * the /Encrypt dict after the font, every content stream
    * RC4-encrypted under its per-object key (encryption is OUTSIDE the
    * filters: stored = RC4(flate(data))), trailer carrying /Encrypt +
    * /ID. `r3` picks V2/R3 RC4-128 (the common form) vs V1/R2 RC4-40;
    * `cfm` switches to the CRYPT-FILTER generations instead:
    * `Some("AESV2")` = V4/R4 AES-128-CBC streams (IV ‖ PKCS#5-padded
    * ciphertext), `Some("V2")` = V4/R4 RC4 named through the filter
    * machinery, `Some("AESV3")` = V5/R6 AES-256 (the R6 hash family,
    * /UE-wrapped 256-bit file key, /Perms seal) — each with the
    * /CF /StdCF /StmF /StrF dict real readers navigate. The deterministic surface equals
    * [[build]]'s — the /Encrypt dict is file plumbing, excluded from
    * the object count like xref machinery — so the same oracle
    * hash-checks the whole authenticate→derive→decrypt path. */
  private[graft] def buildEncrypted(text: String, flate: Boolean = false,
      r3: Boolean = true, cfm: Option[String] = None): Array[Byte] = {
    val chunks = chunksOf(text)
    val pagesOps = if (chunks.isEmpty) Seq(Seq.empty[String])
      else chunks.grouped(OpsPerPage).toSeq
    val n = pagesOps.length
    val fontObj = 3 + 2 * n
    val encObj = fontObj + 1
    val isV5 = cfm.contains("AESV3")
    val r = if (isV5) 6 else if (cfm.isDefined) 4 else if (r3) 3 else 2
    val keyLen = if (r >= 3) 16 else 5
    val p = -44 // print+modify denied; arbitrary but key-load-bearing
    val fileId = md5(text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      Array[Byte](r.toByte, if (flate) 1 else 0, cfm.size.toByte))
    val none = Array.emptyByteArray
    // V5/R6 key material (§7.6.4.4: U = hash ‖ validation salt ‖ key
    // salt; /UE wraps the 256-bit file key under the key-salt hash;
    // /O hashes over the full 48-byte U; /Perms is the ECB-sealed
    // permission record). All salts derived deterministically so the
    // container bytes are reproducible.
    lazy val v5seed = sha(256,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      Array[Byte]('v', '5', if (flate) 1 else 0))
    lazy val v5FileKey = sha(256, v5seed, Array[Byte]('f', 'k'))
    lazy val (v5U, v5UE) = {
      val vs = sha(256, v5seed, Array[Byte]('v', 's')).take(8)
      val ks = sha(256, v5seed, Array[Byte]('k', 's')).take(8)
      (hash2B(none, vs, none) ++ vs ++ ks,
        aesRaw(hash2B(none, ks, none), v5FileKey,
          encrypt = true, cbcZeroIv = true))
    }
    lazy val (v5O, v5OE) = {
      val vs = sha(256, v5seed, Array[Byte]('v', 'o')).take(8)
      val ks = sha(256, v5seed, Array[Byte]('k', 'o')).take(8)
      (hash2B(none, vs, v5U) ++ vs ++ ks,
        aesRaw(hash2B(none, ks, v5U), v5FileKey,
          encrypt = true, cbcZeroIv = true))
    }
    lazy val v5Perms = {
      val plain = Array[Byte](
        (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
        ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte,
        0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
        'T', 'a', 'd', 'b') ++ sha(256, v5seed, Array[Byte]('p', 'm')).take(4)
      aesRaw(v5FileKey, plain, encrypt = true, cbcZeroIv = false)
    }
    lazy val o = ownerBytes(r, keyLen)
    lazy val key = fileKey(r, keyLen, o, p, fileId)
    lazy val u = userBytes(r, key, fileId)
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
      val raw = body.toString.getBytes(ISO_8859_1)
      val (streamBytes, filter) =
        if (flate) (flateBytes(raw), " /Filter /FlateDecode") else (raw, "")
      val objNum = 3 + n + i
      val enc = cfm match {
        case Some("AESV3") =>
          // V5: the FILE key encrypts directly (no per-object
          // derivation, §7.6.4.2); deterministic IV for reproducibility
          val iv = md5(v5FileKey, Array[Byte](objNum.toByte, 'i', 'v'))
          aesCbc(0L, v5FileKey, streamBytes, encrypt = true, iv = iv)
        case Some("AESV2") =>
          // deterministic IV: any 16 bytes are legal, a derived one
          // keeps the whole container byte-reproducible
          val iv = md5(key, Array[Byte](objNum.toByte, 'i', 'v'))
          aesCbc(0L, objectKey(key, objNum, 0, aes = true), streamBytes,
            encrypt = true, iv = iv)
        case _ => rc4(objectKey(key, objNum, 0), streamBytes)
      }
      objs += (s"$objNum 0 obj << /Length ${enc.length}$filter >> " +
        s"stream\n" + new String(enc, ISO_8859_1) + "endstream endobj\n")
    }
    objs += s"$fontObj 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
    val encDict = cfm match {
      case Some("AESV3") =>
        s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
          s"/StmF /StdCF /StrF /StdCF /O <${hexStr(v5O)}> " +
          s"/U <${hexStr(v5U)}> /OE <${hexStr(v5OE)}> " +
          s"/UE <${hexStr(v5UE)}> /Perms <${hexStr(v5Perms)}> /P $p >>"
      case Some(m) =>
        s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          s"/CF << /StdCF << /CFM /$m /Length 16 >> >> " +
          s"/StmF /StdCF /StrF /StdCF /O <${hexStr(o)}> " +
          s"/U <${hexStr(u)}> /P $p >>"
      case None =>
        s"<< /Filter /Standard /V ${if (r3) 2 else 1} " +
          s"/R $r${if (r3) " /Length 128" else ""} /O <${hexStr(o)}> " +
          s"/U <${hexStr(u)}> /P $p >>"
    }
    objs += s"$encObj 0 obj $encDict endobj\n"
    val head = "%PDF-1.4\n"
    val offsets = objs.scanLeft(head.getBytes(ISO_8859_1).length)(
      (off, ob) => off + ob.getBytes(ISO_8859_1).length)
    val xrefOff = offsets.last
    val xref = new StringBuilder(s"xref\n0 ${objs.length + 1}\n")
    xref.append("0000000000 65535 f \n")
    offsets.dropRight(1).foreach(off => xref.append(f"$off%010d 00000 n \n"))
    val trailer = (s"trailer << /Size ${objs.length + 1} /Root 1 0 R " +
      s"/Encrypt $encObj 0 R /ID [<${hexStr(fileId)}> <${hexStr(fileId)}>] " +
      s">>\nstartxref\n$xrefOff\n%%EOF\n")
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

  /** Tokenize one decoded content-stream body for string `Tj` show
    * ops — both PDF string forms (§3.2.3): literal `(…)` with the FULL
    * escape table (octal, \n\r\t\b\f, line continuation,
    * backslash-ignored, unescaped EOLs recorded as LF), and hex `<…>`
    * (whitespace-tolerant, odd trailing digit padded) — so the
    * extractor reads wild PDFs' show ops, not just ours (our writer
    * emits only literal strings with octal escapes). Shown bytes append
    * to `out`; returns the show-op count. */
  private def tokenizeTj(id: Long, body: String,
      out: java.io.ByteArrayOutputStream): Long = {
    var nOps = 0L
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
    nOps
  }

  /** First integer after a dict `key` (e.g. `/Size 7`). */
  private def dictInt(hdr: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + "\\s+(\\d+)").r
      .findFirstMatchIn(hdr).map(_.group(1).toInt)

  /** Like [[dictInt]] but signed — /P in an encryption dict is a
    * NEGATIVE 32-bit permission mask in every real file. */
  private def dictSignedInt(hdr: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + "\\s+(-?\\d+)").r
      .findFirstMatchIn(hdr).map(_.group(1).toInt)

  /** The BINARY value of a string entry (`/O`, `/U`) in a dict — both
    * PDF string forms (§3.2.3): hex `<…>` (whitespace tolerated, odd
    * digit zero-padded) and literal `(…)` with the full escape table
    * (what Acrobat actually writes for O/U). */
  private def pdfStringValue(id: Long, hdr: String, key: String): Array[Byte] = {
    val at = hdr.indexOf(key + " ")
    val at2 = if (at >= 0) at else hdr.indexOf(key + "<") match {
      case -1 => hdr.indexOf(key + "(")
      case h => h
    }
    if (at2 < 0) fail(id, s"encrypt dict has no $key")
    var i = at2 + key.length
    while (i < hdr.length && isPdfWs(hdr.charAt(i))) i += 1
    if (i >= hdr.length) fail(id, s"$key has no value")
    hdr.charAt(i) match {
      case '<' =>
        val j = hdr.indexOf('>', i + 1)
        if (j < 0) fail(id, s"unterminated hex string for $key")
        val hex = hdr.substring(i + 1, j).filterNot(isPdfWs)
        if (!hex.forall(c => Character.digit(c, 16) >= 0))
          fail(id, s"non-hex digit in $key")
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
      case '(' =>
        val out = new java.io.ByteArrayOutputStream()
        i += 1
        var depth = 0
        var done = false
        while (!done) {
          if (i >= hdr.length) fail(id, s"unterminated literal string for $key")
          hdr.charAt(i) match {
            case '\\' =>
              if (i + 1 >= hdr.length) fail(id, s"dangling escape in $key")
              val n = hdr.charAt(i + 1)
              n match {
                case 'n' => out.write('\n'); i += 2
                case 'r' => out.write('\r'); i += 2
                case 't' => out.write('\t'); i += 2
                case 'b' => out.write('\b'); i += 2
                case 'f' => out.write('\f'); i += 2
                case '(' | ')' | '\\' => out.write(n); i += 2
                case d if d >= '0' && d <= '7' =>
                  var k = 0; var v = 0
                  i += 1
                  while (k < 3 && i < hdr.length &&
                      hdr.charAt(i) >= '0' && hdr.charAt(i) <= '7') {
                    v = v * 8 + (hdr.charAt(i) - '0'); i += 1; k += 1
                  }
                  out.write(v & 0xff)
                case '\n' => i += 2 // line continuation
                case '\r' =>
                  i += 2
                  if (i < hdr.length && hdr.charAt(i) == '\n') i += 1
                case other => out.write(other); i += 2 // backslash dropped
              }
            case '(' => depth += 1; out.write('('); i += 1
            case ')' =>
              if (depth == 0) done = true else { depth -= 1; out.write(')') }
              i += 1
            case c => out.write(c); i += 1
          }
        }
        out.toByteArray
      case c => fail(id, s"$key is not a string (starts '$c')")
    }
  }

  /** Reverse the PNG row predictor (RFC 2083 §6, public) that
    * `/DecodeParms << /Predictor >= 10 /Columns n >>` declares — the
    * form nearly every wild xref stream ships in: each row is one
    * filter-type byte + `columns` data bytes (bpp = 1 for xref
    * streams), filters None/Sub/Up/Average/Paeth reversed per spec. */
  private def unpredictPng(id: Long, data: Array[Byte],
      columns: Int): Array[Byte] = {
    if (columns <= 0) fail(id, s"bad /Columns $columns")
    val rowLen = columns + 1
    if (data.length % rowLen != 0)
      fail(id, s"predictor data ${data.length} not a multiple of row ${rowLen}")
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    var prev = new Array[Byte](columns) // zero row above the first
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      val cur = new Array[Byte](columns)
      var c = 0
      while (c < columns) {
        val x = data(r * rowLen + 1 + c) & 0xff
        val a = if (c > 0) cur(c - 1) & 0xff else 0 // left
        val b = prev(c) & 0xff // up
        val ul = if (c > 0) prev(c - 1) & 0xff else 0 // upper-left
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - ul
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else ul)
          case _ => fail(id, s"unsupported PNG filter type $ft in stream")
        }
        cur(c) = (v & 0xff).toByte
        c += 1
      }
      System.arraycopy(cur, 0, out, r * columns, columns)
      prev = cur
      r += 1
    }
    out
  }

  /** Decoded stream bytes of the object at `off` with dict `hdr`, when
    * the dict declares /Length: length-framed (loud on overrun, with
    * the spec's optional EOL before `endstream` tolerated), FlateDecode
    * inflated when declared, PNG-row predictor reversed when
    * /DecodeParms declares one. None when the object has no stream.
    * An indirect `/Length N 0 R` (the form writers that stream their
    * output emit — the length isn't known until the stream is written)
    * is resolved through `resolveLen`; callers where the spec REQUIRES
    * a direct value (the xref stream's own dict, §7.5.8.2) pass a
    * resolver that fails loudly. `decrypt` is applied to the stored
    * bytes BEFORE filter decode — encryption is the outermost layer
    * (§7.6.2: stored = Encrypt(Filter(data))); unencrypted documents
    * and never-encrypted stream kinds (the xref stream itself) pass
    * identity. */
  private def decodedStream(id: Long, s: String, off: Int,
      hdr: String, resolveLen: Int => Long,
      decrypt: Array[Byte] => Array[Byte]): Option[Array[Byte]] = {
    "/Length\\s+(\\d+)(\\s+\\d+\\s+R)?".r.findFirstMatchIn(hdr).map { m =>
      val len =
        if (m.group(2) == null) m.group(1).toInt
        else {
          val v = resolveLen(m.group(1).toInt)
          if (v < 0L || v > Int.MaxValue.toLong)
            fail(id, s"implausible indirect /Length $v")
          v.toInt
        }
      val kw = s.indexOf("stream", off)
      if (kw < 0) fail(id, s"object at $off declares /Length but has no stream")
      val dataAt =
        if (s.startsWith("stream\r\n", kw)) kw + 8
        else if (s.startsWith("stream\n", kw)) kw + 7
        else fail(id, s"malformed stream keyword at byte $kw")
      // spec: an EOL may precede `endstream` and is not stream data
      var e = dataAt + len
      if (e < s.length && s.charAt(e) == '\r') e += 1
      if (e < s.length && s.charAt(e) == '\n') e += 1
      if (!s.startsWith("endstream", e))
        fail(id, s"stream at $dataAt overruns its /Length")
      val raw = decrypt(s.substring(dataAt, dataAt + len).getBytes(ISO_8859_1))
      val inflated =
        if (FlateRe.findFirstIn(hdr).isDefined) inflateBytes(id, raw) else raw
      val pred = dictInt(hdr, "/Predictor").getOrElse(1)
      if (pred >= 10)
        unpredictPng(id, inflated, dictInt(hdr, "/Columns").getOrElse(1))
      else if (pred != 1) fail(id, s"unsupported /Predictor $pred")
      else inflated
    }
  }

  /** One cross-reference entry: type 1 = direct object at byte offset
    * `a`; type 2 = object number `b`-th member of object stream `a`. */
  private final case class XEntry(tpe: Int, a: Long, b: Int)

  /** Parse one PDF's bytes: xref-driven object walk (every reference
    * validated against the object it addresses), streams read by
    * /Length and decoded per their declared filters, `(…) Tj` string
    * bytes unescaped and concatenated in object order. Handles BOTH
    * cross-reference generations: the classic 1.4 xref TABLE, and the
    * 1.5+ XREF STREAM (/W-array binary entries, optional /Index,
    * FlateDecode + PNG predictors) with OBJECT STREAMS (/Type /ObjStm)
    * holding the non-stream objects — the layout the majority of wild
    * PDFs have shipped since ~2005 — plus incremental-update /Prev
    * chains (newest-first, free-entry shadowing), hybrid-reference
    * /XRefStm files, indirect /Length, and RC4 Standard-handler
    * encryption with the empty user password (the owner-locked
    * class). Remaining loud fences: real user passwords, AES (/V 4+),
    * CMap-encoded fonts (SCALE.md). n_objects counts DOCUMENT
    * objects — xref/objstm/encrypt/length-helper plumbing is
    * excluded, so every layout of one document publishes the same
    * deterministic surface. Loud on any structural corruption. */
  private[graft] def extract(id: Long, bytes: Array[Byte]): PdfExtract = {
    val s = new String(bytes, ISO_8859_1)
    if (!s.startsWith("%PDF-1.") || s.length < 9 ||
        s.charAt(7) < '4' || s.charAt(7) > '7' || s.charAt(8) != '\n')
      fail(id, "bad header")
    val xrefAt = s.lastIndexOf("\nstartxref\n")
    if (xrefAt < 0) fail(id, "no startxref")
    val xrefOff = s.substring(xrefAt + 11, s.indexOf('\n', xrefAt + 11)).trim.toInt
    // Both generations, and any number of INCREMENTAL-UPDATE sections
    // (PDF 1.4 §3.4.5: each save appends new objects plus a new xref
    // whose trailer /Prev links the section before it), land in one
    // entry map. Sections are walked NEWEST-FIRST and the first
    // definition of an object number wins — including a FREE (deleted)
    // entry, which must shadow older sections so a deleted object
    // cannot be resurrected by the original file body. None = free.
    val entries =
      scala.collection.mutable.SortedMap.empty[Int, Option[XEntry]]
    var size = -1 // the NEWEST section's /Size: max object number + 1
    // Encryption state lives in the NEWEST trailer (every conformant
    // save rewrites /Encrypt + /ID there): captured once, first
    // section seen = newest.
    var trailerSeen = false
    var encRef = -1
    var fileId: Array[Byte] = Array.emptyByteArray
    val IdRe = "/ID\\s*\\[\\s*<([0-9a-fA-F\\s]*)>".r
    def captureTrailer(trailer: String): Unit = if (!trailerSeen) {
      trailerSeen = true
      size = dictInt(trailer, "/Size").getOrElse(fail(id, "no /Size"))
      encRef = dictInt(trailer, "/Encrypt").getOrElse(-1)
      IdRe.findFirstMatchIn(trailer).foreach { m =>
        val hex = m.group(1).filterNot(isPdfWs)
        if (hex.length % 2 == 0 && hex.nonEmpty)
          fileId = hex.grouped(2)
            .map(h => Integer.parseInt(h, 16).toByte).toArray
      }
    }
    val visited = scala.collection.mutable.Set.empty[Int]
    def note(objNum: Int, e: Option[XEntry]): Unit =
      if (objNum != 0 && !entries.contains(objNum)) entries(objNum) = e
    // §7.5.8.2: every entry of the xref stream's OWN dict must be
    // direct — an indirect /Length there is a chicken-and-egg the spec
    // forbids, so it stays a loud fence
    def noIndirectLen(n: Int): Long =
      fail(id, s"indirect /Length ($n 0 R) in an xref stream dict")
    // 1.5+ XREF STREAM section: the offset addresses an object whose
    // stream holds binary entries, /W giving the three field widths.
    // When it is the SIDE stream of a hybrid-reference file
    // (§7.5.8.4), it supplements one classic section and shall not
    // carry its own /Prev — the table's trailer drives the chain.
    def parseXrefStream(off: Int, depth: Int, hybridSide: Boolean): Unit = {
      if ("^\\d+ 0 obj".r.findFirstIn(
          s.substring(off, math.min(s.length, off + 24))).isEmpty)
        fail(id, if (hybridSide) "/XRefStm does not address an object"
          else "startxref does not address xref")
      val hdrEnd = dictEnd(id, s, off)
      val hdr = if (hdrEnd < 0) fail(id, "xref stream object has no dict")
        else s.substring(off, hdrEnd)
      if (!hdr.contains("/XRef"))
        fail(id, "startxref addresses neither an xref table nor an XRef stream")
      val secSize = dictInt(hdr, "/Size").getOrElse(fail(id, "no /Size"))
      captureTrailer(hdr) // an xref stream's dict doubles as the trailer
      val wM = "/W\\s*\\[\\s*(\\d+)\\s+(\\d+)\\s+(\\d+)\\s*\\]".r
        .findFirstMatchIn(hdr).getOrElse(fail(id, "xref stream has no /W"))
      val w1 = wM.group(1).toInt; val w2 = wM.group(2).toInt
      val w3 = wM.group(3).toInt
      if (w1 > 4 || w2 > 8 || w3 > 4)
        fail(id, s"implausible /W [$w1 $w2 $w3]")
      val index: Seq[(Int, Int)] =
        "/Index\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(hdr) match {
          case Some(m) =>
            val ns = m.group(1).trim.split("\\s+").filter(_.nonEmpty)
              .map(_.toInt).toSeq
            if (ns.length % 2 != 0) fail(id, "odd /Index array")
            ns.grouped(2).map(p => (p.head, p(1))).toSeq
          case None => Seq((0, secSize))
        }
      // §7.5.8.2: the xref stream is NEVER encrypted (it must be
      // readable before the encryption dict can be located)
      val data = decodedStream(id, s, off, hdr, noIndirectLen, identity)
        .getOrElse(fail(id, "xref stream has no /Length"))
      val entryLen = w1 + w2 + w3
      if (data.length != index.map(_._2).sum * entryLen)
        fail(id, s"xref stream data ${data.length} != ${index.map(_._2).sum} entries of $entryLen")
      var p = 0
      def field(w: Int): Long = {
        var v = 0L
        var k = 0
        while (k < w) { v = (v << 8) | (data(p) & 0xffL); p += 1; k += 1 }
        v
      }
      index.foreach { case (first, count) =>
        (0 until count).foreach { k =>
          val traw = field(w1)
          val t = if (w1 == 0) 1L else traw // type defaults to 1 (spec)
          val a = field(w2); val b = field(w3)
          val objNum = first + k
          if (objNum != 0) {
            if (t == 0L) note(objNum, None) // free: shadows older defs
            else if (t == 1L || t == 2L)
              note(objNum, Some(XEntry(t.toInt, a, b.toInt)))
            else fail(id, s"unknown xref entry type $t")
          }
        }
      }
      dictInt(hdr, "/Prev").foreach { prev =>
        if (hybridSide)
          fail(id, "a hybrid /XRefStm shall not carry /Prev (§7.5.8.4)")
        parseSection(prev, depth + 1)
      }
    }
    def parseSection(off: Int, depth: Int): Unit = {
      if (!visited.add(off)) fail(id, s"xref /Prev chain cycle at byte $off")
      if (depth > 64) fail(id, "xref /Prev chain implausibly long")
      if (s.startsWith("xref", off)) {
        // classic cross-reference TABLE: "first count" subsection
        // headers each followed by `count` fixed 20-byte rows (flag
        // 'n' = in use at offset, 'f' = free), then the trailer dict.
        // Rows are BUFFERED, not noted, until the trailer is read:
        // a hybrid-reference trailer (/XRefStm, §7.5.8.4) hides
        // objects from legacy readers by marking them free here while
        // defining them in a side xref stream — the stream's entries
        // must be noted FIRST so they win under first-definition-wins,
        // or the hidden catalog/pages would read as deleted.
        val rows =
          scala.collection.mutable.ArrayBuffer.empty[(Int, Option[XEntry])]
        var p = s.indexOf('\n', off)
        if (p < 0) fail(id, "truncated xref table")
        p += 1
        val sub = "(\\d+)\\s+(\\d+)".r
        var trailerAt = -1
        while (trailerAt < 0) {
          val eol = s.indexOf('\n', p)
          if (eol < 0) fail(id, "xref table has no trailer")
          val line = s.substring(p, eol).trim
          if (line.startsWith("trailer")) trailerAt = p
          else line match {
            case sub(f0, c0) =>
              val first = f0.toInt
              p = eol + 1
              (0 until c0.toInt).foreach { k =>
                if (p + 20 > s.length) fail(id, "truncated xref row")
                val row = s.substring(p, p + 20)
                row.charAt(17) match {
                  case 'n' => rows += (first + k) ->
                    Some(XEntry(1, row.substring(0, 10).trim.toLong, 0))
                  case 'f' => rows += (first + k) -> None
                  case c => fail(id, s"bad xref row flag '$c'")
                }
                p += 20
              }
            case _ => fail(id, s"bad xref subsection header '$line'")
          }
        }
        val dictAt = s.indexOf("<<", trailerAt)
        if (dictAt < 0) fail(id, "trailer has no dict")
        val trailer = s.substring(dictAt, dictEnd(id, s, dictAt))
        captureTrailer(trailer)
        dictInt(trailer, "/XRefStm").foreach { xs =>
          if (!visited.add(xs))
            fail(id, s"xref /Prev chain cycle at byte $xs")
          parseXrefStream(xs, depth, hybridSide = true)
        }
        rows.foreach { case (objNum, e) => note(objNum, e) }
        dictInt(trailer, "/Prev").foreach(parseSection(_, depth + 1))
      } else parseXrefStream(off, depth, hybridSide = false)
    }
    parseSection(xrefOff, 0)
    entries.keys.lastOption.foreach { k =>
      if (k >= size) fail(id, s"xref entry $k beyond /Size $size")
    }

    var xrefValid = true
    // the bare-integer body of a type-1 object, when it is one — the
    // shape of a /Length helper object (writers that stream their
    // output emit the length AFTER the stream bytes as its own object)
    def bareIntBody(objNum: Int, off: Int): Option[Long] = {
      val b0 = off + s"$objNum 0 obj".length
      val e = s.indexOf("endobj", b0)
      if (e < 0) None
      else {
        val tok = s.substring(b0, e).trim
        if (tok.nonEmpty && tok.forall(_.isDigit) && tok.length < 19)
          Some(tok.toLong)
        else None
      }
    }
    // resolve an indirect /Length target through the xref: a direct
    // integer object (the only form our walk can reach before object
    // streams are decoded — a length hiding inside an ObjStm is a
    // circularity we reject loudly rather than half-resolve)
    def resolveLen(num: Int): Long = entries.get(num).flatten match {
      case Some(e) if e.tpe == 1 =>
        val off = e.a.toInt
        if (!s.startsWith(s"$num 0 obj", off))
          fail(id, s"xref offset for /Length object $num is wrong")
        bareIntBody(num, off).getOrElse(
          fail(id, s"/Length object $num is not a direct integer"))
      case Some(_) =>
        fail(id, s"/Length object $num lives inside an object stream")
      case None =>
        fail(id, s"/Length object $num is free or absent from the xref")
    }
    // Decryptor: when the newest trailer names /Encrypt, authenticate
    // the EMPTY user password (the owner-locked class §7.6.3) and
    // derive per-object RC4 keys; anything beyond that class — a real
    // user password, AES (/V 4+), a non-Standard handler — is LOUD.
    // All our references are generation 0 (`N 0 obj`), so the
    // per-object key uses gen 0.
    val decryptFor: Int => Array[Byte] => Array[Byte] =
      if (encRef < 0) _ => identity
      else {
        val e = entries.get(encRef).flatten
          .getOrElse(fail(id, s"/Encrypt object $encRef absent from xref"))
        if (e.tpe != 1)
          fail(id, "/Encrypt dict inside an object stream is not supported")
        val off = e.a.toInt
        if (!s.startsWith(s"$encRef 0 obj", off))
          fail(id, s"xref offset for /Encrypt object $encRef is wrong")
        val hdrEnd = dictEnd(id, s, off)
        val hdr = if (hdrEnd < 0) fail(id, "/Encrypt object has no dict")
          else s.substring(off, hdrEnd)
        if (!hdr.contains("/Standard"))
          fail(id, "non-Standard security handler is not supported")
        val v = dictInt(hdr, "/V").getOrElse(fail(id, "encrypt dict has no /V"))
        if (v != 1 && v != 2 && v != 4 && v != 5)
          fail(id, s"encryption /V $v is not supported")
        val r = dictInt(hdr, "/R").getOrElse(fail(id, "encrypt dict has no /R"))
        // the crypt-filter generations (V4/Acrobat 7+, V5/Acrobat 9+):
        // the named stream filter must be /StdCF and its /CFM picks
        // the cipher. An absent /StmF would mean Identity
        // (UNENCRYPTED streams inside an encrypted file) — a trap
        // worth refusing loudly rather than half-reading.
        def namedCfm(expect: String*): String = {
          val stmF = "/StmF\\s*/(\\w+)".r.findFirstMatchIn(hdr)
            .map(_.group(1)).getOrElse(
              fail(id, s"/V $v without /StmF (Identity streams) is not supported"))
          if (stmF != "StdCF") fail(id, s"unknown stream crypt filter /$stmF")
          val m = "/CFM\\s*/(\\w+)".r.findFirstMatchIn(hdr).map(_.group(1))
            .getOrElse(fail(id, s"/V $v crypt filter without /CFM"))
          if (!expect.contains(m))
            fail(id, s"crypt filter /CFM /$m is not supported at /V $v")
          m
        }
        if (v == 5) {
          // AES-256 generation: /U = hash(32) ‖ validation salt(8) ‖
          // key salt(8); the R6 hash (Algorithm 2.B) authenticates the
          // empty user password and the key-salt hash unwraps the
          // 256-bit file key from /UE; streams decrypt under the FILE
          // key directly (no per-object derivation). /Perms re-seals
          // /P under the file key — a mismatch means a tampered or
          // mis-derived key: loud.
          if (r != 6) fail(id, s"/V 5 with /R $r is not supported (expect R6)")
          namedCfm("AESV3")
          val u = pdfStringValue(id, hdr, "/U")
          if (u.length != 48) fail(id, s"/V 5 /U length ${u.length} != 48")
          val none = Array.emptyByteArray
          if (!java.util.Arrays.equals(
              hash2B(none, u.slice(32, 40), none), u.take(32)))
            fail(id, "password-protected (the empty user password was rejected)")
          val ue = pdfStringValue(id, hdr, "/UE")
          if (ue.length != 32) fail(id, s"/V 5 /UE length ${ue.length} != 32")
          val key32 = aesRaw(hash2B(none, u.slice(40, 48), none), ue,
            encrypt = false, cbcZeroIv = true)
          if (hdr.contains("/Perms")) {
            val perms = pdfStringValue(id, hdr, "/Perms")
            if (perms.length != 16) fail(id, "/Perms length != 16")
            val dec = aesRaw(key32, perms, encrypt = false, cbcZeroIv = false)
            if (dec(9) != 'a' || dec(10) != 'd' || dec(11) != 'b')
              fail(id, "/Perms does not decrypt to 'adb' (tampered or wrong key)")
            val pDict = dictSignedInt(hdr, "/P")
              .getOrElse(fail(id, "encrypt dict has no /P"))
            val pSealed = (dec(0) & 0xff) | ((dec(1) & 0xff) << 8) |
              ((dec(2) & 0xff) << 16) | ((dec(3) & 0xff) << 24)
            if (pSealed != pDict)
              fail(id, s"/Perms seals /P $pSealed but the dict says $pDict")
          }
          num => data => aesCbc(id, key32, data, encrypt = false)
        } else {
          if (r != 2 && r != 3 && r != 4)
            fail(id, s"encryption /R $r is not supported")
          val aes = if (v == 4) namedCfm("AESV2", "V2") == "AESV2" else false
          val bits = dictInt(hdr, "/Length").getOrElse(40)
          if (bits % 8 != 0 || bits < 40 || bits > 128)
            fail(id, s"implausible encryption /Length $bits")
          val keyLen = if (v == 1) 5 else bits / 8
          val o = pdfStringValue(id, hdr, "/O")
          val u = pdfStringValue(id, hdr, "/U")
          if (o.length != 32 || u.length != 32)
            fail(id, s"encrypt /O|/U lengths ${o.length}/${u.length} != 32")
          val p = dictSignedInt(hdr, "/P").getOrElse(fail(id, "encrypt dict has no /P"))
          if (fileId.isEmpty)
            fail(id, "encrypted file without a trailer /ID (key underivable)")
          val key = fileKey(r, keyLen, o, p, fileId)
          val uCheck = userBytes(r, key, fileId)
          val uOk = if (r == 2) java.util.Arrays.equals(uCheck, u)
            else java.util.Arrays.equals(uCheck.take(16), u.take(16))
          if (!uOk)
            fail(id, "password-protected (the empty user password was rejected)")
          if (aes) num => data =>
            aesCbc(id, objectKey(key, num, 0, aes = true), data, encrypt = false)
          else num => data => rc4(objectKey(key, num, 0), data)
        }
      }
    // pre-pass: decode each referenced OBJECT STREAM and index its
    // member bodies (objNum -> body text; streams can't nest in an
    // ObjStm per spec, so members are dict/array/primitive only)
    val objstmBodies = scala.collection.mutable.Map.empty[Int, Map[Int, String]]
    entries.values.flatten.filter(_.tpe == 2).map(_.a.toInt)
      .toSet[Int].foreach { sn =>
      val e = entries.get(sn).flatten.getOrElse(
        fail(id, s"object stream $sn is not in the xref"))
      if (e.tpe != 1) fail(id, s"object stream $sn is itself indirect")
      val off = e.a.toInt
      if (!s.startsWith(s"$sn 0 obj", off))
        fail(id, s"xref offset for object stream $sn is wrong")
      val hdrEnd = dictEnd(id, s, off)
      val hdr = if (hdrEnd < 0) fail(id, s"object stream $sn has no dict")
        else s.substring(off, hdrEnd)
      if (!hdr.contains("/ObjStm")) fail(id, s"object $sn is not an ObjStm")
      val n = dictInt(hdr, "/N").getOrElse(fail(id, "ObjStm has no /N"))
      val first = dictInt(hdr, "/First").getOrElse(fail(id, "ObjStm has no /First"))
      val body = new String(
        decodedStream(id, s, off, hdr, resolveLen, decryptFor(sn))
          .getOrElse(fail(id, "ObjStm has no /Length")), ISO_8859_1)
      if (first > body.length) fail(id, "ObjStm /First beyond stream end")
      val nums = body.substring(0, first).trim.split("\\s+")
        .filter(_.nonEmpty).map(_.toInt)
      if (nums.length != 2 * n) fail(id, "ObjStm header pair count mismatch")
      val pairs = nums.grouped(2).map(a => (a(0), a(1))).toSeq
      objstmBodies(sn) = pairs.zipWithIndex.map { case ((objNum, rel), i) =>
        val from = first + rel
        val to = if (i + 1 < pairs.length) first + pairs(i + 1)._2
          else body.length
        if (from > to || to > body.length)
          fail(id, s"ObjStm member $objNum range [$from,$to) out of bounds")
        objNum -> body.substring(from, to)
      }.toMap
    }

    // object walk in object-number order: count document objects and
    // pages, tokenize content streams for Tj show ops
    var nDocObjs = 0L
    var nPages = 0L
    var nOps = 0L
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach {
      case (_, None) => // free (deleted) — not part of the document
      case (objNum, Some(e)) =>
        if (e.tpe == 1) {
          val off = e.a.toInt
          if (!s.startsWith(s"$objNum 0 obj", off)) xrefValid = false
          val hdrEnd = dictEnd(id, s, off)
          val hdr = if (hdrEnd < 0) "" else s.substring(off, hdrEnd)
          // format plumbing is excluded from the document-object count
          // and never Tj-tokenized: xref/objstm containers (binary
          // decoded bytes, not content), bare-integer /Length helper
          // objects (stream framing, not content), and the /Encrypt
          // dict (file security metadata) — so direct,
          // indirect-length, 1.5, and encrypted layouts of the same
          // document all publish the same deterministic surface
          val lenHelper = hdrEnd < 0 && bareIntBody(objNum, off).isDefined
          if (!hdr.contains("/ObjStm") && !hdr.contains("/XRef") &&
              !lenHelper && objNum != encRef) {
            nDocObjs += 1
            if (hdr.contains("/Type /Page ")) nPages += 1
            decodedStream(id, s, off, hdr, resolveLen, decryptFor(objNum))
              .foreach { raw =>
                nOps += tokenizeTj(id, new String(raw, ISO_8859_1), out)
              }
          }
        } else objstmBodies(e.a.toInt).get(objNum) match {
          case None => xrefValid = false
          case Some(body) =>
            nDocObjs += 1
            if (body.contains("/Type /Page ")) nPages += 1
        }
    }
    PdfExtract(id, nDocObjs, nPages, nOps, xrefValid,
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

  /** The GENERATIONS twin: doc_id (mod 8) picks the container
    * layout — 0 → PDF 1.5 (xref stream + object stream, [[build15]]),
    * 1 → classic flate 1.4, 2 → a TWO-SAVE INCREMENTAL-UPDATE CHAIN
    * (each save /Prev-links the previous xref and frees the replaced
    * page tree — [[buildIncrementalChain]]), 3 → indirect `/Length N
    * 0 R` streams, 4 → HYBRID-REFERENCE (classic table hiding the
    * object-stream members behind a /XRefStm side stream,
    * [[buildHybrid]]), 5 → RC4-ENCRYPTED (Standard handler V2/R3,
    * empty user password — [[buildEncrypted]]), 6 → AES-ENCRYPTED
    * (V4/R4 /AESV2 crypt filter: IV-prefixed AES-128-CBC streams),
    * 7 → AES-256-ENCRYPTED (V5/R6 /AESV3: the R6 Algorithm-2.B hash
    * authenticates, /UE unwraps the 256-bit file key) — so one query
    * exercises both cross-reference machineries, the update-chain
    * walk, free-entry shadowing, indirect-length resolution, hybrid
    * side-stream precedence, AND all three authenticate→derive→
    * decrypt cipher generations end to end. The deterministic surface
    * is layout-independent by construction, so the SAME oracle
    * hash-checks all eight paths: an xref-stream decode, /W-field,
    * ObjStm-indexing, chain-walk, resurrection, length-resolution,
    * hybrid-precedence, key-derivation, key-unwrap, or CBC-layering
    * defect flips the driver hash. */
  def qPdfExtractXref15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        extract(id, (id % 8) match {
          case 0 => build15(text)
          case 1 => build(text, flate = true)
          case 2 => buildIncrementalChain(
            Seq("draft v1", "draft v2 — still not final", text),
            flate = true)
          case 3 => build(text, indirectLen = true)
          case 4 => buildHybrid(text)
          case 5 => buildEncrypted(text, flate = true)
          case 6 => buildEncrypted(text, flate = true, cfm = Some("AESV2"))
          case _ => buildEncrypted(text, flate = true, cfm = Some("AESV3"))
        })
      })
      .toDF()
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pdf_extract" -> qPdfExtract,
    "q_pdf_extract_flate" -> qPdfExtractFlate,
    "q_pdf_extract_xref15" -> qPdfExtractXref15
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
    "q_pdf_extract_flate" -> extractOracle,
    // generation-independent surface: 1.5 xref/object streams must
    // publish exactly what the 1.4 table generation publishes
    "q_pdf_extract_xref15" -> extractOracle
  )
}
