package graft.sources

import java.io.{BufferedOutputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC-LITE — a record-framed crawl container (the shape of the ISO
  * 28500 WARC files a crawl pipeline actually starts from, reduced to
  * the fields this engine consumes): each record is a small header
  * block (magic line + `key: value` lines + blank line) followed by
  * exactly `content-length` payload bytes. Length-prefixed framing is
  * the load-bearing property: payloads may contain ANYTHING, including
  * the magic string and newlines — the parser never scans payload
  * bytes for delimiters, it skips them by count (real WARC's design,
  * and why it streams at any payload content).
  *
  * Write side: one container file per input partition, records framed
  * back-to-back — the many-GB-file layout crawl archives ship in.
  * Read side: `binaryFile` source (one task per container) + a
  * per-partition sequential parse; at 100 TB parallelism comes from
  * file count (crawl archives are ~1 GB per container by convention),
  * each task a single linear pass, payload bytes never shuffled until
  * a downstream projection asks for them.
  *
  * Compressed path: real crawl archives are per-record gzip members
  * (ISO 28500 §6) — [[writeGz]]/[[readGz]] add that layer, one RFC 1952
  * member per record, member-aligned so any record decompresses alone.
  *
  * Local java.io is the sandbox's filesystem seam; a cluster deploy
  * swaps the two file touchpoints for the Hadoop FS API (same framing
  * bytes). */
object WarcLite {

  private[graft] val Magic = "GRAFT-WARC/1"

  final case class WarcRecord(doc_id: Long, url: String,
      payload: Array[Byte])

  /** Frame one record into `out`. */
  private def frame(out: java.io.OutputStream, r: WarcRecord): Unit = {
    val header = (Magic + "\n" +
      s"doc-id: ${r.doc_id}\n" +
      s"url: ${r.url}\n" +
      s"content-length: ${r.payload.length}\n" +
      "\n").getBytes(UTF_8)
    out.write(header)
    out.write(r.payload)
    out.write('\n')
  }

  /** Write a container dir: one `part-NNNNN.warc` per non-empty input
    * partition. Deterministic per partition content; callers that need
    * deterministic FILES repartition deterministically first. */
  def write(records: Dataset[WarcRecord], outDir: String): Unit = {
    new File(outDir).mkdirs()
    records.foreachPartition { (it: Iterator[WarcRecord]) =>
      if (it.hasNext) {
        val pid = TaskContext.get().partitionId()
        val f = new File(outDir, f"part-$pid%05d.warc")
        val out = new BufferedOutputStream(new FileOutputStream(f), 1 << 16)
        try it.foreach(frame(out, _)) finally out.close()
      }
    }
  }

  /** Parse one container's bytes into records — a single linear pass,
    * payload bytes skipped by count (never scanned). Loud on any
    * framing corruption: a container that doesn't parse is a data
    * problem upstream, not something to paper over. */
  private[graft] def parse(bytes: Array[Byte],
      where: String): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var pos = 0
    private def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      require(pos < bytes.length, s"$where: truncated header at byte $start")
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 1
      s
    }
    override def hasNext: Boolean = pos < bytes.length
    override def next(): WarcRecord = {
      val magic = readLine()
      require(magic == Magic, s"$where: bad magic '$magic' at record start")
      var id = -1L; var url = ""; var len = -1
      var seenId = false; var seenUrl = false
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(": ")
        require(i > 0, s"$where: malformed header line '$line'")
        (line.substring(0, i), line.substring(i + 2)) match {
          case ("doc-id", v) => id = v.toLong; seenId = true
          case ("url", v) => url = v; seenUrl = true
          case ("content-length", v) => len = v.toInt
          case _ => // forward-compatible: unknown headers are skipped
        }
        line = readLine()
      }
      // a record missing its identity headers is framing corruption, not
      // a sentinel row — same loud contract as a bad length
      require(seenId, s"$where: record at byte $pos missing doc-id header")
      require(seenUrl, s"$where: record at byte $pos missing url header")
      require(len >= 0 && pos + len <= bytes.length,
        s"$where: bad content-length $len at byte $pos")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      require(pos < bytes.length && bytes(pos) == '\n',
        s"$where: missing record terminator at byte $pos")
      pos += 1
      WarcRecord(id, url, payload)
    }
  }

  /** Read a container dir back as a Dataset: one task per container
    * file (binaryFile source), one linear parse per task. */
  def read(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) => parse(bytes, path) })
  }

  // --- gzip-member containers (the shape real crawl archives ship in) --
  //
  // ISO 28500 §6 (public): a .warc.gz is a plain concatenation of
  // independent gzip members, ONE record per member — that alignment is
  // what lets a reader seek to any member boundary and decompress one
  // record without touching the rest of a multi-GB container. The
  // writer below emits RFC 1952 members byte-for-byte (fixed header,
  // raw-deflate body, CRC32 + ISIZE trailer); the reader walks members
  // by the deflate stream's own end, verifies both trailer fields, and
  // requires each member to inflate to exactly one framed record.

  /** One RFC 1952 gzip member around `raw`: 10-byte fixed header
    * (magic, CM=8, FLG=0, MTIME=0, XFL=0, OS=0 — fully deterministic),
    * raw-deflate body, CRC32 + ISIZE little-endian trailer. */
  private[graft] def gzWrap(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    out.write(graft.Zlib.deflate(raw, Deflater.DEFAULT_COMPRESSION,
      nowrap = true))
    val crc = new CRC32(); crc.update(raw)
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xffL).toInt))
    le32(crc.getValue); le32(raw.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Walk the gzip members of a container — one inflate per member,
    * member boundary found from the deflate stream's own final block
    * (getBytesRead), CRC32 and ISIZE both verified. Reads FOREIGN
    * writers' members too: RFC 1952 optional header fields
    * (FEXTRA/FNAME/FCOMMENT/FHCRC) are skipped per spec. Loud on any
    * corruption: bad magic, reserved header bits, truncated fields or
    * deflate data, trailer mismatch. */
  private[graft] def gzMembers(bytes: Array[Byte],
      where: String): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var pos = 0
    override def hasNext: Boolean = pos < bytes.length
    override def next(): Array[Byte] = {
      require(pos + 18 <= bytes.length,
        s"$where: truncated gzip member at byte $pos")
      require((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"$where: bad gzip magic at byte $pos")
      require(bytes(pos + 2) == 8,
        s"$where: unsupported gzip compression method ${bytes(pos + 2)}")
      // RFC 1952 §2.3.1 optional header fields: our writer emits FLG=0,
      // but archives from other writers routinely carry FNAME/FEXTRA —
      // skip each declared field (loud on truncation); reserved bits
      // (5–7) mean a format we don't know and are rejected
      val flg = bytes(pos + 3) & 0xff
      require((flg & 0xe0) == 0,
        s"$where: reserved gzip FLG bits set ($flg) at byte $pos")
      var dataAt = pos + 10
      def need(n: Int, what: String): Unit =
        require(dataAt + n <= bytes.length,
          s"$where: truncated gzip $what at byte $dataAt")
      if ((flg & 0x04) != 0) { // FEXTRA: 2-byte LE length + payload
        need(2, "FEXTRA length")
        val xlen = (bytes(dataAt) & 0xff) | ((bytes(dataAt + 1) & 0xff) << 8)
        dataAt += 2; need(xlen, "FEXTRA field"); dataAt += xlen
      }
      if ((flg & 0x08) != 0) { // FNAME: zero-terminated
        while ({ need(1, "FNAME"); bytes(dataAt) != 0 }) dataAt += 1
        dataAt += 1
      }
      if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
        while ({ need(1, "FCOMMENT"); bytes(dataAt) != 0 }) dataAt += 1
        dataAt += 1
      }
      if ((flg & 0x02) != 0) { need(2, "FHCRC"); dataAt += 2 }
      // FTEXT (bit 0) is a content hint — nothing to skip
      val (raw, consumed) = graft.Zlib.inflate(bytes, dataAt,
        bytes.length - dataAt, nowrap = true, s"$where member at byte $pos")
      val trailerAt = dataAt + consumed
      require(trailerAt + 8 <= bytes.length,
        s"$where: truncated gzip trailer at byte $trailerAt")
      def le32(o: Int): Long =
        (0 until 4).map(i => (bytes(o + i).toLong & 0xffL) << (8 * i)).sum
      val crc = new CRC32(); crc.update(raw)
      require(le32(trailerAt) == crc.getValue,
        s"$where: gzip CRC mismatch in member at byte $pos")
      require(le32(trailerAt + 4) == (raw.length.toLong & 0xffffffffL),
        s"$where: gzip ISIZE mismatch in member at byte $pos")
      pos = trailerAt + 8
      raw
    }
  }

  /** Write a gzip-member container dir: one `part-NNNNN.warc.gz` per
    * non-empty input partition, each record its own gzip member — the
    * per-record-member layout of real crawl archives — plus a CDX-lite
    * sidecar index per container (`part-NNNNN.cdx`: one
    * `doc_id<TAB>offset<TAB>length<TAB>url` line per member, the
    * Common Crawl convention that makes members individually
    * addressable without decompressing the container). */
  def writeGz(records: Dataset[WarcRecord], outDir: String): Unit = {
    new File(outDir).mkdirs()
    records.foreachPartition { (it: Iterator[WarcRecord]) =>
      if (it.hasNext) {
        val pid = TaskContext.get().partitionId()
        val f = new File(outDir, f"part-$pid%05d.warc.gz")
        val out = new BufferedOutputStream(new FileOutputStream(f), 1 << 16)
        val cdx = new StringBuilder
        var off = 0L
        try it.foreach { r =>
          val frame0 = new ByteArrayOutputStream(r.payload.length + 128)
          frame(frame0, r)
          val member = gzWrap(frame0.toByteArray)
          out.write(member)
          cdx.append(s"${r.doc_id}\t$off\t${member.length}\t${r.url}\n")
          off += member.length
        } finally out.close()
        val idx = new FileOutputStream(new File(outDir, f"part-$pid%05d.cdx"))
        try idx.write(cdx.toString.getBytes(UTF_8)) finally idx.close()
      }
    }
  }

  /** The CDX-lite index of a gz container dir as a DataFrame
    * (container, doc_id, offset, length, url) — tiny text files, one
    * row per member. This is the frame predicates push down to: filter
    * it BEFORE [[fetchGz]] and only the selected members' bytes are
    * ever read or inflated. */
  def readCdx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(s"$dir/*.cdx")
      .select(input_file_name().as("container"), col("value"))
      .as[(String, String)]
      .map { case (cdxUri, line) =>
        val f = line.split("\t", 4)
        require(f.length == 4, s"$cdxUri: malformed cdx line '$line'")
        // input_file_name() is a percent-encoded URI — decode it to a
        // filesystem path (a space or non-ASCII char in the corpus dir
        // must not 404 the container), then swap the sidecar suffix
        // for the container it sits next to
        val cdxPath =
          if (cdxUri.startsWith("file:"))
            java.nio.file.Paths.get(java.net.URI.create(cdxUri)).toString
          else cdxUri
        val container = cdxPath.stripSuffix(".cdx") + ".warc.gz"
        (container, f(0).toLong, f(1).toLong, f(2).toInt, f(3))
      }
      .toDF("container", "doc_id", "offset", "length", "url")
  }

  /** Fetch exactly the members an index frame selects: each row seeks
    * to its member's byte range (RandomAccessFile — the local seam for
    * a cluster FS's positioned read), inflates that ONE member, and
    * requires it to hold the indexed record. Parallelism = index rows,
    * NOT container files: the tiny cdx text files would otherwise
    * coalesce into ~one scan partition, so the index is explicitly
    * REPARTITIONED across the cluster's slots before the seek stage —
    * one multi-GB container genuinely fans out across tasks (the
    * shuffle moves only (path, 2 longs, int, url) rows, never payload
    * bytes). Rows are then sorted by (container, offset) within
    * partitions so each task's reads advance sequentially through each
    * container; the open handle is closed on task completion, SUCCESS
    * OR FAILURE (a corrupt-member throw must not leak a descriptor). */
  def fetchGz(index: DataFrame): Dataset[WarcRecord] = {
    val spark = index.sparkSession
    import spark.implicits._
    index.select(col("container"), col("doc_id"), col("offset"),
        col("length"), col("url"))
      .as[(String, Long, Long, Int, String)]
      .repartition(spark.sparkContext.defaultParallelism)
      .sortWithinPartitions(col("container"), col("offset"))
      .mapPartitions { it =>
        var cur: java.io.RandomAccessFile = null
        var curPath: String = null
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
          _ => if (cur != null) { cur.close(); cur = null }
        })
        def open(path: String): java.io.RandomAccessFile = {
          if (path != curPath) {
            if (cur != null) cur.close()
            cur = new java.io.RandomAccessFile(path, "r"); curPath = path
          }
          cur
        }
        it.map { case (path, docId, off, len, _) =>
          val raf = open(path)
          raf.seek(off)
          val member = new Array[Byte](len)
          raf.readFully(member)
          val one = gzMembers(member, s"$path@$off")
          val rec = parse(one.next(), s"$path@$off").next()
          require(!one.hasNext && rec.doc_id == docId,
            s"$path@$off: index points at record ${rec.doc_id}, expected $docId")
          rec
        }
      }
  }

  /** Index-driven read of a gz container dir: the CDX fan-out path.
    * Same records as [[readGz]], but parallelism = member count and
    * any filter applied to [[readCdx]]'s frame first becomes a
    * container-level pushdown (unselected members are never read). */
  def readGzCdx(spark: SparkSession, dir: String): Dataset[WarcRecord] =
    fetchGz(readCdx(spark, dir))

  /** Read a gzip-member container dir: one task per container file,
    * members walked in order, each required to hold exactly one record
    * (the ISO 28500 §6 alignment invariant — a member holding 0 or 2
    * records would break per-record random access downstream). */
  def readGz(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        gzMembers(bytes, path).map { member =>
          val it = parse(member, path)
          val r = it.next()
          require(!it.hasNext, s"$path: gzip member holds more than one record")
          r
        }
      })
  }
}
