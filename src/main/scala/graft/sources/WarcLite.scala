package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

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
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(": ")
        require(i > 0, s"$where: malformed header line '$line'")
        (line.substring(0, i), line.substring(i + 2)) match {
          case ("doc-id", v) => id = v.toLong
          case ("url", v) => url = v
          case ("content-length", v) => len = v.toInt
          case _ => // forward-compatible: unknown headers are skipped
        }
        line = readLine()
      }
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
}
