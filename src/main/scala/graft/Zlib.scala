package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{DataFormatException, Deflater, Inflater}

/** The one deflate/inflate pump shared by every container codec
  * (gzip members in WarcLite, FlateDecode streams in PdfLite) — a
  * correctness fix to the pump (buffer handling, the k==0 truncation
  * edge) lands everywhere at once instead of drifting across hand-
  * rolled copies. zlib-wrapped (RFC 1950) or raw (nowrap) per flag. */
private[graft] object Zlib {

  /** Compress `raw` at `level`; `nowrap` = raw deflate (no zlib
    * header/adler32 — the gzip-member body form). */
  def deflate(raw: Array[Byte], level: Int, nowrap: Boolean): Array[Byte] = {
    val d = new Deflater(level, nowrap)
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) {
      val k = d.deflate(buf)
      out.write(buf, 0, k)
    }
    d.end()
    out.toByteArray
  }

  /** Inflate `len` bytes of `in` from `off`; returns (bytes, compressed
    * bytes consumed — the member-boundary cursor gzip walking needs).
    * Loud (IllegalArgumentException tagged `where`) on damaged or
    * truncated data; with `nowrap=false` zlib's adler32 makes in-place
    * corruption fail too. */
  def inflate(in: Array[Byte], off: Int, len: Int, nowrap: Boolean,
      where: String): (Array[Byte], Int) = {
    val inf = new Inflater(nowrap)
    try {
      inf.setInput(in, off, len)
      val out = new ByteArrayOutputStream(1 << 12)
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val k =
          try inf.inflate(buf)
          catch { case e: DataFormatException =>
            throw new IllegalArgumentException(
              s"$where: corrupt deflate data: ${e.getMessage}")
          }
        require(k > 0 || inf.finished(),
          s"$where: truncated deflate stream")
        out.write(buf, 0, k)
      }
      (out.toByteArray, inf.getBytesRead.toInt)
    } finally inf.end()
  }
}
