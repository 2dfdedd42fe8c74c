package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream, OutputStream,
  RandomAccessFile}

/** The filesystem seam between the container codecs and storage
  * (VERDICT r14 item 5). WarcLite's three storage touchpoints — the
  * container/sidecar writers and the CDX fetch's positioned reads —
  * go through this trait instead of naked java.io, so a cluster deploy
  * is a constructor swap (a Hadoop-FS impl: `create` →
  * `FileSystem.create`, `openSeekable` → `FSDataInputStream.seek`,
  * `list` → `listStatus`), not an edit to the codecs. Implementations
  * must be Serializable: instances ride task closures to executors.
  *
  * Semantics every impl must honor:
  *  - `create` makes the written object visible ATOMICALLY at close —
  *    a reader never observes a half-written container (local impl:
  *    dot-temp sibling + POSIX rename; HDFS-likes: create+rename or
  *    the store's native atomic commit).
  *  - `openSeekable` is a positioned reader over one immutable object.
  *  - `list` is a flat, deterministic (sorted) listing — container
  *    enumeration must not depend on directory iteration order. */
trait GraftFs extends Serializable {

  /** Atomic create (parents included): bytes become visible as `path`
    * only when the returned stream closes. */
  def create(path: String): OutputStream

  /** Positioned reader over the object at `path`. */
  def openSeekable(path: String): GraftFs.SeekableIn

  /** Sorted flat listing of `dir`'s entries ending in `suffix`,
    * as full paths. Empty when `dir` does not exist. */
  def list(dir: String, suffix: String): Seq[String]

  /** Ensure `dir` exists (writers call this once, driver-side, so an
    * all-empty-partition write still leaves a readable empty dir —
    * the pre-seam java.io behavior). */
  def mkdirs(dir: String): Unit
}

object GraftFs {

  /** A seekable byte source — the reader shape both a local
    * RandomAccessFile and a Hadoop FSDataInputStream satisfy. */
  trait SeekableIn extends AutoCloseable {
    def seek(off: Long): Unit
    /** Fill `buf` completely; loud (EOFException) on short reads —
      * an indexed range that runs off the object end is corruption. */
    def readFully(buf: Array[Byte]): Unit
    /** Sequential read of up to `len` bytes into `buf[off,…)`;
      * -1 at end of object. */
    def read(buf: Array[Byte], off: Int, len: Int): Int
    def close(): Unit
  }

  /** The sandbox impl: java.io over local disk. Atomicity: write to a
    * dot-temp sibling in the same directory, then rename — atomic on
    * POSIX, and the dot-prefix keeps in-flight temps out of `list`
    * (which a concurrent reader may be running). */
  object Local extends GraftFs {
    override def create(path: String): OutputStream = {
      val target = new File(path)
      Option(target.getParentFile).foreach(_.mkdirs())
      val tmp = new File(target.getParentFile, "." + target.getName + ".tmp")
      val out = new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16)
      new OutputStream {
        override def write(b: Int): Unit = out.write(b)
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          out.write(b, off, len)
        override def flush(): Unit = out.flush()
        override def close(): Unit = {
          out.close()
          if (!tmp.renameTo(target)) {
            tmp.delete()
            throw new java.io.IOException(
              s"atomic publish failed: $tmp -> $target")
          }
        }
      }
    }

    override def openSeekable(path: String): SeekableIn = new SeekableIn {
      private val raf = new RandomAccessFile(path, "r")
      override def seek(off: Long): Unit = raf.seek(off)
      override def readFully(buf: Array[Byte]): Unit = raf.readFully(buf)
      override def read(buf: Array[Byte], off: Int, len: Int): Int =
        raf.read(buf, off, len)
      override def close(): Unit = raf.close()
    }

    override def list(dir: String, suffix: String): Seq[String] = {
      val d = new File(dir)
      val fs = Option(d.listFiles()).getOrElse(Array.empty[File])
      fs.filter(f => f.isFile && f.getName.endsWith(suffix))
        .map(_.getPath).sorted.toSeq
    }

    override def mkdirs(dir: String): Unit = { new File(dir).mkdirs(); () }
  }
}