package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs behind the Multimodal batch interface (closes the
  * r7 "stubbed codec" gap): PNG/JPEG via `javax.imageio` and WAV/PCM16
  * via `javax.sound.sampled` — both in the JDK, no external library.
  *
  * PNG and WAV are LOSSLESS, so a corpus encoded from a deterministic
  * pixel/sample formula decodes back to exactly those values — which
  * makes decode queries driver-checkable: the DuckDB oracle recomputes
  * the same formula arithmetically while Spark goes the long way
  * through real encoded bytes (encode → container format → decode).
  * JPEG (decode AND quality-factor encode, r10) shares the same image
  * path but is lossy, so it is spec-tested on dimensions + bounded
  * pixel error + the quality ladder, not oracle-hashed; the JPEG
  * thumbnail query is rows-only by design, like q_text_compress_ratio.
  *
  * Scale notes: codecs run inside `mapPartitions` batches exactly like
  * the stub did — the binary payload never shuffles, decode parallelism
  * is partition parallelism, and per-batch memory is one decoded image
  * at a time. */
object Codec {

  // ImageIO's default stream cache is DISK-backed: every encode/decode
  // spills through a temp file, so a 32-thread executor encoding small
  // thumbnails serializes on file create/delete instead of computing.
  // Memory-cached streams are strictly better for our byte-array I/O
  // (images are bounded by the batch interface, never huge).
  ImageIO.setUseCache(false)

  private def toBufferedImage(width: Int, height: Int,
      rgb: Array[Byte]): BufferedImage = {
    require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != $width*$height*3")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        img.setRGB(x, y,
          ((rgb(i) & 0xFF) << 16) | ((rgb(i + 1) & 0xFF) << 8) | (rgb(i + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode a flat RGB byte array (row-major, 3 bytes/pixel, values
    * 0-255) as a real PNG. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(toBufferedImage(width, height, rgb), "png", out)
    out.toByteArray
  }

  /** Encode a flat RGB byte array as a real baseline JPEG at an
    * explicit quality factor (0..1, the libjpeg-style knob). Lossy by
    * design — [[decodeImage]] reads it back through the same image
    * path; CodecSpec pins the dims-exact/bounded-error contract and
    * the quality ladder (higher quality → more bytes, less error). */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte],
      quality: Float = 0.85f): Array[Byte] = {
    require(quality > 0f && quality <= 1f, s"quality $quality outside (0, 1]")
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(toBufferedImage(width, height, rgb), null, null),
        params)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode any ImageIO-supported container (PNG, JPEG, GIF, BMP) to
    * (width, height, flat row-major RGB bytes). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val i = (y * w + x) * 3
        rgb(i) = ((p >> 16) & 0xFF).toByte
        rgb(i + 1) = ((p >> 8) & 0xFF).toByte
        rgb(i + 2) = (p & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** 256-entry grayscale palette: GIF is palette-indexed, so an
    * explicit gray IndexColorModel makes the container LOSSLESS for
    * 8-bit gray pixels (no quantizer in the path) — the property that
    * lets the multi-frame corpus be oracle-hashed like PNG/WAV. */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val cmap = Array.tabulate(256)(i => (0xFF << 24) | (i << 16) | (i << 8) | i)
    new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
  }

  private def grayIndexed(width: Int, height: Int,
      gray: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(width, height,
      BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    img
  }

  /** Encode N same-size 8-bit grayscale frames as a real multi-frame
    * (animated) GIF via the JDK's GIF sequence writer. */
  def encodeGif(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame length ${f.length} != $width*$height"))
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(grayIndexed(width, height, f), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode every frame of a GIF container to 8-bit grayscale byte
    * arrays: (width, height, frames). Frames written full-size (as
    * [[encodeGif]] does) read back independently. */
  def decodeGifFrames(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "no frames in GIF payload")
      val frames = (0 until n).map { fi =>
        val img = reader.read(fi)
        val (w, h) = (img.getWidth, img.getHeight)
        val gray = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            gray(y * w + x) = ((img.getRGB(x, y) >> 16) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        gray
      }
      val first = reader.read(0)
      (first.getWidth, first.getHeight, frames)
    } finally { reader.dispose(); iis.close() }
  }

  /** Encode 16-bit signed PCM mono samples as a real RIFF/WAVE file. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(i * 2) = (samples(i) & 0xFF).toByte
      pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV container to (sampleRate, 16-bit signed PCM mono
    * samples) via the real audio file parser. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected PCM16 mono, got $fmt")
      val pcm = in.readAllBytes()
      val samples = new Array[Short](pcm.length / 2)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < samples.length) {
        val (lo, hi) = if (le) (pcm(i * 2), pcm(i * 2 + 1)) else (pcm(i * 2 + 1), pcm(i * 2))
        samples(i) = (((hi & 0xFF) << 8) | (lo & 0xFF)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, samples)
    } finally in.close()
  }
}
