package graft

import java.nio.file.{Files, Paths}

import graft.multimodal.{Codec, Multimodal}

/** The REAL codecs (javax.imageio PNG/JPEG, javax.sound WAV) behind
  * the Multimodal batch interface: lossless round-trips are exact,
  * JPEG decodes with bounded error, and fixture files on disk decode
  * the same as in-memory bytes (a browser-writable PNG is a
  * Spark-readable one). */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureDir = {
    val d = Paths.get("target", "graft-test", "codec-fixtures")
    Files.createDirectories(d)
    d
  }

  test("PNG round-trip is lossless: encode → decode returns the exact pixels") {
    val (w, h) = (13, 7)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = Codec.encodePng(w, h, rgb)
    // real container: PNG magic bytes
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (dw, dh, out) = Codec.decodeImage(png)
    assert((dw, dh) == (w, h))
    assert(out.toSeq == rgb.toSeq)
  }

  test("animated GIF round-trip is lossless: every frame's gray pixels exact") {
    val (w, h) = (11, 9)
    val frames = (0 until 4).map(f =>
      Array.tabulate(w * h)(i => ((f * 83 + i * 37 + 11) % 256).toByte))
    val gif = Codec.encodeGif(w, h, frames)
    // real container: GIF89a/GIF87a magic
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
    val (dw, dh, out) = Codec.decodeGifFrames(gif)
    assert((dw, dh) == (w, h))
    assert(out.length == 4)
    out.zip(frames).zipWithIndex.foreach { case ((got, want), fi) =>
      assert(got.toSeq == want.toSeq, s"frame $fi differs")
    }
  }

  test("GIF fixture file on disk decodes identically to the in-memory bytes") {
    val (w, h) = (9, 8)
    val frames = Seq(Array.tabulate(w * h)(i => ((i * 13) % 256).toByte),
      Array.tabulate(w * h)(i => ((i * 29 + 5) % 256).toByte))
    val gif = Codec.encodeGif(w, h, frames)
    val f = fixtureDir.resolve("fixture.gif")
    Files.write(f, gif)
    val (dw, dh, out) = Codec.decodeGifFrames(Files.readAllBytes(f))
    assert((dw, dh) == (w, h))
    assert(out.map(_.toSeq) == frames.map(_.toSeq))
  }

  test("PNG fixture file on disk decodes identically to the in-memory bytes") {
    val (w, h) = (8, 8)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7) % 256).toByte)
    val png = Codec.encodePng(w, h, rgb)
    val f = fixtureDir.resolve("fixture.png")
    Files.write(f, png)
    val (dw, dh, out) = Codec.decodeImage(Files.readAllBytes(f))
    assert((dw, dh) == (w, h) && out.toSeq == rgb.toSeq)
  }

  test("JPEG decodes through the same image path: exact dims, bounded pixel error") {
    val (w, h) = (16, 12)
    // smooth gradient — JPEG is lossy but close on low-frequency content
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3
      (((px % w) * 8 + (px / w) * 4) % 256).toByte
    }
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(i) & 0xFF) << 16) | ((rgb(i + 1) & 0xFF) << 8) | (rgb(i + 2) & 0xFF))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert((jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8) // JPEG SOI
    val (dw, dh, out) = Codec.decodeImage(jpeg)
    assert((dw, dh) == (w, h))
    val maxErr = out.indices.map(i => math.abs((out(i) & 0xFF) - (rgb(i) & 0xFF))).max
    assert(maxErr <= 40, s"JPEG pixel error $maxErr too large for smooth content")
  }

  test("JPEG encode: quality-factor knob works — dims exact, bounded error, quality ladder") {
    val (w, h) = (16, 12)
    // textured but band-limited content: per-8x8-block gradients
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3
      (((px % w) * 8 + (px / w) * 4 + (i % 3) * 5) % 256).toByte
    }
    val hi = Codec.encodeJpeg(w, h, rgb, 0.95f)
    val lo = Codec.encodeJpeg(w, h, rgb, 0.30f)
    Seq(hi, lo).foreach { j =>
      assert((j(0) & 0xFF) == 0xFF && (j(1) & 0xFF) == 0xD8) // SOI marker
    }
    def errs(bytes: Array[Byte]): (Int, Long) = {
      val (dw, dh, out) = Codec.decodeImage(bytes)
      assert((dw, dh) == (w, h))
      val e = out.indices.map(i => math.abs((out(i) & 0xFF) - (rgb(i) & 0xFF)))
      (e.max, e.map(_.toLong).sum)
    }
    val (hiMax, hiSum) = errs(hi)
    val (loMax, loSum) = errs(lo)
    assert(hiMax <= 40, s"q=0.95 max pixel error $hiMax")
    // the quality knob is real: lower quality -> fewer bytes, more error
    assert(lo.length < hi.length, s"q=0.30 ${lo.length}B !< q=0.95 ${hi.length}B")
    assert(hiSum < loSum, s"q=0.95 total error $hiSum !< q=0.30 $loSum")
    val _ = loMax
  }

  test("WAV round-trip is lossless: PCM16 samples and rate survive the container") {
    val samples = Array.tabulate(300)(i => ((i * 1031) % 65536 - 32768).toShort)
    val wav = Codec.encodeWav(samples, 16000)
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    val (rate, out) = Codec.decodeWav(wav)
    assert(rate == 16000)
    assert(out.toSeq == samples.toSeq)
    // fixture file path too
    val f = fixtureDir.resolve("fixture.wav")
    Files.write(f, wav)
    val (r2, o2) = Codec.decodeWav(Files.readAllBytes(f))
    assert(r2 == 16000 && o2.toSeq == samples.toSeq)
  }

  test("encoded corpus decodes to the formula values end-to-end on Spark") {
    val media = Multimodal.encodedMedia(spark, sf0001)
    val imgs = Multimodal.decodeImages(media).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { d =>
      assert(d.width == 8 + d.media_id % 9 && d.height == 8 + d.media_id % 7)
      val n = d.width * d.height * 3
      val want = (0L until n).map(i => (d.media_id * 2654435761L + i * 40503L) % 256)
      assert(d.pix_sum == want.sum, s"media ${d.media_id}")
      assert(d.pix_wsum == want.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum)
    }
    val auds = Multimodal.decodeAudio(media).collect()
    assert(auds.nonEmpty)
    auds.foreach { d =>
      assert(d.n_samples == 64 + d.media_id % 65)
      assert(d.sample_rate == (if (d.media_id % 2 == 0) 8000L else 16000L))
      val want = (0L until d.n_samples).map(i => (d.media_id * 7919L + i * 104729L) % 65536L - 32768L)
      assert(d.energy == want.map(s => s * s).sum, s"media ${d.media_id}")
    }
  }
}
