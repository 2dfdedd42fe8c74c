package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media corpus carries typed metadata and binary payloads") {
    val m = Multimodal.mediaFromDocuments(spark, sf0001).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.kind))
      assert(r.content.nonEmpty)
      assert(r.content.length == r.duration_ms / 10) // n_chars-derived meta
    }
  }

  test("feature histogram sums to byte count") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, sf0001)).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.hist.length == Multimodal.HistBuckets)
      assert(f.hist.sum == f.n_bytes)
    }
  }

  test("feature extraction is partitioning-invariant (batch shape holds)") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val a = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.hist.toSeq).toMap
    val b = Multimodal.extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.hist.toSeq).toMap
    assert(a == b)
  }

  test("resize: image rows only, fixed target, partitioning-invariant") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val a = Multimodal.resize(media).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.media_id % 3 == 0) // only image-kind payloads
      assert(r.resized_md5.matches("[0-9a-f]{32}"))
    }
    val b = Multimodal.resize(media.repartition(5)).collect()
    assert(a.map(r => r.media_id -> r.resized_md5).toMap ==
      b.map(r => r.media_id -> r.resized_md5).toMap)
  }

  test("frame sampling respects stride, length cap, and determinism") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaFromDocuments(spark, sf0001)).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.values.foreach { fs =>
      assert(fs.length <= 4)
      assert(fs.map(_.frame_idx).sorted.sameElements(0L until fs.length))
      fs.foreach(f => assert(f.frame_md5.matches("[0-9a-f]{32}")))
    }
  }

  test("dhash: image rows only, halves in 32-bit range, matches direct recomputation") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val got = Multimodal.dhashImages(media).collect()
    assert(got.nonEmpty)
    got.foreach { d =>
      assert(d.media_id % 3 == 0)
      assert(d.dhash_hi >= 0L && d.dhash_hi < (1L << 32), d)
      assert(d.dhash_lo >= 0L && d.dhash_lo < (1L << 32), d)
    }
    val payloads = media.filter(_.kind == "image").collect()
      .map(m => m.media_id -> m.content).toMap
    assert(got.length == payloads.size)
    got.foreach { d =>
      val bytes = payloads(d.media_id)
      def px(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else 0
      var hi = 0L; var lo = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        val i = r * 9 + c
        if (px(i) < px(i + 1)) {
          val bit = r * 8 + c
          if (bit >= 32) hi |= 1L << (bit - 32) else lo |= 1L << bit
        }
      }
      assert(d.dhash_hi == hi && d.dhash_lo == lo, d)
    }
  }

  test("dhash banded pairs reproduce the all-pairs hamming output") {
    val h = Multimodal.dhashImages(Multimodal.mediaFromDocuments(spark, sf0001))
      .collect()
    val all = (for {
      a <- h; b <- h if a.media_id < b.media_id
      d = java.lang.Long.bitCount(a.dhash_hi ^ b.dhash_hi) +
        java.lang.Long.bitCount(a.dhash_lo ^ b.dhash_lo)
      if d <= 7
    } yield (a.media_id, b.media_id, d.toLong)).toSet
    val got = Multimodal.qMmDhashPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Long]("hamming"))).toSet
    // the pigeonhole banding must lose nothing vs brute force
    assert(got == all)
  }

  test("audio energy: audio rows only, full windows, matches direct recomputation") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val got = Multimodal.audioEnergy(media).collect()
    assert(got.nonEmpty)
    got.foreach(w => assert(w.media_id % 3 == 1 && w.energy >= 0))
    // direct recomputation over the raw payloads
    val payloads = media.filter(_.kind == "audio").collect()
      .map(m => m.media_id -> m.content).toMap
    got.groupBy(_.media_id).foreach { case (id, ws) =>
      val bytes = payloads(id)
      assert(ws.length == bytes.length / 32)
      ws.foreach { w =>
        val e = (w.window_idx.toInt * 32 until w.window_idx.toInt * 32 + 32)
          .map { i => val a = (bytes(i) & 0xFF) - 128; a.toLong * a }.sum
        assert(w.energy == e)
      }
    }
  }

  test("scene cuts: video rows only, matches direct histogram-diff recomputation") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val got = Multimodal.sceneCuts(media).collect()
      .map(b => (b.media_id, b.frame_idx) -> ((b.l1_diff, b.is_cut))).toMap
    assert(got.nonEmpty)
    val byId = media.collect().map(m => m.media_id -> m).toMap
    // every boundary belongs to a video payload
    assert(got.keys.forall { case (id, _) => byId(id).kind == "video" })
    got.foreach { case ((id, fi), (l1, cut)) =>
      val bytes = byId(id).content
      def hist(f: Long): Array[Long] = {
        val h = new Array[Long](16)
        (0 until 32).foreach(j => h((bytes(f.toInt * 64 + j) & 0xFF) / 16) += 1)
        h
      }
      val (h0, h1) = (hist(fi - 1), hist(fi))
      val want = (0 until 16).map(b => math.abs(h0(b) - h1(b))).sum
      assert(l1 == want && cut == (l1 > 16L), s"media $id boundary $fi")
    }
    // boundaries are exactly the consecutive valid frame pairs
    val wantKeys = byId.values.filter(_.kind == "video").flatMap { m =>
      val nFrames = (0 until 4).count(f => f * 64 + 32 <= m.content.length)
      (1 until nFrames).map(i => (m.media_id, i.toLong))
    }.toSet
    assert(got.keySet == wantKeys)
    // the synthetic corpus has real cuts and real non-cuts
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("audio mcr: audio rows only, matches direct mean-crossing recomputation") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val got = Multimodal.audioMcr(media).collect()
    assert(got.nonEmpty)
    got.foreach(w => assert(w.media_id % 3 == 1 &&
      w.mean_crossings >= 0 && w.mean_crossings <= 31 &&
      w.peak_dev_x32 >= 0))
    val payloads = media.filter(_.kind == "audio").collect()
      .map(m => m.media_id -> m.content).toMap
    got.groupBy(_.media_id).foreach { case (id, ws) =>
      val bytes = payloads(id)
      assert(ws.length == bytes.length / 32)
      ws.foreach { w =>
        val raw = (w.window_idx.toInt * 32 until w.window_idx.toInt * 32 + 32)
          .map(i => (bytes(i) & 0xFF).toLong)
        val s = raw.sum
        val dev = raw.map(a => 32L * a - s)
        val mc = dev.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) }
        assert(w.dc_sum == s)
        assert(w.mean_crossings == mc.toLong, s"media $id window ${w.window_idx}")
        assert(w.peak_dev_x32 == dev.map(math.abs).max)
      }
    }
    // mean-centering makes the signal live on this DC-offset corpus:
    // crossings genuinely occur (plain ZCR measured all-zero here)
    assert(got.exists(_.mean_crossings > 0))
  }

  test("jpeg thumbnails: lossless-thumb agreement within JPEG error, real compression") {
    val png = Multimodal.qMmThumbnail(spark, sf0001).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("thumb_sum")).toMap
    val rows = Multimodal.qMmThumbnailJpeg(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length == png.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = 8 * 8 * 3
      assert(r.getAs[Long]("jpeg_bytes") > 0L)
      val maxE = r.getAs[Long]("max_abs_err")
      val sumE = r.getAs[Long]("sum_abs_err")
      // the synthetic pixels are hash noise — the hardest content for
      // JPEG (q=0.85 uses 4:2:0 chroma subsampling, so isolated chroma
      // errors reach ~200); the MEAN error is the meaningful bound
      // (observed ~50/pixel on this corpus)
      assert(maxE <= 230L, s"media $id max error $maxE")
      assert(sumE <= 64L * n, s"media $id mean error ${sumE / n} too high")
      assert(sumE <= maxE * n)
      // the lossy fingerprint stays within the accumulated error of
      // the lossless one (triangle inequality over the 192 pixels)
      assert(math.abs(r.getAs[Long]("thumb_sum") - png(id)) <= sumE,
        s"media $id jpeg sum drifted beyond its own error accounting")
    }
  }
}
