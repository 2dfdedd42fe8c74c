package graft

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Semantic property tests for the training-data pipeline operators
  * (the DuckDB oracle compare is the exactness gate; these assert the
  * operator-level invariants). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("text quality: permille bounds and score ceiling") {
    val rows = TextAnalysis.qTextQuality(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pm = r.getAs[Long]("stop_permille")
      assert(pm >= 0 && pm <= 1000)
      assert(r.getAs[Long]("quality_score") <= 1000)
      assert(r.getAs[Long]("stop_cnt") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("text stats: alpha tokens never exceed whitespace tokens + chars consistent") {
    val rows = TextAnalysis.qTextStats(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alpha_tokens") <= r.getAs[Long]("n_tokens") * 2)
      assert(r.getAs[Long]("avg_token_len_x100") > 0)
    }
  }

  test("fingerprint: equal iff text equal") {
    val docs = Tables.load(spark, sf0001, "documents")
    val nText = docs.select("text").distinct().count()
    val nFp = TextAnalysis.qTextFingerprint(spark, sf0001).select("fp").distinct().count()
    assert(nFp == nText)
  }

  test("exact dedup partitions the corpus") {
    val rows = Dedup.qDedupExact(spark, sf0001).collect()
    val n = Tables.load(spark, sf0001, "documents").count()
    assert(rows.length == n)
    rows.foreach(r => assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("doc_id")))
    // canonical rows are never marked dup
    assert(rows.filter(r => r.getAs[Long]("canonical_id") == r.getAs[Long]("doc_id"))
      .forall(_.getAs[String]("is_dup") == "N"))
  }

  test("jaccard bounds and ordering") {
    val rows = Dedup.qDedupJaccard(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Long]("jac_permille")
      assert(j >= 20 && j <= 1000)
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("uni"))
    }
  }

  test("simhash fits in 16 bits; pairs respect hamming threshold") {
    val sh = Dedup.qDedupSimhash(spark, sf0001).collect()
    sh.foreach { r =>
      val v = r.getAs[Long]("simhash16")
      assert(v >= 0 && v <= 0xFFFFL)
    }
    Dedup.qDedupSimhashPairs(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("hamming") <= 4)
    }
  }

  test("pigeonhole chunk-banding reproduces the all-pairs simhash output exactly") {
    // Hamming ≤ 4 over 5 chunks ⇒ ≥1 chunk matches exactly, so the
    // banded candidate set is a guaranteed superset and the verified
    // output must equal the quadratic self-join it replaced.
    val sh = Dedup.qDedupSimhash(spark, sf0001)
      .select($"doc_id", $"source", $"simhash16")
    val a = sh.select($"source", $"doc_id".as("doc_a"), $"simhash16".as("ha"))
    val b = sh.select($"source", $"doc_id".as("doc_b"), $"simhash16".as("hb"))
    val allPairs = a.join(b, Seq("source"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("hamming", org.apache.spark.sql.functions.expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= 4)
      .select($"doc_a", $"doc_b", $"hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.qDedupSimhashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == allPairs)
  }

  test("64-bit simhash: halves fit 32 bits; banded pairs equal the all-pairs form") {
    val sh = Dedup.qDedupSimhashWide(spark, sf0001)
    val rows = sh.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sim_hi") >= 0 && r.getAs[Long]("sim_hi") <= 0xFFFFFFFFL)
      assert(r.getAs[Long]("sim_lo") >= 0 && r.getAs[Long]("sim_lo") <= 0xFFFFFFFFL)
    }
    import org.apache.spark.sql.functions.expr
    val a = sh.select($"source", $"doc_id".as("doc_a"),
      $"sim_hi".as("hia"), $"sim_lo".as("loa"))
    val b = sh.select($"source", $"doc_id".as("doc_b"),
      $"sim_hi".as("hib"), $"sim_lo".as("lob"))
    val allPairs = a.join(b, Seq("source"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("hamming",
        expr("bit_count(hia ^ hib) + bit_count(loa ^ lob)").cast("long"))
      .filter($"hamming" <= 7)
      .select($"doc_a", $"doc_b", $"hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.qDedupSimhashWidePairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == allPairs)
    assert(banded.nonEmpty) // exact-dup groups guarantee hamming-0 pairs
  }

  test("leakage-safe split: identical texts always land in the same split") {
    val rows = Dedup.qSplitAssign(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byFp = rows.groupBy(_.getAs[String]("fp"))
    byFp.values.foreach { g =>
      assert(g.map(_.getAs[String]("split")).toSet.size == 1)
    }
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // deterministic hash split: the dominant class must be train
    val counts = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(counts.getOrElse("train", 0) > counts.getOrElse("test", 0))
  }

  test("contamination: permille bounded, hits never exceed shingle count, src0 excluded") {
    val rows = Dedup.qContamination(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("contam_permille")
      assert(p >= 0 && p <= 1000)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_sh"))
    }
    val benchIds = Tables.load(spark, sf0001, "documents")
      .filter($"source" === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.intersect(benchIds).isEmpty)
  }

  test("vocab top-k is tf-descending with df <= tf") {
    val rows = TextAnalysis.qVocabTopk(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val tfs = rows.map(_.getAs[Long]("tf"))
    assert(tfs.sameElements(tfs.sorted(Ordering[Long].reverse)))
    rows.foreach(r => assert(r.getAs[Long]("df") <= r.getAs[Long]("tf")))
  }

  test("tfidf top-3: dense ranks, rare terms outscore common ones at equal tf") {
    val rows = TextAnalysis.qTfidfTopk(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to g.length))
      val scores = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("score"))
      assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("score") == r.getAs[Long]("tf") * r.getAs[Long]("idf_x1000")))
  }

  test("minhash signatures are 16-bit hex slots; identical docs would collide") {
    val rows = Dedup.qDedupMinhash(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until 8).foreach(i => assert(r.getAs[String](s"mh$i").matches("[0-9a-f]{4}")))
    }
  }

  test("knn brute: ranks dense from 1, cosine within [-1,1], no self match") {
    val rows = Similarity.qSimKnnBrute(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
      rs.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") != q)
        val c = r.getAs[Long]("cos_e6")
        assert(c >= -1000000L && c <= 1000000L)
      }
      // ranks ordered by descending cosine
      val ordered = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cos_e6"))
      assert(ordered.sameElements(ordered.sorted(Ordering[Long].reverse)))
    }
  }

  test("ann lsh results never beat the brute-force best") {
    val brute = Similarity.qSimKnnBrute(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cos_e6")).max }
    val ann = Similarity.qSimAnnLsh(spark, sf0001).collect()
    ann.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("cos_e6") <= brute(q))
    }
  }

  test("ann pq: dense ranks, no self match, approx never beats brute best") {
    val brute = Similarity.qSimKnnBrute(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cos_e6")).max }
    val rows = Similarity.qSimAnnPq(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
      rs.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") != q)
        assert(r.getAs[Long]("adist_e6") >= 0L)
        // exact rerank can't exceed the true best neighbor
        assert(r.getAs[Long]("cos_e6") <= brute(q))
      }
    }
  }

  test("ann pq plan: ADC scoring is an equi-join, no query-corpus loop join") {
    val p = Similarity.qSimAnnPq(spark, sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the candidate scorer joins codes to the broadcast distance tables
    // on (m, j) — a hash join; a BroadcastNestedLoopJoin over the full
    // query × corpus space would be the brute-force shape leaking back
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bm25 more-like-this equals a direct Scala replay") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty).toSeq }
    val tf = toks.toSeq
      .flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dl = tf.groupBy(_._1._1).map { case (id, m) => id -> m.values.sum }
    val dfr = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val nDocs = dl.size.toLong                       // docs with >= 1 token
    val avgdlX1000 = dl.values.sum * 1000L / nDocs
    val qid = docs.keys.min
    val qterms = toks(qid).toSet
    val expected = dl.keys.filter(_ != qid).toSeq
      .flatMap { id =>
        val terms = qterms.filter(w => tf.contains((id, w)))
        if (terms.isEmpty) None
        else {
          val score = terms.toSeq.map { w =>
            val t = tf((id, w))
            val idf = nDocs * 1000L / dfr(w)
            val norm = 250L + 750L * dl(id) * 1000L / avgdlX1000
            t * 2200L * idf / (t * 1000L + 1200L * norm / 1000L)
          }.sum
          Some((id, terms.size.toLong, score))
        }
      }
      .sortBy { case (id, _, s) => (-s, id) }.take(15)
      .zipWithIndex.map { case ((id, m, s), i) => (i + 1L, id, m, s) }
    val got = TextAnalysis.qTextBm25(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("score_x1000"))).toSeq
    assert(got == expected)
  }

  test("bm25 plan: query side broadcast, top-k rank limited below the sort") {
    val p = TextAnalysis.qTextBm25(spark, sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // query terms + corpus stats ride broadcasts; candidate generation
    // is the postings join, never a corpus-wide nested loop
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the top-15 is a bounded per-partition heap merged on the driver,
    // never a global sort of the whole candidate set
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("embedding qa: norms match a Scala replay; scan-speed plan") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val want = vecs.map { case (id, v) =>
      // mirror the engine's op order: per-component double square,
      // sequential sum, sqrt, round
      var acc = 0.0
      v.foreach { x => val d = x.toDouble; acc += d * d }
      id -> math.round(math.sqrt(acc) * 1e6)
    }.toMap
    val got = graft.sim.Similarity.qEmbQa(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("norm_e6")).toMap
    assert(got == want)
    val p = graft.sim.Similarity.qEmbQa(spark, sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("novelty equals a direct Scala replay; exact dups score zero") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2).groupBy(identity).map { case (g, os) => g -> os.length }
    val expected = sh.map { case (id, gs) =>
      val unique = gs.count(df(_) == 1).toLong
      id -> ((gs.size.toLong, unique, unique * 1000L / gs.size))
    }.toMap
    val got = graft.dedup.Dedup.qTextNovelty(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_unique"), r.getAs[Long]("novelty_permille")))).toMap
    assert(got == expected && got.nonEmpty)
    // an exact duplicate's shingles all recur -> novelty 0 (sf0.001
    // has no exact dup pair, so this bites only where one exists)
    docs.groupBy(_._2).values.filter(_.length > 1).flatMap(_.map(_._1))
      .filter(got.contains).foreach(id => assert(got(id)._3 == 0L))
    // the metric discriminates on this corpus
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("langid eval: cells account for the corpus, shares sum per class") {
    val rows = TextAnalysis.qLangIdEval(spark, sf0001).collect()
    val total = Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // the five learned heads diagonalize: every class's diagonal cell
    // dominates each off-diagonal cell in its row (recall-dominance —
    // the r9 3-head detector absorbed all classes into 'en')
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, cs) =>
      val diag = cs.find(_.getAs[String]("predicted_lang") == lang)
        .map(_.getAs[Long]("n")).getOrElse(0L)
      cs.filter(_.getAs[String]("predicted_lang") != lang).foreach { c =>
        assert(diag > c.getAs[Long]("n"),
          s"$lang diag=$diag <= ${c.getAs[String]("predicted_lang")}=${c.getAs[Long]("n")}")
      }
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, cs) =>
      val s = cs.map(_.getAs[Long]("true_share_ppm")).sum
      // floor division loses at most (cells - 1) ppm
      assert(s <= 1000000L && s > 1000000L - cs.length)
      assert(cs.map(_.getAs[Long]("n")).sum == cs.head.getAs[Long]("n_true"))
    }
    // marginals agree with the shared per-doc prediction query
    val pred = TextAnalysis.qTextLangId(spark, sf0001).collect()
      .groupBy(_.getAs[String]("predicted_lang"))
      .view.mapValues(_.length.toLong).toMap
    rows.groupBy(_.getAs[String]("predicted_lang")).foreach { case (p, cs) =>
      assert(cs.head.getAs[Long]("n_pred") == pred(p))
    }
  }

  test("rake keyphrases equal a direct Scala replay") {
    val stop = Set("the", "a", "")
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // phrases: maximal stopword-free runs, capped at 4 tokens
    val phrases = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) runs += cur
      runs.filter(_.length <= 4).map(ws => (id, ws))
    }
    val freq = phrases.flatMap(_._2).groupBy(identity)
      .map { case (w, os) => w -> os.length.toLong }
    val deg = phrases.flatMap { case (_, ws) => ws.map(w => w -> ws.length.toLong) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    def wscore(w: String) = deg(w) * 1000L / freq(w)
    val expected = phrases
      .map { case (_, ws) => (ws.mkString(" "), ws.map(wscore).sum) }
      .groupBy(_._1)
      .map { case (p, os) => (p, os.length.toLong, os.map(_._2).max) }
      .toSeq.sortBy { case (p, _, s) => (-s, p) }.take(20)
    val got = TextAnalysis.qTextRake(spark, sf0001).collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("score_x1000"))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("near-dup pairs meet the threshold and are label-blocked") {
    val rows = Similarity.qSimNearDup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cos_e6") >= 250000)
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    }
  }

  test("near-dup LSH candidates+verify is a subset of the exhaustive all-pairs form") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sf0001, "embeddings")
      .withColumn("nv", expr("transform(embedding, x -> cast(x as double))"))
    val a = n.select($"label", $"vec_id".as("vec_a"), $"nv".as("va"))
    val b = n.select($"label", $"vec_id".as("vec_b"), $"nv".as("vb"))
    val cos = graft.functions.CosineSimilarity.cosine_sim($"va", $"vb")
    val exhaustive = a.join(b, Seq("label")).filter($"vec_a" < $"vec_b")
      .withColumn("cos_e6",
        when(isnan(cos), lit(null)).otherwise(round(cos * 1e6).cast("long")))
      .filter($"cos_e6" >= 250000)
      .select($"vec_a", $"vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.qSimNearDup(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lsh.subsetOf(exhaustive))
  }

  test("minhash estimate: slot-quantized, err = est - exact, estimator informative") {
    val rows = Dedup.qDedupMinhashEst(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ms = r.getAs[Long]("match_slots")
      val est = r.getAs[Long]("est_permille")
      assert(ms >= 1 && ms <= 8) // LSH candidates share >= 1 band = 2 slots
      assert(est == ms * 1000 / 8)
      assert(r.getAs[Long]("err_permille") == est - r.getAs[Long]("jac_permille"))
    }
    // k=8 is coarse but must correlate: high-estimate pairs (all slots
    // match) should have higher mean exact jaccard than low-estimate ones
    val (hi, lo) = rows.partition(_.getAs[Long]("match_slots") >= 7)
    if (hi.nonEmpty && lo.nonEmpty) {
      def meanJac(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getAs[Long]("jac_permille")).sum.toDouble / rs.length
      assert(meanJac(hi) > meanJac(lo), s"${meanJac(hi)} <= ${meanJac(lo)}")
    }
  }

  test("count-min estimates never undercount; top-20 by exact tf") {
    val rows = TextAnalysis.qVocabCmsEst(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_tf"),
        s"${r.getAs[String]("token")} undercounted") // CMS one-sided error
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact_tf"))
    }
    val tfs = rows.map(_.getAs[Long]("exact_tf"))
    assert(tfs.sameElements(tfs.sorted(Ordering[Long].reverse)))
  }

  test("bigram LM: probabilities in (0, 1e6]; min <= avg; bigram count = tokens - 1") {
    val lm = TextAnalysis.qTextBigramLm(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val nTokens = TextAnalysis.qTextStats(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(lm.nonEmpty && lm.keySet == nTokens.keySet)
    lm.foreach { case (d, r) =>
      if (nTokens(d) >= 2) {
        val avg = r.getAs[Long]("avg_p_e6"); val mn = r.getAs[Long]("min_p_e6")
        assert(r.getAs[Long]("n_bigrams") == nTokens(d) - 1)
        assert(mn >= 1 && mn <= avg && avg <= 1000000L, s"doc $d: $mn / $avg")
      } else assert(r.isNullAt(r.fieldIndex("n_bigrams")))
    }
    // the conditional probability is informative: not every bigram is
    // equally likely (some doc must contain a sub-maximal bigram)
    assert(lm.values.exists(r => !r.isNullAt(r.fieldIndex("min_p_e6")) &&
      r.getAs[Long]("min_p_e6") < 1000000L))
  }

  test("connected components: 64-node path graph converges in O(log n) rounds") {
    // A path is the worst case for plain min-label propagation (O(n)
    // rounds); the pointer-doubling shortcut must bring it to ~log2 n.
    val n = 64L
    val fwd = spark.range(1, n).select($"id".as("a"), ($"id" + 1).as("b"))
    val und = fwd.union(fwd.select($"b".as("a"), $"a".as("b")))
    val (labels, rounds) = Dedup.connectedComponents(und, (_, df) => df.localCheckpoint())
    val got = labels.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("label")))
    assert(got.length == n)
    assert(got.forall(_._2 == 1L), got.filter(_._2 != 1L).take(5).toSeq.toString)
    assert(rounds <= 10, s"path-64 took $rounds rounds — shortcut not effective")
  }

  test("connected components: two separate cliques keep separate min labels") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val und = e.union(e.select($"b".as("a"), $"a".as("b")))
    val (labels, _) = Dedup.connectedComponents(und, (_, df) => df.localCheckpoint())
    val m = labels.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("label")).toMap
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(m(_) == 10L))
  }

  test("containment: verdict rule consistent; contained class fires on subset fixtures") {
    val rows = Dedup.qDedupContainment(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (jac, ca, cb, v) = (r.getAs[Long]("jac_permille"),
        r.getAs[Long]("cont_a_in_b"), r.getAs[Long]("cont_b_in_a"),
        r.getAs[String]("verdict"))
      // containment dominates jaccard (divides by a smaller denominator)
      assert(ca >= jac && cb >= jac)
      assert(ca <= 1000L && cb <= 1000L)
      val want = if (jac >= 500) "duplicate"
        else if (math.max(ca, cb) >= 800) "contained"
        else "distinct"
      assert(v == want)
    }
    assert(rows.exists(_.getAs[String]("verdict") == "duplicate"))
    assert(rows.exists(_.getAs[String]("verdict") == "distinct"))
    // the corpus has no subset pairs; prove the contained class on a
    // crafted shingle-set pair run through the SAME verify arithmetic:
    // |A| = 10 wholly inside |B| = 100 → jac 90, cont_a 1000
    val fixture = Seq((10L, 100L, 10L)).toDF("inter_", "lb_", "la_")
      .selectExpr(
        "(inter_ * 1000) div (la_ + lb_ - inter_) as jac_permille",
        "(inter_ * 1000) div la_ as cont_a_in_b",
        "(inter_ * 1000) div lb_ as cont_b_in_a")
      .selectExpr("*",
        """CASE WHEN jac_permille >= 500 THEN 'duplicate'
          |     WHEN greatest(cont_a_in_b, cont_b_in_a) >= 800 THEN 'contained'
          |     ELSE 'distinct' END as verdict""".stripMargin)
      .collect().head
    assert(fixture.getAs[String]("verdict") == "contained")
    assert(fixture.getAs[Long]("cont_a_in_b") == 1000L)
    assert(fixture.getAs[Long]("jac_permille") < 500L)
  }

  test("dedup bias: removal accounting ties to the keep-best decision") {
    val drops = Dedup.qDedupClusterPick(spark, sf0001).collect()
      .filter(_.getAs[String]("action") == "drop").map(_.getAs[Long]("doc_id")).toSet
    val src = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val got = Dedup.qDedupBias(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("removed_ppm"), r.getAs[Long]("corpus_removed_ppm"),
          r.getAs[Long]("bias_x1000"))))
      .toMap
    // per-source accounting matches the shared keep-best decision
    val want = src.groupBy(_._2).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.count(x => drops(x._1)).toLong))
    }
    assert(got.map { case (s, v) => s -> ((v._1, v._2)) } == want)
    assert(got.values.map(_._2).sum == drops.size.toLong)
    val corpusPpm = drops.size.toLong * 1000000L / src.length
    got.foreach { case (s, (n, rem, ppm, cPpm, bias)) =>
      assert(ppm == rem * 1000000L / n)
      assert(cPpm == corpusPpm)
      assert(bias == (if (corpusPpm == 0) 1000L else ppm * 1000L / cPpm), s)
    }
    // the corpus removes something, and sources genuinely differ
    assert(drops.nonEmpty)
    assert(got.values.map(_._5).toSet.size > 1)
  }

  test("dedup impact: histogram == components rollup; removable accounting holds") {
    val comp = Dedup.qDedupComponents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("component_id") -> r.getAs[Long]("component_size"))
    val want = comp.groupBy(_._1).map(_._2.head._2)
      .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    val got = Dedup.qDedupImpact(spark, sf0001).collect()
      .map(r => r.getAs[Long]("size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("docs_in_clusters"),
          r.getAs[Long]("docs_removable"), r.getAs[Long]("corpus_share_ppm"))))
      .toMap
    assert(got.map { case (s, v) => s -> v._1 } == want)
    got.foreach { case (s, (n, inC, rem, share)) =>
      assert(inC == s * n && rem == (s - 1) * n)
      assert(share == s * n * 1000000L / nDocs)
      assert(s >= 2, "singletons never appear in the component frame")
    }
    // totals tie back to the component frame
    assert(got.values.map(_._2).sum == comp.length.toLong)
  }

  test("LSH dedup recall audit: counts consistent; banded path misses nothing within blocks") {
    val r = Dedup.qDedupLshRecall(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r.head
    val (truth, hit, lsh, recall) = (row.getAs[Long]("n_truth"),
      row.getAs[Long]("n_hit"), row.getAs[Long]("n_lsh"),
      row.getAs[Long]("recall_permille"))
    assert(hit <= truth && hit <= lsh)
    assert(recall == (if (truth == 0) 1000L else hit * 1000 / truth))
    // the verified-candidate pipeline must not miss within-block truth
    // on this corpus (8 minhash slots, 4 bands — a banding regression
    // that drops recall below 500 permille fails here)
    assert(recall >= 500L, s"recall $recall")
    // cross-block near-dups exist: the banded path sees MORE than the
    // blocked baseline — the blocking blindness the audit quantifies
    assert(lsh >= truth)
  }

  test("PCA power iteration: engine == BigInt replay; L-inf normalized") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as nv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val d = 64
    val q = vecs.map { case (_, nv) =>
      nv.map(x => BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val m = Array.ofDim[BigInt](d, d)
    for (p <- 0 until d; j <- 0 until d)
      m(p)(j) = q.map(v => BigInt(v(p)) * v(j)).sum
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to 2) {
      val w = (0 until d).map(p => (0 until d).map(j => m(p)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(x =>
        if (x < 0) -((-x * 1000000) / mx) else (x * 1000000) / mx).toArray
    }
    val got = Similarity.qEmbPcaPower(spark, sf0001).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("pc1_x1e6")).toMap
    assert(got == (0 until d).map(p => p.toLong -> v(p).toLong).toMap)
    // L-inf normalization: every component within ±1e6, one at the peak
    assert(got.values.forall(x => math.abs(x) <= 1000000L))
    assert(got.values.exists(x => math.abs(x) == 1000000L))
  }

  test("corpus diff: engine == Scala replay; statuses partition both snapshots") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val v1 = docs.filter(_._1 % 11 != 0).map { case (id, src, t) =>
      id -> ((src, if (id % 7 == 0) t.substring(0, math.max(t.length - 5, 0)) else t))
    }.toMap
    val v2 = docs.filter(_._1 % 13 != 0).map { case (id, src, t) => id -> ((src, t)) }.toMap
    val want = (v1.keySet ++ v2.keySet).toSeq.map { id =>
      val status =
        if (!v1.contains(id)) "added"
        else if (!v2.contains(id)) "removed"
        else if (v1(id)._2 != v2(id)._2) "changed"
        else "unchanged"
      (v1.get(id).map(_._1).getOrElse(v2(id)._1), status)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = Dedup.qCorpusDiff(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs")).toMap
    assert(got == want)
    // the partition identities: every v1 doc is removed/changed/unchanged,
    // every v2 doc is added/changed/unchanged
    def tot(s: String) = got.collect { case ((_, `s`), n) => n }.sum
    assert(tot("removed") + tot("changed") + tot("unchanged") == v1.size.toLong)
    assert(tot("added") + tot("changed") + tot("unchanged") == v2.size.toLong)
    assert(Seq("added", "removed", "changed", "unchanged").forall(tot(_) > 0))
  }

  test("length buckets: engine == Scala replay; waste bounded below 50%") {
    val lens = Tables.load(spark, sf0001, "documents")
      .select($"text").as[String].collect()
      .map(t => t.split(" ", -1).count(_.nonEmpty).toLong)
    def pow2(n: Long): Long =
      if (n <= 1) 1L else java.lang.Long.highestOneBit(n - 1) << 1
    val want = lens.groupBy(pow2).map { case (b, xs) =>
      val n = xs.length.toLong; val s = xs.sum
      b -> ((n, s, n * b, (n * b - s) * 1000000L / (n * b)))
    }
    val got = graft.text.TextAnalysis.qLengthBuckets(spark, sf0001).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Long]("waste_ppm"))))
      .toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == lens.length.toLong)
    // pad-to-power-of-two never wastes half the batch (bucket/2 < len ≤ bucket)
    got.foreach { case (b, (_, _, _, waste)) =>
      if (b > 1) assert(waste < 500000L, s"bucket $b waste $waste")
    }
  }

  test("HLL sketch table: estimates within 5% of exact; ALL row consistent") {
    val rows = TextAnalysis.qSketchDistinct(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Long]("est_distinct"))))
      .toMap
    assert(rows.contains("ALL") && rows.size > 1)
    rows.foreach { case (src, (exact, est)) =>
      assert(exact > 0, src)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$src: est $est vs exact $exact")
    }
    // the merged-sketch global covers at least every per-source space
    val (allExact, allEst) = rows("ALL")
    rows.filterNot(_._1 == "ALL").values.foreach { case (exact, est) =>
      assert(exact <= allExact)
      // merged estimate can't be materially below any single source
      assert(allEst >= (est * 95) / 100)
    }
    // deterministic: a second run reproduces the estimates exactly
    val again = TextAnalysis.qSketchDistinct(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    assert(again == rows.map { case (k, v) => k -> v._2 })
  }
}
