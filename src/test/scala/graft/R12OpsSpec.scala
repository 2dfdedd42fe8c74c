package graft

import graft.text.TextAnalysis

/** Round-12 operator specs: char-level duplicated spans. */
class R12OpsSpec extends SparkSpec {
  import spark.implicits._

  // One shared passage, three surface forms: clean, punctuation/casing
  // drifted (re-tokenizes differently on every word), and offset by an
  // unshared prefix (breaks any fixed-stride sampling grid).
  private val passage = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu")
  private val clean = passage.mkString(" ")
  private val drifted = passage.map(_.capitalize).mkString(", ") + "!!"
  private val shifted = "unshared preamble words here " + clean

  test("char dup spans: punctuation/casing drift is caught at char level") {
    val df = Seq((0L, clean), (1L, drifted), (2L, shifted))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.dupChars(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 3)
    Seq(0L, 1L, 2L).foreach { id =>
      val r = rows(id)
      assert(r.getAs[Long]("n_dup_grams") > 0L, s"doc $id grams")
      assert(r.getAs[Long]("n_dup_spans") >= 1L, s"doc $id spans")
      assert(r.getAs[Long]("longest_dup_span_chars") >= 50L, s"doc $id longest")
      assert(r.getAs[Long]("dup_coverage_chars") >= 50L, s"doc $id coverage")
      assert(r.getAs[Long]("dup_coverage_chars") <= r.getAs[Long]("n_chars"),
        s"doc $id coverage bound")
    }
    // drift normalizes away entirely: docs 0 and 1 have identical
    // normalized streams, so their coverage accounting is identical
    assert(rows(0L).getAs[Long]("n_dup_grams") ==
      rows(1L).getAs[Long]("n_dup_grams"))
    assert(rows(0L).getAs[Long]("dup_coverage_chars") ==
      rows(1L).getAs[Long]("dup_coverage_chars"))
  }

  test("char dup spans: the word-8-gram pass misses the same drifted pair") {
    // The r10/r11 documented gap this operator closes: pervasive
    // punctuation drift changes EVERY whitespace token, so no word
    // 8-gram survives — the word-level pass reports zero duplication
    // on the exact pair the char-level pass catches above.
    val df = Seq((0L, clean), (1L, drifted)).toDF("doc_id", "text")
    val rows = TextAnalysis.dupSpans(df).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_grams") == 0L)
      assert(r.getAs[Long]("n_dup_spans") == 0L)
      assert(r.getAs[Long]("dup_coverage_tokens") == 0L)
    }
  }

  test("url dedup: drift variants collapse; exactly one keeper per page") {
    val rows = graft.quality.Quality.qUrlDedup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val url = r.getAs[String]("url")
      // normalization left no scheme/www/query/fragment/trailing slash
      assert(!url.contains("://") && !url.startsWith("www."), url)
      assert(!url.contains("?") && !url.contains("#") && !url.endsWith("/"), url)
      assert(url == url.toLowerCase, url)
      assert(r.getAs[String]("domain") == url.takeWhile(_ != '/'))
    }
    val byUrl = rows.groupBy(_.getAs[String]("url"))
    byUrl.foreach { case (url, g) =>
      assert(g.count(_.getAs[Boolean]("keeper")) == 1, s"keepers of $url")
      assert(g.forall(_.getAs[Long]("n_dups") == g.length), s"n_dups of $url")
      val keeper = g.find(_.getAs[Boolean]("keeper")).get
      assert(keeper.getAs[Long]("doc_id") == g.map(_.getAs[Long]("doc_id")).min)
    }
    // the planted drift really exercises all four raw forms of one page
    assert(byUrl.exists(_._2.length >= 2))
  }

  test("domain mix: dup share varies by site and drives the keep tier") {
    val rows = graft.quality.Quality.qDomainMix(spark, sf0001).collect()
      .map(r => r.getAs[String]("domain") -> r).toMap
    assert(rows.size == 5) // 5 synthesized sites
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_pages") <= r.getAs[Long]("n_docs"))
      val dup = r.getAs[Long]("dup_permille")
      assert(r.getAs[Long]("rep_permille") == 1000L - dup)
      val keep = r.getAs[Long]("keep_permille")
      assert(Seq(900L, 500L, 200L).contains(keep))
      assert(r.getAs[Long]("kept_docs_budget") ==
        r.getAs[Long]("n_docs") * keep / 1000)
    }
    // site0 collapses nothing (rep 1000 → top tier), site4 collapses
    // 5 of every 7 docs (rep ~429 → bottom tier)
    assert(rows("site0.example.com").getAs[Long]("keep_permille") == 900L)
    assert(rows("site4.example.com").getAs[Long]("keep_permille") == 200L)
  }

  test("truncated-head recall: one row per brute query, permille coherent") {
    val truth = graft.sim.Similarity.qSimKnnBrute(spark, sf0001)
      .select($"query_id").distinct().as[Long].collect().toSet
    val rows = graft.sim.Similarity.qSimTruncRecall(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet == truth,
      "audit must cover exactly the brute query set")
    rows.foreach { r =>
      val h = r.getAs[Long]("trunc_hits")
      assert(h >= 0L && h <= 3L, s"hits $h out of range")
      assert(r.getAs[Long]("trunc_recall_permille") == h * 1000 / 3,
        "permille must derive from hits")
    }
    // determinism: the float cosine rounds to e6 before ranking, so a
    // second run reproduces every row (the oracle depends on it)
    val again = graft.sim.Similarity.qSimTruncRecall(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("doremi mix: matches a brute-force MW replay; weights ordered by loss") {
    import graft.quality.Quality
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"source", $"doc_id", $"text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text")))
    val loss = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._3.split(" ", -1))
      src -> (toks.distinct.length.toLong * 1000000L / toks.length)
    }
    val rows = loss.toSeq.sortBy(_._1)
    val m = rows.length
    var w = rows.map(_._1 -> 1000000L).toMap
    for (_ <- 0 until Quality.DoremiIters) {
      val sumW = rows.map(r => w(r._1)).sum
      val mean = rows.map(r => w(r._1) * r._2).sum / sumW
      val raw = rows.map { case (s, l) =>
        s -> math.max(1L, w(s) * (1000000L +
          Quality.DoremiEtaPpm * (l - mean) / 1000000L) / 1000000L)
      }.toMap
      val tot = raw.values.sum
      w = raw.map { case (s, v) => s -> math.max(1L, v * (m * 1000000L) / tot) }
    }
    val got = Quality.qMixDoremi(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("loss_ppm"), r.getAs[Long]("weight_x1e6"))).toMap
    assert(got.keySet == loss.keySet)
    got.foreach { case (s, (l, wt)) =>
      assert(l == loss(s), s"$s loss")
      assert(wt == w(s), s"$s weight ${wt} vs replay ${w(s)}")
    }
    // normalization pinned up to per-source truncation; the update is
    // monotone in loss from a uniform start, so weight order == loss order
    val tot = got.values.map(_._2).sum
    assert(math.abs(tot - m * 1000000L) <= m, s"weight sum $tot")
    val byLoss = got.toSeq.sortBy(_._2._1).map(_._2._2)
    assert(byLoss == byLoss.sorted, "weights must be ordered by loss")
    assert(byLoss.last > byLoss.head, "MW must separate the extremes")
  }

  test("secret census: matches a brute-force regex replay; plants fully covered") {
    import graft.quality.Quality
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    val aws = Quality.AwsKeyRe.r
    val hex = Quality.Hex32Re.r
    val hdr = Quality.KeyHeaderRe.r
    val flagged = docs.map { case (id, src, text) =>
      val t = text +
        (if (id % 7 == 0) " AKIA" + md5hex(s"ak|$id").take(16).toUpperCase else "") +
        (if (id % 11 == 3) " " + md5hex(s"hx|$id") else "") +
        (if (id % 13 == 5) " BEGIN RSA PRIVATE KEY" else "")
      (src, aws.findFirstIn(t).isDefined, hex.findFirstIn(t).isDefined,
        hdr.findFirstIn(t).isDefined, id)
    }
    val expected = flagged.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, fs) =>
      (src, fs.length.toLong, fs.count(_._2).toLong, fs.count(_._3).toLong,
        fs.count(_._4).toLong, fs.count(f => f._2 || f._3 || f._4).toLong)
    }
    val got = Quality.qSecretCensus(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_aws_docs"), r.getAs[Long]("n_hex_docs"),
        r.getAs[Long]("n_keyhdr_docs"), r.getAs[Long]("n_secret_docs")))
    assert(got.toSeq == expected, s"got ${got.toSeq}")
    // every planted doc must be caught by its own class — the plant
    // matches the REAL pattern (AKIA upper-hex is inside [0-9A-Z])
    flagged.foreach { case (_, a, h, k, id) =>
      if (id % 7 == 0) assert(a, s"doc $id aws plant missed")
      if (id % 11 == 3) assert(h, s"doc $id hex plant missed")
      if (id % 13 == 5) assert(k, s"doc $id key-header plant missed")
    }
  }

  test("char dup spans: disjoint documents report zero duplication") {
    val df = Seq(
      (0L, clean),
      (1L, "entirely different content with no shared passage at all " * 3))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.dupChars(df).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_grams") == 0L)
      assert(r.getAs[Long]("n_dup_spans") == 0L)
      assert(r.getAs[Long]("dup_coverage_chars") == 0L)
    }
  }
}
