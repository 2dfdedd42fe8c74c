package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** r7 scale guards (VERDICT items 3/4): the widened fuzzy blocking is
  * a drop-in for the plain suffix-blocked quadratic, and over-cap
  * blocks fail loudly instead of running quadratic. */
class ScaleGuardSpec extends SparkSpec {
  import spark.implicits._

  private def vocab = Tables.load(spark, sf0001, "documents")
    .select(explode(split($"text", " ")).as("token"))
    .filter(length($"token") >= 3).distinct()

  test("fuzzyPairs (last char, length bucket) == plain suffix-blocked join") {
    // reference: the r6 unbounded formulation — same predicate, whole
    // suffix class as the block
    val v = vocab.withColumn("ck", substring($"token", -1, 1))
    val a = v.select($"ck", $"token".as("tok_a"))
    val b = v.select($"ck", $"token".as("tok_b"))
    val want = a.join(b, Seq("ck"))
      .filter($"tok_a" < $"tok_b" &&
        abs(length($"tok_a") - length($"tok_b")) <= 1)
      .withColumn("dist", levenshtein($"tok_a", $"tok_b"))
      .filter($"dist" <= 2)
      .select($"tok_a", $"tok_b", $"dist".cast("long").as("dist"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val got = TextAnalysis.fuzzyPairs(vocab, TextAnalysis.MaxFuzzyBlock)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // exactly-once: the bucketed join must not duplicate same-length pairs
    val list = TextAnalysis.fuzzyPairs(vocab, TextAnalysis.MaxFuzzyBlock)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(list.length == list.distinct.length)
  }

  test("fuzzyPairs raises loudly when a block exceeds the cap") {
    val e = intercept[Exception] {
      TextAnalysis.fuzzyPairs(vocab, maxBlock = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("block over cap")), e.toString)
  }

  test("fuzzyPairs at cap-1: one skewed block just under the cap completes and matches brute force") {
    // generator-backed skewed fixture (VERDICT r7 item 6): every token
    // shares last char 'x' AND length 6, so the (x,6)/(x,7) cells each
    // hold the entire vocabulary — the worst block the cap allows.
    val cap = 1500L
    val rnd = new scala.util.Random(42)
    val toks = Iterator.continually(
      (1 to 5).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString + "x")
      .distinct.take(cap.toInt - 1).toVector
    assert(toks.size == cap - 1 && toks.forall(_.length == 6))
    val vocabDf = toks.toDF("token").repartition(4)

    // cap-1 tokens in the hot cell: must COMPLETE (guard silent)...
    val got = TextAnalysis.fuzzyPairs(vocabDf, maxBlock = cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // ...and equal the brute-force quadratic over the same predicate
    val want = (for {
      i <- toks.indices.iterator
      j <- (i + 1) until toks.size
      (a, b) = if (toks(i) < toks(j)) (toks(i), toks(j)) else (toks(j), toks(i))
      d = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(a, b).toLong
      if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "fixture produced no qualifying pairs — weak test")

    // one more token pushes the cell to the cap boundary; cap-1 at a
    // LOWER cap fails loudly — the guard fires exactly past the cap
    val e = intercept[Exception] {
      TextAnalysis.fuzzyPairs(vocabDf, maxBlock = cap - 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("block over cap")), e.toString)
  }

  test("qDedupJaccard still runs under its block census guard") {
    val rows = graft.dedup.Dedup.qDedupJaccard(spark, sf0001).collect()
    // guard must be invisible at this corpus size; pairs are symmetric-free
    rows.foreach(r => assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("optimizer rewrites levenshtein-vs-literal predicates to the banded form") {
    val df = spark.range(200).select(
      concat(lit("tok"), ($"id" % 17).cast("string")).as("a"),
      concat(lit("tkk"), ($"id" % 13).cast("string")).as("b"))
    df.createOrReplaceTempView("lev_pairs")

    // users write the builtin; the optimized plan carries the banded form
    val q = spark.sql("SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 2")
    assert(q.queryExecution.optimizedPlan.toString.contains("boundedlevenshtein"),
      q.queryExecution.optimizedPlan.toString)
    // and the rewrite is answer-preserving vs the un-rewritten semantics
    val want = df.filter(least(levenshtein($"a", $"b"), lit(3)) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet == want)

    // strict <, and mirrored literal-first forms rewrite too
    for (pred <- Seq("levenshtein(a, b) < 3", "2 >= levenshtein(a, b)",
        "3 > levenshtein(a, b)")) {
      val p = spark.sql(s"SELECT a FROM lev_pairs WHERE $pred")
      assert(p.queryExecution.optimizedPlan.toString.contains("boundedlevenshtein"), pred)
      assert(p.collect().map(_.getString(0)).toSeq.sorted ==
        q.select($"a").collect().map(_.getString(0)).toSeq.sorted, pred)
    }

    // a bare projection of the distance is NOT rewritten (no bound to exploit)
    val proj = spark.sql("SELECT levenshtein(a, b) AS d FROM lev_pairs")
    assert(!proj.queryExecution.optimizedPlan.toString.contains("boundedlevenshtein"))
  }

  test("bounded_levenshtein == min(levenshtein, k+1) and stays codegen'd") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def rs(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = Seq(("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
      ("flaw", "lawn"), ("same", "same"), ("ab", "ba"), ("abcd", "dcba")) ++
      (1 to 500).map(_ => (rs(rnd.nextInt(12)), rs(rnd.nextInt(12))))
    val df = pairs.toDF("a", "b")
    for (k <- 0 to 3) {
      val got = df.select(
        graft.functions.BoundedLevenshtein.bounded_levenshtein($"a", $"b", k).as("d"),
        least(levenshtein($"a", $"b"), lit(k + 1)).as("want"),
        $"a", $"b").collect()
      got.foreach(r =>
        assert(r.getInt(0) == r.getInt(1), s"k=$k ${r.getString(2)}/${r.getString(3)}"))
    }
    // plan pin over a non-local source (a local Seq constant-folds to
    // LocalTableScan before any codegen happens)
    val plan = spark.range(100).select(
      concat(lit("tok"), ($"id" % 7).cast("string")).as("a"),
      concat(lit("tok"), ($"id" % 5).cast("string")).as("b"))
      .select(graft.functions.BoundedLevenshtein.bounded_levenshtein($"a", $"b", 2))
      .queryExecution.executedPlan.toString
    // the "*(1)" prefix is the WholeStageCodegen marker: the projection
    // with the custom expression fused into the generated stage
    assert(plan.contains("*(1) Project [boundedlevenshtein"), plan)
  }
}
