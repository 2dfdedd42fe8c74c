package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for the training-data pipeline:
  *
  *  - exact: content-hash groupBy (one shuffle on the digest; at 100 TB
  *    this is the canonical "hash-partition by digest" dedup);
  *  - n-gram Jaccard: word-shingle set similarity within candidate
  *    buckets (bucketed so the pair space stays linear-ish, the same
  *    blocking strategy that keeps 100 TB tractable);
  *  - MinHash + LSH: per-doc signatures via lexicographic-min digests
  *    of shingles (portable across engines — no engine-specific hash),
  *    banded into LSH buckets whose equality yields candidate pairs
  *    without any O(n²) comparison;
  *  - SimHash: 16-bit majority-vote fingerprint over token digests +
  *    Hamming-distance near-dup pairs via bit_count(xor).
  *
  * All arithmetic is integer/lexicographic so the DuckDB oracle matches
  * exactly. No UDFs — everything stays inside whole-stage codegen.
  */
object Dedup {

  /** Distinct word 3-gram shingles of the `text` column. Guarded for
    * short docs (Spark sequence(1,0) would generate a DESCENDING seq). */
  private def shingles(toks: Column): Column =
    array_distinct(expr(
      "CASE WHEN size(toks) < 3 THEN CAST(array() AS array<string>) " +
        "ELSE transform(sequence(1, size(toks) - 2), " +
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))) END"))

  /** Shingle frame, materialized once per (session, dir): consumed by
    * both sides of the Jaccard self-join and by the signature builder. */
  private[graft] def withShingles(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"dedup.shingles|$dir") {
      import spark.implicits._
      Tables.load(spark, dir, "documents")
        .withColumn("toks", split($"text", " "))
        .withColumn("sh", shingles($"toks"))
        // sorted 64-bit shingle hashes: the pair-join intersects these
        // with the codegen'd two-pointer merge instead of hashing
        // strings per pair (SortedIntersectCount)
        .withColumn("shs", array_sort(expr("transform(sh, s -> xxhash64(s))")))
        .select($"doc_id", $"source", $"lang", $"sh", $"shs")
    }

  /** Exact dedup: canonical id per content digest. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"fp")
    Tables.load(spark, dir, "documents")
      .withColumn("fp", md5($"text".cast("binary")))
      .withColumn("canonical_id", min($"doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select($"doc_id", $"fp", $"canonical_id", $"group_size",
        when($"doc_id" =!= $"canonical_id", "Y").otherwise("N").as("is_dup"))
      .orderBy($"doc_id")
  }

  /** Any (source, lang) Jaccard block larger than this fails loudly
    * instead of running a silently quadratic self-join. */
  private[graft] val MaxJaccardBlock = 50000L

  /** Exact n-gram Jaccard similarity, blocked by (source, lang).
    *
    * AUDIT / ORACLE BASELINE ONLY (r7, VERDICT item 4): block
    * population grows linearly with the corpus, so candidate pairs per
    * block grow quadratically — at 100 TB production near-dup pairs
    * come from [[qDedupLshVerify]] (banded candidates, identical
    * verify arithmetic); this exact path exists to audit the LSH
    * path's recall on bounded samples. To keep mis-use loud instead of
    * silently quadratic, any block larger than [[MaxJaccardBlock]]
    * raises at run time (assert_true on the broadcast block census) —
    * the same guard policy as `text.TextAnalysis.fuzzyPairs`. */
  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = withShingles(spark, dir)
      .select($"doc_id", $"source", $"lang", $"sh", $"shs")
    val blockCounts = d.groupBy($"source", $"lang").agg(count(lit(1)).as("bn"))
    val guarded = d.join(broadcast(blockCounts), Seq("source", "lang"))
      .filter(assert_true($"bn" <= lit(MaxJaccardBlock),
        format_string("qDedupJaccard block over cap %d: source=%s lang=%s n=%d",
          lit(MaxJaccardBlock), $"source", $"lang", $"bn")).isNull)
      .drop("bn")
    val a = guarded.select($"source", $"lang", $"doc_id".as("doc_a"), $"shs".as("sh_a"))
    val b = guarded.select($"source", $"lang", $"doc_id".as("doc_b"), $"shs".as("sh_b"))
    a.join(b, Seq("source", "lang"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count($"sh_a", $"sh_b"))
      // |a ∪ b| = |a| + |b| − |a ∩ b| on distinct sets — skips the
      // second O(n·m) array traversal array_union would cost
      .withColumn("uni",
        (size($"sh_a") + size($"sh_b")).cast("long") - $"inter")
      .filter($"inter" > 0)
      .select($"doc_a", $"doc_b",
        $"inter", $"uni", expr("(inter * 1000) div uni").as("jac_permille"))
      .filter($"jac_permille" >= 20)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Any prefix-token posting list longer than this fails loudly: a
    * frequent token surviving into prefixes means the frequency
    * ordering is broken (or the corpus is pathological) and the
    * candidate join would go quadratic on that token. */
  private[graft] val MaxPrefixPosting = 10000L

  /** PREFIX-FILTERED exact similarity join — PPJoin-style (Xiao et
    * al., WWW 2008, public paper): ALL pairs with Jaccard ≥ 500‰,
    * EXACTLY — the guarantee LSH banding trades away (recall < 1, the
    * gap q_dedup_lsh_recall measures) — without an all-pairs join.
    *
    * The filter: order every document's shingles by GLOBAL document
    * frequency (rarest first; hash tiebreak — any consistent total
    * order works) and keep only the PREFIX of length
    * n − ⌈t·n⌉ + 1. Two sets with J ≥ t must overlap in at least
    * ⌈t·n⌉ elements, so they cannot avoid each other's prefixes —
    * candidates sharing a prefix token are a SUPERSET of the true
    * pairs, and exact verification (the shared SortedIntersectCount
    * merge) keeps precision at 1. Because prefixes hold each doc's
    * RAREST tokens, posting lists stay short by construction — the
    * inverse of the hot-token blow-up a naive token join suffers —
    * and the length filter (t·|a| ≤ |b| ≤ |a|/t) prunes cross-size
    * candidates before the verify.
    *
    * Scale shape: one df shuffle (map-side combined), one per-doc
    * sort of its own shingle list (array_sort, no shuffle), one
    * posting-list self-join on prefix tokens (short lists, loud
    * [[MaxPrefixPosting]] census), verify on the staged sorted-hash
    * arrays. */
  def qDedupPpjoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = 500L // permille
    val d = withShingles(spark, dir).filter(size($"shs") > 0)
      .select($"doc_id", $"shs")
    // global shingle document frequencies
    val df = d.select($"doc_id", explode($"shs").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("df"))
    // per-doc (df, h)-sorted shingles → prefix of length n − ⌈t·n⌉ + 1
    val prefixes = d.select($"doc_id", size($"shs").as("n"), explode($"shs").as("h"))
      .join(df, Seq("h"))
      .groupBy($"doc_id", $"n")
      .agg(array_sort(collect_list(struct($"df", $"h"))).as("ord"))
      .withColumn("p", expr(s"n - (($t * n + 999) div 1000) + 1"))
      .select($"doc_id", $"n",
        expr("transform(slice(ord, 1, cast(p as int)), x -> x.h)").as("pref"))
      .select($"doc_id", $"n", explode($"pref").as("h"))
    val postingCounts = prefixes.groupBy($"h").agg(count(lit(1)).as("pn"))
    val guarded = prefixes.join(broadcast(
        postingCounts.filter($"pn" > lit(MaxPrefixPosting / 2))),
        Seq("h"), "left_outer")
      .filter(assert_true(coalesce($"pn", lit(0L)) <= lit(MaxPrefixPosting),
        format_string("qDedupPpjoin prefix posting over cap %d: h=%d n=%d",
          lit(MaxPrefixPosting), $"h", $"pn")).isNull)
      .drop("pn")
    val cand = guarded.select($"h", $"doc_id".as("doc_a"), $"n".as("na"))
      .join(guarded.select($"h", $"doc_id".as("doc_b"), $"n".as("nb")), Seq("h"))
      .filter($"doc_a" < $"doc_b" &&
        $"nb" * 1000 >= $"na" * t && $"na" * 1000 >= $"nb" * t)
      .select($"doc_a", $"doc_b").distinct()
    cand
      .join(d.select($"doc_id".as("doc_a"), $"shs".as("sh_a")), Seq("doc_a"))
      .join(d.select($"doc_id".as("doc_b"), $"shs".as("sh_b")), Seq("doc_b"))
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count($"sh_a", $"sh_b"))
      .withColumn("uni",
        (size($"sh_a") + size($"sh_b")).cast("long") - $"inter")
      .filter($"inter" > 0)
      .select($"doc_a", $"doc_b", $"inter", $"uni",
        expr("(inter * 1000) div uni").as("jac_permille"))
      .filter($"jac_permille" >= t)
      .orderBy($"doc_a", $"doc_b")
  }

  /** MinHash signature: one md5 per shingle, sliced into k 4-hex-char
    * (16-bit) slots; each slot's lexicographic min over the shingle set
    * is an independent minhash — 1/k-th the hashing cost of k seeded
    * digests, identical LSH behavior. */
  private val MinhashK = 8
  private def minhashCols: Seq[Column] =
    (0 until MinhashK).map(i =>
      array_min(expr(s"transform(shh, h -> substring(h, ${4 * i + 1}, 4))")).as(s"mh$i"))

  /** Signature table, materialized once per (session, dir) — at scale
    * this is a persisted signatures table, computed once per corpus. */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"dedup.signatures|$dir") {
      import spark.implicits._
      withShingles(spark, dir)
        .filter(size($"sh") > 0)
        .withColumn("shh", expr("transform(sh, s -> md5(cast(s as binary)))"))
        .select(Seq($"doc_id") ++ minhashCols: _*)
    }

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    signatures(spark, dir).orderBy($"doc_id")
  }

  /** LSH candidate pairs: 4 bands × 2 rows — pairs agreeing on any
    * band digest. One shuffle on (band, digest); no O(n²) scan. */
  def qDedupLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = signatures(spark, dir)
    val banded = sig.select($"doc_id", explode(array(
      (0 until MinhashK / 2).map(bnd =>
        struct(lit(bnd).as("band"),
          md5(concat(col(s"mh${2 * bnd}"), col(s"mh${2 * bnd + 1}")).cast("binary"))
            .as("sig"))): _*)).as("b"))
      .select($"doc_id", $"b.band".as("band"), $"b.sig".as("sig"))
    val l = banded.select($"band", $"sig", $"doc_id".as("doc_a"))
    val r = banded.select($"band", $"sig", $"doc_id".as("doc_b"))
    l.join(r, Seq("band", "sig"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** Full MinHash-LSH dedup: LSH candidate pairs VERIFIED by exact
    * shingle Jaccard (candidates are probabilistic; the verify step
    * makes the dedup decision) — the standard candidate→verify pipeline
    * at 100 TB: O(n) banding + exact checks only on the candidate set. */
  def qDedupLshVerify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = qDedupLsh(spark, dir)
    val sh = withShingles(spark, dir)
    cands
      .join(sh.select($"doc_id".as("doc_a"), $"shs".as("sh_a")), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"shs".as("sh_b")), Seq("doc_b"))
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count($"sh_a", $"sh_b"))
      .withColumn("uni", (size($"sh_a") + size($"sh_b")).cast("long") - $"inter")
      .withColumn("jac_permille", expr("(inter * 1000) div uni"))
      .filter($"jac_permille" >= 500)
      .select($"doc_a", $"doc_b", $"jac_permille")
      .orderBy($"doc_a", $"doc_b")
  }

  /** MinHash Jaccard ESTIMATE vs exact, per LSH candidate pair — the
    * estimator-quality audit for the signature family. The estimate
    * (matching slots × 1000 div k) is what a signatures-only pass can
    * compute at 100 TB — 16 bytes per doc, shingle arrays never
    * touched; this query puts the estimate next to the exact value and
    * their signed error so signature-count tuning (k=8 here) is
    * data-driven rather than folklore. Integer permille throughout. */
  def qDedupMinhashEst(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = qDedupLsh(spark, dir)
    val sig = signatures(spark, dir)
    val sh = withShingles(spark, dir)
    val sa = sig.select(Seq($"doc_id".as("doc_a")) ++
      (0 until MinhashK).map(i => col(s"mh$i").as(s"ma$i")): _*)
    val sb = sig.select(Seq($"doc_id".as("doc_b")) ++
      (0 until MinhashK).map(i => col(s"mh$i").as(s"mb$i")): _*)
    val matchSlots = (0 until MinhashK)
      .map(i => when(col(s"ma$i") === col(s"mb$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cands
      .join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("match_slots", matchSlots)
      .join(sh.select($"doc_id".as("doc_a"), $"shs".as("sh_a")), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"shs".as("sh_b")), Seq("doc_b"))
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count($"sh_a", $"sh_b"))
      .withColumn("uni", (size($"sh_a") + size($"sh_b")).cast("long") - $"inter")
      .select($"doc_a", $"doc_b", $"match_slots",
        expr(s"(match_slots * 1000) div $MinhashK").as("est_permille"),
        expr("(inter * 1000) div uni").as("jac_permille"),
        (expr(s"(match_slots * 1000) div $MinhashK") -
          expr("(inter * 1000) div uni")).as("err_permille"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** 16-bit SimHash over distinct tokens (hex-digit bits of md5). */
  /** SimHash frame, materialized once per (session, dir): the
    * token-explode aggregation is the expensive part and both the
    * direct query and the pair self-join (twice) consume it. */
  private def simhashes(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"dedup.simhash|$dir") {
      import spark.implicits._
      val tok = Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", explode(array_distinct(split($"text", " "))).as("tok"))
        .withColumn("h", md5($"tok".cast("binary")))
      // bit k (0..15) = bit (k%4) of hex digit (k/4) of the token digest
      val bitSums = (0 until 16).map { k =>
        val p = k / 4 + 1
        val b = k % 4
        sum(expr(s"shiftright(instr('0123456789abcdef', substring(h, $p, 1)) - 1, $b) & 1"))
          .as(s"c$k")
      }
      val aggCols = count(lit(1)).as("n") +: bitSums
      val agg = tok.groupBy($"doc_id", $"source")
        .agg(aggCols.head, aggCols.tail: _*)
      val simhash = (0 until 16).map(k =>
        when(col(s"c$k") * 2 >= col("n"), lit(1L) * (1L << k)).otherwise(0L))
        .reduce(_ + _)
      agg.select($"doc_id", $"source", simhash.as("simhash16"))
    }

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    simhashes(spark, dir).orderBy($"doc_id")
  }

  /** SimHash near-dup pairs (Hamming ≤ 4 within source block) via
    * pigeonhole chunk-banding: split the 16-bit fingerprint into 5
    * chunks (4+3+3+3+3 bits) — Hamming ≤ 4 means at most 4 chunks can
    * differ, so at least one chunk matches EXACTLY. Candidates sharing
    * (source, chunk_idx, chunk_value) are therefore a guaranteed
    * superset of the answer; bit_count verification then makes the
    * output identical to the all-pairs form. One shuffle on the chunk
    * key replaces the O(B²) per-source self-join — at 100 TB a hot
    * source block no longer materializes quadratic pairs, only
    * same-chunk collisions do. */
  def qDedupSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = simhashes(spark, dir)
    // (offset, width) of the 5 pigeonhole chunks over bits 0..15
    val chunks = Seq((0, 4), (4, 3), (7, 3), (10, 3), (13, 3))
    val banded = s.select($"source", $"doc_id", $"simhash16", explode(array(
      chunks.zipWithIndex.map { case ((off, w), i) =>
        struct(lit(i).as("ck"),
          shiftright($"simhash16", off).bitwiseAND((1 << w) - 1).as("cv"))
      }: _*)).as("c"))
      .select($"source", $"doc_id", $"simhash16", $"c.ck".as("ck"), $"c.cv".as("cv"))
    val a = banded.select($"source", $"ck", $"cv",
      $"doc_id".as("doc_a"), $"simhash16".as("ha"))
    val b = banded.select($"source", $"ck", $"cv",
      $"doc_id".as("doc_b"), $"simhash16".as("hb"))
    a.join(b, Seq("source", "ck", "cv"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= 4)
      // a qualifying pair can collide on several chunks — dedup after
      // the verify so only surviving pairs pay the distinct shuffle
      .select($"doc_a", $"doc_b", $"hamming").distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** 64-bit SimHash — the at-scale fingerprint width (16-bit
    * `q_dedup_simhash` is its oracle-sized sibling; SCALE.md trade-off
    * closed in r2). Stored as two 32-bit halves (`sim_hi` bits 32-63,
    * `sim_lo` bits 0-31) so neither engine plays BIGINT sign games
    * with bit 63. Bit k = majority vote of bit (k%4) of md5 hex digit
    * (k/4) over the document's distinct tokens. */
  private def simhashesWide(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"dedup.simhash64|$dir") {
      import spark.implicits._
      val tok = Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", explode(array_distinct(split($"text", " "))).as("tok"))
        .withColumn("h", md5($"tok".cast("binary")))
      // hoist the 16 hex-digit decodes into one projection — 64 sums
      // each redoing substring+instr made the aggregate 4× slower
      val digits = tok.select(Seq($"doc_id", $"source") ++ (1 to 16).map(p =>
        expr(s"instr('0123456789abcdef', substring(h, $p, 1)) - 1").as(s"d$p")): _*)
      val bitSums = (0 until 64).map { k =>
        val p = k / 4 + 1
        val b = k % 4
        sum(expr(s"shiftright(d$p, $b) & 1")).as(s"c$k")
      }
      val aggCols = count(lit(1)).as("n") +: bitSums
      val agg = digits.groupBy($"doc_id", $"source")
        .agg(aggCols.head, aggCols.tail: _*)
      def half(lowBit: Int): Column = (0 until 32).map(i =>
        when(col(s"c${lowBit + i}") * 2 >= col("n"), lit(1L) * (1L << i)).otherwise(0L))
        .reduce(_ + _)
      agg.select($"doc_id", $"source",
        half(32).as("sim_hi"), half(0).as("sim_lo"))
    }

  def qDedupSimhashWide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    simhashesWide(spark, dir).orderBy($"doc_id")
  }

  /** 64-bit near-dup pairs (Hamming ≤ 7 within source) via pigeonhole
    * banding over 8 byte-chunks: ≤ 7 differing bits over 8 chunks ⇒
    * ≥ 1 chunk matches exactly. One shuffle on (source, chunk, value);
    * `bit_count` verification over both halves reproduces the
    * all-pairs output. */
  def qDedupSimhashWidePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = simhashesWide(spark, dir)
    val banded = s.select($"source", $"doc_id", $"sim_hi", $"sim_lo", explode(array(
      (0 until 8).map { i =>
        val src = if (i < 4) $"sim_lo" else $"sim_hi"
        struct(lit(i).as("ck"),
          shiftright(src, (i % 4) * 8).bitwiseAND(255).as("cv"))
      }: _*)).as("c"))
      .select($"source", $"doc_id", $"sim_hi", $"sim_lo",
        $"c.ck".as("ck"), $"c.cv".as("cv"))
    val a = banded.select($"source", $"ck", $"cv",
      $"doc_id".as("doc_a"), $"sim_hi".as("hia"), $"sim_lo".as("loa"))
    val b = banded.select($"source", $"ck", $"cv",
      $"doc_id".as("doc_b"), $"sim_hi".as("hib"), $"sim_lo".as("lob"))
    a.join(b, Seq("source", "ck", "cv"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("hamming",
        expr("bit_count(hia ^ hib) + bit_count(loa ^ lob)").cast("long"))
      .filter($"hamming" <= 7)
      .select($"doc_a", $"doc_b", $"hamming").distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** Connected components over the verified near-dup graph — the step
    * that turns PAIRS into dedup decisions: near-duplicate relations
    * are not transitive per-pair, so production dedup clusters the
    * verified-pair graph and keeps one canonical document (the min id)
    * per component. Min-label propagation: every node starts labeled
    * with itself; each round pushes labels across edges and keeps the
    * per-node minimum; converged when no label shrinks. The driver
    * loop is the legitimate exception to the no-driver-control-flow
    * rule — iterative graph connectivity needs O(diameter) rounds
    * (near-dup clusters are near-cliques, so 2-3 in practice; the
    * large-star/small-star variant bounds it at O(log n) for
    * pathological chains). Each round is one join + one aggregate on
    * the (small) node-label frame; at 100 TB the per-round label frame
    * is checkpointed to storage, not the driver heap. */
  def qDedupComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = graft.SessionCache.checkpointed(spark, s"dedup.cc.edges|$dir") {
      qDedupLshVerify(spark, dir).select($"doc_a".as("a"), $"doc_b".as("b"))
    }
    val und = edges.union(edges.select($"b".as("a"), $"a".as("b")))
    // Per-round label frames go to parquet STAGE TABLES (two alternating
    // dirs: round r writes dir r%2 and reads r-1's — never its own
    // input), matching the at-scale story: label state lives in
    // storage, not on the driver/executor heap.
    val (labels, _) = connectedComponents(und, (r, df) =>
      graft.SessionCache.stage(spark, s"dedup.cc.labels|$dir|r${r % 2}")(df))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"component_id")
    labels.select($"doc_id", $"label".as("component_id"))
      .withColumn("component_size", count(lit(1)).over(w))
      .withColumn("is_canonical",
        when($"doc_id" === $"component_id", "Y").otherwise("N"))
      .orderBy($"doc_id")
  }

  /** DEDUP BIAS audit — does the dedup pass disproportionately erase a
    * source? Responsible curation requires knowing WHERE the removed
    * mass comes from: a near-dup pass that happens to hit one domain
    * 10× harder than the corpus average silently reshapes the mix.
    * Per source: docs, docs the keep-best policy drops (the SAME
    * [[qDedupClusterPick]] decision — shared-definition rule), removal
    * rate in ppm, the corpus-wide rate, and the bias ratio ×1000
    * (1000 = at par). One join of the tiny drop set onto document
    * sources + a |sources|-row rollup + a 1-row corpus-rate
    * broadcast. */
  def qDedupBias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val drops = qDedupClusterPick(spark, dir)
      .filter($"action" === "drop").select($"doc_id")
    val perSource = Tables.load(spark, dir, "documents")
      .join(drops.withColumn("dropped", lit(1L)), Seq("doc_id"), "left_outer")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce($"dropped", lit(0L))).as("n_removed"))
    val corpus = perSource.agg(
      sum($"n_docs").as("tot_docs"), sum($"n_removed").as("tot_removed"))
    perSource.crossJoin(broadcast(corpus))
      .select($"source", $"n_docs", $"n_removed",
        expr("(n_removed * 1000000) div n_docs").as("removed_ppm"),
        expr("(tot_removed * 1000000) div tot_docs").as("corpus_removed_ppm"),
        expr("""CASE WHEN tot_removed = 0 THEN 1000L
               |ELSE ((n_removed * 1000000) div n_docs) * 1000
               |     div ((tot_removed * 1000000) div tot_docs) END""".stripMargin)
          .as("bias_x1000"))
      .orderBy($"source")
  }

  /** CONTAINMENT detection — the asymmetric near-dup symmetric Jaccard
    * is BLIND to: a short document wholly quoted inside a long one has
    * tiny Jaccard (the union is dominated by the long doc) but
    * containment `|A∩B| div |A| ≈ 1`. Candidates come from the SAME
    * LSH bands as the dedup pipeline; each pair is verified with BOTH
    * directed containments and the Jaccard, and the interesting
    * verdict is `contained` (max containment ≥ 800‰ while Jaccard
    * < 500‰) — subset/quote pairs the symmetric threshold passes over.
    * Same candidates→verify scale shape as qDedupLshVerify; the
    * verify adds two integral divisions, nothing else. */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = qDedupLsh(spark, dir)
    val sh = withShingles(spark, dir)
    cands
      .join(sh.select($"doc_id".as("doc_a"), $"shs".as("sh_a")), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"shs".as("sh_b")), Seq("doc_b"))
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count($"sh_a", $"sh_b"))
      .filter($"inter" > 0)
      .withColumn("jac_permille", expr(
        "(inter * 1000) div (size(sh_a) + size(sh_b) - inter)"))
      .withColumn("cont_a_in_b", expr("(inter * 1000) div size(sh_a)"))
      .withColumn("cont_b_in_a", expr("(inter * 1000) div size(sh_b)"))
      .withColumn("verdict", expr(
        """CASE WHEN jac_permille >= 500 THEN 'duplicate'
          |     WHEN greatest(cont_a_in_b, cont_b_in_a) >= 800 THEN 'contained'
          |     ELSE 'distinct' END""".stripMargin))
      .select($"doc_a", $"doc_b", $"inter", $"jac_permille",
        $"cont_a_in_b", $"cont_b_in_a", $"verdict")
      .orderBy($"doc_a", $"doc_b")
  }

  /** DEDUP IMPACT report — what the near-dup clustering actually buys:
    * the cluster-SIZE histogram (how many clusters of each size) with
    * the removable-doc accounting (`(size−1)·n_clusters` per row —
    * every cluster keeps one canonical) plus each size's share of the
    * whole corpus in ppm. This is the readout a curation run publishes
    * before committing a dedup pass: total docs touched, total
    * removed, and whether the mass sits in pairs or in a few giant
    * templates (which changes the keep-policy conversation). Built
    * from the SAME staged component labels as q_dedup_components; the
    * histogram rollup is |distinct sizes| rows. */
  def qDedupImpact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comp = qDedupComponents(spark, dir)
      .select($"doc_id", $"component_id", $"component_size")
    val nDocs = Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    comp.groupBy($"component_id", $"component_size").agg(count(lit(1)))
      .groupBy($"component_size".as("size"))
      .agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(nDocs))
      .select($"size", $"n_clusters",
        ($"size" * $"n_clusters").as("docs_in_clusters"),
        (($"size" - 1L) * $"n_clusters").as("docs_removable"),
        expr("(size * n_clusters * 1000000) div n_docs").as("corpus_share_ppm"))
      .orderBy($"size")
  }

  /** Canonical selection over the near-dup clusters with the KEEP-BEST
    * policy: the longest document wins its cluster (doc_id tiebreak),
    * everything else is dropped — the production dedup decision
    * (min-id canonical is replay-convenient; real pipelines keep the
    * best copy, typically the longest / highest-quality one). One
    * |dup-docs|-row join onto the components labels + one aggregate;
    * the cluster frame is tiny relative to the corpus at any scale. */
  def qDedupClusterPick(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sized = qDedupComponents(spark, dir)
      .select($"doc_id", $"component_id")
      .join(Tables.load(spark, dir, "documents").select($"doc_id", $"n_chars"),
        Seq("doc_id"))
    // max over (n_chars, -doc_id): longest wins, smallest id breaks ties
    val keepers = sized.groupBy($"component_id")
      .agg(max_by($"doc_id", struct($"n_chars", -$"doc_id")).as("keep_doc"),
        count(lit(1)).as("n_members"))
    sized.join(keepers, Seq("component_id"))
      .select($"doc_id", $"component_id", $"n_members", $"keep_doc",
        when($"doc_id" === $"keep_doc", "keep").otherwise("drop").as("action"))
      .orderBy($"doc_id")
  }

  /** Min-label propagation with a pointer-doubling shortcut
    * (Hash-to-Min flavor — Rastogi et al. 2012, "Finding Connected
    * Components in Map-Reduce"): each round every node takes the min
    * of its own label, its neighbors' labels, AND its label's label
    * (the shortcut — label chains halve every round, so a path graph
    * converges in O(log n) rounds instead of O(n); near-clique dup
    * clusters still converge in 2-3). Convergence via the label-sum
    * invariant: labels only ever decrease, so the exact DECIMAL sum
    * strictly decreases until fixpoint — one aggregate action per
    * round instead of a join + count against the previous frame.
    * `und` must hold both directions of each edge as (a, b).
    * `stageRound(r, df)` materializes round r's label frame and
    * returns a re-readable scan. Returns (labels, rounds). */
  private[graft] def connectedComponents(und: DataFrame,
      stageRound: (Int, DataFrame) => DataFrame): (DataFrame, Int) = {
    val spark = und.sparkSession
    import spark.implicits._
    var labels = stageRound(0,
      und.select($"a".as("doc_id")).distinct().withColumn("label", $"doc_id"))
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"label".cast("decimal(38,0)"))).head.getDecimal(0)
    var cur = labelSum(labels)
    var iters = 0
    var converged = cur == null // empty graph
    val maxIters = 48 // shortcutting: 48 rounds cover diameter 2^48
    while (!converged && iters < maxIters) {
      val prop = und.join(labels.withColumnRenamed("doc_id", "a"), Seq("a"))
        .select($"b".as("doc_id"), $"label")
      val shortcut = labels.select($"doc_id", $"label".as("mid"))
        .join(labels.select($"doc_id".as("mid"), $"label"), Seq("mid"))
        .select($"doc_id", $"label")
      val next = stageRound(iters + 1,
        labels.unionByName(prop).unionByName(shortcut)
          .groupBy($"doc_id").agg(min($"label").as("label")))
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(cur) == 0
      cur = nextSum
      labels = next
      iters += 1
    }
    // an unconverged result would silently mislabel components (the
    // oracle computes the exact closure) — fail loudly instead
    if (!converged && cur != null)
      sys.error(s"component propagation did not converge in $maxIters rounds " +
        "(diameter over 2^$maxIters is impossible — investigate label growth)")
    (labels, iters)
  }

  /** Leakage-safe train/val/test split: the assignment unit is the
    * EXACT-DUP GROUP (content fingerprint), so byte-identical copies
    * can never straddle splits and leak eval data into training. The
    * split is a pure function of a salted fingerprint hash — stable
    * under re-runs, shards, and corpus growth (adding documents never
    * reassigns existing ones), zero shuffles (embarrassingly
    * parallel). ~13/16 train, 2/16 val, 1/16 test. */
  def qSplitAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    splitAssigned(Tables.load(spark, dir, "documents"))
      .select($"doc_id", $"fp", $"bucket", $"split")
      .orderBy($"doc_id")
  }

  /** The ONE split-assignment definition — shared by [[qSplitAssign]]
    * and the cross-split leakage audit ([[qSplitLeakage]]), so the
    * audit can never measure leakage against a different split than
    * the one the pipeline assigns. Adds `fp`, `bucket`, `split`. */
  private[graft] def splitAssigned(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("fp", md5($"text".cast("binary")))
      .withColumn("bucket", expr(
        "instr('0123456789abcdef', substring(md5(cast(concat('split|', fp) as binary)), 1, 1)) - 1")
        .cast("long"))
      .withColumn("split",
        when($"bucket" < 13, "train").when($"bucket" < 15, "val")
          .otherwise("test"))
  }

  /** CROSS-SPLIT GRAM LEAKAGE — the memorization-risk audit the
    * split assignment alone can't give: [[qSplitAssign]] guarantees
    * byte-identical copies never straddle splits, but two DISTINCT
    * documents sharing word 3-grams still can, and every shared gram
    * is eval text the model saw in training. Per test-split document:
    * how many of its distinct shingles also occur in ANY train-split
    * document (the canary/contamination measurement of an eval set
    * against its own training corpus — same shape as benchmark
    * decontamination, but the "benchmark" is the test split itself).
    *
    * Scale shape: split assignment is scan-speed (salted-hash
    * expressions); the audit is ONE shuffle on the 8-byte shingle
    * hash joining test-side (doc, gram) rows against the train-side
    * distinct gram set. The train side is ~13/16 of the corpus — it
    * must NOT be broadcast (contrast [[qContamination]], whose bench
    * side is tiny by construction); a plain shuffled semi-join is the
    * 100 TB plan. */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = withShingles(spark, dir)
      .join(splitAssigned(Tables.load(spark, dir, "documents"))
        .select($"doc_id", $"split"), Seq("doc_id"))
    val testDocs = sh.filter($"split" === "test" && size($"shs") > 0)
      .select($"doc_id", $"source", size($"shs").cast("long").as("n_sh"), $"shs")
    val trainGrams = sh.filter($"split" === "train")
      .select(explode($"shs").as("h")).distinct()
    val leaked = testDocs
      .select($"doc_id", explode($"shs").as("h"))
      .join(trainGrams, Seq("h"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("leaked"))
    testDocs.select($"doc_id", $"source", $"n_sh")
      .join(leaked, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"source", $"n_sh",
        coalesce($"leaked", lit(0L)).as("leaked"),
        expr("(coalesce(leaked, 0) * 1000) div n_sh").as("leak_permille"))
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination sweep: per corpus document, the
    * fraction of its word 3-gram shingles that appear ANYWHERE in the
    * held-out benchmark source's shingle set (`src0` stands in for an
    * eval benchmark). One shuffle on the shingle hash — the standard
    * n-gram-collision decontamination shape at 100 TB (the benchmark
    * side is tiny and broadcastable; the corpus streams). */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = withShingles(spark, dir)
    val bench = sh.filter($"source" === "src0")
      .select(explode($"shs").as("h")).distinct()
    val corpusDocs = sh.filter($"source" =!= "src0" && size($"shs") > 0)
      .select($"doc_id", size($"shs").cast("long").as("n_sh"), $"shs")
    val hits = corpusDocs
      .select($"doc_id", explode($"shs").as("h"))
      .join(broadcast(bench), Seq("h"))
      .groupBy($"doc_id").agg(count(lit(1)).as("hits"))
    corpusDocs.select($"doc_id", $"n_sh")
      .join(hits, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"n_sh", coalesce($"hits", lit(0L)).as("hits"),
        expr("(coalesce(hits, 0) * 1000) div n_sh").as("contam_permille"))
      .orderBy($"doc_id")
  }

  /** Cross-source shingle overlap audit — the corpus-composition
    * question every multi-source training mix asks ("how much of srcA
    * is already in srcB?"): distinct (source, shingle) pairs, then
    * per-source-pair shared-shingle counts and Jaccard permille.
    *
    * Scale shape: ONE shuffle on the shingle for the distinct + the
    * equi-self-join; per-shingle fan-out is bounded by #sources² (a
    * handful), never by corpus size — contrast with doc-level pair
    * enumeration. The per-source totals are a tiny broadcast. */
  /** N-gram novelty — the diversity/memorization metric curation
    * pipelines rank on: per document, the fraction (permille) of its
    * DISTINCT word 3-grams that appear in NO other document. Low
    * novelty = boilerplate/templated text the corpus already covers;
    * high = fresh content worth keeping. Shares the staged shingle
    * frame ([[withShingles]]) with the dedup family, so the only new
    * cost is one shingle-keyed document-frequency shuffle and the
    * doc rollup — the same linear histogram shape as word counting. */
  def qTextNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = withShingles(spark, dir)
      .filter(size($"sh") > 0)
      .select($"doc_id", explode($"sh").as("g"))
    // (g, doc) pairs are distinct (shingle arrays are deduped), so the
    // per-shingle row count IS its document frequency
    val gdf = sh.groupBy($"g").agg(count(lit(1)).as("gdf"))
    sh.join(gdf, Seq("g"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when($"gdf" === 1, 1)).as("n_unique"))
      .withColumn("novelty_permille", expr("(n_unique * 1000) div n_shingles"))
      .orderBy($"doc_id")
  }

  def qSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = withShingles(spark, dir)
      .select($"source", explode($"sh").as("s")).distinct()
    val per = e.groupBy($"source").agg(count(lit(1)).as("n"))
    val a = e.select($"source".as("src_a"), $"s")
    val b = e.select($"source".as("src_b"), $"s")
    a.join(b, Seq("s")).filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("shared"))
      .join(broadcast(per.select($"source".as("src_a"), $"n".as("n_a"))), Seq("src_a"))
      .join(broadcast(per.select($"source".as("src_b"), $"n".as("n_b"))), Seq("src_b"))
      .select($"src_a", $"src_b", $"shared", $"n_a", $"n_b",
        expr("(shared * 1000) div (n_a + n_b - shared)").as("jac_permille"))
      .orderBy($"src_a", $"src_b")
  }

  /** Head fingerprint: md5 of the first 8 tokens — the crawl-pipeline
    * "leading boilerplate" key (full-content md5 finds zero overlap in
    * this corpus; a head key exercises all three verdicts and is what
    * prefix-dedup passes actually use for template-heavy pages).
    *
    * ONE shared definition for both halves of incremental dedup: the
    * batch side ([[qDedupIncremental]]) and the streaming side
    * (`quality.CurationStream.dedupAgainstCorpus`) — the two layers
    * must agree on what counts as a duplicate or the lambda
    * architecture silently diverges. */
  def headFingerprint(text: Column): Column =
    md5(concat_ws(" ", slice(split(text, " "), 1, 8)).cast("binary"))

  /** Incremental corpus dedup: the arriving batch (`src1` stands in
    * for a new crawl snapshot) is deduplicated against the EXISTING
    * corpus (every other source) by content fingerprint, then within
    * itself — the shape every growing training corpus runs on each
    * ingest. Verdicts: `dup_corpus` (fingerprint already stored),
    * `dup_batch` (another batch doc with the same fingerprint and a
    * smaller id wins), `new` (survives into the corpus).
    *
    * Scale shape: the corpus side reduces to its DISTINCT fingerprint
    * set — at 100 TB that set is a stored digest table maintained by
    * previous ingests (see `sources.Bucketed`), so each increment
    * touches only |batch| + |digests| rows, never re-reading corpus
    * text. One shuffle each side on fp for the left join + one window
    * over batch fp groups; a Bloom filter on stored digests
    * (`operators.BloomPrune`) can pre-drop the overwhelmingly-new
    * majority before the join. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("fp", headFingerprint($"text"))
    val corpusFps = docs.filter($"source" =!= "src1")
      .select($"fp").distinct().withColumn("in_corpus", lit(1))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"fp")
    docs.filter($"source" === "src1")
      .select($"doc_id", $"fp")
      .withColumn("batch_first", min($"doc_id").over(w))
      .join(corpusFps, Seq("fp"), "left_outer")
      .select($"doc_id", $"fp",
        when($"in_corpus".isNotNull, "dup_corpus")
          .when($"doc_id" =!= $"batch_first", "dup_batch")
          .otherwise("new").as("verdict"))
      .orderBy($"doc_id")
  }

  /** Corpus SNAPSHOT DIFF — the version-to-version change audit a
    * dataset release ships next to its datasheet: two snapshots are
    * compared by key + content digest and every document classified
    * `added` / `removed` / `changed` / `unchanged`, rolled up per
    * source. The snapshots are derived deterministically from the
    * corpus so the oracle replays them: v1 drops `doc_id % 11 = 0`
    * (those become v2's additions) and truncates the text of
    * `doc_id % 7 = 0` docs (those become `changed`); v2 drops
    * `doc_id % 13 = 0` (v1's removals).
    *
    * Scale shape: each side reduces to (doc_id, source, digest) at
    * scan time — the diff joins 16-byte digests, never text; one
    * co-keyed full-outer join on doc_id + one rollup. At 100 TB both
    * digest frames are the stored manifests of their snapshots, so the
    * diff never reads either corpus. */
  def qCorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val v1 = docs.filter($"doc_id" % 11 =!= 0)
      .select($"doc_id", $"source", md5(
        when($"doc_id" % 7 === 0,
          expr("substring(text, 1, greatest(length(text) - 5, 0))"))
          .otherwise($"text").cast("binary")).as("d1"))
    val v2 = docs.filter($"doc_id" % 13 =!= 0)
      .select($"doc_id", $"source".as("source2"), md5($"text".cast("binary")).as("d2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(coalesce($"source", $"source2").as("source"),
        when($"d1".isNull, "added")
          .when($"d2".isNull, "removed")
          .when($"d1" =!= $"d2", "changed")
          .otherwise("unchanged").as("status"))
      .groupBy($"source", $"status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"source", $"status")
  }

  /** LSH dedup RECALL audit — the dedup family's analog of the ANN
    * recall guard (`Similarity.qSimAnnRecall`): ground truth is the
    * blocked exact-Jaccard pairs at the dedup threshold (500‰ — the
    * audit-only baseline finally doing its stated job), compared
    * against what the production LSH candidates→verify path actually
    * caught. A banding change that craters dedup recall now FAILS
    * correctness, not just quality. Output is a 1-row readout
    * (truth/hit/LSH counts + recall permille); the exact side runs
    * under the [[MaxJaccardBlock]] guard like every audit use.
    *
    * The readout also quantifies the blocking's OWN blindness: on this
    * corpus `n_lsh` exceeds `n_truth` by 24× because near-dup pairs
    * CROSS (source, lang) blocks — exactly the pairs the blocked
    * baseline can never see and the banded path catches for free. */
  def qDedupLshRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val truth = qDedupJaccard(spark, dir)
      .filter($"jac_permille" >= 500).select($"doc_a", $"doc_b")
    val lsh = qDedupLshVerify(spark, dir).select($"doc_a", $"doc_b")
    val hits = truth.join(lsh, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
      .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
      .select($"n_truth", $"n_hit", $"n_lsh",
        expr("""CASE WHEN n_truth = 0 THEN 1000L
               |ELSE (n_hit * 1000) div n_truth END""".stripMargin)
          .as("recall_permille"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_diff" -> qCorpusDiff,
    "q_dedup_lsh_recall" -> qDedupLshRecall,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_jaccard" -> qDedupJaccard,
    "q_dedup_ppjoin" -> qDedupPpjoin,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_lsh_pairs" -> qDedupLsh,
    "q_dedup_lsh_verify" -> qDedupLshVerify,
    "q_dedup_minhash_est" -> qDedupMinhashEst,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_simhash_pairs" -> qDedupSimhashPairs,
    "q_dedup_simhash_wide" -> qDedupSimhashWide,
    "q_dedup_simhash_wide_pairs" -> qDedupSimhashWidePairs,
    "q_dedup_components" -> qDedupComponents,
    "q_dedup_impact" -> qDedupImpact,
    "q_dedup_bias" -> qDedupBias,
    "q_dedup_containment" -> qDedupContainment,
    "q_dedup_cluster_pick" -> qDedupClusterPick,
    "q_split_assign" -> qSplitAssign,
    "q_split_leakage" -> qSplitLeakage,
    "q_contamination" -> qContamination,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_source_overlap" -> qSourceOverlap,
    "q_text_novelty" -> qTextNovelty
  )

  /** DuckDB CTE chain replaying the LSH-verified near-dup graph +
    * recursive transitive closure, ending in
    * `comp(doc_id, component_id)` — shared by the components and
    * cluster-pick oracles. */
  private def duckComponentsCte: String =
    (s"""${duckShingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |sig AS (
      |  SELECT doc_id,
      |${(0 until MinhashK).map(i =>
          s"    list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
          .mkString(",\n")}
      |  FROM d WHERE len(sh) > 0),
      |banded AS (
      |${(0 until MinhashK / 2).map(bnd =>
          s"  SELECT doc_id, $bnd AS band, md5(mh${2 * bnd} || mh${2 * bnd + 1}) AS sig FROM sig")
          .mkString("\n  UNION ALL\n")}
      |),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |jac AS (
      |  SELECT c.doc_a, c.doc_b,
      |    (CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) * 1000)
      |      // (CAST(len(x.sh) + len(y.sh) AS BIGINT)
      |          - CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT)) AS jac_permille
      |  FROM cand c
      |  JOIN d x ON x.doc_id = c.doc_a
      |  JOIN d y ON y.doc_id = c.doc_b),
      |edges AS (SELECT doc_a, doc_b FROM jac WHERE jac_permille >= 500),
      |und AS (SELECT doc_a AS a, doc_b AS b FROM edges
      |        UNION SELECT doc_b, doc_a FROM edges),
      |nodes AS (SELECT DISTINCT a AS doc_id FROM und),
      |reach(src, dst) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
      |comp AS (SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src)""".stripMargin)

  /** DuckDB CTE prologue producing doc_id/source/lang/sh (shingles). */
  private[graft] val duckShingleCte =
    """WITH tt AS (
      |  SELECT doc_id, source, lang, string_split(text, ' ') AS t FROM documents),
      |d AS (
      |  SELECT doc_id, source, lang,
      |    CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
      |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
      |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
      |  FROM tt)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_lsh_recall" ->
      (s"""$duckShingleCte,
        |sig AS (
        |  SELECT doc_id,
        |${(0 until MinhashK).map(i =>
            s"    list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
            .mkString(",\n")}
        |  FROM d WHERE len(sh) > 0),
        |banded AS (
        |${(0 until MinhashK / 2).map(bnd =>
            s"  SELECT doc_id, $bnd AS band, md5(mh${2 * bnd} || mh${2 * bnd + 1}) AS sig FROM sig")
            .mkString("\n  UNION ALL\n")}
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |lshv AS (
        |  SELECT c.doc_a, c.doc_b FROM cand c
        |  JOIN d x ON x.doc_id = c.doc_a
        |  JOIN d y ON y.doc_id = c.doc_b
        |  WHERE (CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) * 1000)
        |    // (CAST(len(x.sh) + len(y.sh) AS BIGINT)
        |       - CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT)) >= 500),
        |truth AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM d a JOIN d b ON a.source = b.source AND a.lang = b.lang
        |                   AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sh, b.sh)) > 0
        |    AND (CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000)
        |      // (CAST(len(a.sh) + len(b.sh) AS BIGINT)
        |         - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)) >= 500),
        |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
        |      FROM truth t JOIN lshv l
        |        ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b),
        |ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        |nls AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lshv)
        |SELECT ntr.n_truth, h.n_hit, nls.n_lsh,
        |  CAST(CASE WHEN ntr.n_truth = 0 THEN 1000
        |    ELSE (h.n_hit * 1000) // ntr.n_truth END AS BIGINT) AS recall_permille
        |FROM ntr CROSS JOIN h CROSS JOIN nls""".stripMargin),

    "q_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 7 = 0
        |        THEN substr(text, 1, greatest(length(text) - 5, 0))
        |        ELSE text END) AS d1
        |  FROM documents WHERE doc_id % 11 <> 0),
        |v2 AS (
        |  SELECT doc_id, source AS source2, md5(text) AS d2
        |  FROM documents WHERE doc_id % 13 <> 0),
        |j AS (
        |  SELECT COALESCE(v1.source, v2.source2) AS source,
        |    CASE WHEN v1.d1 IS NULL THEN 'added'
        |         WHEN v2.d2 IS NULL THEN 'removed'
        |         WHEN v1.d1 <> v2.d2 THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY source, status
        |ORDER BY source, status""".stripMargin,
    "q_dedup_exact" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents)
        |SELECT doc_id, fp,
        |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
        |  count(*) OVER (PARTITION BY fp) AS group_size,
        |  CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp) THEN 'Y' ELSE 'N' END AS is_dup
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_dedup_jaccard" ->
      (s"""$duckShingleCte
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
        |  CAST(len(a.sh) + len(b.sh) AS BIGINT) - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni,
        |  (CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000)
        |    // (CAST(len(a.sh) + len(b.sh) AS BIGINT) - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)) AS jac_permille
        |FROM d a JOIN d b ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) > 0
        |  AND (CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000)
        |    // (CAST(len(a.sh) + len(b.sh) AS BIGINT) - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)) >= 20
        |ORDER BY doc_a, doc_b""".stripMargin),

    // the oracle is the UNBLOCKED brute-force join — proving the
    // prefix-filtered candidates lost nothing anywhere in the corpus
    "q_dedup_ppjoin" ->
      (s"""$duckShingleCte
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
        |  CAST(len(a.sh) + len(b.sh) AS BIGINT) - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni,
        |  (CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000)
        |    // (CAST(len(a.sh) + len(b.sh) AS BIGINT) - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)) AS jac_permille
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE len(a.sh) > 0 AND len(b.sh) > 0
        |  AND len(list_intersect(a.sh, b.sh)) > 0
        |  AND (CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000)
        |    // (CAST(len(a.sh) + len(b.sh) AS BIGINT) - CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)) >= 500
        |ORDER BY doc_a, doc_b""".stripMargin),

    "q_dedup_minhash" ->
      (s"""$duckShingleCte
        |SELECT doc_id,
        |${(0 until MinhashK).map(i =>
            s"  list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
            .mkString(",\n")}
        |FROM d WHERE len(sh) > 0 ORDER BY doc_id""".stripMargin),

    "q_dedup_lsh_pairs" ->
      (s"""$duckShingleCte,
        |sig AS (
        |  SELECT doc_id,
        |${(0 until MinhashK).map(i =>
            s"    list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
            .mkString(",\n")}
        |  FROM d WHERE len(sh) > 0),
        |banded AS (
        |${(0 until MinhashK / 2).map(bnd =>
            s"  SELECT doc_id, $bnd AS band, md5(mh${2 * bnd} || mh${2 * bnd + 1}) AS sig FROM sig")
            .mkString("\n  UNION ALL\n")}
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin),

    "q_dedup_minhash_est" ->
      (s"""$duckShingleCte,
        |sig AS (
        |  SELECT doc_id,
        |${(0 until MinhashK).map(i =>
            s"    list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
            .mkString(",\n")}
        |  FROM d WHERE len(sh) > 0),
        |banded AS (
        |${(0 until MinhashK / 2).map(bnd =>
            s"  SELECT doc_id, $bnd AS band, md5(mh${2 * bnd} || mh${2 * bnd + 1}) AS sig FROM sig")
            .mkString("\n  UNION ALL\n")}
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |est AS (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(${(0 until MinhashK).map(i =>
            s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |      AS match_slots
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.doc_a
        |  JOIN sig sb ON sb.doc_id = c.doc_b),
        |ex AS (
        |  SELECT e.doc_a, e.doc_b, e.match_slots,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
        |    CAST(len(x.sh) + len(y.sh) AS BIGINT)
        |      - CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS uni
        |  FROM est e
        |  JOIN d x ON x.doc_id = e.doc_a
        |  JOIN d y ON y.doc_id = e.doc_b)
        |SELECT doc_a, doc_b, match_slots,
        |  CAST((match_slots * 1000) // $MinhashK AS BIGINT) AS est_permille,
        |  CAST((inter * 1000) // uni AS BIGINT) AS jac_permille,
        |  CAST((match_slots * 1000) // $MinhashK - (inter * 1000) // uni AS BIGINT)
        |    AS err_permille
        |FROM ex ORDER BY doc_a, doc_b""".stripMargin),

    "q_dedup_lsh_verify" ->
      (s"""$duckShingleCte,
        |sig AS (
        |  SELECT doc_id,
        |${(0 until MinhashK).map(i =>
            s"    list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
            .mkString(",\n")}
        |  FROM d WHERE len(sh) > 0),
        |banded AS (
        |${(0 until MinhashK / 2).map(bnd =>
            s"  SELECT doc_id, $bnd AS band, md5(mh${2 * bnd} || mh${2 * bnd + 1}) AS sig FROM sig")
            .mkString("\n  UNION ALL\n")}
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |jac AS (
        |  SELECT c.doc_a, c.doc_b,
        |    (CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) * 1000)
        |      // (CAST(len(x.sh) + len(y.sh) AS BIGINT)
        |          - CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT)) AS jac_permille
        |  FROM cand c
        |  JOIN d x ON x.doc_id = c.doc_a
        |  JOIN d y ON y.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, jac_permille
        |FROM jac WHERE jac_permille >= 500
        |ORDER BY doc_a, doc_b""".stripMargin),

    // the verify chain again, then an undirected transitive closure:
    // component id = min reachable doc (matches min-label propagation)
    "q_dedup_components" ->
      (duckComponentsCte +
        """
        |SELECT doc_id, component_id,
        |  CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS component_size,
        |  CASE WHEN doc_id = component_id THEN 'Y' ELSE 'N' END AS is_canonical
        |FROM comp ORDER BY doc_id""".stripMargin),

    "q_dedup_containment" ->
      (s"""$duckShingleCte,
        |sig AS (
        |  SELECT doc_id,
        |${(0 until MinhashK).map(i =>
            s"    list_min(list_transform(sh, s -> substr(md5(s), ${4 * i + 1}, 4))) AS mh$i")
            .mkString(",\n")}
        |  FROM d WHERE len(sh) > 0),
        |banded AS (
        |${(0 until MinhashK / 2).map(bnd =>
            s"  SELECT doc_id, $bnd AS band, md5(mh${2 * bnd} || mh${2 * bnd + 1}) AS sig FROM sig")
            .mkString("\n  UNION ALL\n")}
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |v AS (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
        |    CAST(len(x.sh) AS BIGINT) AS la, CAST(len(y.sh) AS BIGINT) AS lb
        |  FROM cand c
        |  JOIN d x ON x.doc_id = c.doc_a
        |  JOIN d y ON y.doc_id = c.doc_b
        |  WHERE len(list_intersect(x.sh, y.sh)) > 0),
        |m AS (
        |  SELECT doc_a, doc_b, inter,
        |    (inter * 1000) // (la + lb - inter) AS jac_permille,
        |    (inter * 1000) // la AS cont_a_in_b,
        |    (inter * 1000) // lb AS cont_b_in_a
        |  FROM v)
        |SELECT doc_a, doc_b, inter, jac_permille, cont_a_in_b, cont_b_in_a,
        |  CASE WHEN jac_permille >= 500 THEN 'duplicate'
        |       WHEN greatest(cont_a_in_b, cont_b_in_a) >= 800 THEN 'contained'
        |       ELSE 'distinct' END AS verdict
        |FROM m ORDER BY doc_a, doc_b""".stripMargin),

    "q_dedup_impact" ->
      (duckComponentsCte +
        """,
        |sized AS (
        |  SELECT component_id, CAST(COUNT(*) AS BIGINT) AS size
        |  FROM comp GROUP BY component_id),
        |hist AS (
        |  SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
        |  FROM sized GROUP BY size),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT hist.size, hist.n_clusters,
        |  CAST(hist.size * hist.n_clusters AS BIGINT) AS docs_in_clusters,
        |  CAST((hist.size - 1) * hist.n_clusters AS BIGINT) AS docs_removable,
        |  CAST((hist.size * hist.n_clusters * 1000000) // nd.n_docs AS BIGINT)
        |    AS corpus_share_ppm
        |FROM hist CROSS JOIN nd ORDER BY hist.size""".stripMargin),

    "q_dedup_bias" ->
      (duckComponentsCte +
        """,
        |sized AS (
        |  SELECT c.doc_id, c.component_id, doc.n_chars
        |  FROM comp c JOIN documents doc ON doc.doc_id = c.doc_id),
        |rk AS (
        |  SELECT component_id, doc_id,
        |         row_number() OVER (PARTITION BY component_id
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM sized),
        |drops AS (SELECT doc_id FROM rk WHERE rn > 1),
        |ps AS (
        |  SELECT doc.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_removed
        |  FROM documents doc LEFT JOIN drops dr ON dr.doc_id = doc.doc_id
        |  GROUP BY doc.source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
        |               CAST(SUM(n_removed) AS BIGINT) AS tot_removed FROM ps)
        |SELECT ps.source, ps.n_docs, ps.n_removed,
        |  CAST((ps.n_removed * 1000000) // ps.n_docs AS BIGINT) AS removed_ppm,
        |  CAST((tot.tot_removed * 1000000) // tot.tot_docs AS BIGINT)
        |    AS corpus_removed_ppm,
        |  CAST(CASE WHEN tot.tot_removed = 0 THEN 1000
        |    ELSE ((ps.n_removed * 1000000) // ps.n_docs) * 1000
        |         // ((tot.tot_removed * 1000000) // tot.tot_docs) END AS BIGINT)
        |    AS bias_x1000
        |FROM ps CROSS JOIN tot ORDER BY ps.source""".stripMargin),

    "q_dedup_cluster_pick" ->
      (duckComponentsCte +
        """,
        |sized AS (
        |  SELECT c.doc_id, c.component_id, doc.n_chars
        |  FROM comp c JOIN documents doc ON doc.doc_id = c.doc_id),
        |rk AS (
        |  SELECT component_id, doc_id,
        |         row_number() OVER (PARTITION BY component_id
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM sized),
        |keep AS (SELECT component_id, doc_id AS keep_doc FROM rk WHERE rn = 1),
        |nm AS (SELECT component_id, CAST(count(*) AS BIGINT) AS n_members
        |       FROM sized GROUP BY component_id)
        |SELECT s.doc_id, s.component_id, nm.n_members, keep.keep_doc,
        |  CASE WHEN s.doc_id = keep.keep_doc THEN 'keep' ELSE 'drop' END AS action
        |FROM sized s
        |JOIN keep ON keep.component_id = s.component_id
        |JOIN nm ON nm.component_id = s.component_id
        |ORDER BY s.doc_id""".stripMargin),

    "q_dedup_simhash" ->
      (s"""WITH tok AS (
        |  SELECT doc_id, source, md5(t) AS h
        |  FROM (SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS t
        |        FROM documents)),
        |agg AS (
        |  SELECT doc_id, source, count(*) AS n,
        |${(0 until 16).map { k =>
            val p = k / 4 + 1; val b = k % 4
            s"    sum(((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) >> $b) & 1) AS c$k"
          }.mkString(",\n")}
        |  FROM tok GROUP BY doc_id, source)
        |SELECT doc_id, source,
        |  CAST(${(0 until 16).map(k =>
            s"(CASE WHEN c$k * 2 >= n THEN ${1L << k} ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |    AS simhash16
        |FROM agg ORDER BY doc_id""".stripMargin),

    "q_split_assign" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |b AS (SELECT doc_id, fp,
        |        CAST(strpos('0123456789abcdef', substr(md5('split|' || fp), 1, 1)) - 1 AS BIGINT) AS bucket
        |      FROM d)
        |SELECT doc_id, fp, bucket,
        |  CASE WHEN bucket < 13 THEN 'train' WHEN bucket < 15 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // cross-split leakage: replay the split rule on fp = md5(text),
    // join it onto the shingle CTE, then the same distinct-gram
    // semi-join as contamination with the train split as the corpus
    // side (grams join as STRINGS — Spark ships xxhash64 of the same
    // strings; identical modulo 64-bit collisions)
    "q_split_leakage" ->
      (s"""$duckShingleCte,
        |sp AS (SELECT doc_id,
        |        CASE WHEN CAST(strpos('0123456789abcdef',
        |            substr(md5('split|' || md5(text)), 1, 1)) - 1 AS BIGINT) < 13
        |          THEN 'train'
        |          WHEN CAST(strpos('0123456789abcdef',
        |            substr(md5('split|' || md5(text)), 1, 1)) - 1 AS BIGINT) < 15
        |          THEN 'val' ELSE 'test' END AS split
        |       FROM documents),
        |ds AS MATERIALIZED (SELECT d.doc_id, d.source, d.sh, sp.split
        |       FROM d JOIN sp USING (doc_id)),
        |td AS (SELECT doc_id, source, CAST(len(sh) AS BIGINT) AS n_sh, sh
        |       FROM ds WHERE split = 'test' AND len(sh) > 0),
        |tg AS (SELECT DISTINCT unnest(sh) AS g FROM ds WHERE split = 'train'),
        |tge AS (SELECT doc_id, unnest(sh) AS g FROM td),
        |lk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS leaked
        |       FROM tge WHERE g IN (SELECT g FROM tg) GROUP BY doc_id)
        |SELECT td.doc_id, td.source, td.n_sh,
        |  COALESCE(lk.leaked, 0) AS leaked,
        |  CAST((COALESCE(lk.leaked, 0) * 1000) // td.n_sh AS BIGINT) AS leak_permille
        |FROM td LEFT JOIN lk ON lk.doc_id = td.doc_id
        |ORDER BY td.doc_id""".stripMargin),

    "q_contamination" ->
      (s"""$duckShingleCte,
        |bench AS (SELECT DISTINCT unnest(sh) AS g FROM d WHERE source = 'src0'),
        |cd AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, sh
        |       FROM d WHERE source <> 'src0' AND len(sh) > 0),
        |cg AS (SELECT doc_id, unnest(sh) AS g FROM cd),
        |hits AS (SELECT doc_id, count(*) AS hits
        |         FROM cg JOIN bench USING (g) GROUP BY doc_id)
        |SELECT cd.doc_id, cd.n_sh,
        |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
        |  CAST((COALESCE(h.hits, 0) * 1000) // cd.n_sh AS BIGINT) AS contam_permille
        |FROM cd LEFT JOIN hits h ON h.doc_id = cd.doc_id
        |ORDER BY cd.doc_id""".stripMargin),

    "q_dedup_simhash_wide" ->
      (s"""WITH tok AS (
        |  SELECT doc_id, source, md5(t) AS h
        |  FROM (SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS t
        |        FROM documents)),
        |agg AS (
        |  SELECT doc_id, source, count(*) AS n,
        |${(0 until 64).map { k =>
            val p = k / 4 + 1; val b = k % 4
            s"    sum(((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) >> $b) & 1) AS c$k"
          }.mkString(",\n")}
        |  FROM tok GROUP BY doc_id, source)
        |SELECT doc_id, source,
        |  CAST(${(0 until 32).map(i =>
            s"(CASE WHEN c${32 + i} * 2 >= n THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |    AS sim_hi,
        |  CAST(${(0 until 32).map(i =>
            s"(CASE WHEN c$i * 2 >= n THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |    AS sim_lo
        |FROM agg ORDER BY doc_id""".stripMargin),

    "q_dedup_simhash_wide_pairs" ->
      (s"""WITH tok AS (
        |  SELECT doc_id, source, md5(t) AS h
        |  FROM (SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS t
        |        FROM documents)),
        |agg AS (
        |  SELECT doc_id, source, count(*) AS n,
        |${(0 until 64).map { k =>
            val p = k / 4 + 1; val b = k % 4
            s"    sum(((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) >> $b) & 1) AS c$k"
          }.mkString(",\n")}
        |  FROM tok GROUP BY doc_id, source),
        |s AS (
        |  SELECT doc_id, source,
        |    CAST(${(0 until 32).map(i =>
            s"(CASE WHEN c${32 + i} * 2 >= n THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |      AS sim_hi,
        |    CAST(${(0 until 32).map(i =>
            s"(CASE WHEN c$i * 2 >= n THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |      AS sim_lo
        |  FROM agg)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.sim_hi, b.sim_hi))
        |          + bit_count(xor(a.sim_lo, b.sim_lo)) AS BIGINT) AS hamming
        |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim_hi, b.sim_hi))
        |    + bit_count(xor(a.sim_lo, b.sim_lo)) <= 7
        |ORDER BY doc_a, doc_b""".stripMargin),

    "q_dedup_simhash_pairs" ->
      (s"""WITH tok AS (
        |  SELECT doc_id, source, md5(t) AS h
        |  FROM (SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS t
        |        FROM documents)),
        |agg AS (
        |  SELECT doc_id, source, count(*) AS n,
        |${(0 until 16).map { k =>
            val p = k / 4 + 1; val b = k % 4
            s"    sum(((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) >> $b) & 1) AS c$k"
          }.mkString(",\n")}
        |  FROM tok GROUP BY doc_id, source),
        |s AS (
        |  SELECT doc_id, source,
        |    CAST(${(0 until 16).map(k =>
            s"(CASE WHEN c$k * 2 >= n THEN ${1L << k} ELSE 0 END)").mkString(" + ")} AS BIGINT)
        |      AS simhash16
        |  FROM agg)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.simhash16, b.simhash16)) AS BIGINT) AS hamming
        |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash16, b.simhash16)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin),

    "q_dedup_incremental" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
        |  FROM documents),
        |corpus AS (SELECT DISTINCT fp FROM docs WHERE source <> 'src1'),
        |batch AS (
        |  SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS batch_first
        |  FROM docs WHERE source = 'src1')
        |SELECT b.doc_id, b.fp,
        |  CASE WHEN c.fp IS NOT NULL THEN 'dup_corpus'
        |       WHEN b.doc_id <> b.batch_first THEN 'dup_batch'
        |       ELSE 'new' END AS verdict
        |FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
        |ORDER BY b.doc_id""".stripMargin,

    "q_source_overlap" ->
      (s"""$duckShingleCte,
        |e AS (SELECT DISTINCT source, s
        |      FROM (SELECT source, unnest(sh) AS s FROM d)),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |             CAST(count(*) AS BIGINT) AS shared
        |      FROM e a JOIN e b ON a.s = b.s AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, shared, pa.n AS n_a, pb.n AS n_b,
        |       (shared * 1000) // (pa.n + pb.n - shared) AS jac_permille
        |FROM p
        |JOIN per pa ON pa.source = p.src_a
        |JOIN per pb ON pb.source = p.src_b
        |ORDER BY src_a, src_b""".stripMargin),

    "q_text_novelty" ->
      (s"""$duckShingleCte,
        |g AS (SELECT doc_id, unnest(sh) AS g FROM d WHERE len(sh) > 0),
        |gdf AS (SELECT g, CAST(count(*) AS BIGINT) AS gdf FROM g GROUP BY g)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(count(*) FILTER (WHERE gdf.gdf = 1) AS BIGINT) AS n_unique,
        |  (CAST(count(*) FILTER (WHERE gdf.gdf = 1) AS BIGINT) * 1000)
        |    // count(*) AS novelty_permille
        |FROM g JOIN gdf ON g.g = gdf.g
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)
  )
}
