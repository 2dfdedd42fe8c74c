package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Text-analysis operators for the training-data pipeline surface:
  * token counting (whitespace + regex), quality scoring, n-gram
  * language ID, and document fingerprinting — all as codegen'd builtin
  * expressions (no UDFs), integer/exact arithmetic so the DuckDB oracle
  * matches bit-for-bit, and embarrassingly parallel per-document (no
  * shuffle at any scale).
  */
object TextAnalysis {

  private val Stopwords = Seq("the", "a")

  def tokens(text: Column): Column = split(text, " ")

  /** Count of a literal marker's occurrences via the replace-length
    * trick — exact, codegen-friendly, no regex engine divergence.
    * Integer `div` matches DuckDB's `//` floor division on positives. */
  def markerCount(marker: String): Column =
    expr(s"(length(text) - length(replace(text, '$marker', ''))) div ${marker.length}")

  // --- queries -----------------------------------------------------

  /** Token statistics: whitespace tokens, regex alpha tokens, exact
    * average token length (x100 fixed-point to stay in integers). */
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("sum_len", aggregate(transform($"toks", t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x))
      .select($"doc_id",
        length($"text").cast("long").as("n_chars_calc"),
        $"n_tokens",
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").as("n_alpha_tokens"),
        expr("(sum_len * 100) div n_tokens").as("avg_token_len_x100"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: stopword density + length penalty, integer
    * fixed-point (a real pipeline thresholds on these to drop docs). */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("stop_cnt",
        size(filter($"toks", t => t.isin(Stopwords.map(lit): _*))).cast("long"))
      .withColumn("stop_permille", expr("(stop_cnt * 1000) div n_tokens"))
      .select($"doc_id", $"n_tokens", $"stop_cnt", $"stop_permille",
        (lit(1000L) - $"stop_permille"
          - when(length($"text") < 100, 200L).otherwise(0L)).as("quality_score"),
        when(length($"text") < 100, "Y").otherwise("N").as("is_short"))
      .orderBy($"doc_id")
  }

  /** The classifier's five heads — one per corpus language. Earlier
    * rounds ran 3 hand-picked marker-trigram heads; on this corpus
    * (shared vocabulary, per-language word-ORDER skew) every marker
    * count degenerated and all docs scored 'en'. The learned model
    * below diagonalizes the confusion matrix (≈89% accuracy, every
    * class recall-dominant). */
  private[graft] val LangHeads = Seq("de", "en", "es", "fr", "zh")

  /** Fixed-point floor(4096·log2(x)) for an integer column x ≥ 1 as a
    * pure SQL expression: exponent from the binary-string length, then
    * 12 mantissa squaring steps folded over sequence(0,11) — the
    * classical bit-by-bit log algorithm in bounded BIGINT arithmetic
    * (mantissa < 8192², never overflows, never touches a float).
    * Engine-exact by construction: the oracle replays the identical
    * integer steps, so no ln() last-ulp divergence can enter the
    * hash. Error vs the true floor is within −3..0 units (≈0.07%),
    * identical in both engines. */
  private[graft] def ilog2x4096(x: String): String =
    s"""aggregate(sequence(0, 11),
       |  struct(cast(shiftright($x * 4096, length(bin($x)) - 1) as bigint) AS m,
       |         cast((length(bin($x)) - 1) * 4096 as bigint) AS r),
       |  (acc, i) -> if(shiftright(acc.m * acc.m, 12) >= 8192L,
       |    struct(shiftright(acc.m * acc.m, 13) AS m,
       |           acc.r + shiftleft(1L, 11 - i) AS r),
       |    struct(shiftright(acc.m * acc.m, 12) AS m, acc.r AS r)),
       |  acc -> acc.r)""".stripMargin

  /** Learned word-bigram naive-Bayes language ID — ONE definition
    * shared by the per-doc prediction query ([[qTextLangId]]) and the
    * evaluation matrix ([[qLangIdEval]]). Training: per-(lang, bigram)
    * counts with add-one smoothing over the union vocabulary, weights
    * = fixed-point log2 of the smoothed ppm ([[ilog2x4096]] — the
    * uniform log(1e6) offset cancels in the argmax since every head
    * scores every bigram). Scoring: per-doc bigram counts joined to
    * the BROADCAST weight table (the shipped-model shape — a langid
    * model is a bounded artifact by design; fastText is a few MB),
    * five weighted sums, argmax with deterministic alphabetical
    * priority on ties. Zero-bigram docs score 0 on every head and
    * fall to the first head.
    *
    * Scale shape: ONE (doc, bigram) shuffle produces the frame both
    * training and scoring aggregate from; everything else is
    * vocabulary-sized or 1-row broadcasts. At 100 TB training runs
    * offline on a sample and only the weight broadcast remains in the
    * scoring path. */
  /** Per-doc bigram counts — the one corpus-sized shuffle of the
    * langid pipeline, shared by training and scoring. */
  private def langIdBigrams(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select($"doc_id", $"lang",
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", $"lang", explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("bigram"))
      .groupBy($"doc_id", $"lang", $"bigram")
      .agg(count(lit(1)).as("nb"))
  }

  private[graft] def withLangId(df: DataFrame): DataFrame = {
    val db = langIdBigrams(df)
    withLangIdScored(df, db, langIdWeights(db))
  }

  /** TRAINING: the (bigram → w_de..w_zh) weight table from a per-doc
    * bigram-count frame. Vocabulary-sized output — the shipped model
    * artifact ([[langIdWeightsFor]] stages it once per corpus). */
  private def langIdWeights(db: DataFrame): DataFrame = {
    val spark = db.sparkSession
    import spark.implicits._
    val cnt = db.groupBy($"lang", $"bigram").agg(sum($"nb").as("n"))
    val tot = cnt.groupBy($"lang").agg(sum($"n").as("tot"))
    val voc = cnt.select($"bigram").distinct()
    val vs = voc.agg(count(lit(1)).as("v"))
    val ppm = voc.crossJoin(broadcast(tot)) // vocab × |langs| grid
      .join(cnt, Seq("lang", "bigram"), "left_outer")
      .crossJoin(broadcast(vs)) // 1-row vocab size
      .select($"lang", $"bigram",
        expr("((coalesce(n, 0L) + 1) * 1000000) div (tot + v)").as("ppm"))
    val wAggs = LangHeads.map(l =>
      sum(when($"lang" === l, $"w")).as(s"w_$l"))
    ppm.withColumn("w", expr(ilog2x4096("ppm")))
      .groupBy($"bigram").agg(wAggs.head, wAggs.tail: _*)
  }

  /** SCORING: five broadcast-weighted sums per doc + tie-broken
    * argmax, appended to `df`. */
  private def withLangIdScored(df: DataFrame, db: DataFrame,
      weights: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sAggs = LangHeads.map(l =>
      sum($"nb" * col(s"w_$l")).as(s"s_$l"))
    val scores = db.join(broadcast(weights), Seq("bigram"))
      .groupBy($"doc_id").agg(sAggs.head, sAggs.tail: _*)
    val joined = LangHeads.foldLeft(
      df.join(scores, Seq("doc_id"), "left_outer")) {
      case (d, l) => d.withColumn(s"s_$l", coalesce(col(s"s_$l"), lit(0L)))
    }
    joined.withColumn("predicted_lang",
      when($"s_de" >= $"s_en" && $"s_de" >= $"s_es" &&
        $"s_de" >= $"s_fr" && $"s_de" >= $"s_zh", "de")
        .when($"s_en" >= $"s_es" && $"s_en" >= $"s_fr" &&
          $"s_en" >= $"s_zh", "en")
        .when($"s_es" >= $"s_fr" && $"s_es" >= $"s_zh", "es")
        .when($"s_fr" >= $"s_zh", "fr")
        .otherwise("zh"))
  }

  /** The weight table staged once per (session, corpus) — training
    * runs once and both langid queries score against the stored
    * model, the production train-once/score-many shape. */
  private def langIdWeightsFor(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"langid_weights|$dir")(
      langIdWeights(langIdBigrams(Tables.load(spark, dir, "documents"))))

  def qTextLangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    withLangIdScored(docs, langIdBigrams(docs), langIdWeightsFor(spark, dir))
      .select($"doc_id", $"s_de", $"s_en", $"s_es", $"s_fr", $"s_zh",
        $"predicted_lang")
      .orderBy($"doc_id")
  }

  /** HELD-OUT LANGUAGE-ID EVALUATION — the train/test-separated
    * generalization measure [[qLangIdEval]] (in-corpus, the
    * operational readout) deliberately is not: the model trains on
    * the even-doc_id half only and scores the odd half it never saw.
    * Test bigrams outside the trained vocabulary drop in the weight
    * join — exactly the serve-time OOV behavior, measured instead of
    * hidden. Output: per (true, predicted) cell with test-set recall
    * shares in ppm.
    *
    * Measured on this corpus: in-corpus accuracy 89%, held-out ~23% —
    * the separation quantifies how much of the in-corpus diagonal is
    * each document's own rare bigrams voting for themselves
    * (memorization), which is exactly the overfitting audit a
    * classifier-driven curation pipeline must run before trusting its
    * operational confusion matrix. */
  def qLangIdHoldout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val weights = graft.SessionCache.checkpointed(
      spark, s"langid_weights_holdout|$dir")(
      langIdWeights(langIdBigrams(docs.filter($"doc_id" % 2 === 0))))
    val test = docs.filter($"doc_id" % 2 =!= 0)
    val cells = withLangIdScored(test, langIdBigrams(test), weights)
      .groupBy($"lang", $"predicted_lang").agg(count(lit(1)).as("n"))
    val trueTot = cells.groupBy($"lang").agg(sum($"n").as("n_true"))
    cells.join(broadcast(trueTot), Seq("lang"))
      .withColumn("true_share_ppm", expr("(n * 1000000) div n_true"))
      .select($"lang", $"predicted_lang", $"n", $"n_true", $"true_share_ppm")
      .orderBy($"lang", $"predicted_lang")
  }

  /** Language-ID evaluation against the corpus's labeled `lang` —
    * the classifier-evaluation primitive: the full confusion matrix
    * with per-cell shares of the TRUE class (diagonal = recall) and of
    * the PREDICTED class (diagonal = precision), exact ppm. With the
    * five learned heads the matrix is diagonal-dominant in every class
    * (the r9 3-head marker detector absorbed everything into 'en';
    * this query documented that blind spot then and pins its closure
    * now). Two map-side-combined aggregates over the cell frame;
    * marginals broadcast back. */
  def qLangIdEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val cells = withLangIdScored(docs, langIdBigrams(docs),
        langIdWeightsFor(spark, dir))
      .groupBy($"lang", $"predicted_lang").agg(count(lit(1)).as("n"))
    val trueTot = cells.groupBy($"lang").agg(sum($"n").as("n_true"))
    val predTot = cells.groupBy($"predicted_lang").agg(sum($"n").as("n_pred"))
    cells
      .join(broadcast(trueTot), Seq("lang"))
      .join(broadcast(predTot), Seq("predicted_lang"))
      .withColumn("true_share_ppm", expr("(n * 1000000) div n_true"))
      .withColumn("pred_share_ppm", expr("(n * 1000000) div n_pred"))
      .select($"lang", $"predicted_lang", $"n", $"n_true", $"n_pred",
        $"true_share_ppm", $"pred_share_ppm")
      .orderBy($"lang", $"predicted_lang")
  }

  /** HEAVY HITTERS via the SpaceSaving mergeable aggregate
    * ([[graft.functions.SpaceSavingTopK]]): tokens with frequency over
    * 0.5% of the stream, EXACTLY — but without ever shuffling the full
    * token cardinality. One scan folds each partition into an
    * 800-entry summary, partials merge associatively (error ≤ n/800,
    * so every token over n/200 is guaranteed in the candidate set —
    * 4× margin), and the ≤ 800 candidates are re-counted exactly
    * through a broadcast semi-join. At 100 TB the groupBy alternative
    * shuffles billions of distinct keys to find these few; this
    * shuffles 800. The sketch only proposes — the exact re-count
    * decides — so the output is deterministic and oracle-hashable
    * despite the sketch's order-dependent internals. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val cands = toks.agg(expr("spacesaving_topk(token, 800)").as("cand"))
      .select(explode($"cand").as("token"))
    val tot = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot)) // 1-row total onto ≤800 candidates
      .filter($"n" * 200 > $"n_total")
      .select($"token", $"n", expr("(n * 1000000) div n_total").as("share_ppm"))
      .orderBy($"n".desc, $"token")
  }

  /** PER-GROUP heavy hitters — [[qHeavyHitters]]'s native mergeable
    * SpaceSaving aggregate composed with a GROUP BY: one summary per
    * source, so per-domain frequent-token profiles come out of the
    * same two-phase shape (candidates → exact recount → threshold).
    * Capacity 200 per group guarantees every token above the 1%%
    * emission threshold is a candidate (SpaceSaving admits any item
    * with share > 1/capacity = 0.5%% — Metwally 2005), which is what
    * makes the DuckDB exact-count oracle replay the OUTPUT exactly
    * even though the sketch itself is not SQL-expressible.
    *
    * Scale: candidate state is O(groups × capacity) regardless of
    * token cardinality; the exact recount semi-joins on (source,
    * token) against the ≤ 200·|sources| candidate list — only
    * candidate keys ever shuffle with their counts. */
  def qHeavyHittersGrouped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select($"source", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val cands = toks.groupBy($"source")
      .agg(expr("spacesaving_topk(token, 200)").as("cand"))
      .select($"source", explode($"cand").as("token"))
    val tot = toks.groupBy($"source").agg(count(lit(1)).as("n_src"))
    toks.join(broadcast(cands), Seq("source", "token"), "left_semi")
      .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
      .join(broadcast(tot), Seq("source"))
      .filter($"n" * 100 > $"n_src")
      .select($"source", $"token", $"n",
        expr("(n * 1000000) div n_src").as("share_ppm"))
      .orderBy($"source", $"n".desc, $"token")
  }

  /** CODE-SWITCHING / LANGUAGE-MIX AUDIT: the doc-level langid hides
    * documents that switch language mid-text (boilerplate headers,
    * quoted translations, scraped concatenations) — a curation hazard
    * langid-filtered corpora are known to carry. Chunk each document
    * into fixed 256-char windows, run the SAME marker-trigram argmax
    * per chunk, and report per doc: chunk votes per language, the
    * dominant language (the doc-level priority rule on chunk votes),
    * and the mix share — 1000 − dominant votes·1000 div chunks.
    * `is_mixed` flags docs whose dominant language holds under 80% of
    * chunks. One explode (bounded ×⌈len/256⌉) + one combine; no join,
    * no shuffle beyond the rollup. */
  def qLangIdMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the SAME stored weight table the doc-level classifier scores
    // with (shared-definition rule — r10 upgraded this audit from the
    // retired marker heads to the learned model)
    val weights = langIdWeightsFor(spark, dir)
    val chunks = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        // greatest(1, …): a zero-length doc yields ONE empty chunk on
        // both engines. Without it Spark's sequence(0, -1) auto-
        // reverses to [0, -1] (two phantom chunks) while DuckDB's
        // range(0, 0) emits none — a latent hash divergence on empty
        // docs (ADVICE r9).
        explode(expr(
          "sequence(0, greatest(1, cast((length(text) + 255) div 256 as int)) - 1)")).as("ci"),
        $"text")
      .withColumn("chunk", expr("substring(text, ci * 256 + 1, 256)"))
      .select($"doc_id", $"ci", $"chunk")
    // per-chunk bigrams, the doc-level token convention; boundary-cut
    // partial tokens form bigrams outside the trained vocabulary and
    // drop in the weight join — identically in both engines
    val cb = chunks
      .select($"doc_id", $"ci",
        expr("filter(split(chunk, ' '), t -> t <> '')").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", $"ci", explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("bigram"))
      .groupBy($"doc_id", $"ci", $"bigram")
      .agg(count(lit(1)).as("nb"))
    val sAggs = LangHeads.map(l =>
      sum($"nb" * col(s"w_$l")).as(s"s_$l"))
    val scored = cb.join(broadcast(weights), Seq("bigram"))
      .groupBy($"doc_id", $"ci").agg(sAggs.head, sAggs.tail: _*)
    val chunkLang = LangHeads.foldLeft(
        chunks.join(scored, Seq("doc_id", "ci"), "left_outer")) {
        case (d, l) => d.withColumn(s"s_$l", coalesce(col(s"s_$l"), lit(0L)))
      }
      .withColumn("chunk_lang",
        when($"s_de" >= $"s_en" && $"s_de" >= $"s_es" &&
          $"s_de" >= $"s_fr" && $"s_de" >= $"s_zh", "de")
          .when($"s_en" >= $"s_es" && $"s_en" >= $"s_fr" &&
            $"s_en" >= $"s_zh", "en")
          .when($"s_es" >= $"s_fr" && $"s_es" >= $"s_zh", "es")
          .when($"s_fr" >= $"s_zh", "fr")
          .otherwise("zh"))
    val vAggs = LangHeads.map(l =>
      sum(when($"chunk_lang" === l, 1L).otherwise(0L)).as(s"v_$l"))
    chunkLang.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), vAggs: _*)
      .withColumn("dom_lang",
        when($"v_de" >= $"v_en" && $"v_de" >= $"v_es" &&
          $"v_de" >= $"v_fr" && $"v_de" >= $"v_zh", "de")
          .when($"v_en" >= $"v_es" && $"v_en" >= $"v_fr" &&
            $"v_en" >= $"v_zh", "en")
          .when($"v_es" >= $"v_fr" && $"v_es" >= $"v_zh", "es")
          .when($"v_fr" >= $"v_zh", "fr")
          .otherwise("zh"))
      .withColumn("dom_votes",
        when($"dom_lang" === "de", $"v_de")
          .when($"dom_lang" === "en", $"v_en")
          .when($"dom_lang" === "es", $"v_es")
          .when($"dom_lang" === "fr", $"v_fr")
          .otherwise($"v_zh"))
      .withColumn("mix_permille",
        expr("1000 - (dom_votes * 1000) div n_chunks"))
      .select($"doc_id", $"n_chunks", $"v_de", $"v_en", $"v_es",
        $"v_fr", $"v_zh", $"dom_lang", $"mix_permille",
        when($"mix_permille" > 200, "Y").otherwise("N").as("is_mixed"))
      .orderBy($"doc_id")
  }

  /** COMPRESSION-RATIO quality signal (the Gopher/RedPajama "too
    * compressible" filter, public papers): deflate bytes per text byte
    * in permille — templated/repetitive boilerplate compresses far
    * below prose and gets dropped by thresholding this. DEFLATE runs
    * in `mapPartitions` with one `Deflater`(level 6) reused per batch
    * (native zlib allocation amortized); the compressed BYTES never
    * leave the executor — only the two lengths do. Rows-only at the
    * driver gate (no SQL engine replays zlib); the spec pins the
    * discriminative property on planted fixtures instead. */
  def qTextCompressRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, in.length.toLong, out,
            if (in.length > 0) out * 1000 / in.length else 0L)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate", "ratio_permille")
      .orderBy($"doc_id")
  }

  /** AUDIT TWIN of [[qTextCompressRatio]]: zlib's output bytes aren't
    * SQL-replayable, but four invariants of them are — the stream is
    * non-empty; bounded by the SIZE-PROPORTIONAL deflate worst case
    * (zlib's own public compressBound: n + n/4096 + n/16384 + 13 —
    * stored-block overhead at the ~16 KiB blocks zlib actually emits;
    * a flat "+64" would falsely flag an incompressible document past
    * ~250 KiB); an INDEPENDENT fresh-Deflater recompression reproduces the
    * main query's published n_deflate and its ratio arithmetic exactly
    * (level-6 determinism — the property that makes the ratio a stable
    * quality signal across reruns and executors, checked by JOINING
    * the main query's output, not by recomputing in-process); and a
    * second fresh instance within this scan reproduces the bytes
    * bit-for-bit. DuckDB replays exact UTF-8 byte length (strlen) +
    * constant-TRUE booleans. The recompression scan is zero-shuffle;
    * the cross-check join shuffles only (doc_id, 2 longs) rows. */
  def qTextCompressAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val audit = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val buf = new Array[Byte](1 << 16)
        def deflate(in: Array[Byte]): Array[Byte] = {
          val d = new java.util.zip.Deflater(6) // fresh per run: rerun claim
          d.setInput(in); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          while (!d.finished()) {
            val k = d.deflate(buf)
            out.write(buf, 0, k)
          }
          d.end()
          out.toByteArray
        }
        it.map { case (id, text) =>
          val in = text.getBytes("UTF-8")
          val c1 = deflate(in)
          val c2 = deflate(in)
          (id, in.length.toLong, c1.length.toLong,
            java.util.Arrays.equals(c1, c2))
        }
      }
      .toDF("doc_id", "a_bytes", "a_deflate", "rerun_deterministic")
    qTextCompressRatio(spark, dir)
      .join(audit, Seq("doc_id"))
      .select($"doc_id", $"n_bytes",
        ($"n_deflate" > 0L).as("deflate_positive"),
        expr("n_deflate <= n_bytes + (n_bytes div 4096) + (n_bytes div 16384) + 64")
          .as("deflate_bounded"),
        ($"a_bytes" === $"n_bytes" && $"a_deflate" === $"n_deflate" &&
          $"ratio_permille" === when($"n_bytes" > 0L,
            expr("n_deflate * 1000 div n_bytes")).otherwise(lit(0L)))
          .as("published_reproducible"),
        $"rerun_deterministic")
      .orderBy($"doc_id")
  }

  /** HYBRID RETRIEVAL via RECIPROCAL RANK FUSION (Cormack et al. 2009,
    * public paper): the standard way to combine a lexical and a dense
    * ranking without tuning score scales — fused(d) = Σ 1/(60 + rank)
    * over the lists that retrieved d. For each flagged query document
    * (doc_id % 100 == 0, the sim module's query set — vec_id and
    * doc_id share a domain), the BM25 more-like-this top-20 fuses with
    * the cosine-kNN top-20; each side contributes (10⁶ div (60+rank)),
    * a doc missing from one list contributes 0 from it. All integral.
    *
    * Shape: the BM25 side joins query terms (broadcast — queries ×
    * their distinct tokens) onto the tf frame, grouped per (query,
    * doc); the dense side broadcasts the query vectors over one corpus
    * scan; fusion is a full-outer join of two ≤20-row-per-query rank
    * frames. */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select($"doc_id", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    // tf spines the doc-length rollup, the df rollup, the query-term
    // broadcast AND the main postings join — dl/dfr sit on the serial
    // join spine, so the corpus tokenize+count re-ran per reference
    // (plans/r15/q_hybrid_rrf_before.txt: 4 tokenize subtrees).
    // Ephemeral materialization: corpus-proportional (one row per
    // distinct (doc,token)) but single-query — SCALE.md category 3;
    // a cluster deployment routes it through the parquet stage.
    val tf = graft.SessionCache.stageEphemeral(spark, "rrf_tf")(
      tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val dfr = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("(sum(dl) * 1000) div count(1)").as("avgdl_x1000"))
    val qterms = tf.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("qid"), $"token").distinct()
    val wText = Window.partitionBy($"qid")
      .orderBy($"score_x1000".desc, $"doc_id")
    val textRanks = withBm25Score(tf
      .join(broadcast(qterms), Seq("token"))
      .filter($"doc_id" =!= $"qid")
      .join(dl, Seq("doc_id"))
      .join(dfr, Seq("token"))
      .crossJoin(broadcast(stats)))
      .groupBy($"qid", $"doc_id")
      .agg(sum($"score_term").as("score_x1000"))
      .withColumn("rank_text", row_number().over(wText).cast("long"))
      .filter($"rank_text" <= 20)
      .select($"qid", $"doc_id", $"rank_text")
    val emb = Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as nv")
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"nv".as("qv"))
    val wVec = Window.partitionBy($"qid").orderBy($"cos_e6".desc, $"doc_id")
    val vecRanks = broadcast(q)
      .join(emb.select($"vec_id".as("doc_id"), $"nv".as("cv")),
        $"qid" =!= $"doc_id")
      .withColumn("c", graft.functions.CosineSimilarity.cosine_sim($"qv", $"cv"))
      .filter(!isnan($"c"))
      .withColumn("cos_e6", round($"c" * 1e6).cast("long"))
      .withColumn("rank_vec", row_number().over(wVec).cast("long"))
      .filter($"rank_vec" <= 20)
      .select($"qid", $"doc_id", $"rank_vec")
    val wFused = Window.partitionBy($"qid").orderBy($"rrf_e6".desc, $"doc_id")
    textRanks.join(vecRanks, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_e6",
        expr("coalesce(1000000 div (60 + rank_text), 0L) + " +
          "coalesce(1000000 div (60 + rank_vec), 0L)"))
      .withColumn("fused_rank", row_number().over(wFused).cast("long"))
      .filter($"fused_rank" <= 10)
      .select($"qid".as("query_id"), $"fused_rank", $"doc_id",
        $"rank_text", $"rank_vec", $"rrf_e6")
      .orderBy($"query_id", $"fused_rank")
  }

  /** GPT-2-style pretokenizer pattern, restricted to constructs RE2 and
    * java.util.regex match identically (no backrefs, no lookaround):
    * space-glued letter runs, digit runs, punctuation runs. */
  private val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** BPE-ish token accounting: pretokenizer piece counts plus a
    * length-capped piece count (every pretoken longer than 4 chars
    * splits into ceil(len/4) merges — the byte-pair budget a real BPE
    * vocabulary would land under). The pipeline thresholds on
    * tokens-per-char to drop boilerplate-heavy docs. */
  def qTextBpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("pieces", expr(s"regexp_extract_all(text, '$BpePattern', 0)"))
      .withColumn("n_pieces", size($"pieces").cast("long"))
      .withColumn("n_bpe",
        expr("aggregate(pieces, 0L, (acc, p) -> acc + (length(p) + 3) div 4)"))
      .select($"doc_id", $"n_pieces",
        size(array_distinct($"pieces")).cast("long").as("n_distinct_pieces"),
        $"n_bpe",
        // nullif: an empty document must yield NULL, not an ANSI
        // DIVIDE_BY_ZERO job failure
        expr("(n_bpe * 1000) div nullif(length(text), 0)").as("bpe_per_kchar"))
      .orderBy($"doc_id")
  }

  private val RollK = 8          // rolling window (chars)
  private val RollP = 1000000007L // modulus keeps BIGINT math ANSI-safe

  /** Rolling-hash fingerprint (Rabin-Karp windows + mod-sampling à la
    * winnowing): polynomial hash of every 8-char window, then the
    * shift-robust summary a dedup pipeline keys on — min/max window
    * hash and the min over the deterministic mod-16 sample. Pure
    * integer arithmetic (sum of ascii·31^d, d<8, fits BIGINT) so both
    * engines compute bit-identical values. */
  /** The [[RollK]]-char Rabin window hash at 1-based position `i` over
    * a pre-split bigint `codes` array — ONE definition shared by the
    * fingerprint sampler ([[qTextRollhash]]) and the char-dup-span
    * selector ([[dupChars]]). Indexing the pre-split code array keeps
    * the evaluation O(1) per position — substring(text, i, 1) inside
    * a lambda is an O(i) UTF-8 seek that made the whole pass quadratic
    * in document length (measured 25s at sf0.1). */
  private def rollWindowHash: String = {
    val powers = (0 until RollK).map(d => math.pow(31.0, RollK - 1 - d).toLong)
    (1 to RollK).map { d =>
      s"element_at(codes, i + ${d - 1}) * ${powers(d - 1)}L"
    }.mkString("(", " + ", s") % ${RollP}L")
  }

  /** The DuckDB replay of [[rollWindowHash]]: the same Rabin window
    * hash over `strExpr` at 1-based position `posExpr` — ONE oracle
    * definition shared by the q_text_rollhash and q_text_dup_chars
    * oracles, mirroring the Spark-side sharing, so a RollK/RollP/base
    * change cannot update one query's oracle and silently break the
    * other's hash. */
  private def duckRollWindowHash(strExpr: String, posExpr: String): String = {
    val powers = (0 until RollK).map(d => math.pow(31.0, RollK - 1 - d).toLong)
    (1 to RollK).map { d =>
      s"CAST(ascii(substring($strExpr, $posExpr + ${d - 1}, 1)) AS BIGINT) * ${powers(d - 1)}"
    }.mkString("(", " + ", s") % $RollP")
  }

  def qTextRollhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val windowHash = rollWindowHash
    Tables.load(spark, dir, "documents")
      .withColumn("codes", expr("transform(split(text, ''), c -> cast(ascii(c) as bigint))"))
      .withColumn("wh", expr(
        s"CASE WHEN length(text) < $RollK THEN CAST(array() AS array<bigint>) " +
          s"ELSE transform(sequence(1, length(text) - ${RollK - 1}), i -> $windowHash) END"))
      .select($"doc_id",
        size($"wh").cast("long").as("n_windows"),
        array_min($"wh").as("fp_min"),
        array_max($"wh").as("fp_max"),
        array_min(expr("filter(wh, h -> h % 16 = 0)")).as("fp_sampled"))
      .orderBy($"doc_id")
  }

  /** Document fingerprinting: whole-doc digest + head/tail block
    * digests (the building block for shift-robust dedup keys). */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        md5($"text".cast("binary")).as("fp"),
        md5(substring($"text", 1, 64).cast("binary")).as("head_fp"),
        md5(when(length($"text") >= 64,
          expr("substring(text, length(text) - 63, 64)"))
          .otherwise($"text").cast("binary")).as("tail_fp"),
        substring(md5($"text".cast("binary")), 1, 16).as("fp64"))
      .orderBy($"doc_id")
  }

  /** Corpus vocabulary top-k: term frequency + document frequency per
    * token, top 100 by tf. One shuffle with map-side combine; the
    * driver-side cap is a TakeOrdered, not a full sort — the corpus
    * vocabulary-build shape at 100 TB (df feeds idf and tokenizer
    * training). Ties are impossible at the cut: (tf DESC, token) is a
    * total order. */
  def qVocabTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token")
      .agg(count(lit(1)).as("tf"), count_distinct($"doc_id").as("df"))
      .orderBy($"tf".desc, $"token")
      .limit(100)
  }

  /** READABILITY SCORING — Flesch Reading Ease (Flesch 1948) and the
    * Flesch–Kincaid grade level (Kincaid 1975), both public formulas
    * and standard corpus-quality columns (a pretraining mix report
    * routinely buckets by grade level): FRE = 206.835 − 1.015·(w/s) −
    * 84.6·(sy/w), FKGL = 0.39·(w/s) + 11.8·(sy/w) − 15.59, carried in
    * millis with one integer division per ratio (all operands
    * non-negative — no signed-division daylight). Syllables use the
    * classical vowel-group heuristic (maximal [aeiouy]+ runs — the
    * same regex in both engines); sentences count [.!?] with a
    * floor of 1. Pure scan shape: zero shuffles, one row per doc. */
  def qTextReadability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("n_words",
        size(filter(tokens($"text"), t => length(t) > 0)).cast("long"))
      .withColumn("n_sentences", expr(
        "greatest(1L, cast(size(regexp_extract_all(text, '[.!?]', 0)) as long))"))
      .withColumn("n_syllables", expr(
        "cast(size(regexp_extract_all(text, '[aeiouy]+', 0)) as long)"))
      .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
        expr(
          """CASE WHEN n_words > 0 THEN
            |  206835 - (1015 * n_words) div n_sentences
            |         - (84600 * n_syllables) div n_words END""".stripMargin)
          .as("flesch_milli"),
        expr(
          """CASE WHEN n_words > 0 THEN
            |  (390 * n_words) div n_sentences
            |  + (11800 * n_syllables) div n_words - 15590 END""".stripMargin)
          .as("fk_grade_milli"))
      .orderBy($"doc_id")
  }

  /** BURROWS' DELTA STYLOMETRY between sources (Burrows 2002, "Delta:
    * a measure of stylistic difference" — the standard authorship-
    * attribution metric): over the corpus's top-32 words (the
    * function-word proxy), each source's relative frequencies are
    * z-scored against the cross-source distribution and Delta(a, b) =
    * mean |z_a − z_b| — sources writing in the same "voice" (two
    * crawls of one site, templated mirrors) sit near 0 even when
    * exact/MinHash dedup sees distinct documents. Integer end to end:
    * deviations carried ×k (k = #sources) so the mean never divides,
    * σ via the 26-step integer-sqrt fold (`Relational.isqrtFold` —
    * variance sums reach ~10¹⁴, past the default 2⁴⁰ domain), z in
    * sign-split millis, σ = 0 words (uniform across sources)
    * contribute 0. Shape: one (source, token) combine against the
    * broadcast top-32 list, then every frame is ≤ k·32 rows — the
    * pairwise join is 32·k(k−1)/2 bounded. */
  def qSourceStylometry(spark: SparkSession, dir: String): DataFrame =
    sourceStylometry(Tables.load(spark, dir, "documents"))

  /** Core of [[qSourceStylometry]] over any (source, text) frame —
    * separated so the twin-source fixture spec can drive it. */
  private[graft] def sourceStylometry(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select($"source", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val srcTot = tok.groupBy($"source").agg(count(lit(1)).as("n_s"))
    val topW = tok.groupBy($"token").agg(count(lit(1)).as("tf"))
      .orderBy($"tf".desc, $"token").limit(32).select($"token")
    val cnt = tok.join(broadcast(topW), Seq("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
    val grid = srcTot.crossJoin(broadcast(topW))
      .join(cnt, Seq("source", "token"), "left_outer")
      .select($"source", $"token",
        expr("(coalesce(c, 0L) * 1000000) div n_s").as("f"))
    val ws = grid.groupBy($"token")
      .agg(count(lit(1)).as("k"), sum($"f").as("sf"))
    val dev = grid.join(broadcast(ws), Seq("token"))
      .withColumn("dnum", expr("k * f - sf"))
    val sig = dev.groupBy($"token")
      .agg(max($"k").as("k"), sum($"dnum" * $"dnum").as("ss"))
      .withColumn("sigk", expr(
        graft.queries.Relational.isqrtFold("ss div k", steps = 26)))
    val z = dev.join(broadcast(sig.select($"token", $"sigk")), Seq("token"))
      .select($"source", $"token", expr(
        """CASE WHEN sigk = 0 THEN 0L
          |     WHEN dnum >= 0 THEN (dnum * 1000) div sigk
          |     ELSE -(((-dnum) * 1000) div sigk) END""".stripMargin)
        .as("z_milli"))
    val a = z.select($"token", $"source".as("source_a"), $"z_milli".as("za"))
    val b = z.select($"token", $"source".as("source_b"), $"z_milli".as("zb"))
    a.join(b, Seq("token"))
      .filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_words"),
        expr("sum(abs(za - zb)) div count(1)").as("delta_milli"))
      .orderBy($"source_a", $"source_b")
  }

  /** LEXICAL-DIVERSITY / VOCABULARY-GROWTH AUDIT per source — the
    * Herdan's-law readout (Herdan 1960; a.k.a. Heaps' law) a corpus
    * report puts next to the Zipf slope: per source the token count
    * N, vocabulary V, hapax legomena (count-1 tokens — the OOV
    * pressure estimate), type-token ratio, hapax share, and Herdan's
    * C = log V / log N in millis through the shared integer log —
    * natural text sits near C ≈ 0.7–0.9 and V ≈ K·N^C; a source with
    * C near 1 is vocabulary-exploding (noisy/IDs), near 0 is
    * template-collapsed. ONE (source, token) combine; everything
    * after is |sources| rows. */
  def qVocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.load(spark, dir, "documents")
      .select($"source", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
    cnt.groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("v_types"),
        sum(when($"c" === 1L, 1L).otherwise(0L)).as("hapax"))
      .withColumn("lv", expr(ilog2x4096("v_types")))
      .withColumn("ln", expr(ilog2x4096("n_tokens")))
      .select($"source", $"n_tokens", $"v_types", $"hapax",
        expr("(v_types * 1000) div n_tokens").as("ttr_milli"),
        expr("(hapax * 1000) div v_types").as("hapax_share_milli"),
        expr("CASE WHEN ln > 0 THEN (lv * 1000) div ln END")
          .as("herdan_c_milli"))
      .orderBy($"source")
  }

  /** CHARACTER-LEVEL SHANNON ENTROPY (Shannon 1948) — the classical
    * randomness signal next to [[qTextCompressRatio]]'s zlib column,
    * but SQL-replayable: H = Σ_c (k_c/n)·log2(n/k_c) carried as
    * Σ k_c·(L(n) − L(k_c)) div n in 1/4096-bit units through the
    * shared integer log ([[ilog2x4096]]). Low entropy flags repeated-
    * character boilerplate; ~4.2 bits is ordinary English. Each term
    * is clamped at 0 (exact math keeps them non-negative; the log
    * chain's −3-unit floor error could otherwise push a k≈n term
    * negative and split truncate-vs-floor division between engines).
    *
    * Scale: one map-side-combined (doc, char) shuffle — the per-doc
    * char alphabet is bounded, so the window totals and the final doc
    * combine ride tiny frames. */
  def qTextEntropy(spark: SparkSession, dir: String): DataFrame =
    textEntropy(Tables.load(spark, dir, "documents"))

  /** Core of [[qTextEntropy]] over any (doc_id, text) frame —
    * separated so the exact-bit planted spec can drive it. */
  private[graft] def textEntropy(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cc = docs
      .select($"doc_id", explode(split($"text", "")).as("ch"))
      .filter(length($"ch") > 0)
      .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("k"))
    val wD = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
    val agg = cc
      .withColumn("nc", sum($"k").over(wD))
      .withColumn("ndc", count(lit(1)).over(wD))
      .withColumn("lk", expr(ilog2x4096("k")))
      .withColumn("ln", expr(ilog2x4096("nc")))
      .groupBy($"doc_id")
      .agg(max($"nc").as("n_chars"), max($"ndc").as("n_distinct_chars"),
        expr("sum(k * greatest(0L, ln - lk))").as("num"))
    docs.select($"doc_id").join(agg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_chars", $"n_distinct_chars",
        expr("num div n_chars").as("entropy_x4096"))
      .orderBy($"doc_id")
  }

  /** ZIPF-LAW FIT AUDIT (Zipf 1949; Theil 1950/Sen 1968 for the
    * robust slope): how power-law-like is the corpus's rank-frequency
    * curve? Natural language sits near slope −1 on the log-log plot;
    * a much flatter slope flags synthetic/templated text, a steeper
    * one a degenerate vocabulary — a cheap corpus-health signal next
    * to the entropy and compression-ratio columns. Fit: the top-64
    * tokens' (log2 rank, log2 freq) points in 1/4096 units through
    * the shared integer-log chain ([[ilog2x4096]]); slope = the
    * Theil–Sen MEDIAN of all pairwise slopes (sign-split millis —
    * pairwise dy is never positive), intercept = median of
    * y·1000 − slope·x (kept ×1000 so NO signed division ever runs).
    *
    * Scale: the vocabulary aggregate is the only corpus shuffle;
    * top-64 via TakeOrdered (bounded heap), then every frame is ≤ 64
    * points / ≤ 2016 pairs — the pair cross join and the median
    * windows are constant-sized regardless of corpus. */
  def qVocabZipf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables.load(spark, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token").agg(count(lit(1)).as("n"))
    val top = freq.orderBy($"n".desc, $"token").limit(64)
    val wR = org.apache.spark.sql.expressions.Window
      .orderBy($"n".desc, $"token") // 64-row frame
    val pts = top
      .withColumn("rnk", row_number().over(wR).cast("long"))
      .withColumn("x", expr(ilog2x4096("rnk")))
      .withColumn("y", expr(ilog2x4096("n")))
      .select($"rnk", $"x", $"y")
    val slopes = pts.select($"rnk".as("ra"), $"x".as("xa"), $"y".as("ya"))
      .crossJoin(pts.select($"rnk".as("rb"), $"x".as("xb"), $"y".as("yb")))
      .filter($"ra" < $"rb" && $"xb" > $"xa") // ≤ 2016 bounded pairs
      .select(expr(
        """CASE WHEN yb >= ya THEN ((yb - ya) * 1000) div (xb - xa)
          |     ELSE -(((ya - yb) * 1000) div (xb - xa)) END""".stripMargin)
        .as("s"))
    val wS = org.apache.spark.sql.expressions.Window.orderBy($"s")
    val slope = slopes
      .withColumn("rk", row_number().over(wS).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter($"rk" === expr("(n_pairs + 1) div 2"))
      .select($"n_pairs", $"s".as("zipf_slope_milli"))
    val withT = pts.crossJoin(broadcast(slope))
      .withColumn("t", $"y" * 1000L - $"zipf_slope_milli" * $"x")
    val wT = org.apache.spark.sql.expressions.Window.orderBy($"t")
    withT
      .withColumn("rk", row_number().over(wT).cast("long"))
      .withColumn("n_points", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter($"rk" === expr("(n_points + 1) div 2"))
      .select($"n_points", $"n_pairs", $"zipf_slope_milli",
        $"t".as("intercept_x4096e3"))
  }

  private val CmsDepth = 4  // independent hash rows
  private val CmsWidth = 64 // buckets per row

  /** 16-bit integer from 4 hex chars of a token's md5, row `d` using
    * its own digest slice — the hex-digit instr trick both engines
    * evaluate identically (no conv()/strtol divergence). `h` is the
    * engine's md5-hex expression (Spark needs an explicit binary cast,
    * DuckDB hashes VARCHAR directly). */
  private def cmsBucketExpr(d: Int, h: String): String = {
    val hx = (0 until 4).map { i =>
      s"(instr('0123456789abcdef', substring($h, ${4 * d + i + 1}, 1)) - 1)"
    }
    s"(((${hx(0)} * 16 + ${hx(1)}) * 16 + ${hx(2)}) * 16 + ${hx(3)}) % $CmsWidth"
  }
  private def cmsBucketSpark(d: Int): String =
    cmsBucketExpr(d, "md5(cast(token as binary))")
  private def cmsBucketDuck(d: Int): String =
    cmsBucketExpr(d, "md5(token)")

  /** Count-Min sketch frequency estimates vs exact, for the top-20
    * tokens (Cormode & Muthukrishnan 2005): the sketch is a D×W = 4×64
    * integer grid — fixed memory regardless of vocabulary — built in
    * one map-side-combined shuffle over token occurrences; a token's
    * estimate is the MIN of its D bucket counters, always ≥ the truth
    * (collisions only ever inflate). The audit output (est, exact,
    * overcount) next to the HLL and MinHash-estimate entries completes
    * the sketch family: cardinality, similarity, frequency. At 100 TB
    * the 256-cell grid replaces an unbounded vocabulary aggregation
    * wherever an upper-bounded frequency suffices (heavy-hitter gates,
    * stopword discovery). Deterministic md5 bucket hashing keeps it
    * DuckDB-oracle-exact. */
  def qVocabCmsEst(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.load(spark, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    // one pass builds all D rows: explode each occurrence into its D
    // (row, bucket) cells, then count per cell (256 result rows)
    val cms = tok
      .select(explode(array((0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), expr(cmsBucketSpark(d)).as("bucket"))): _*)).as("c"))
      .groupBy($"c.d".as("d"), $"c.bucket".as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val top = tok.groupBy($"token").agg(count(lit(1)).as("exact_tf"))
      .orderBy($"exact_tf".desc, $"token").limit(20)
    top
      .select($"token", $"exact_tf",
        explode(array((0 until CmsDepth).map(d =>
          struct(lit(d).as("d"), expr(cmsBucketSpark(d)).as("bucket"))): _*)).as("c"))
      .select($"token", $"exact_tf", $"c.d".as("d"), $"c.bucket".as("bucket"))
      .join(broadcast(cms), Seq("d", "bucket"))
      .groupBy($"token", $"exact_tf")
      .agg(min($"cnt").as("cms_est"))
      .select($"token", $"exact_tf", $"cms_est",
        ($"cms_est" - $"exact_tf").as("overcount"))
      .orderBy($"exact_tf".desc, $"token")
  }

  /** Mergeable HLL sketch TABLE — the stored-sketch architecture for
    * distinct counting at 100 TB: build ONE binary Datasketches-HLL
    * sketch per source over its token space (`hll_sketch_agg`,
    * map-side-combined like any aggregate), store the 5-row sketch
    * table, and answer the GLOBAL distinct-token question by merging
    * sketches (`hll_union_agg`) — never by rescanning the corpus. This
    * is the pattern behind partition-level NDV stats: per-partition
    * sketches persist with the data; any subset's cardinality is a
    * union over kilobyte blobs. Output: per-source exact vs estimated
    * distinct tokens plus the 'ALL' row whose estimate comes ONLY from
    * the merged sketches (the exact columns exist to audit the
    * estimate and are what you deliberately stop computing at scale).
    *
    * ESTIMATES ARE ENGINE-SPECIFIC (DuckDB has no Datasketches HLL),
    * so this is a rows-only driver entry by design — like
    * q_approx_distinct; TextOpsProps pins the ≤2% relative-error bound
    * (lgK=14) and merge-vs-direct consistency. */
  def qSketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.load(spark, dir, "documents")
      .select($"source", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    // the stored sketch table: one binary sketch + exact audit per source
    val sketches = tok.groupBy($"source")
      .agg(expr("hll_sketch_agg(token)").as("sk"),
        count_distinct($"token").as("exact_distinct"))
    val perSource = sketches
      .select($"source", $"exact_distinct",
        expr("hll_sketch_estimate(sk)").as("est_distinct"))
    val global = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"))
      .crossJoin(broadcast(
        tok.agg(count_distinct($"token").as("exact_distinct"))))
      .select(lit("ALL").as("source"), $"exact_distinct", $"est_distinct")
    perSource.unionByName(global).orderBy($"source")
  }

  /** AUDIT TWIN of [[qSketchDistinct]] (the q_mm_thumbnail_jpeg_audit
    * r12 pattern): Datasketches HLL estimates are engine-specific, but
    * the exact per-source/global distinct counts and the ≤5% relative
    * error band (the PipelineOpsSpec bound) are not — so this twin
    * re-runs the SAME sketch pipeline (per-source hll_sketch_agg, ALL
    * row from hll_union_agg merges only) and emits the deterministic
    * surface: exact_distinct + |est − exact|·100 ≤ 5·exact as a
    * constant-TRUE boolean DuckDB replays from the token rollup. A
    * sketch or merge regression flips the boolean → driver hash fail. */
  def qSketchDistinctAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.load(spark, dir, "documents")
      .select($"source", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val sketches = tok.groupBy($"source")
      .agg(expr("hll_sketch_agg(token)").as("sk"),
        count_distinct($"token").as("exact_distinct"))
    val perSource = sketches
      .select($"source", $"exact_distinct",
        expr("hll_sketch_estimate(sk)").as("est_distinct"))
    val global = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"))
      .crossJoin(broadcast(
        tok.agg(count_distinct($"token").as("exact_distinct"))))
      .select(lit("ALL").as("source"), $"exact_distinct", $"est_distinct")
    perSource.unionByName(global)
      .select($"source", $"exact_distinct",
        (abs($"est_distinct" - $"exact_distinct") * 100 <=
          $"exact_distinct" * 5).as("est_within_5pct"))
      .orderBy($"source")
  }

  /** Length-bucketed batching prep — the dynamic-padding step every
    * training dataloader runs: documents grouped into power-of-two
    * token-length buckets (pad-to-bucket wastes far less than
    * pad-to-global-max), with the padding-waste accounting that decides
    * the bucket granularity. The bucket is computed in pure INTEGER bit
    * arithmetic — `1 << length(bin(n−1))` is the next power of two ≥ n
    * — because `2^ceil(log2 n)` through doubles flips at exact powers
    * of two (the float-vs-oracle trap). Waste is exact ppm:
    * `(padded − real)·10⁶ div padded` where padded = n_docs·bucket.
    * One scan + one map-side-combined rollup onto ≤ ~20 bucket rows;
    * scan-speed at any corpus size. */
  def qLengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
        .as("n_tokens"))
      .withColumn("bucket", expr(
        "CASE WHEN n_tokens <= 1 THEN 1L ELSE shiftleft(1L, length(bin(n_tokens - 1))) END"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"))
      .select($"bucket", $"n_docs", $"sum_tokens",
        ($"n_docs" * $"bucket").as("padded_tokens"),
        expr("((n_docs * bucket - sum_tokens) * 1000000) div (n_docs * bucket)")
          .as("waste_ppm"))
      .orderBy($"bucket")
  }

  /** Per-document top-3 salient terms by tf·idf, with a RATIONAL idf
    * (`(N·1000) div df` fixed-point) instead of `ln(N/df)`: JVM
    * `Math.log` and DuckDB `ln` differ in the last ulp (measured: 1 of
    * 2000 inputs), so a float idf cannot pass a bit-exact cross-engine
    * gate — the rational form is order-equivalent for ranking and
    * exactly reproducible. Two shuffles (per-doc tf, corpus df) + a
    * broadcast of the 1-row corpus count; ranking is a bounded
    * per-doc window. */
  def qTfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select($"doc_id", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val tf = tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tok.select($"doc_id", $"token").distinct()
      .groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"token")
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_x1000", expr("(n_docs * 1000) div df"))
      .withColumn("score", $"tf" * $"idf_x1000")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank", $"token", $"tf", $"df", $"idf_x1000", $"score")
      .orderBy($"doc_id", $"rank")
  }

  private[text] val Bm25TopK = 15

  /** The BM25 scoring expressions (k1=1.2, b=0.75, ×1000 fixed-point)
    * over a frame carrying (tf, df, dl, n_docs, avgdl_x1000) — ONE
    * definition shared by the direct query ([[qTextBm25]]) and the
    * stored-index search ([[InvertedIndex]]), so the two paths cannot
    * disagree on a score. */
  private[graft] def withBm25Score(frame: DataFrame): DataFrame = frame
    .withColumn("idf_x1000", expr("(n_docs * 1000) div df"))
    .withColumn("norm_x1000", expr("250 + (750 * dl * 1000) div avgdl_x1000"))
    .withColumn("score_term",
      expr("(tf * 2200 * idf_x1000) div (tf * 1000 + (1200 * norm_x1000) div 1000)"))

  /** BM25 "more-like-this" retrieval — the full-text ranking primitive
    * behind search-based curation (query-by-document, near-neighbor
    * retrieval without embeddings): every document is scored against
    * the query formed by the distinct tokens of the smallest-doc_id
    * document, and the top-15 are ranked.
    *
    * The arithmetic is the Okapi form with k1=1.2, b=0.75 carried in
    * BIGINT fixed-point end to end: the rational idf `(N·1000) div df`
    * of [[qTfidfTopk]] (see the ulp note there for why not `ln`), a
    * ×1000 length normalization `250 + (750·dl·1000) div avgdl_x1000`,
    * and the saturating tf term `(tf·2200·idf_x1000) div (tf·1000 +
    * (1200·norm_x1000) div 1000)` — every `div` identical to DuckDB's
    * `//` on positives, and the per-doc score an order-independent
    * integer sum.
    *
    * Scale shape: the two token shuffles every retrieval index pays
    * (per-doc tf, corpus df) and a doc-length rollup of the tf frame;
    * the query side is a broadcast so candidate generation is "scan the
    * postings of the query's terms" — corpus rows without a query term
    * never reach the join. The final rank is `orderBy + limit` — Spark
    * plans it as TakeOrderedAndProject (a bounded heap per partition,
    * merged on the driver), never a global sort; row_number then labels
    * only the 15 survivors (a global window CANNOT take the
    * WindowGroupLimit rewrite — it has no partition key — so ranking
    * before limiting would sort the whole candidate set on one task). */
  def qTextBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select($"doc_id", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val tf = tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val dfr = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("(sum(dl) * 1000) div count(1)").as("avgdl_x1000"))
    val qdoc = docs.agg(min($"doc_id").as("qid"))
    val qterms = tf.join(broadcast(qdoc), tf("doc_id") === qdoc("qid"))
      .select($"token").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score_x1000".desc, $"doc_id")
    withBm25Score(tf.join(broadcast(qterms), Seq("token"))
      .join(dl, Seq("doc_id"))
      .join(dfr, Seq("token"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(qdoc))
      .filter($"doc_id" =!= $"qid"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_matched"), sum($"score_term").as("score_x1000"))
      .orderBy($"score_x1000".desc, $"doc_id")
      .limit(Bm25TopK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select($"rank", $"doc_id", $"n_matched", $"score_x1000")
      .orderBy($"rank")
  }

  private val RakeMaxPhrase = 4
  private val RakeTopK = 20

  /** RAKE keyphrase extraction (Rose et al. 2010 — public): candidate
    * phrases are maximal stopword-free token runs (capped at 4 tokens
    * — the cap bounds per-word degree, the scale guard the original
    * paper doesn't need at document scale but a corpus does); corpus-
    * level word scores `deg/freq` (deg = Σ lengths of phrases
    * containing the word, freq = occurrences in phrases) carried as
    * `(deg·1000) div freq`; a phrase scores the sum of its words, and
    * identical phrase text always scores identically (word scores are
    * corpus-level), so the per-text rollup takes `max` purely for
    * determinism. Top-20 by (score, phrase).
    *
    * Shape: one doc-keyed window shuffle for the phrase-id running
    * count, the phrase rollup and word joins co-partitioned on
    * (doc_id, phrase_id), one token shuffle for word scores, and a
    * bounded-heap top-20. */
  def qTextRake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val marked = Tables.load(spark, dir, "documents")
      .select($"doc_id", posexplode(tokens($"text")))
      .select($"doc_id", $"pos", $"col".as("token"))
      .withColumn("is_stop",
        $"token".isin(Stopwords: _*) || length($"token") === 0)
    val words = marked
      .withColumn("phrase_id", sum(when($"is_stop", 1L).otherwise(0L)).over(w))
      .filter(!$"is_stop")
    val phrases = words.groupBy($"doc_id", $"phrase_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, token)))," +
        " x -> x.token), ' ')").as("phrase"),
        count(lit(1)).as("len"))
      .filter($"len" <= RakeMaxPhrase)
    val pw = words.join(phrases, Seq("doc_id", "phrase_id"))
    val wordScores = pw.groupBy($"token")
      .agg(count(lit(1)).as("freq"), sum($"len").as("deg"))
      .withColumn("wscore_x1000", expr("(deg * 1000) div freq"))
    pw.join(wordScores.select($"token", $"wscore_x1000"), Seq("token"))
      .groupBy($"doc_id", $"phrase_id", $"phrase")
      .agg(sum($"wscore_x1000").as("score_x1000"))
      .groupBy($"phrase")
      .agg(count(lit(1)).as("n_occurrences"), max($"score_x1000").as("score_x1000"))
      .orderBy($"score_x1000".desc, $"phrase")
      .limit(RakeTopK)
  }

  /** Token-rarity scoring — the integer stand-in for LM-perplexity
    * filtering: per document, the mean corpus document-frequency of its
    * tokens (permille of n_docs) and the rarest token's df. Documents
    * full of corpus-rare tokens (low mean, low min) are the ones a
    * perplexity filter would flag. Same two shuffles as tf-idf (doc
    * tokens, corpus df) + a 1-row broadcast; all integer `div`. */
  def qTextRarity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select($"doc_id", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val df = tok.select($"doc_id", $"token").distinct()
      .groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tok.join(df, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        min($"df").as("min_df"),
        expr("(sum(df) * 1000) div (count(1) * max(n_docs))").as("mean_df_permille"))
      .orderBy($"doc_id")
  }

  private val ChunkTokens = 50   // tokens per chunk
  private val ChunkStride = 40   // stride (10-token overlap)

  /** Document chunking with overlap — the context-window splitter every
    * training pipeline runs before tokenization: fixed 50-token chunks
    * on a 40-token stride (10-token overlap so no boundary context is
    * lost). Chunk starts are generated per row (sequence + posexplode,
    * a map-side generator — no shuffle); a document shorter than one
    * stride still yields exactly one chunk. */
  def qTextChunk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .select($"doc_id", $"n_tokens", $"toks",
        posexplode(expr(s"sequence(1, greatest(size(toks), 1), $ChunkStride)")))
      .withColumn("chunk_toks", expr(s"slice(toks, col, $ChunkTokens)"))
      .select($"doc_id", $"pos".cast("long").as("chunk_id"),
        $"col".cast("long").as("start_token"),
        size($"chunk_toks").cast("long").as("n_chunk_tokens"),
        array_join($"chunk_toks", " ").as("chunk_text"),
        $"n_tokens")
      .orderBy($"doc_id", $"chunk_id")
  }

  private val PackBudget = 256L // tokens per pack (context window)

  /** Sequence packing (concat-then-chop): documents are concatenated
    * per source in doc_id order and cut into 256-token context
    * windows; each document's pack id and offset fall out of ONE
    * running sum per source (a single exchange on the source key —
    * no stateful loop, no driver pass). `spans_packs` marks documents
    * straddling a window boundary (the ones a loss mask would split). */
  def qTextPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Explicit ROWS frame: doc_id is unique so RANGE would agree, but the
    // oracle spells ROWS BETWEEN and pinning removes the only frame daylight.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", size(tokens($"text")).cast("long"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"source", $"n_tokens",
        expr(s"(cum - n_tokens) div $PackBudget").as("pack_id"),
        expr(s"(cum - n_tokens) % $PackBudget").as("pack_offset"),
        expr(s"CASE WHEN (cum - n_tokens) div $PackBudget <> (cum - 1) div $PackBudget" +
          " THEN 'Y' ELSE 'N' END").as("spans_packs"))
      .orderBy($"source", $"doc_id")
  }

  /** Corpus-trained bigram LM scoring — the statistical-quality signal
    * a perplexity filter thresholds on (CCNet trains a KenLM on clean
    * text and drops high-perplexity docs; Gopher uses the same shape).
    * Training = two count aggregations over the corpus's bigrams; the
    * score = each document's mean (and minimum) conditional bigram
    * probability p(w2|w1) = c(w1,w2)/c(w1·) in integer micro-units, so
    * the DuckDB oracle reproduces it bit-for-bit (counts are positive:
    * Spark `div` == DuckDB `//`). Low avg / min flags improbable word
    * sequences — the discriminative part of a perplexity filter
    * without float log-sums.
    *
    * Scale: bigram extraction is a map-side generator (zip_with over
    * two slices — no per-element regex re-run); counting is two
    * map-side-combined shuffles on (w1,w2) / (w1); scoring joins the
    * count tables back on the same keys and aggregates per doc. At
    * 100 TB the count tables are the "LM" — stored once, reused by
    * every scoring pass, exactly like the ANN index tables. */
  def qTextBigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLm(Tables.load(spark, dir, "documents"))

  /** Core of [[qTextBigramLm]] over any (doc_id, text) frame —
    * separated so the randomized property suite can drive it against a
    * direct Scala recomputation on generated corpora. */
  private[graft] def bigramLm(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = docs
      .withColumn("toks", tokens($"text"))
      .select($"doc_id", explode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
          |         slice(toks, 2, size(toks) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val biCnt = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    // context totals roll up from the (far smaller) distinct-bigram
    // frame — same result as re-aggregating the raw pairs stream, one
    // full-corpus shuffle less
    val uniCnt = biCnt.groupBy($"w1").agg(sum($"c12").as("c1"))
    val scored = pairs
      .join(biCnt, Seq("w1", "w2"))
      .join(uniCnt, Seq("w1"))
      .withColumn("p_e6", expr("(c12 * 1000000) div c1"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_e6) div count(*)").as("avg_p_e6"),
        min($"p_e6").as("min_p_e6"))
    docs.select($"doc_id")
      .join(scored, Seq("doc_id"), "left")
      .orderBy($"doc_id")
  }

  /** LEAVE-ONE-OUT TRIGRAM LM with STUPID BACKOFF (Brants et al. 2007,
    * public paper): each document's trigrams scored against counts
    * trained on the REST of the corpus (its own occurrences
    * subtracted) — the honest perplexity-style quality filter: scoring
    * against counts that include the doc itself rewards self-repeated
    * boilerplate, and the LOO form is where backoff actually fires
    * (doc-unique trigrams back off to the bigram estimate × 0.4 —
    * integral as ×2 div 5). High backoff share = unusual text; score 0
    * = nothing in the rest of the corpus has even the bigram.
    *
    * Scale: ONE corpus scan makes the per-doc trigram counts; every
    * other frame (global trigram/bigram/unigram-context counts and
    * their per-doc complements) ROLLS UP from that — the joins run on
    * distinct-n-gram frames, never the raw token stream. */
  def qTextTrigramLoo(spark: SparkSession, dir: String): DataFrame =
    trigramLoo(Tables.load(spark, dir, "documents"))

  private[graft] def trigramLoo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tri = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """zip_with(zip_with(slice(toks, 1, size(toks) - 2),
          |                  slice(toks, 2, size(toks) - 2),
          |                  (a, b) -> struct(a AS w1, b AS w2)),
          |         slice(toks, 3, size(toks) - 2),
          |         (p, c) -> struct(p.w1 AS w1, p.w2 AS w2, c AS w3))""".stripMargin))
        .as("t"))
      .select($"doc_id", $"t.w1".as("w1"), $"t.w2".as("w2"), $"t.w3".as("w3"))
    // d123 is the base of EVERY rollup below (c123, d12, d23) plus the
    // scored join spine — unmaterialized, the corpus tokenize+explode
    // re-ran once per reference (9 document scans in plans/r15/
    // q_text_trigram_loo_before.txt). One ephemeral materialization
    // feeds all of them; c123 likewise (3 consumers). Both frames are
    // corpus-proportional (one row per distinct (doc,trigram) /
    // trigram) but single-query — SCALE.md category 3; a cluster
    // deployment routes them through the parquet stage.
    val d123 = graft.SessionCache.stageEphemeral(spark, "trigram_d123")(
      tri.groupBy($"doc_id", $"w1", $"w2", $"w3")
        .agg(count(lit(1)).as("d123")))
    val c123 = graft.SessionCache.stageEphemeral(spark, "trigram_c123")(
      d123.groupBy($"w1", $"w2", $"w3").agg(sum($"d123").as("c123")))
    val d12 = d123.groupBy($"doc_id", $"w1", $"w2").agg(sum($"d123").as("d12"))
    val c12 = c123.groupBy($"w1", $"w2").agg(sum($"c123").as("c12"))
    val d23 = d123.groupBy($"doc_id", $"w2", $"w3").agg(sum($"d123").as("d23"))
    val c23 = c123.groupBy($"w2", $"w3").agg(sum($"c123").as("c23"))
    val d2 = d23.groupBy($"doc_id", $"w2").agg(sum($"d23").as("d2"))
    val c2 = c23.groupBy($"w2").agg(sum($"c23").as("c2"))
    val scored = d123
      .join(c123, Seq("w1", "w2", "w3"))
      .join(d12, Seq("doc_id", "w1", "w2")).join(c12, Seq("w1", "w2"))
      .join(d23, Seq("doc_id", "w2", "w3")).join(c23, Seq("w2", "w3"))
      .join(d2, Seq("doc_id", "w2")).join(c2, Seq("w2"))
      .withColumn("l123", $"c123" - $"d123")
      .withColumn("l12", $"c12" - $"d12")
      .withColumn("l23", $"c23" - $"d23")
      .withColumn("l2", $"c2" - $"d2")
      .withColumn("p_e6", expr(
        """CASE WHEN l123 > 0 AND l12 > 0 THEN (l123 * 1000000) div l12
          |     WHEN l23 > 0 AND l2 > 0
          |       THEN (2 * ((l23 * 1000000) div l2)) div 5
          |     ELSE 0 END""".stripMargin))
      .withColumn("kind", expr(
        """CASE WHEN l123 > 0 AND l12 > 0 THEN 'direct'
          |     WHEN l23 > 0 AND l2 > 0 THEN 'backoff'
          |     ELSE 'zero' END""".stripMargin))
      .groupBy($"doc_id")
      .agg(sum($"d123").as("n_trigrams"),
        expr("sum(d123 * p_e6) div sum(d123)").as("avg_p_e6"),
        expr("sum(if(kind = 'backoff', d123, 0L))").as("backoff_occ"),
        expr("sum(if(kind = 'zero', d123, 0L))").as("zero_occ"))
      .withColumn("backoff_permille",
        expr("(backoff_occ * 1000) div n_trigrams"))
    docs.select($"doc_id").join(scored, Seq("doc_id"), "left")
      .select($"doc_id", $"n_trigrams", $"avg_p_e6", $"backoff_occ",
        $"zero_occ", $"backoff_permille")
      .orderBy($"doc_id")
  }

  /** CCNET-STYLE PERPLEXITY BUCKETING (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" — public): the curation step that made Common Crawl
    * trainable — language-ID every document, score it with a language
    * model, and split each language's corpus into HEAD / MIDDLE /
    * TAIL perplexity tertiles (head feeds pretraining, tail gets
    * dropped or downweighted). Composes two shipped models under the
    * shared-definition rule: the staged learned langid
    * ([[qTextLangId]]'s weight table, trained once per corpus) and
    * the corpus bigram LM ([[qTextBigramLm]]'s avg conditional
    * probability — HIGH mean p = low perplexity = head; docs with no
    * bigrams score 0 and sink to the tail).
    *
    * Tertile cuts use the value-count ranking pattern (per-language
    * (score, count) frame + one cumulative window over distinct
    * scores) — never a corpus-wide row_number: the bucketing is
    * THRESHOLD semantics exactly as CCNet publishes its perplexity
    * cutoffs, so score ties share a bucket. Output is one row per
    * (language, bucket) with the doc count, share, and the actual
    * score boundaries — the shippable cutoff table. */
  def qCcnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val pred = withLangIdScored(docs, langIdBigrams(docs),
      langIdWeightsFor(spark, dir))
      .select($"doc_id", $"predicted_lang")
    val lm = bigramLm(docs).select($"doc_id",
      coalesce($"avg_p_e6", lit(0L)).as("score_e6"))
    val scored = pred.join(lm, Seq("doc_id"))
    val vc = scored.groupBy($"predicted_lang", $"score_e6")
      .agg(count(lit(1)).as("cnt"))
      // the (lang, score) distribution frame feeds the cumulative
      // window, the per-lang totals AND the final bucket rollup —
      // bounded ephemeral (≤ distinct scores), so the langid + LM
      // pipeline derives exactly once (SCALE.md policy)
      .localCheckpoint()
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"predicted_lang").orderBy($"score_e6".desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = vc.withColumn("cum", sum($"cnt").over(wCum))
    val nl = vc.groupBy($"predicted_lang").agg(sum($"cnt").as("n_lang"))
    // boundary scores: the first (highest) score whose cumulative
    // count reaches ceil(n/3) / ceil(2n/3) — max over the qualifying
    // (lower) scores IS that boundary
    val cuts = cum.join(nl, Seq("predicted_lang"))
      .groupBy($"predicted_lang")
      .agg(max(when($"cum" >= expr("(n_lang + 2) div 3"), $"score_e6"))
          .as("cut1"),
        max(when($"cum" >= expr("(2 * n_lang + 2) div 3"), $"score_e6"))
          .as("cut2"),
        max($"n_lang").as("n_lang"))
    cum.join(broadcast(cuts), Seq("predicted_lang"))
      .withColumn("bucket", expr(
        """CASE WHEN score_e6 >= cut1 THEN 'head'
          |     WHEN score_e6 >= cut2 THEN 'middle'
          |     ELSE 'tail' END""".stripMargin))
      .groupBy($"predicted_lang", $"bucket")
      .agg(sum($"cnt").as("n_docs"),
        min($"score_e6").as("min_score_e6"),
        max($"score_e6").as("max_score_e6"),
        expr("(sum(cnt) * 1000) div max(n_lang)").as("share_permille"))
      .orderBy($"predicted_lang", $"bucket")
  }

  /** Span-level duplication coverage (the suffix-array "duplicated
    * span" signal, approximated at 8-word granularity): per document,
    * the fraction of its distinct word 8-grams that occur in at least
    * one OTHER document's 8-gram set — the score pipelines threshold
    * on to drop boilerplate-heavy docs that exact/minhash dedup keeps.
    *
    * Scale shape: the 8-gram generator is a map-side transform (no
    * shuffle to build spans); then one shuffle keyed on the gram to
    * count document frequency and one join back — both hash-partition
    * the (gram, doc) stream, the same linear shape as tf-idf. Grams
    * are hashed to int64 AFTER the explode, at the top level of the
    * projection — a codegen'd xxhash64 in the same stage as the
    * explode (hashing inside the transform lambda would fall out of
    * codegen and cost more CPU than it saves) — so the shuffle moves
    * 8-byte keys, not ~60-byte span strings. */
  def qTextSpanDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens($"text"))
      .withColumn("g8", expr(
        "CASE WHEN size(toks) < 8 THEN CAST(array() AS array<string>) " +
          "ELSE array_distinct(transform(sequence(1, size(toks) - 7), " +
          "i -> concat_ws(' ', slice(toks, i, 8)))) END"))
      .filter(size($"g8") > 0)
      .select($"doc_id", size($"g8").cast("long").as("n_spans"),
        explode($"g8").as("gs"))
      .select($"doc_id", $"n_spans", xxhash64($"gs").as("g"))
    // distinct per doc by construction, so count(*) = document frequency
    val docFreq = grams.groupBy($"g").agg(count(lit(1)).as("nd"))
    grams.join(docFreq, Seq("g"))
      .groupBy($"doc_id", $"n_spans")
      .agg(sum(when($"nd" >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .select($"doc_id", $"n_spans", $"dup_spans",
        expr("(dup_spans * 1000) div n_spans").as("dup_permille"))
      .orderBy($"doc_id")
  }

  /** Vocabulary size for the OOV audit — sized so the audit
    * discriminates on THIS corpus (~31 token types; a production
    * corpus uses 32k–256k and the same plan). */
  private[graft] val OovVocabK = 16

  /** VOCABULARY OOV AUDIT — the tokenizer-coverage metric a
    * fixed-vocab deployment tracks: encode the corpus against the
    * stored top-[[OovVocabK]] vocabulary (by corpus tf, token-asc
    * tiebreak) and report per language: docs, tokens, OOV tokens, OOV
    * rate in ppm, and distinct OOV types. The fertility audit's
    * sibling: fertility prices in-vocab efficiency, OOV prices what
    * falls off the edge entirely — the signal that a vocab refresh is
    * due or a language is under-served.
    *
    * Scale shape: one token combine for tf, the vocab is a bounded
    * top-K (TakeOrdered — never a global sort), broadcast into a
    * left join flag, one (lang) rollup. At 100 TB the vocab is the
    * stored tokenizer artifact and only the flag join remains. */
  def qVocabOov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
    val vocab = toks.groupBy($"token").agg(count(lit(1)).as("tf"))
      .orderBy($"tf".desc, $"token").limit(OovVocabK)
      .select($"token", lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left_outer")
      .withColumn("oov", when($"in_vocab".isNull, 1L).otherwise(0L))
      .groupBy($"lang")
      .agg(count_distinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum($"oov").as("n_oov"),
        count_distinct(when($"oov" === 1L, $"token")).as("oov_types"))
      .select($"lang", $"n_docs", $"n_tokens", $"n_oov",
        expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"),
        $"oov_types")
      .orderBy($"lang")
  }

  /** MAXIMAL DUPLICATED SPANS (the structure behind the substring-
    * level dedup of Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better" — public paper): where
    * [[qTextSpanDup]] reports the dup-gram SHARE, this reports the
    * RUN structure a span-removal pass needs: per doc, how many
    * maximal cross-document duplicated spans, the longest one, and
    * the exact token coverage of duplication. An 8-gram is duplicated
    * when ≥ 2 DISTINCT docs contain it (cross-doc — within-doc
    * repetition is [[graft.quality.Quality]]'s repetition signal);
    * runs of CONSECUTIVE duplicated gram positions form spans (span
    * tokens = run + 7); coverage is the exact interval union of the
    * [p, p+7] token windows (positions merge while gaps ≤ 8), so
    * overlapping near-adjacent spans never double-count.
    *
    * Scale shape: one (doc, gram) shuffle for document frequency, one
    * semi-join back onto positions, then per-doc windows over the
    * duplicated-position frame (bounded by doc length — never the
    * corpus). The islands-and-gaps pass is two window functions over
    * ONE (doc_id, p) exchange. */
  def qTextDupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpans(Tables.load(spark, dir, "documents"))

  /** Core of [[qTextDupSpans]] over any (doc_id, text) frame —
    * separated so the planted-fixture spec can drive it. */
  /** Positions of cross-document duplicated 8-grams — shared by the
    * span statistics and the span-payload extraction. */
  private def dupPositions(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pos = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 8)
      .select($"doc_id", posexplode(expr(
        "transform(sequence(1, size(toks) - 7), " +
          "i -> concat_ws(' ', slice(toks, i, 8)))")))
      .select($"doc_id", $"pos".cast("long").as("p"), xxhash64($"col").as("g"))
    val docFreq = pos.select($"doc_id", $"g").distinct()
      .groupBy($"g").agg(count(lit(1)).as("nd"))
    pos.join(docFreq.filter($"nd" >= 2).select($"g"), Seq("g"), "left_semi")
      .select($"doc_id", $"p")
  }

  private[graft] def dupSpans(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .withColumn("toks", tokens($"text"))
      .select($"doc_id", size($"toks").cast("long").as("n_tokens"), $"toks")
    val dupPos = dupPositions(docs)
    val w = Window.partitionBy($"doc_id").orderBy($"p")
    val runs = dupPos
      .withColumn("run_id", $"p" - row_number().over(w))
      .withColumn("prev", lag($"p", 1).over(w))
      .withColumn("new_cov",
        when($"prev".isNull || $"p" - $"prev" > 8, 1L).otherwise(0L))
      .withColumn("cov_id", sum($"new_cov").over(w))
    val spanStats = runs.groupBy($"doc_id", $"run_id")
      .agg(count(lit(1)).as("len"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        max($"len" + 7).as("longest_dup_span_tokens"),
        sum($"len").as("n_dup_grams"))
    val covStats = runs.groupBy($"doc_id", $"cov_id")
      .agg((max($"p") - min($"p") + 8).as("cov"))
      .groupBy($"doc_id").agg(sum($"cov").as("dup_coverage_tokens"))
    base.select($"doc_id", $"n_tokens")
      .join(spanStats, Seq("doc_id"), "left_outer")
      .join(covStats, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"n_tokens",
        coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"),
        coalesce($"n_dup_spans", lit(0L)).as("n_dup_spans"),
        coalesce($"longest_dup_span_tokens", lit(0L)).as("longest_dup_span_tokens"),
        coalesce($"dup_coverage_tokens", lit(0L)).as("dup_coverage_tokens"),
        expr("(coalesce(dup_coverage_tokens, 0L) * 1000) div n_tokens")
          .as("dup_coverage_permille"))
      .orderBy($"doc_id")
  }

  /** LONGEST-DUPLICATED-SPAN PAYLOAD — the removal half of
    * [[qTextDupSpans]]: per document carrying at least one duplicated
    * span, the LONGEST span's start token index, token length, and
    * the actual text (what a span-removal dedup pass would cut, per
    * Lee et al. 2022). Tie-break: longest first, then earliest start.
    * Same shuffles as the statistics query plus one join back onto
    * the token arrays to slice the payload — only one span's tokens
    * per doc ever re-materialize. */
  def qTextDupSpanExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val base = docs.withColumn("toks", tokens($"text"))
      .select($"doc_id", $"toks")
    val w = Window.partitionBy($"doc_id").orderBy($"p")
    val runs = dupPositions(docs)
      .withColumn("run_id", $"p" - row_number().over(w))
      .groupBy($"doc_id", $"run_id")
      .agg(min($"p").as("span_start"),
        (count(lit(1)) + 7).as("span_tokens"))
    val top = runs.groupBy($"doc_id")
      .agg(max_by(
        struct($"span_start", $"span_tokens"),
        struct($"span_tokens", (-$"span_start").as("ns"))).as("t"))
      .select($"doc_id", $"t.span_start".as("span_start"),
        $"t.span_tokens".as("span_tokens"))
    top.join(base, Seq("doc_id"))
      .select($"doc_id", $"span_start", $"span_tokens",
        expr("concat_ws(' ', slice(toks, cast(span_start + 1 as int), " +
          "cast(span_tokens as int)))").as("span_text"))
      .orderBy($"doc_id")
  }

  /** Char-gram length (≈ the 50-token threshold of Lee et al. 2022
    * scaled to characters at this corpus's short tokens). */
  private[graft] val DupCharK = 50
  /** Winnowing sample modulus — SAME deterministic mod-16 rule as
    * [[qTextRollhash]]'s fp_sampled, so one selection convention
    * serves both fingerprinting and span dedup. */
  private val DupCharSampleMod = 16
  /** Island gap (chars): selected positions of one real shared span
    * arrive at ~[[DupCharSampleMod]]-char expected spacing, so two
    * dup positions within gram-length + sampling slack belong to one
    * span. */
  private val DupCharGap = 64

  /** CHAR-LEVEL duplicated spans — the cross-tokenization companion of
    * [[qTextDupSpans]]: boilerplate that re-tokenizes differently
    * (punctuation or casing drift, collapsed whitespace) produces
    * different word 8-grams but the SAME normalized character stream,
    * so the word-level pass misses it and this one catches it (the
    * substring-granularity signal of Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — public paper).
    *
    * Shape: normalize (lowercase, non-alphanumeric runs → one space),
    * then select [[DupCharK]]-char gram positions by the SHARED Rabin
    * window rule ([[rollWindowHash]] mod 16 = 0 — winnowing-style
    * CONTENT-DEFINED sampling, not a fixed stride: a fixed stride
    * breaks on drift because deleting one punctuation char shifts
    * every later position off the stride grid, while content-defined
    * selection picks the same relative positions inside every copy of
    * a span regardless of its offset). A selected gram duplicated in
    * ≥ 2 distinct docs marks its position; positions within
    * [[DupCharGap]] chars merge into spans.
    *
    * Scale shape: selection and gram construction are per-document
    * map-side work over the pre-split code array (O(1) per position,
    * ~1/16 of positions emit a gram); the shuffle carries (doc_id,
    * pos, int64 xxhash) rows — never the 50-char strings; document
    * frequency is one map-side-combined groupBy on the 8-byte gram
    * key + a semi-join back; the island pass windows per doc_id. The
    * oracle replays gram STRINGS (no xxhash64 in DuckDB) — identical
    * modulo 64-bit collisions. */
  def qTextDupChars(spark: SparkSession, dir: String): DataFrame =
    dupChars(Tables.load(spark, dir, "documents"))

  /** Core of [[qTextDupChars]] over any (doc_id, text) frame —
    * separated so the planted cross-tokenization fixture spec can
    * drive it. */
  private[graft] def dupChars(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val normed = docs
      .withColumn("norm",
        trim(regexp_replace(lower($"text"), "[^a-z0-9]+", " ")))
      .select($"doc_id", $"norm", length($"norm").cast("long").as("n_chars"))
    // The (position, gram) structs are built INSIDE one per-document
    // array expression and only the small struct array reaches the
    // Generate, for two scale reasons: (a) a plain explode would let
    // the optimizer infer `size(sel) > 0` and push it below the
    // projections with `codes` SUBSTITUTED by its defining expression
    // — every element_at in the interpreted lambda then re-splits and
    // re-transforms the whole document per position (measured 200×
    // slowdown at sf0.01); explode_outer infers no such filter and the
    // per-doc arrays evaluate exactly once. (b) carrying the L-element
    // chars array through the Generate would copy it once per emitted
    // row — O(L²/16) bytes per document on long documents.
    val pos = normed
      .withColumn("chars", split($"norm", ""))
      .withColumn("codes", expr("transform(chars, c -> cast(ascii(c) as bigint))"))
      .withColumn("selg", expr(
        s"CASE WHEN length(norm) < $DupCharK " +
          s"THEN CAST(array() AS array<struct<p:int,gs:string>>) " +
          s"ELSE transform(filter(sequence(1, length(norm) - ${DupCharK - 1}), " +
          s"i -> $rollWindowHash % $DupCharSampleMod = 0), " +
          s"p -> struct(p, concat_ws('', slice(chars, p, $DupCharK)) AS gs)) END"))
      .select($"doc_id", explode_outer($"selg").as("sg"))
      .filter($"sg".isNotNull)
      .select($"doc_id", $"sg.p".cast("long").as("p"), xxhash64($"sg.gs").as("g"))
    val docFreq = pos.select($"doc_id", $"g").distinct()
      .groupBy($"g").agg(count(lit(1)).as("nd"))
    val dupPos = pos
      .join(docFreq.filter($"nd" >= 2).select($"g"), Seq("g"), "left_semi")
      .select($"doc_id", $"p")
    val w = Window.partitionBy($"doc_id").orderBy($"p")
    val spans = dupPos
      .withColumn("prev", lag($"p", 1).over(w))
      .withColumn("new_span",
        when($"prev".isNull || $"p" - $"prev" > DupCharGap, 1L).otherwise(0L))
      .withColumn("span_id", sum($"new_span").over(w))
      .groupBy($"doc_id", $"span_id")
      .agg(count(lit(1)).as("n_g"),
        (max($"p") - min($"p") + DupCharK).as("span_chars"))
    val stats = spans.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        max($"span_chars").as("longest_dup_span_chars"),
        sum($"n_g").as("n_dup_grams"),
        sum($"span_chars").as("dup_coverage_chars"))
    normed.select($"doc_id", $"n_chars")
      .join(stats, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"n_chars",
        coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"),
        coalesce($"n_dup_spans", lit(0L)).as("n_dup_spans"),
        coalesce($"longest_dup_span_chars", lit(0L)).as("longest_dup_span_chars"),
        coalesce($"dup_coverage_chars", lit(0L)).as("dup_coverage_chars"),
        expr("(coalesce(dup_coverage_chars, 0L) * 1000) div nullif(n_chars, 0L)")
          .as("dup_coverage_permille"))
      .orderBy($"doc_id")
  }

  /** Fuzzy vocabulary pairs: near-identical token pairs (edit distance
    * ≤ 2) found by blocked candidate generation — the typo-clustering /
    * vocab-normalization step. Blocking: same LAST character + length
    * difference ≤ 1 (suffix block — this corpus's near-pairs vary
    * their heads, e.g. part/sort, agg/big, row/slow; documented recall
    * tradeoff, same policy as the blocked Jaccard: pairs differing in
    * their last char or by 2+ length belong to the unblocked MinHash
    * path). Verification is the codegen'd builtin levenshtein —
    * identical DP on both engines.
    *
    * Scale shape: one shuffle on the distinct-token frame, one
    * equi-join on the (last char, length bucket) block key; per-block
    * quadratic bounded by one (suffix, length) vocabulary cell, with a
    * loud [[MaxFuzzyBlock]] cap — see [[fuzzyPairs]]. */
  def qTextFuzzy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fuzzyPairs(
      Tables.load(spark, dir, "documents")
        .select(explode(tokens($"text")).as("token"))
        .filter(length($"token") >= 3).distinct(),
      MaxFuzzyBlock)
  }

  /** Any (last-char, length) cell larger than this fails the query
    * loudly instead of going silently quadratic. */
  private[graft] val MaxFuzzyBlock = 50000L

  /** ENTITY RESOLUTION over the fuzzy-match graph (record linkage):
    * [[qTextFuzzy]]'s edit-distance pairs are the pairwise half of the
    * problem — an entity is the TRANSITIVE closure ("colour" ~
    * "color" ~ "colors" are one entity even though colour↮colors
    * directly). Min-label propagation over the fuzzy edges, 3 bounded
    * rounds (the qGraphCc convention; fuzzy clusters are short
    * chains), every round one shuffled join + combine on the
    * vocab-sized label frame; isolated tokens stay their own entity.
    * Output: token → canonical entity label + entity size. */
  def qEntityResolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .filter(length($"token") >= 3).distinct()
    val pairs = fuzzyPairs(vocab, MaxFuzzyBlock)
      .select($"tok_a", $"tok_b")
    val edges = pairs
      .union(pairs.select($"tok_b".as("tok_a"), $"tok_a".as("tok_b")))
      .toDF("src", "dst")
    var lbl = vocab.select($"token", $"token".as("entity")).localCheckpoint()
    for (_ <- 1 to 3) {
      val nbrMin = edges
        .join(lbl.select($"token".as("dst"), $"entity".as("ne")).hint("shuffle_hash"),
          Seq("dst"))
        .groupBy($"src").agg(min($"ne").as("nbr_entity"))
      lbl = lbl
        .join(nbrMin.withColumnRenamed("src", "token"), Seq("token"), "left_outer")
        .select($"token",
          least($"entity", coalesce($"nbr_entity", $"entity")).as("entity"))
        .localCheckpoint()
    }
    val sizes = lbl.groupBy($"entity").agg(count(lit(1)).as("n_members"))
    lbl.join(sizes, Seq("entity"))
      .select($"token", $"entity", $"n_members")
      .orderBy($"token")
  }

  /** Core of [[qTextFuzzy]] over any single-column `token` frame.
    *
    * Blocking (r7, VERDICT item 3): the candidate key is (last char,
    * length bucket). A token of length L probes buckets L and L+1, and
    * a pair is kept only in bucket max(len_a, len_b) — so every
    * qualifying pair surfaces EXACTLY once and no pair the predicate
    * allows (same last char, |Δlen| ≤ 1, lev ≤ 2) is lost: semantics
    * identical to a plain suffix-blocked self-join, pair space bounded
    * by one (suffix, length) cell instead of a whole suffix class. At
    * web vocabulary (~10⁷ distinct tokens) that turns ~10¹⁰ candidates
    * per hot suffix into ~10⁷ per cell; an over-cap cell raises via
    * assert_true rather than running quadratic. */
  private[graft] def fuzzyPairs(vocab: DataFrame, maxBlock: Long): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val v = vocab
      .withColumn("ck", substring($"token", -1, 1))
      .withColumn("len", length($"token"))
    val probes = v.select($"ck", $"token", $"len",
      explode(array($"len", $"len" + lit(1))).as("bucket"))
    val blockCounts = probes.groupBy($"ck", $"bucket")
      .agg(count(lit(1)).as("bn"))
    val guarded = probes.join(broadcast(blockCounts), Seq("ck", "bucket"))
      .filter(assert_true($"bn" <= lit(maxBlock),
        format_string("qTextFuzzy block over cap %d: ck=%s bucket=%d n=%d",
          lit(maxBlock), $"ck", $"bucket", $"bn")).isNull)
      .drop("bn")
    val a = guarded.select($"ck", $"bucket", $"token".as("tok_a"), $"len".as("len_a"))
    val b = guarded.select($"ck", $"bucket", $"token".as("tok_b"), $"len".as("len_b"))
    a.join(b, Seq("ck", "bucket"))
      .filter($"tok_a" < $"tok_b" &&
        abs($"len_a" - $"len_b") <= 1 &&
        $"bucket" === greatest($"len_a", $"len_b"))
      // banded bounded Levenshtein (custom codegen'd Expression):
      // exact distance when ≤ 2, early-exits the DP otherwise — the
      // verify step is the hot loop at web candidate volumes
      .withColumn("dist",
        graft.functions.BoundedLevenshtein.bounded_levenshtein($"tok_a", $"tok_b", 2))
      .filter($"dist" <= 2)
      .select($"tok_a", $"tok_b", $"dist".cast("long").as("dist"))
      .orderBy($"tok_a", $"tok_b")
  }

  /** BPE merge training, [[BpeRounds]] staged rounds: symbol
    * sequences start as sentinel-spaced characters (" s p a r k ");
    * each round counts adjacent symbol pairs weighted by corpus token
    * frequency, learns the most frequent pair (lexicographic
    * tiebreak), and applies the merge as a literal left-to-right
    * non-overlapping replace — the identical semantics in both
    * engines (true BPE also re-merges immediately-adjacent repeats
    * within a round; this corpus has none). Output: the top-5 merge
    * candidates per round — round r's rank 1 is the learned merge
    * round r+1's counts reflect.
    *
    * Scale shape: the pair counts are one map-side-combined shuffle
    * of the DISTINCT-token tf frame — never the raw corpus (tf
    * weighting collapses repeats first, the standard trick) — and the
    * loop runs the staged-round protocol the graph module uses: each
    * round's merged vocab frame and pair-count frame are parquet-
    * staged, so round r plans over a flat scan, never an r-deep
    * nested aggregate tree. The learned merge enters the next round
    * as a 1-row broadcast merge ARRAY folded over the symbols in one
    * projection ([[bpeApplyMerges]]); a round with no remaining pairs
    * broadcasts an empty array and the apply is the identity — the
    * loop's natural fixed point, no special-casing. Learning is
    * memoized per (session, corpus): train/encode/fertility share one
    * learned-rounds table. */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeRoundsFor(spark, dir).orderBy($"round", $"rank")
  }

  /** Number of merge rounds the trainer learns and the encoder
    * applies. A real tokenizer runs thousands of rounds with this
    * exact per-round recipe; the oracle replays every round as a CTE,
    * so the count is bounded by what DuckDB can re-derive, not by the
    * engine. */
  private[graft] val BpeRounds = 8

  /** The learned-rounds table for a corpus dir, staged once per
    * (session, dir) and shared by train/encode/fertility. */
  private def bpeRoundsFor(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"bpe_rounds_$BpeRounds|$dir")(
      bpeTrain(Tables.load(spark, dir, "documents")))

  /** Core of [[qBpeTrain]] over any frame with a `text` column —
    * separated so the randomized property suite can drive it against
    * a direct Scala replay on generated corpora. */
  /** Distinct-token frame with corpus tf and sentinel-spaced symbol
    * spelling — the shared input of BPE training AND encoding. */
  private def bpeVocab(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token").agg(count(lit(1)).as("tf"))
      .withColumn("syms", concat(lit(" "),
        array_join(expr(
          "transform(sequence(1, length(token)), i -> substring(token, i, 1))"), " "),
        lit(" ")))
  }

  /** tf-weighted adjacent-symbol-pair counts over a (tf, syms) frame. */
  private def bpePairCounts(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df
      .withColumn("arr", split(trim($"syms"), " "))
      .filter(size($"arr") >= 2)
      .select($"tf", explode(expr(
        "transform(sequence(1, size(arr) - 1), " +
          "i -> struct(element_at(arr, i) AS a, element_at(arr, i+1) AS b))")).as("p"))
      .groupBy($"p.a".as("sym_a"), $"p.b".as("sym_b"))
      .agg(sum($"tf").as("pair_count"))
  }

  /** The round's learned merge as a 1-row frame holding a 0-or-1-
    * element merge array — empty when no adjacent pairs remain, so
    * applying it is the identity and the round loop terminates at its
    * natural fixed point without special-casing. */
  private def bpeBestMerge(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.orderBy($"pair_count".desc, $"sym_a", $"sym_b").limit(1)
      .agg(collect_list(struct($"sym_a".as("ba"), $"sym_b".as("bb")))
        .as("merges"))
  }

  /** Apply an ORDERED merge list — a 1-row broadcast `merges` array —
    * to a syms frame in ONE projection: fold the array left-to-right,
    * each merge a literal non-overlapping replace (same semantics in
    * both engines). Serves the trainer's per-round 1-merge apply AND
    * the encoder's all-N-merges apply: the learned merge table is a
    * broadcast-joined artifact folded in one codegen'd expression,
    * never a chain of N per-merge plan nodes. */
  private def bpeApplyMerges(df: DataFrame, mergesRow: DataFrame): DataFrame =
    df.crossJoin(broadcast(mergesRow))
      .withColumn("syms", expr(
        "aggregate(merges, syms, (acc, m) -> " +
          "replace(acc, concat(' ', m.ba, ' ', m.bb, ' '), concat(' ', m.ba, m.bb, ' ')))"))
      .drop("merges")

  /** Distinguishes concurrent trainer invocations' stage dirs (the
    * property suite drives many generated corpora through one
    * session). */
  private val bpeCallIds = new java.util.concurrent.atomic.AtomicLong()

  /** N-round BPE merge learning over any frame with a `text` column —
    * the staged-round loop behind [[qBpeTrain]], separated so the
    * randomized property suite can drive it against a direct Scala
    * replay on generated corpora. Returns (round, rank, sym_a, sym_b,
    * pair_count), ranks 1–5 per round; rank 1 of round r is the merge
    * applied before round r+1's counts. A round whose pair frame is
    * empty contributes no rows and later rounds stay empty (identity
    * apply). */
  private[graft] def bpeTrain(docs: DataFrame,
      rounds: Int = BpeRounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1, s"bpeTrain needs >= 1 round, got $rounds")
    val key = s"bpe_call_${bpeCallIds.incrementAndGet()}"
    // Per-round vocab/pair frames are vocab-sized (distinct tokens,
    // shrinking as merges apply) and consumed only inside this call —
    // bounded-ephemeral materialization per SCALE.md policy. The
    // previous parquet stage per round cost 8 rounds × 3 write+read
    // cycles (~60% of q_bpe_encode's wall); stageEphemeral keeps the
    // construct-time plans in the audit ledger (the r11 blind-spot
    // guard) without the round-trips. The LEARNED rounds table still
    // goes to parquet (bpeRoundsFor) — it outlives the query.
    var cur = graft.SessionCache.stageEphemeral(spark, s"$key|s0")(
      bpeVocab(docs).select($"tf", $"syms"))
    val tops = Vector.newBuilder[DataFrame]
    for (r <- 0 until rounds) {
      val counts = graft.SessionCache.stageEphemeral(spark, s"$key|c$r")(
        bpePairCounts(cur))
      // Per-round top-5 report: TakeOrdered the <=5 rows FIRST (same
      // shape as bpeBestMerge), THEN rank the bounded frame. Ranking
      // before limiting was the r11 audit blind spot — an unpartitioned
      // window sorting the whole distinct-pair frame (millions of rows
      // on a 100 TB corpus) on one task.
      val w = Window.orderBy($"pair_count".desc, $"sym_a", $"sym_b")
      tops += counts.orderBy($"pair_count".desc, $"sym_a", $"sym_b").limit(5)
        .withColumn("rank", row_number().over(w))
        .select(lit(r.toLong).as("round"), $"rank".cast("long").as("rank"),
          $"sym_a", $"sym_b", $"pair_count")
      if (r < rounds - 1)
        cur = graft.SessionCache.stageEphemeral(spark, s"$key|s${r + 1}")(
          bpeApplyMerges(cur, bpeBestMerge(counts)))
    }
    tops.result().reduce(_.unionByName(_)).orderBy($"round", $"rank")
  }

  /** The learned merge table as a 1-row round-ordered merge array —
    * the tokenizer artifact the encoder broadcasts. `array_sort` on
    * (round, ba, bb) structs orders by round, so the fold applies
    * merges in learning order. */
  private def bpeMergeTable(roundsTable: DataFrame): DataFrame = {
    val spark = roundsTable.sparkSession
    import spark.implicits._
    roundsTable.filter($"rank" === 1L)
      .agg(array_sort(collect_list(struct($"round",
        $"sym_a".as("ba"), $"sym_b".as("bb")))).as("merges"))
  }

  /** Tokenizer APPLICATION — the other half of [[qBpeTrain]]: encode
    * the corpus with the [[BpeRounds]] learned merges and account the
    * per-doc compression (the token-budget input a trained tokenizer
    * changes).
    *
    * Scale shape: merges are learned on the DISTINCT-token frame
    * (repeats collapse before any shuffle) and applied there too — the
    * N merges arrive as ONE broadcast merge-table array folded over
    * each token's symbols in a single projection; the per-doc pass is
    * ONE equi-join of the exploded corpus tokens onto the |vocab|-row
    * encoded lengths plus one map-side-combined groupBy; the corpus
    * text never carries symbol arrays through a shuffle. */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeWith(Tables.load(spark, dir, "documents"),
      bpeMergeTable(bpeRoundsFor(spark, dir)))

  /** TOKENIZER FERTILITY by language: BPE symbols per word (×100) and
    * per character (permille) rolled up over the labeled `lang` — the
    * multilingual-tokenizer-fairness audit (a language whose fertility
    * is 2× pays 2× the context budget for the same text). Pure rollup
    * of the per-doc [[bpeEncode]] stats joined back to the corpus
    * labels. */
  def qBpeFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    bpeEncodeWith(docs, bpeMergeTable(bpeRoundsFor(spark, dir)))
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_words").as("n_words"),
        sum($"n_symbols_char").as("n_chars"),
        sum($"n_symbols_bpe").as("n_bpe"))
      .select($"lang", $"n_docs", $"n_words", $"n_chars", $"n_bpe",
        expr("(n_bpe * 100) div n_words").as("fertility_x100"),
        expr("(n_bpe * 1000) div n_chars").as("compression_permille"))
      .orderBy($"lang")
  }

  /** Core of [[qBpeEncode]] over any frame with doc_id + text —
    * learns [[BpeRounds]] merges (or `rounds`) then applies them; the
    * property suite replays it on generated corpora. */
  private[graft] def bpeEncode(docs: DataFrame,
      rounds: Int = BpeRounds): DataFrame =
    bpeEncodeWith(docs, bpeMergeTable(bpeTrain(docs, rounds)))

  /** Encode `docs` with a pre-learned merge table (1-row merge-array
    * frame from [[bpeMergeTable]]): one broadcast fold over the
    * distinct-token vocab, one corpus-token equi-join, one combine. */
  private[graft] def bpeEncodeWith(docs: DataFrame,
      mergesRow: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = bpeVocab(docs) // token, tf, syms
    val appliedN = bpeApplyMerges(vocab, mergesRow)
    val tokenStats = appliedN.select($"token",
      size(split(trim($"syms"), " ")).cast("long").as("n_sym_bpe"),
      length($"token").cast("long").as("n_chars"))
    docs.select($"doc_id", explode(tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .join(tokenStats, Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_chars").as("n_symbols_char"),
        sum($"n_sym_bpe").as("n_symbols_bpe"))
      .select($"doc_id", $"n_words", $"n_symbols_char", $"n_symbols_bpe",
        expr("(n_symbols_bpe * 1000) div n_symbols_char").as("compression_permille"))
      .orderBy($"doc_id")
  }

  /** The taxonomy dictionary for [[qTextTagging]] — (keyword →
    * category), the multi-pattern matching dictionary a content
    * pipeline ships (topic routing, compliance wordlists, PII keyword
    * pre-filters). ONE definition shared with the oracle. */
  private[graft] val Taxonomy: Seq[(String, String)] = Seq(
    "join" -> "relational", "merge" -> "relational", "agg" -> "relational",
    "scan" -> "access", "index" -> "access",
    "sort" -> "ordering", "order" -> "ordering",
    "window" -> "analytics", "rank" -> "analytics",
    "stream" -> "streaming", "batch" -> "streaming",
    "hash" -> "physical", "shuffle" -> "physical", "partition" -> "physical")

  /** DICTIONARY TAGGING (multi-pattern keyword matching): every
    * document tagged with the taxonomy categories its tokens hit,
    * with per-category match counts and the dominant category — the
    * Aho–Corasick use case expressed relationally: explode tokens
    * once, broadcast-join the (keyword → category) dictionary (small
    * by definition — dictionaries are human-curated), combine per
    * (doc, category). At 100 TB: one token scan, a broadcast no
    * bigger than the wordlist, one doc-keyed combine — no shuffle of
    * text, ever. Dominant category resolves ties by category name so
    * the output is deterministic. */
  def qTextTagging(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dict = Taxonomy.toDF("kw", "category")
    val hits = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("kw"))
      .join(broadcast(dict), Seq("kw"))
      .groupBy($"doc_id", $"category")
      .agg(count(lit(1)).as("n_hits"))
    hits.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_categories"),
        sum($"n_hits").as("n_matches"),
        max_by($"category", struct($"n_hits", $"category")).as("top_category"),
        max($"n_hits").as("top_hits"),
        array_join(array_sort(collect_list($"category")), ",").as("categories"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tagging" -> qTextTagging,
    "q_sketch_distinct" -> qSketchDistinct, // rows-only: engine-specific HLL
    "q_sketch_distinct_audit" -> qSketchDistinctAudit, // its hash-checked twin
    "q_length_buckets" -> qLengthBuckets,
    "q_text_bigram_lm" -> qTextBigramLm,
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_encode" -> qBpeEncode,
    "q_text_fuzzy" -> qTextFuzzy,
    "q_text_span_dup" -> qTextSpanDup,
    "q_text_chunk" -> qTextChunk,
    "q_text_pack" -> qTextPack,
    "q_text_rarity" -> qTextRarity,
    "q_vocab_topk" -> qVocabTopk,
    "q_vocab_cms_est" -> qVocabCmsEst,
    "q_tfidf_topk" -> qTfidfTopk,
    "q_text_bm25" -> qTextBm25,
    "q_text_rake" -> qTextRake,
    "q_text_stats" -> qTextStats,
    "q_text_quality" -> qTextQuality,
    "q_text_langid" -> qTextLangId,
    "q_langid_eval" -> qLangIdEval,
    "q_langid_holdout" -> qLangIdHoldout,
    "q_langid_mix" -> qLangIdMix,
    "q_text_dup_spans" -> qTextDupSpans,
    "q_text_dup_span_extract" -> qTextDupSpanExtract,
    "q_text_dup_chars" -> qTextDupChars,
    "q_vocab_oov" -> qVocabOov,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_heavy_hitters_grouped" -> qHeavyHittersGrouped,
    "q_vocab_zipf" -> qVocabZipf,
    "q_vocab_growth" -> qVocabGrowth,
    "q_source_stylometry" -> qSourceStylometry,
    "q_text_entropy" -> qTextEntropy,
    "q_text_readability" -> qTextReadability,
    "q_entity_resolution" -> qEntityResolution,
    "q_bpe_fertility" -> qBpeFertility,
    "q_text_trigram_loo" -> qTextTrigramLoo,
    "q_ccnet_buckets" -> qCcnetBuckets,
    "q_hybrid_rrf" -> qHybridRrf,
    "q_text_compress_ratio" -> qTextCompressRatio,
    "q_text_compress_audit" -> qTextCompressAudit,
    "q_text_bpe" -> qTextBpe,
    "q_text_rollhash" -> qTextRollhash,
    "q_text_fingerprint" -> qTextFingerprint
  )

  /** The argmax CASE chain over five (already-coalesced) score
    * columns — alphabetical priority on ties, shared by all langid
    * oracles. */
  private def duckLangArgmax: String =
    """CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |       WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END""".stripMargin

  /** The langid TRAINING replay as DuckDB CTEs ending in
    * `wt(bigram, w_de..w_zh)` — the weight table, shared by the
    * prediction, evaluation, and chunk-mix oracles; includes the 12
    * integer log2 squaring rounds (generated, one small CTE each). */
  /** The entropy oracle: per-(doc, char) counts, the 12-step integer
    * log chain run over k (keyed on doc+char) and over n (keyed on
    * doc), clamped non-negative terms, one division per doc. */
  private def textEntropyOracle: String = {
    def steps(p: String, key: String) = (0 until 12).map { i =>
      s"""$p${i + 1} AS (SELECT $key,
         |  CASE WHEN (m*m)>>12 >= 8192 THEN ((m*m)>>12)>>1 ELSE (m*m)>>12 END AS m,
         |  r + CASE WHEN (m*m)>>12 >= 8192 THEN 1<<${11 - i} ELSE 0 END AS r
         |  FROM $p$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
       |           FROM documents),
       |cf AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS k
       |       FROM ch WHERE len(ch) > 0 GROUP BY 1, 2),
       |pd AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS nc,
       |         CAST(count(*) AS BIGINT) AS ndc
       |  FROM cf GROUP BY 1),
       |e0 AS (SELECT doc_id, ch,
       |  (k * 4096) >> (length(bin(k)) - 1) AS m,
       |  (length(bin(k)) - 1) * 4096 AS r FROM cf),
       |${steps("e", "doc_id, ch")},
       |f0 AS (SELECT doc_id,
       |  (nc * 4096) >> (length(bin(nc)) - 1) AS m,
       |  (length(bin(nc)) - 1) * 4096 AS r FROM pd),
       |${steps("f", "doc_id")},
       |ag AS (
       |  SELECT cf.doc_id,
       |    CAST(sum(cf.k * greatest(0, f.r - e.r)) AS BIGINT) AS num
       |  FROM cf JOIN e12 e ON e.doc_id = cf.doc_id AND e.ch = cf.ch
       |          JOIN f12 f ON f.doc_id = cf.doc_id
       |  GROUP BY cf.doc_id)
       |SELECT d.doc_id, pd.nc AS n_chars, pd.ndc AS n_distinct_chars,
       |  CAST(ag.num // pd.nc AS BIGINT) AS entropy_x4096
       |FROM documents d LEFT JOIN pd USING (doc_id) LEFT JOIN ag USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The Zipf oracle: vocabulary counts → top-64 ranks → BOTH log
    * operands (rank and frequency) through the 12-step integer log2
    * chain keyed on (rnk, wh) → pairwise sign-split slopes → lower
    * medians for slope and the ×1000 intercept. */
  private def vocabZipfOracle: String = {
    val logSteps = (0 until 12).map { i =>
      s"""zl${i + 1} AS (SELECT rnk, wh,
         |  CASE WHEN (m*m)>>12 >= 8192 THEN ((m*m)>>12)>>1 ELSE (m*m)>>12 END AS m,
         |  r + CASE WHEN (m*m)>>12 >= 8192 THEN 1<<${11 - i} ELSE 0 END AS r
         |  FROM zl$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |tt AS (SELECT token FROM tok WHERE len(token) > 0),
       |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tt GROUP BY token),
       |top AS (SELECT rnk, n FROM (
       |  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rnk FROM c) q
       |  WHERE rnk <= 64),
       |unp AS (SELECT rnk, 'x' AS wh, rnk AS v FROM top
       |        UNION ALL SELECT rnk, 'y', n FROM top),
       |zl0 AS (SELECT rnk, wh,
       |  (v * 4096) >> (length(bin(v)) - 1) AS m,
       |  (length(bin(v)) - 1) * 4096 AS r FROM unp),
       |$logSteps,
       |xy AS MATERIALIZED (SELECT rnk,
       |  CAST(max(CASE WHEN wh = 'x' THEN r END) AS BIGINT) AS x,
       |  CAST(max(CASE WHEN wh = 'y' THEN r END) AS BIGINT) AS y
       |  FROM zl12 GROUP BY rnk),
       |sl AS (
       |  SELECT CASE WHEN b.y >= a.y THEN ((b.y - a.y) * 1000) // (b.x - a.x)
       |              ELSE -(((a.y - b.y) * 1000) // (b.x - a.x)) END AS s
       |  FROM xy a JOIN xy b ON a.rnk < b.rnk AND b.x > a.x),
       |md AS MATERIALIZED (SELECT np AS n_pairs, s AS zipf_slope_milli FROM (
       |  SELECT s, row_number() OVER (ORDER BY s) AS rk,
       |         CAST(count(*) OVER () AS BIGINT) AS np FROM sl) q
       |  WHERE rk = (np + 1) // 2),
       |tv AS (SELECT xy.rnk, y * 1000 - md.zipf_slope_milli * x AS t,
       |              md.n_pairs, md.zipf_slope_milli
       |       FROM xy CROSS JOIN md)
       |SELECT np2 AS n_points, n_pairs, zipf_slope_milli,
       |       CAST(t AS BIGINT) AS intercept_x4096e3
       |FROM (SELECT t, n_pairs, zipf_slope_milli,
       |        row_number() OVER (ORDER BY t) AS rk,
       |        CAST(count(*) OVER () AS BIGINT) AS np2 FROM tv) q
       |WHERE rk = (np2 + 1) // 2""".stripMargin
  }

  /** The stylometry oracle: top-32 grid, ×k deviations, the 26-step
    * integer-sqrt chain keyed per token, sign-split z, pairwise mean
    * |Δz|. */
  private def sourceStylometryOracle: String = {
    val sqrtSteps = (0 until 26).map { kk =>
      s"""y${kk + 1} AS (SELECT token, k,
         |  CASE WHEN x >= res + bit THEN x - res - bit ELSE x END AS x,
         |  CASE WHEN x >= res + bit THEN (res >> 1) + bit ELSE res >> 1 END AS res,
         |  bit >> 2 AS bit
         |  FROM y$kk)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |tt AS (SELECT source, token FROM tok WHERE len(token) > 0),
       |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
       |       FROM tt GROUP BY source),
       |topw AS MATERIALIZED (SELECT token FROM (
       |  SELECT token, count(*) AS tf FROM tt GROUP BY token
       |  ORDER BY tf DESC, token LIMIT 32)),
       |cnt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
       |        FROM tt JOIN topw USING (token) GROUP BY 1, 2),
       |grid AS MATERIALIZED (
       |  SELECT st.source, topw.token,
       |    (coalesce(cnt.c, 0) * 1000000) // st.n_s AS f
       |  FROM st CROSS JOIN topw
       |  LEFT JOIN cnt ON cnt.source = st.source AND cnt.token = topw.token),
       |ws AS (SELECT token, CAST(count(*) AS BIGINT) AS k,
       |              CAST(sum(f) AS BIGINT) AS sf FROM grid GROUP BY token),
       |dev AS MATERIALIZED (
       |  SELECT grid.source, grid.token, ws.k, ws.k * grid.f - ws.sf AS dnum
       |  FROM grid JOIN ws USING (token)),
       |vv AS (SELECT token, max(k) AS k, CAST(sum(dnum * dnum) AS BIGINT) AS ss
       |       FROM dev GROUP BY token),
       |y0 AS (SELECT token, k, ss // k AS x, CAST(0 AS BIGINT) AS res,
       |       CAST(1 AS BIGINT) << 50 AS bit FROM vv),
       |$sqrtSteps,
       |sg AS (SELECT token, res AS sigk FROM y26),
       |z AS MATERIALIZED (SELECT dev.source, dev.token,
       |  CASE WHEN sg.sigk = 0 THEN 0
       |       WHEN dev.dnum >= 0 THEN (dev.dnum * 1000) // sg.sigk
       |       ELSE -(((-dev.dnum) * 1000) // sg.sigk) END AS z_milli
       |  FROM dev JOIN sg USING (token))
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(abs(a.z_milli - b.z_milli)) // count(*) AS BIGINT)
       |    AS delta_milli
       |FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** The vocabulary-growth oracle: per-source (N, V, hapax), both log
    * operands through the 12-step chain keyed (source, wh). */
  private def vocabGrowthOracle: String = {
    val logSteps = (0 until 12).map { i =>
      s"""gl${i + 1} AS (SELECT source, wh,
         |  CASE WHEN (m*m)>>12 >= 8192 THEN ((m*m)>>12)>>1 ELSE (m*m)>>12 END AS m,
         |  r + CASE WHEN (m*m)>>12 >= 8192 THEN 1<<${11 - i} ELSE 0 END AS r
         |  FROM gl$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |tt AS (SELECT source, token FROM tok WHERE len(token) > 0),
       |c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
       |      FROM tt GROUP BY 1, 2),
       |g AS MATERIALIZED (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         CAST(count(*) AS BIGINT) AS v_types,
       |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
       |  FROM c GROUP BY source),
       |unp AS (SELECT source, 'v' AS wh, v_types AS v FROM g
       |        UNION ALL SELECT source, 'n', n_tokens FROM g),
       |gl0 AS (SELECT source, wh,
       |  (v * 4096) >> (length(bin(v)) - 1) AS m,
       |  (length(bin(v)) - 1) * 4096 AS r FROM unp),
       |$logSteps,
       |xy AS (SELECT source,
       |  CAST(max(CASE WHEN wh = 'v' THEN r END) AS BIGINT) AS lv,
       |  CAST(max(CASE WHEN wh = 'n' THEN r END) AS BIGINT) AS ln
       |  FROM gl12 GROUP BY source)
       |SELECT g.source, g.n_tokens, g.v_types, g.hapax,
       |  (g.v_types * 1000) // g.n_tokens AS ttr_milli,
       |  (g.hapax * 1000) // g.v_types AS hapax_share_milli,
       |  CASE WHEN xy.ln > 0 THEN (xy.lv * 1000) // xy.ln END AS herdan_c_milli
       |FROM g JOIN xy USING (source) ORDER BY g.source""".stripMargin
  }

  private def duckLangIdTrainCtes: String = duckLangIdTrainCtesWhere("")

  /** Same, restricted to a training subset (`where` like
    * "WHERE doc_id % 2 = 0") — the held-out evaluation trains here. */
  private def duckLangIdTrainCtesWhere(where: String): String = {
    val logSteps = (0 until 12).map { i =>
      s"""l${i + 1} AS (SELECT lang, bigram,
         |  CASE WHEN (m*m)>>12 >= 8192 THEN ((m*m)>>12)>>1 ELSE (m*m)>>12 END AS m,
         |  r + CASE WHEN (m*m)>>12 >= 8192 THEN 1<<${11 - i} ELSE 0 END AS r
         |  FROM l$i)""".stripMargin
    }.mkString(",\n")
    val wCols = LangHeads.map(l =>
      s"  sum(CASE WHEN lang='$l' THEN r END) AS w_$l").mkString(",\n")
    s"""tk AS MATERIALIZED (
       |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents $where),
       |bgd AS MATERIALIZED (
       |  SELECT doc_id, lang, bigram, CAST(count(*) AS BIGINT) AS nb
       |  FROM (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS bigram
       |        FROM (SELECT doc_id, lang, toks,
       |                unnest(generate_series(1, len(toks)-1)) AS i
       |              FROM tk WHERE len(toks) >= 2) q) b
       |  GROUP BY 1, 2, 3),
       |cnt AS MATERIALIZED (
       |  SELECT lang, bigram, CAST(sum(nb) AS BIGINT) AS n FROM bgd GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
       |voc AS MATERIALIZED (SELECT DISTINCT bigram FROM cnt),
       |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
       |pp AS MATERIALIZED (
       |  SELECT t.lang, voc.bigram,
       |    ((coalesce(c.n, 0) + 1) * 1000000) // (t.tot + vs.v) AS ppm
       |  FROM voc CROSS JOIN tot t
       |  LEFT JOIN cnt c ON c.lang = t.lang AND c.bigram = voc.bigram
       |  CROSS JOIN vs),
       |l0 AS (SELECT lang, bigram,
       |  (ppm * 4096) >> (length(bin(ppm)) - 1) AS m,
       |  (length(bin(ppm)) - 1) * 4096 AS r FROM pp),
       |$logSteps,
       |wt AS MATERIALIZED (SELECT bigram,
       |$wCols
       |  FROM l12 GROUP BY bigram)""".stripMargin
  }

  /** The doc-level langid replay: training CTEs + per-doc scoring,
    * ending in `p(doc_id, lang, s_de..s_zh, predicted_lang)` — shared
    * by the prediction and evaluation oracles, mirroring
    * [[withLangId]] step for step. */
  private def duckLangIdCte: String = {
    val sCols = LangHeads.map(l =>
      s"  CAST(sum(nb*w_$l) AS BIGINT) AS s_$l").mkString(",\n")
    val cCols = LangHeads.map(l =>
      s"    coalesce(sc.s_$l, 0) AS s_$l").mkString(",\n")
    s"""$duckLangIdTrainCtes,
       |sc AS (SELECT doc_id,
       |$sCols
       |  FROM bgd JOIN wt USING(bigram) GROUP BY doc_id),
       |p AS (SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
       |  $duckLangArgmax AS predicted_lang
       |  FROM (SELECT d.doc_id, d.lang,
       |$cCols
       |    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id) q)""".stripMargin
  }

  /** The chunk-mix oracle: the shared training CTEs, then per-chunk
    * bigram scoring with the SAME weight table + argmax, per-doc
    * votes/dominance/mix share — mirroring [[qLangIdMix]]. */
  private def langIdMixOracle: String = {
    val sCols = LangHeads.map(l =>
      s"  CAST(sum(nb*w_$l) AS BIGINT) AS s_$l").mkString(",\n")
    val cCols = LangHeads.map(l =>
      s"    coalesce(csc.s_$l, 0) AS s_$l").mkString(",\n")
    val vCols = LangHeads.map(l =>
      s"    CAST(sum(CASE WHEN chunk_lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS v_$l")
      .mkString(",\n")
    s"""WITH $duckLangIdTrainCtes,
       |ch AS MATERIALIZED (
       |  SELECT d.doc_id, g.ci, substr(d.text, g.ci * 256 + 1, 256) AS chunk
       |  FROM documents d
       |  CROSS JOIN LATERAL (SELECT unnest(range(0,
       |    greatest(1, (length(d.text) + 255) // 256))) AS ci) g),
       |cbd AS MATERIALIZED (
       |  SELECT doc_id, ci, bigram, CAST(count(*) AS BIGINT) AS nb
       |  FROM (SELECT doc_id, ci, toks[i] || ' ' || toks[i+1] AS bigram
       |        FROM (SELECT doc_id, ci,
       |                list_filter(string_split(chunk, ' '), t -> t <> '') AS toks
       |              FROM ch) tq,
       |             LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS i) g
       |        WHERE len(toks) >= 2) b
       |  GROUP BY 1, 2, 3),
       |csc AS (SELECT doc_id, ci,
       |$sCols
       |  FROM cbd JOIN wt USING(bigram) GROUP BY doc_id, ci),
       |cl AS (SELECT doc_id, ci,
       |  $duckLangArgmax AS chunk_lang
       |  FROM (SELECT ch.doc_id, ch.ci,
       |$cCols
       |    FROM ch LEFT JOIN csc ON csc.doc_id = ch.doc_id AND csc.ci = ch.ci) q),
       |v AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |$vCols
       |  FROM cl GROUP BY doc_id),
       |dv AS (
       |  SELECT *,
       |    CASE WHEN v_de >= v_en AND v_de >= v_es AND v_de >= v_fr AND v_de >= v_zh THEN 'de'
       |         WHEN v_en >= v_es AND v_en >= v_fr AND v_en >= v_zh THEN 'en'
       |         WHEN v_es >= v_fr AND v_es >= v_zh THEN 'es'
       |         WHEN v_fr >= v_zh THEN 'fr' ELSE 'zh' END AS dom_lang
       |  FROM v),
       |m AS (
       |  SELECT *,
       |    1000 - (CASE dom_lang WHEN 'de' THEN v_de WHEN 'en' THEN v_en
       |            WHEN 'es' THEN v_es WHEN 'fr' THEN v_fr
       |            ELSE v_zh END * 1000) // n_chunks AS mix_permille
       |  FROM dv)
       |SELECT doc_id, n_chunks, v_de, v_en, v_es, v_fr, v_zh, dom_lang,
       |  mix_permille,
       |  CASE WHEN mix_permille > 200 THEN 'Y' ELSE 'N' END AS is_mixed
       |FROM m ORDER BY doc_id""".stripMargin
  }

  private def duckTaxonomyValues: String =
    Taxonomy.map { case (k, c) => s"('$k', '$c')" }.mkString(", ")

  /** The shared N-round BPE CTE chain for the DuckDB oracles: `tok`
    * (distinct-token tf), `s0` (sentinel-spaced characters), then per
    * round r: `p_r` (adjacent symbol pairs), `c_r` (tf-weighted
    * counts), and — through round rounds−2, or rounds−1 when
    * `applyLast` — `b_r` (learned pair) + `s_{r+1}` (merge applied as
    * the same literal replace). The COUNT guard makes an exhausted
    * round the identity (a NULL scalar subquery would otherwise null
    * the replace pattern), mirroring the engine's empty-merge-array
    * fold. Token is carried so the encode oracle can join back. */
  private def bpeChainCtes(rounds: Int, applyLast: Boolean): String = {
    val sb = new StringBuilder
    sb ++=
      """WITH tok AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE len(token) > 0 GROUP BY token),
        |s0 AS (
        |  SELECT token, tf, ' ' || array_to_string(
        |      list_transform(range(1, len(token) + 1), i -> substr(token, i, 1)), ' ')
        |    || ' ' AS syms
        |  FROM tok)""".stripMargin
    // MATERIALIZED is load-bearing: s_{r+1} references s_r several
    // times (its own FROM plus the b_r scalar subqueries), so default
    // inlined CTEs would re-derive the whole prefix 3^r times.
    for (r <- 0 until rounds) {
      sb ++= s""",
         |p$r AS (
         |  SELECT tf, l, unnest(generate_series(1, len(l) - 1)) AS i
         |  FROM (SELECT tf, string_split(trim(syms), ' ') AS l FROM s$r) q
         |  WHERE len(l) >= 2),
         |c$r AS MATERIALIZED (
         |       SELECT l[i] AS sym_a, l[i + 1] AS sym_b,
         |              CAST(sum(tf) AS BIGINT) AS pair_count
         |       FROM p$r GROUP BY 1, 2)""".stripMargin
      if (r < rounds - 1 || applyLast)
        sb ++= s""",
           |b$r AS MATERIALIZED (
           |        SELECT sym_a AS ba, sym_b AS bb FROM c$r
           |        ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
           |s${r + 1} AS MATERIALIZED (
           |  SELECT token, tf,
           |    CASE WHEN (SELECT count(*) FROM b$r) = 0 THEN syms
           |    ELSE replace(syms,
           |      ' ' || (SELECT ba FROM b$r) || ' ' || (SELECT bb FROM b$r) || ' ',
           |      ' ' || (SELECT ba FROM b$r) || (SELECT bb FROM b$r) || ' ') END AS syms
           |  FROM s$r)""".stripMargin
    }
    sb.toString
  }

  /** The N-round training oracle: top-5 pair candidates per round. */
  private def bpeTrainOracle: String =
    bpeChainCtes(BpeRounds, applyLast = false) +
      (0 until BpeRounds).map { r =>
        s""",
           |t$r AS (SELECT CAST($r AS BIGINT) AS round,
           |        CAST(row_number() OVER (ORDER BY pair_count DESC, sym_a, sym_b) AS BIGINT) AS rank,
           |        sym_a, sym_b, pair_count FROM c$r)""".stripMargin
      }.mkString +
      (0 until BpeRounds)
        .map(r => s"SELECT round, rank, sym_a, sym_b, pair_count FROM t$r WHERE rank <= 5")
        .mkString("\n", "\nUNION ALL\n", "\nORDER BY round, rank")

  /** The per-doc BPE encode oracle (all [[BpeRounds]] merges applied)
    * — shared verbatim by the q_bpe_encode entry and the
    * q_bpe_fertility rollup. */
  private val bpeEncodeOracle: String =
    bpeChainCtes(BpeRounds, applyLast = true) +
      s""",
         |ts AS (
         |  SELECT token,
         |    CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_sym_bpe,
         |    CAST(length(token) AS BIGINT) AS n_chars
         |  FROM s$BpeRounds),
         |dt AS (
         |  SELECT doc_id, token
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |  WHERE len(token) > 0)
         |SELECT dt.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ts.n_chars) AS BIGINT) AS n_symbols_char,
         |  CAST(sum(ts.n_sym_bpe) AS BIGINT) AS n_symbols_bpe,
         |  (CAST(sum(ts.n_sym_bpe) AS BIGINT) * 1000)
         |    // CAST(sum(ts.n_chars) AS BIGINT) AS compression_permille
         |FROM dt JOIN ts ON dt.token = ts.token
         |GROUP BY dt.doc_id
         |ORDER BY dt.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_text_tagging" ->
      s"""WITH dict(kw, category) AS (VALUES $duckTaxonomyValues),
         |hits AS (
         |  SELECT d.doc_id, t.category, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS kw
         |        FROM documents) d
         |  JOIN dict t ON t.kw = d.kw
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT doc_id, category, n_hits,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY n_hits DESC, category DESC) AS rn
         |  FROM hits)
         |SELECT h.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_categories,
         |  CAST(sum(h.n_hits) AS BIGINT) AS n_matches,
         |  max(CASE WHEN t.rn = 1 THEN t.category END) AS top_category,
         |  CAST(max(h.n_hits) AS BIGINT) AS top_hits,
         |  array_to_string(list_sort(list(h.category)), ',') AS categories
         |FROM hits h JOIN top t ON t.doc_id = h.doc_id AND t.category = h.category
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_length_buckets" ->
      """WITH n AS (
        |  SELECT CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
        |    AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT n_tokens,
        |    CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
        |         ELSE CAST(1 AS BIGINT) << length(bin(n_tokens - 1)) END AS bucket
        |  FROM n)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
        |  CAST(((COUNT(*) * bucket - SUM(n_tokens)) * 1000000)
        |    // (COUNT(*) * bucket) AS BIGINT) AS waste_ppm
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_bpe_encode" -> bpeEncodeOracle,

    // fertility = the per-doc encode stats rolled up per language;
    // the subquery is the VERBATIM q_bpe_encode oracle (concatenated
    // AFTER stripMargin — a second stripMargin pass would eat its
    // `||` operators)
    "q_bpe_fertility" ->
      ("""SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(e.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(e.n_symbols_char) AS BIGINT) AS n_chars,
         |  CAST(sum(e.n_symbols_bpe) AS BIGINT) AS n_bpe,
         |  (CAST(sum(e.n_symbols_bpe) AS BIGINT) * 100)
         |    // CAST(sum(e.n_words) AS BIGINT) AS fertility_x100,
         |  (CAST(sum(e.n_symbols_bpe) AS BIGINT) * 1000)
         |    // CAST(sum(e.n_symbols_char) AS BIGINT) AS compression_permille
         |FROM (
         |""".stripMargin + bpeEncodeOracle + """
         |) e
         |JOIN documents d ON d.doc_id = e.doc_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin),

    "q_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tt AS (SELECT doc_id, token FROM tok WHERE len(token) > 0),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tt GROUP BY ALL),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY doc_id),
        |dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        |        FROM tf GROUP BY token),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         (CAST(sum(dl) AS BIGINT) * 1000) // count(*) AS avgdl_x1000
        |       FROM dl),
        |qt AS (SELECT DISTINCT doc_id AS qid, token FROM tf
        |       WHERE doc_id % 100 = 0),
        |sc AS (
        |  SELECT qt.qid, tf.doc_id,
        |    CAST(sum((tf.tf * 2200 * ((st.n_docs * 1000) // dfr.df))
        |      // (tf.tf * 1000
        |          + (1200 * (250 + (750 * dl.dl * 1000) // st.avgdl_x1000))
        |            // 1000)) AS BIGINT) AS score
        |  FROM tf
        |  JOIN qt USING (token)
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  JOIN dfr ON dfr.token = tf.token, st
        |  WHERE tf.doc_id <> qt.qid
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT qid, doc_id, rank_text FROM (
        |    SELECT qid, doc_id,
        |      CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, doc_id) AS BIGINT) AS rank_text
        |    FROM sc) WHERE rank_text <= 20),
        |n AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS nv
        |      FROM embeddings),
        |vp AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS doc_id,
        |    CAST(round(list_sum(list_transform(range(1, 65),
        |        i -> q.nv[i] * c.nv[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |          i -> q.nv[i] * q.nv[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65),
        |          i -> c.nv[i] * c.nv[i])))) * 1e6) AS BIGINT) AS cos_e6
        |  FROM n q JOIN n c ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id),
        |vr AS (
        |  SELECT qid, doc_id, rank_vec FROM (
        |    SELECT qid, doc_id,
        |      CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_e6 DESC, doc_id) AS BIGINT) AS rank_vec
        |    FROM vp) WHERE rank_vec <= 20),
        |fu AS (
        |  SELECT COALESCE(tr.qid, vr.qid) AS query_id,
        |    COALESCE(tr.doc_id, vr.doc_id) AS doc_id,
        |    tr.rank_text, vr.rank_vec,
        |    COALESCE(1000000 // (60 + tr.rank_text), 0)
        |      + COALESCE(1000000 // (60 + vr.rank_vec), 0) AS rrf_e6
        |  FROM tr FULL JOIN vr
        |    ON tr.qid = vr.qid AND tr.doc_id = vr.doc_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_e6 DESC, doc_id) AS BIGINT) AS fused_rank,
        |  doc_id, rank_text, rank_vec, CAST(rrf_e6 AS BIGINT) AS rrf_e6
        |FROM fu
        |QUALIFY fused_rank <= 10
        |ORDER BY query_id, fused_rank""".stripMargin,

    "q_text_trigram_loo" ->
      """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tr AS (
        |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        |        FROM tt WHERE len(t) >= 3) q),
        |dd AS (SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS d123
        |       FROM tr GROUP BY ALL),
        |cc AS (SELECT w1, w2, w3, CAST(sum(d123) AS BIGINT) AS c123
        |       FROM dd GROUP BY ALL),
        |dp AS (SELECT doc_id, w1, w2, CAST(sum(d123) AS BIGINT) AS d12
        |       FROM dd GROUP BY ALL),
        |cp AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
        |       FROM cc GROUP BY ALL),
        |ds AS (SELECT doc_id, w2, w3, CAST(sum(d123) AS BIGINT) AS d23
        |       FROM dd GROUP BY ALL),
        |cs AS (SELECT w2, w3, CAST(sum(c123) AS BIGINT) AS c23
        |       FROM cc GROUP BY ALL),
        |du AS (SELECT doc_id, w2, CAST(sum(d23) AS BIGINT) AS d2
        |       FROM ds GROUP BY ALL),
        |cu AS (SELECT w2, CAST(sum(c23) AS BIGINT) AS c2
        |       FROM cs GROUP BY ALL),
        |sc AS (
        |  SELECT dd.doc_id, dd.d123,
        |    cc.c123 - dd.d123 AS l123, cp.c12 - dp.d12 AS l12,
        |    cs.c23 - ds.d23 AS l23, cu.c2 - du.d2 AS l2
        |  FROM dd
        |  JOIN cc USING (w1, w2, w3)
        |  JOIN dp ON dp.doc_id = dd.doc_id AND dp.w1 = dd.w1 AND dp.w2 = dd.w2
        |  JOIN cp ON cp.w1 = dd.w1 AND cp.w2 = dd.w2
        |  JOIN ds ON ds.doc_id = dd.doc_id AND ds.w2 = dd.w2 AND ds.w3 = dd.w3
        |  JOIN cs ON cs.w2 = dd.w2 AND cs.w3 = dd.w3
        |  JOIN du ON du.doc_id = dd.doc_id AND du.w2 = dd.w2
        |  JOIN cu ON cu.w2 = dd.w2),
        |sp AS (
        |  SELECT doc_id, d123,
        |    CASE WHEN l123 > 0 AND l12 > 0 THEN (l123 * 1000000) // l12
        |         WHEN l23 > 0 AND l2 > 0
        |           THEN (2 * ((l23 * 1000000) // l2)) // 5
        |         ELSE 0 END AS p_e6,
        |    CASE WHEN l123 > 0 AND l12 > 0 THEN 'direct'
        |         WHEN l23 > 0 AND l2 > 0 THEN 'backoff'
        |         ELSE 'zero' END AS kind
        |  FROM sc),
        |agg AS (
        |  SELECT doc_id, CAST(sum(d123) AS BIGINT) AS n_trigrams,
        |    CAST(sum(d123 * p_e6) // sum(d123) AS BIGINT) AS avg_p_e6,
        |    CAST(sum(CASE WHEN kind = 'backoff' THEN d123 ELSE 0 END)
        |      AS BIGINT) AS backoff_occ,
        |    CAST(sum(CASE WHEN kind = 'zero' THEN d123 ELSE 0 END)
        |      AS BIGINT) AS zero_occ
        |  FROM sp GROUP BY doc_id)
        |SELECT d.doc_id, a.n_trigrams, a.avg_p_e6, a.backoff_occ, a.zero_occ,
        |  (a.backoff_occ * 1000) // a.n_trigrams AS backoff_permille
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_entity_resolution" ->
      """WITH vocab AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |v AS (SELECT token, substr(token, len(token), 1) AS ck
        |      FROM vocab WHERE len(token) >= 3),
        |p AS (
        |  SELECT a.token AS tok_a, b.token AS tok_b
        |  FROM v a JOIN v b ON a.ck = b.ck AND a.token < b.token
        |  WHERE abs(len(a.token) - len(b.token)) <= 1
        |    AND levenshtein(a.token, b.token) <= 2),
        |e AS (SELECT tok_a AS src, tok_b AS dst FROM p
        |      UNION ALL SELECT tok_b, tok_a FROM p),
        |l0 AS (SELECT token, token AS entity FROM v),
        |l1 AS (
        |  SELECT l.token, least(l.entity, coalesce(m.me, l.entity)) AS entity
        |  FROM l0 l LEFT JOIN (
        |    SELECT e.src, min(l0.entity) AS me
        |    FROM e JOIN l0 ON l0.token = e.dst GROUP BY e.src) m
        |  ON m.src = l.token),
        |l2 AS (
        |  SELECT l.token, least(l.entity, coalesce(m.me, l.entity)) AS entity
        |  FROM l1 l LEFT JOIN (
        |    SELECT e.src, min(l1.entity) AS me
        |    FROM e JOIN l1 ON l1.token = e.dst GROUP BY e.src) m
        |  ON m.src = l.token),
        |l3 AS (
        |  SELECT l.token, least(l.entity, coalesce(m.me, l.entity)) AS entity
        |  FROM l2 l LEFT JOIN (
        |    SELECT e.src, min(l2.entity) AS me
        |    FROM e JOIN l2 ON l2.token = e.dst GROUP BY e.src) m
        |  ON m.src = l.token),
        |sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members
        |       FROM l3 GROUP BY entity)
        |SELECT l3.token, l3.entity, sz.n_members
        |FROM l3 JOIN sz ON sz.entity = l3.entity
        |ORDER BY l3.token""".stripMargin,


    "q_bpe_train" -> bpeTrainOracle,

    "q_text_fuzzy" ->
      """WITH vocab AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents),
        |v AS (SELECT token, substr(token, len(token), 1) AS ck FROM vocab WHERE len(token) >= 3)
        |SELECT a.token AS tok_a, b.token AS tok_b,
        |  CAST(levenshtein(a.token, b.token) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.ck = b.ck AND a.token < b.token
        |WHERE abs(len(a.token) - len(b.token)) <= 1
        |  AND levenshtein(a.token, b.token) <= 2
        |ORDER BY tok_a, tok_b""".stripMargin,

    "q_text_span_dup" ->
      """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) < 8 THEN CAST([] AS VARCHAR[])
        |         ELSE list_distinct(list_transform(range(1, len(t) - 6),
        |                i -> array_to_string(t[i:i+7], ' '))) END AS g8
        |  FROM tt),
        |dd AS (SELECT doc_id, CAST(len(g8) AS BIGINT) AS n_spans, unnest(g8) AS g
        |       FROM d WHERE len(g8) > 0),
        |cnt AS (SELECT g, count(*) AS nd FROM dd GROUP BY g)
        |SELECT dd.doc_id, dd.n_spans,
        |  CAST(sum(CASE WHEN cnt.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
        |  CAST((sum(CASE WHEN cnt.nd >= 2 THEN 1 ELSE 0 END) * 1000) // dd.n_spans AS BIGINT)
        |    AS dup_permille
        |FROM dd JOIN cnt ON dd.g = cnt.g
        |GROUP BY dd.doc_id, dd.n_spans
        |ORDER BY dd.doc_id""".stripMargin,

    "q_vocab_cms_est" ->
      (s"""WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tt AS (SELECT token FROM tok WHERE len(token) > 0),
        |cells AS (
        |  SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
        |${(0 until CmsDepth).map(d =>
            s"    SELECT $d AS d, ${cmsBucketDuck(d)} AS bucket FROM tt")
            .mkString("\n    UNION ALL\n")}
        |  ) GROUP BY d, bucket),
        |top AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS exact_tf
        |  FROM tt GROUP BY token ORDER BY exact_tf DESC, token LIMIT 20),
        |est AS (
        |  SELECT t.token, t.exact_tf, min(c.cnt) AS cms_est FROM (
        |${(0 until CmsDepth).map(d =>
            s"    SELECT token, exact_tf, $d AS d, ${cmsBucketDuck(d)} AS bucket FROM top")
            .mkString("\n    UNION ALL\n")}
        |  ) t JOIN cells c ON c.d = t.d AND c.bucket = t.bucket
        |  GROUP BY t.token, t.exact_tf)
        |SELECT token, exact_tf, CAST(cms_est AS BIGINT) AS cms_est,
        |  CAST(cms_est - exact_tf AS BIGINT) AS overcount
        |FROM est ORDER BY exact_tf DESC, token""".stripMargin),

    "q_text_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ix AS (SELECT doc_id, toks,
        |         unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
        |p AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM ix),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM p GROUP BY w1, w2),
        |uc AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM p GROUP BY w1),
        |s AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(CAST(sum((c12 * 1000000) // c1) AS BIGINT) // count(*) AS BIGINT) AS avg_p_e6,
        |    CAST(min((c12 * 1000000) // c1) AS BIGINT) AS min_p_e6
        |  FROM p JOIN bc USING (w1, w2) JOIN uc USING (w1)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, s.n_bigrams, s.avg_p_e6, s.min_p_e6
        |FROM documents d LEFT JOIN s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_text_rarity" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tt AS (SELECT doc_id, token FROM tok WHERE len(token) > 0),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        |       FROM (SELECT DISTINCT doc_id, token FROM tt) GROUP BY token),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  min(df.df) AS min_df,
        |  CAST((sum(df.df) * 1000) // (count(*) * max(n.n_docs)) AS BIGINT) AS mean_df_permille
        |FROM tt JOIN df USING (token) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_chunk" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
         |             unnest(range(0, (greatest(len(toks), 1) - 1) // $ChunkStride + 1)) AS chunk_id
         |      FROM t)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(chunk_id * $ChunkStride + 1 AS BIGINT) AS start_token,
         |  CAST(len(toks[chunk_id * $ChunkStride + 1 : chunk_id * $ChunkStride + $ChunkTokens]) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(toks[chunk_id * $ChunkStride + 1 : chunk_id * $ChunkStride + $ChunkTokens], ' ') AS chunk_text,
         |  n_tokens
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_text_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, source, n_tokens,
         |  (cum - n_tokens) // $PackBudget AS pack_id,
         |  (cum - n_tokens) % $PackBudget AS pack_offset,
         |  CASE WHEN (cum - n_tokens) // $PackBudget <> (cum - 1) // $PackBudget
         |       THEN 'Y' ELSE 'N' END AS spans_packs
         |FROM c ORDER BY source, doc_id""".stripMargin,

    "q_tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tt AS (SELECT doc_id, token FROM tok WHERE len(token) > 0),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tt GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, token FROM tt) GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         CAST((n.n_docs * 1000) // df.df AS BIGINT) AS idf_x1000,
        |         CAST(tf.tf * ((n.n_docs * 1000) // df.df) AS BIGINT) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, token) AS BIGINT) AS rank
        |  FROM s)
        |SELECT doc_id, rank, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |       idf_x1000, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_text_rake" ->
      """WITH tok AS (
        |  SELECT doc_id, u.pos, u.tok AS token
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
        |  LATERAL (SELECT unnest(ws) AS tok, generate_subscripts(ws, 1) AS pos) u),
        |wds AS (
        |  SELECT * FROM (
        |    SELECT doc_id, pos, token,
        |      (token IN ('the', 'a') OR token = '') AS is_stop,
        |      CAST(sum(CASE WHEN (token IN ('the', 'a') OR token = '')
        |               THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS phrase_id
        |    FROM tok)
        |  WHERE NOT is_stop),
        |ph AS (
        |  SELECT doc_id, phrase_id,
        |    string_agg(token, ' ' ORDER BY pos) AS phrase,
        |    CAST(count(*) AS BIGINT) AS len
        |  FROM wds GROUP BY doc_id, phrase_id
        |  HAVING count(*) <= 4),
        |pw AS (SELECT w.doc_id, w.phrase_id, w.token, p.phrase, p.len
        |       FROM wds w JOIN ph p USING (doc_id, phrase_id)),
        |wsc AS (SELECT token, CAST(count(*) AS BIGINT) AS freq,
        |               CAST(sum(len) AS BIGINT) AS deg
        |        FROM pw GROUP BY token),
        |psc AS (
        |  SELECT pw.doc_id, pw.phrase_id, pw.phrase,
        |    CAST(sum((wsc.deg * 1000) // wsc.freq) AS BIGINT) AS score_x1000
        |  FROM pw JOIN wsc USING (token)
        |  GROUP BY pw.doc_id, pw.phrase_id, pw.phrase)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
        |       CAST(max(score_x1000) AS BIGINT) AS score_x1000
        |FROM psc GROUP BY phrase
        |ORDER BY score_x1000 DESC, phrase LIMIT 20""".stripMargin,

    "q_text_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tt AS (SELECT doc_id, token FROM tok WHERE len(token) > 0),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tt GROUP BY doc_id, token),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        |dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |stats AS (SELECT count(*) AS n_docs,
        |                 (sum(dl) * 1000) // count(*) AS avgdl_x1000 FROM dl),
        |qdoc AS (SELECT min(doc_id) AS qid FROM documents),
        |qterms AS (SELECT DISTINCT token FROM tf, qdoc WHERE tf.doc_id = qdoc.qid),
        |scored AS (
        |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
        |    CAST(sum((f.tf * 2200 * ((s.n_docs * 1000) // d2.df))
        |         // (f.tf * 1000
        |             + (1200 * (250 + (750 * d.dl * 1000) // s.avgdl_x1000)) // 1000))
        |      AS BIGINT) AS score_x1000
        |  FROM tf f
        |  JOIN qterms q ON f.token = q.token
        |  JOIN dl d ON f.doc_id = d.doc_id
        |  JOIN dfr d2 ON f.token = d2.token
        |  CROSS JOIN stats s CROSS JOIN qdoc
        |  WHERE f.doc_id <> qdoc.qid
        |  GROUP BY f.doc_id),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY score_x1000 DESC, doc_id)
        |              AS BIGINT) AS rank FROM scored)
        |SELECT rank, doc_id, n_matched, score_x1000
        |FROM r WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q_vocab_topk" ->
      """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE len(token) > 0
        |GROUP BY token
        |ORDER BY tf DESC, token LIMIT 100""".stripMargin,

    // the sketch only PROPOSES candidates; the exact re-count decides —
    // so the oracle is simply the exact frequent-items query
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tt AS (SELECT token FROM t WHERE len(token) > 0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tt),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        |      FROM tt GROUP BY token)
        |SELECT c.token, c.n, (c.n * 1000000) // tot.n_total AS share_ppm
        |FROM c, tot WHERE c.n * 200 > tot.n_total
        |ORDER BY c.n DESC, c.token""".stripMargin,

    "q_vocab_zipf" -> vocabZipfOracle,
    "q_vocab_growth" -> vocabGrowthOracle,

    // Audit twins of the rows-only sketch/zlib entries: DuckDB replays
    // the deterministic surface (exact companions + constant-TRUE
    // bounded-error invariants); the estimates stay engine-side.
    "q_sketch_distinct_audit" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |tt AS (SELECT source, token FROM tok WHERE len(token) > 0),
        |per AS (SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct
        |        FROM tt GROUP BY 1),
        |g AS (SELECT 'ALL' AS source, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct
        |      FROM tt)
        |SELECT source, exact_distinct, TRUE AS est_within_5pct
        |FROM (SELECT * FROM per UNION ALL SELECT * FROM g)
        |ORDER BY source""".stripMargin,

    "q_text_compress_audit" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  TRUE AS deflate_positive, TRUE AS deflate_bounded,
        |  TRUE AS published_reproducible, TRUE AS rerun_deterministic
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_source_stylometry" -> sourceStylometryOracle,
    "q_text_entropy" -> textEntropyOracle,

    "q_text_readability" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT)
        |      AS n_words,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT))
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    206835 - (1015 * n_words) // n_sentences
        |           - (84600 * n_syllables) // n_words END AS flesch_milli,
        |  CASE WHEN n_words > 0 THEN
        |    (390 * n_words) // n_sentences
        |    + (11800 * n_syllables) // n_words - 15590 END AS fk_grade_milli
        |FROM m ORDER BY doc_id""".stripMargin,

    // per-source exact counts + the same 1% threshold: capacity 200
    // guarantees the sketch's candidate set covers every emitted row
    "q_heavy_hitters_grouped" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tt AS (SELECT source, token FROM t WHERE len(token) > 0),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
        |        FROM tt GROUP BY source),
        |c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
        |      FROM tt GROUP BY source, token)
        |SELECT c.source, c.token, c.n,
        |  (c.n * 1000000) // tot.n_src AS share_ppm
        |FROM c JOIN tot USING (source) WHERE c.n * 100 > tot.n_src
        |ORDER BY c.source, c.n DESC, c.token""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
        |  CAST((list_sum(list_transform(string_split(text, ' '), t -> CAST(len(t) AS BIGINT))) * 100)
        |    // CAST(len(string_split(text, ' ')) AS BIGINT) AS BIGINT) AS avg_token_len_x100
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS BIGINT) AS stop_cnt
        |  FROM documents)
        |SELECT doc_id, n_tokens, stop_cnt,
        |  (stop_cnt * 1000) // n_tokens AS stop_permille,
        |  1000 - (stop_cnt * 1000) // n_tokens
        |       - (CASE WHEN length(text) < 100 THEN 200 ELSE 0 END) AS quality_score,
        |  CASE WHEN length(text) < 100 THEN 'Y' ELSE 'N' END AS is_short
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_langid" ->
      s"""WITH $duckLangIdCte
         |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh, predicted_lang
         |FROM p ORDER BY doc_id""".stripMargin,

    // langid replay (ending in p) + the bigram-LM replay (CTEs renamed
    // lm* — the langid chain already owns `p`) + value-count tertiles
    "q_ccnet_buckets" ->
      s"""WITH $duckLangIdCte,
         |lmt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |lmi AS (SELECT doc_id, toks,
         |          unnest(generate_series(1, len(toks) - 1)) AS i FROM lmt),
         |lmp AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM lmi),
         |lmbc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |         FROM lmp GROUP BY w1, w2),
         |lmuc AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
         |         FROM lmp GROUP BY w1),
         |lms AS (
         |  SELECT doc_id,
         |    CAST(CAST(sum((c12 * 1000000) // c1) AS BIGINT) // count(*) AS BIGINT)
         |      AS avg_p_e6
         |  FROM lmp JOIN lmbc USING (w1, w2) JOIN lmuc USING (w1)
         |  GROUP BY doc_id),
         |sc2 AS (
         |  SELECT p.doc_id, p.predicted_lang,
         |         coalesce(lms.avg_p_e6, 0) AS score_e6
         |  FROM p LEFT JOIN lms USING (doc_id)),
         |vc AS (SELECT predicted_lang, score_e6, CAST(count(*) AS BIGINT) AS cnt
         |       FROM sc2 GROUP BY 1, 2),
         |cm AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY predicted_lang
         |         ORDER BY score_e6 DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum
         |       FROM vc),
         |nl AS (SELECT predicted_lang, CAST(sum(cnt) AS BIGINT) AS n_lang
         |       FROM vc GROUP BY 1),
         |cuts AS (
         |  SELECT cm.predicted_lang,
         |    max(CASE WHEN cum >= (n_lang + 2) // 3 THEN score_e6 END) AS cut1,
         |    max(CASE WHEN cum >= (2 * n_lang + 2) // 3 THEN score_e6 END) AS cut2,
         |    max(n_lang) AS n_lang
         |  FROM cm JOIN nl USING (predicted_lang) GROUP BY cm.predicted_lang)
         |SELECT cm.predicted_lang,
         |  CASE WHEN score_e6 >= cut1 THEN 'head'
         |       WHEN score_e6 >= cut2 THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  min(score_e6) AS min_score_e6,
         |  max(score_e6) AS max_score_e6,
         |  CAST((sum(cnt) * 1000) // max(cuts.n_lang) AS BIGINT)
         |    AS share_permille
         |FROM cm JOIN cuts USING (predicted_lang)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_langid_eval" ->
      s"""WITH $duckLangIdCte,
         |cells AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
         |          FROM p GROUP BY lang, predicted_lang),
         |tt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true
         |       FROM cells GROUP BY lang),
         |pt AS (SELECT predicted_lang, CAST(sum(n) AS BIGINT) AS n_pred
         |       FROM cells GROUP BY predicted_lang)
         |SELECT c.lang, c.predicted_lang, c.n, tt.n_true, pt.n_pred,
         |  (c.n * 1000000) // tt.n_true AS true_share_ppm,
         |  (c.n * 1000000) // pt.n_pred AS pred_share_ppm
         |FROM cells c
         |JOIN tt ON c.lang = tt.lang
         |JOIN pt ON c.predicted_lang = pt.predicted_lang
         |ORDER BY c.lang, c.predicted_lang""".stripMargin,

    "q_langid_mix" -> langIdMixOracle,

    "q_langid_holdout" -> {
      val sCols = LangHeads.map(l =>
        s"  CAST(sum(nb*w_$l) AS BIGINT) AS s_$l").mkString(",\n")
      val cCols = LangHeads.map(l =>
        s"    coalesce(sc.s_$l, 0) AS s_$l").mkString(",\n")
      s"""WITH ${duckLangIdTrainCtesWhere("WHERE doc_id % 2 = 0")},
         |ttk AS (
         |  SELECT doc_id, lang,
         |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE doc_id % 2 <> 0),
         |tbg AS MATERIALIZED (
         |  SELECT doc_id, lang, bigram, CAST(count(*) AS BIGINT) AS nb
         |  FROM (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS bigram
         |        FROM (SELECT doc_id, lang, toks,
         |                unnest(generate_series(1, len(toks)-1)) AS i
         |              FROM ttk WHERE len(toks) >= 2) q) b
         |  GROUP BY 1, 2, 3),
         |sc AS (SELECT doc_id,
         |$sCols
         |  FROM tbg JOIN wt USING(bigram) GROUP BY doc_id),
         |p AS (SELECT doc_id, lang,
         |  $duckLangArgmax AS predicted_lang
         |  FROM (SELECT d.doc_id, d.lang,
         |$cCols
         |    FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 2 <> 0) d
         |    LEFT JOIN sc ON sc.doc_id = d.doc_id) q),
         |cells AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
         |          FROM p GROUP BY 1, 2),
         |tt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true
         |       FROM cells GROUP BY 1)
         |SELECT c.lang, c.predicted_lang, c.n, tt.n_true,
         |  (c.n * 1000000) // tt.n_true AS true_share_ppm
         |FROM cells c JOIN tt ON tt.lang = c.lang
         |ORDER BY c.lang, c.predicted_lang""".stripMargin
    },

    "q_vocab_oov" ->
      s"""WITH tt AS (
         |  SELECT doc_id, lang, token
         |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
         |        FROM documents)
         |  WHERE len(token) > 0),
         |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
         |       FROM tt GROUP BY token),
         |voc AS (SELECT token FROM (
         |          SELECT *, row_number() OVER (ORDER BY tf DESC, token) AS rn
         |          FROM tf) WHERE rn <= $OovVocabK),
         |fl AS (SELECT tt.lang, tt.doc_id, tt.token,
         |         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
         |       FROM tt LEFT JOIN voc v ON v.token = tt.token)
         |SELECT lang,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(oov) AS BIGINT) AS n_oov,
         |  (CAST(sum(oov) AS BIGINT) * 1000000) // count(*) AS oov_ppm,
         |  CAST(count(DISTINCT CASE WHEN oov = 1 THEN token END) AS BIGINT)
         |    AS oov_types
         |FROM fl GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_dup_span_extract" ->
      """WITH tk AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |gr AS MATERIALIZED (
        |  SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS p,
        |    array_to_string(toks[g.i : g.i + 7], ' ') AS gs
        |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 7)) AS i) g
        |  WHERE len(toks) >= 8),
        |dfq AS (SELECT gs, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        |        FROM gr GROUP BY gs),
        |dp AS (SELECT gr.doc_id, gr.p
        |       FROM gr JOIN dfq USING (gs) WHERE nd >= 2),
        |rr AS (SELECT doc_id, p,
        |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS run_id
        |       FROM dp),
        |sp AS (SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |        CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |       FROM rr GROUP BY doc_id, run_id),
        |top AS (SELECT doc_id, span_start, span_tokens FROM (
        |          SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY span_tokens DESC, span_start) AS rn FROM sp)
        |        WHERE rn = 1)
        |SELECT t.doc_id, t.span_start, t.span_tokens,
        |  array_to_string(tk.toks[CAST(t.span_start + 1 AS INT) :
        |    CAST(t.span_start + t.span_tokens AS INT)], ' ') AS span_text
        |FROM top t JOIN tk ON tk.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_text_dup_spans" ->
      """WITH tk AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |gr AS MATERIALIZED (
        |  SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS p,
        |    array_to_string(toks[g.i : g.i + 7], ' ') AS gs
        |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 7)) AS i) g
        |  WHERE len(toks) >= 8),
        |dfq AS (SELECT gs, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        |        FROM gr GROUP BY gs),
        |dp AS (SELECT gr.doc_id, gr.p
        |       FROM gr JOIN dfq USING (gs) WHERE nd >= 2),
        |rr AS (SELECT doc_id, p,
        |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS run_id,
        |        CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
        |             OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
        |             THEN 1 ELSE 0 END AS new_cov
        |       FROM dp),
        |rc AS (SELECT *, sum(new_cov) OVER (PARTITION BY doc_id ORDER BY p) AS cov_id
        |       FROM rr),
        |sp AS (SELECT doc_id, run_id, CAST(count(*) AS BIGINT) AS len
        |       FROM rc GROUP BY 1, 2),
        |ss AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |        CAST(max(len + 7) AS BIGINT) AS longest_dup_span_tokens,
        |        CAST(sum(len) AS BIGINT) AS n_dup_grams FROM sp GROUP BY 1),
        |cv AS (SELECT doc_id, cov_id, max(p) - min(p) + 8 AS cov
        |       FROM rc GROUP BY 1, 2),
        |cs AS (SELECT doc_id, CAST(sum(cov) AS BIGINT) AS dup_coverage_tokens
        |       FROM cv GROUP BY 1),
        |nt AS (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM documents)
        |SELECT nt.doc_id, nt.n_tokens,
        |  coalesce(ss.n_dup_grams, 0) AS n_dup_grams,
        |  coalesce(ss.n_dup_spans, 0) AS n_dup_spans,
        |  coalesce(ss.longest_dup_span_tokens, 0) AS longest_dup_span_tokens,
        |  coalesce(cs.dup_coverage_tokens, 0) AS dup_coverage_tokens,
        |  (coalesce(cs.dup_coverage_tokens, 0) * 1000) // nt.n_tokens
        |    AS dup_coverage_permille
        |FROM nt
        |LEFT JOIN ss ON ss.doc_id = nt.doc_id
        |LEFT JOIN cs ON cs.doc_id = nt.doc_id
        |ORDER BY nt.doc_id""".stripMargin,

    // char-level dup spans: the oracle replays the normalization, the
    // shared Rabin mod-16 selector, the 50-char gram STRINGS (Spark
    // ships xxhash64 of the same strings), the distinct-doc frequency
    // and the gap-64 island merge. MATERIALIZED: nrm/pos are each read
    // twice — inlining re-derives the lateral gram scan per reference.
    "q_text_dup_chars" -> {
      val sel = s"${duckRollWindowHash("n.norm", "g.p")} % $DupCharSampleMod = 0"
      s"""WITH nrm AS MATERIALIZED (
         |  SELECT doc_id,
         |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
         |  FROM documents),
         |pos AS MATERIALIZED (
         |  SELECT n.doc_id, g.p,
         |    substring(n.norm, g.p, $DupCharK) AS gs
         |  FROM nrm n
         |  CROSS JOIN LATERAL (SELECT unnest(range(1,
         |    length(n.norm) - ${DupCharK - 2})) AS p) g
         |  WHERE $sel),
         |dfq AS (SELECT gs, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
         |        FROM pos GROUP BY gs),
         |dp AS (SELECT pos.doc_id, pos.p
         |       FROM pos JOIN dfq USING (gs) WHERE nd >= 2),
         |sp AS (SELECT doc_id, p,
         |        CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
         |             OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $DupCharGap
         |             THEN 1 ELSE 0 END AS new_span
         |       FROM dp),
         |sp2 AS (SELECT doc_id, p,
         |         sum(new_span) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
         |        FROM sp),
         |st AS (SELECT doc_id, span_id, CAST(count(*) AS BIGINT) AS n_g,
         |        max(p) - min(p) + $DupCharK AS span_chars
         |       FROM sp2 GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |         CAST(max(span_chars) AS BIGINT) AS longest_dup_span_chars,
         |         CAST(sum(n_g) AS BIGINT) AS n_dup_grams,
         |         CAST(sum(span_chars) AS BIGINT) AS dup_coverage_chars
         |        FROM st GROUP BY 1)
         |SELECT n.doc_id, CAST(length(n.norm) AS BIGINT) AS n_chars,
         |  coalesce(a.n_dup_grams, 0) AS n_dup_grams,
         |  coalesce(a.n_dup_spans, 0) AS n_dup_spans,
         |  coalesce(a.longest_dup_span_chars, 0) AS longest_dup_span_chars,
         |  coalesce(a.dup_coverage_chars, 0) AS dup_coverage_chars,
         |  (coalesce(a.dup_coverage_chars, 0) * 1000)
         |    // nullif(CAST(length(n.norm) AS BIGINT), 0) AS dup_coverage_permille
         |FROM nrm n LEFT JOIN agg a ON a.doc_id = n.doc_id
         |ORDER BY n.doc_id""".stripMargin
    },

    "q_text_bpe" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+') AS pieces
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, text,
        |    CAST(len(pieces) AS BIGINT) AS n_pieces,
        |    CAST(len(list_distinct(pieces)) AS BIGINT) AS n_distinct_pieces,
        |    CAST(list_sum(list_transform(pieces, x -> (length(x) + 3) // 4)) AS BIGINT) AS n_bpe
        |  FROM p)
        |SELECT doc_id, n_pieces, n_distinct_pieces, n_bpe,
        |       (n_bpe * 1000) // nullif(length(text), 0) AS bpe_per_kchar
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_rollhash" -> {
      val windowHash = duckRollWindowHash("text", "i")
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text) < $RollK THEN CAST([] AS BIGINT[])
         |         ELSE list_transform(range(1, length(text) - ${RollK - 2}),
         |                i -> CAST($windowHash AS BIGINT)) END AS wh
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(wh) AS BIGINT) AS n_windows,
         |  list_min(wh) AS fp_min,
         |  list_max(wh) AS fp_max,
         |  list_min(list_filter(wh, h -> h % 16 = 0)) AS fp_sampled
         |FROM w ORDER BY doc_id""".stripMargin
    },

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(text) AS fp,
        |  md5(substr(text, 1, 64)) AS head_fp,
        |  md5(CASE WHEN length(text) >= 64
        |           THEN substr(text, length(text) - 63, 64)
        |           ELSE text END) AS tail_fp,
        |  substr(md5(text), 1, 16) AS fp64
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
