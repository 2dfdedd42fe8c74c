package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Labeled-data / preference-data operators — the RLHF corner of a
  * training-data pipeline: uncertainty for A/B metrics at corpus scale
  * (Poisson bootstrap), preference-log ranking (Bradley–Terry), and
  * annotation quality (Fleiss' kappa over multi-rater labels).
  *
  * Determinism: every "random" draw is a fixed-width hex slice of
  * `md5(salt || key)` compared against constants embedded IDENTICALLY
  * in the Spark expression and the DuckDB oracle (the q_sample_hash
  * convention), and every ratio is integer/decimal arithmetic with
  * truncating division (`div` ≡ DuckDB `//`, both toward zero), so
  * both engines produce bit-identical rows.
  *
  * Scale notes (100 TB):
  *  - the bootstrap is the Poisson bootstrap (Chamandy et al.,
  *    "Estimating Uncertainty for Massive Data Streams", public
  *    Google paper): resampling weights are computed per (unit,
  *    replicate) at scan speed, so the whole R-replicate resample is
  *    ONE map-side-combined shuffle into (metric, replicate, variant)
  *    cells — no per-replicate pass, no sampling state;
  *  - Bradley–Terry aggregates the preference log into a ≤ M²-row
  *    win matrix in one shuffle (the only data-sized step), stages
  *    it, and fits on the matrix — model count M is fixed by the
  *    catalog, independent of log size;
  *  - Fleiss' kappa is pure per-row expressions (rater labels and
  *    per-item agreement pairs computed in one projection) plus one
  *    groupBy(source) rollup.
  */
object Labeling {

  /** Bootstrap replicate count. 32 replicates give a rank-2 / rank-31
    * interval ≈ a 90% CI — the resolution/width trade documented with
    * the query. */
  private[graft] val BootReps = 32

  /** Cumulative Poisson(1) CDF for k = 0..7, mapped to 6-hex-digit
    * thresholds on the md5-slice domain [0, 16^6): a uniform hex
    * slice `h` draws weight k where k = #{thresholds ≤ h} (capped at
    * 8). Embedded verbatim in BOTH engines' SQL, so the float→hex
    * rounding here is shared constant-folding, not a runtime
    * divergence. */
  private[graft] val PoissonCumHex: Seq[String] = {
    val pdf = (0 to 7).map(k => math.exp(-1.0) / (1 to k).product)
    pdf.scanLeft(0.0)(_ + _).tail
      .map(c => f"${math.min((c * (1L << 24)).toLong, 0xffffffL)}%06x")
  }

  /** SQL CASE drawing a Poisson(1) weight from `hexExpr` (a 6-hex-char
    * slice) — same text evaluates in Spark and DuckDB. */
  private def poissonCaseSql(hexExpr: String): String =
    PoissonCumHex.zipWithIndex
      .map { case (t, k) => s"WHEN $hexExpr < '$t' THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 8L END")

  /** The same CASE with DuckDB integer literals (no `L` suffix). */
  private def poissonCaseDuck(hexExpr: String): String =
    PoissonCumHex.zipWithIndex
      .map { case (t, k) => s"WHEN $hexExpr < '$t' THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** First 6 hex chars of md5 as a BIGINT in [0, 16^6) — one
    * `instr`/`strpos` term per digit, the qSplitAssign single-digit
    * rule widened to 6 digits. Both variants are the same arithmetic;
    * only the position-function name differs per engine. */
  private def hex6ToLongSpark(hexExpr: String): String =
    (0 until 6).map { i =>
      val w = 1L << (4 * (5 - i))
      s"(instr('0123456789abcdef', substring($hexExpr, ${i + 1}, 1)) - 1) * ${w}L"
    }.mkString("(", " + ", ")")

  private def hex6ToLongDuck(hexExpr: String): String =
    (0 until 6).map { i =>
      val w = 1L << (4 * (5 - i))
      s"(strpos('0123456789abcdef', substring($hexExpr, ${i + 1}, 1)) - 1) * $w"
    }.mkString("(", " + ", ")")

  // --- Poisson bootstrap ---------------------------------------------

  /** The Poisson(1) weight of resampling unit `unitIdSql` in replicate
    * `r` — the md5 salt + CASE chain shared by the batch (user-level)
    * and streaming (event-level) bootstraps, so the two legs draw from
    * one definition. */
  private def bootWeightSql(unitIdSql: String): String =
    poissonCaseSql(
      "substring(md5(cast(concat('boot|', cast(r as string), '|', " +
        s"cast($unitIdSql as string)) as binary)), 1, 6)")

  /** POISSON BOOTSTRAP CI — uncertainty for the A/B
    * revenue-per-user difference without resampling passes: each
    * (user, replicate) draws an independent Poisson(1) weight from
    * `md5('boot|r|user_id')` (the at-scale bootstrap — with millions
    * of units, multinomial resampling ≈ independent Poisson(1)
    * weights, and the draw needs no global state). Replicate means
    * are weighted means in micro-cents; the interval is the rank-2 /
    * rank-(n−1) envelope of the 32 replicate diffs (≈ a 90%
    * percentile-bootstrap CI at this R). A replicate whose variant
    * side draws all-zero weights has no mean and is excluded — at
    * small scale factors this genuinely happens, and both engines
    * exclude it identically (`n_reps_valid` says how many survived).
    *
    * Shape: per-user totals (one shuffle), a 32× scan-side replicate
    * fan-out combined map-side into (event_type, replicate, variant)
    * cells — ≤ |types|·R·2 rows — then a ≤ R-row window per type. */
  def qAbBootstrap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.load(spark, dir, "events")
      .groupBy($"event_type", $"user_id")
      .agg(sum(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
        .as("cents"))
      .withColumn("variant", $"user_id" % 2)
    val wExpr = bootWeightSql("user_id")
    val cells = users
      .withColumn("r", explode(expr(s"sequence(0L, ${BootReps - 1}L)")))
      .withColumn("w", expr(wExpr))
      .groupBy($"event_type", $"r")
      .agg(
        sum(when($"variant" === 0, $"w").otherwise(0L)).as("n_a"),
        sum(when($"variant" === 1, $"w").otherwise(0L)).as("n_b"),
        sum(when($"variant" === 0, $"w" * $"cents").otherwise(0L)).as("wc_a"),
        sum(when($"variant" === 1, $"w" * $"cents").otherwise(0L)).as("wc_b"))
      .withColumn("diff", expr(
        """(cast(wc_b as decimal(38,0)) * 1000000) div nullif(n_b, 0L)
          | - (cast(wc_a as decimal(38,0)) * 1000000) div nullif(n_a, 0L)"""
          .stripMargin).cast("long"))
      .filter($"diff".isNotNull)
    val w = Window.partitionBy($"event_type").orderBy($"diff", $"r")
    val ci = cells
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"event_type")))
      .groupBy($"event_type")
      .agg(max(when($"rn" === 2, $"diff")).as("boot_lo_ucents"),
        max(when($"rn" === $"cnt" - 1, $"diff")).as("boot_hi_ucents"),
        max($"cnt").as("n_reps_valid"))
    val point = users.groupBy($"event_type")
      .agg(
        count(when($"variant" === 0, 1)).as("n_a"),
        count(when($"variant" === 1, 1)).as("n_b"),
        sum(when($"variant" === 0, $"cents").otherwise(0L)).as("c_a"),
        sum(when($"variant" === 1, $"cents").otherwise(0L)).as("c_b"))
      .withColumn("diff_ucents", expr(
        """(cast(c_b as decimal(38,0)) * 1000000) div nullif(n_b, 0L)
          | - (cast(c_a as decimal(38,0)) * 1000000) div nullif(n_a, 0L)"""
          .stripMargin).cast("long"))
      .select($"event_type", ($"n_a" + $"n_b").as("n_users"), $"diff_ucents")
    point.join(ci, Seq("event_type"), "left_outer")
      .select($"event_type", $"n_users", $"diff_ucents",
        $"boot_lo_ucents", $"boot_hi_ucents",
        coalesce($"n_reps_valid", lit(0L)).as("n_reps_valid"))
      .orderBy($"event_type")
  }

  /** STREAMING BOOTSTRAP CELLS — the online arm of [[qAbBootstrap]]:
    * per event-time hour window, the (event_type, replicate, variant)
    * resample cells computed as ONE watermarked stateful aggregate, so
    * a per-window A/B diff WITH a bootstrap CI is available the moment
    * the watermark closes the window (append mode; the CI extraction —
    * rank the ≤ R diffs — is a stateless read over the emitted cells).
    * The resampling unit is the EVENT (weights drawn per (event_id,
    * replicate) from the SHARED [[bootWeightSql]] salt), not the user:
    * a user-unit bootstrap needs per-user totals first, and chaining a
    * second stateful aggregate behind them in update mode is
    * unsupported — the event-unit bootstrap is the standard streaming
    * variant and is exact for per-window mean-of-events metrics. The
    * 32× replicate fan-out happens scan-side BEFORE state: state is
    * one row per (window, type, replicate, variant) — fixed
    * cardinality per window, independent of event volume. */
  def bootstrapCellsHourly(events: DataFrame, tsCol: String,
      watermark: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("cents",
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .withColumn("variant", $"user_id" % 2)
      .withColumn("r", explode(expr(s"sequence(0L, ${BootReps - 1}L)")))
      .withColumn("w", expr(bootWeightSql("event_id")))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), $"event_type", $"r", $"variant")
      .agg(sum($"w").as("n"), sum($"w" * $"cents").as("wc"))
      .select($"window.start".as("window_start"), $"event_type", $"r",
        $"variant", $"n", $"wc")
  }

  /** The batch replay of [[bootstrapCellsHourly]]'s cell definition —
    * the spec pins stream == batch on one corpus. */
  private[graft] def bootstrapCellsBatch(events: DataFrame,
      tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("cents",
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .withColumn("variant", $"user_id" % 2)
      .withColumn("r", explode(expr(s"sequence(0L, ${BootReps - 1}L)")))
      .withColumn("w", expr(bootWeightSql("event_id")))
      .groupBy(window(col(tsCol), "1 hour"), $"event_type", $"r", $"variant")
      .agg(sum($"w").as("n"), sum($"w" * $"cents").as("wc"))
      .select($"window.start".as("window_start"), $"event_type", $"r",
        $"variant", $"n", $"wc")
  }

  // --- Bradley–Terry -------------------------------------------------

  /** Model count of the synthetic preference log (event_id % 5). */
  private[graft] val BtModels = 5
  /** MM iterations — fixed, so the fit is a deterministic function of
    * the win matrix in both engines. */
  private[graft] val BtIters = 8
  private val BtScale = 1000000L

  /** Per-comparison projection (lo, hi, lo_wins) — THE shared
    * synthesis + outcome definition: [[btMatrix]] (batch) and
    * [[prefMatrixStream]] (incremental) both aggregate exactly this,
    * so the two legs cannot disagree on who won a game. The synthetic
    * log: each event is one comparison between model a = event_id % 5
    * and b = (event_id div 5) % 5 (self-pairs dropped); the
    * lower-indexed model wins with true probability (lo+1)/(lo+hi+2)
    * — i.e. true strength of model i is (i+1) — decided by an md5
    * slice compared WITHOUT division: u·(lo+hi+2) < 16^6·(lo+1).
    * Stateless scan expressions, streaming-legal. Input columns ride
    * through (only the synthesis intermediates are dropped) so
    * downstream legs can key on `event_id` (the length-bias audit) or
    * the event time (the streaming monitors). */
  private[graft] def prefGames(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    prefGameCols(events).filter($"lo" =!= $"hi")
  }

  /** [[prefGames]] WITHOUT the self-pair filter — every input row
    * survives with its (lo, hi, lo_wins) columns (meaningless when
    * lo = hi). The streaming monitors aggregate over THIS stage with
    * a `lo <> hi` predicate inside the aggregate instead of a filter
    * operator: Catalyst pushes deterministic filters below the
    * `EventTimeWatermark` node, so a filter-shaped exclusion would
    * drop rows before they advance the watermark and a self-pair-only
    * micro-batch could never close a window (measured — the monitor
    * spec pins the fixed behavior). */
  private[graft] def prefGameCols(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val u = hex6ToLongSpark(
      "substring(md5(cast(concat('pref|', cast(event_id as string)) as binary)), 1, 6)")
    events
      .withColumn("a", expr("event_id % 5"))
      .withColumn("b", expr("(event_id div 5) % 5"))
      .withColumn("lo", least($"a", $"b"))
      .withColumn("hi", greatest($"a", $"b"))
      .withColumn("lo_wins",
        expr(s"$u * (lo + hi + 2) < ${1L << 24} * (lo + 1)"))
      .drop("a", "b")
  }

  /** The directed win matrix (i, j, n_ij, w_ij) for every ordered
    * pair that occurred — ONE groupBy over [[prefGames]] plus the
    * stateless directed expansion. */
  private[graft] def btMatrix(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val games = prefGames(events)
      .groupBy($"lo", $"hi")
      .agg(count(lit(1)).as("n"),
        sum(when($"lo_wins", 1L).otherwise(0L)).as("w_lo"))
    games.select($"lo".as("i"), $"hi".as("j"), $"n", $"w_lo".as("w"))
      .union(games.select($"hi".as("i"), $"lo".as("j"), $"n",
        ($"n" - $"w_lo").as("w")))
  }

  /** STREAMING WIN-MATRIX MAINTENANCE — the online half of
    * [[qPrefBradleyTerry]]: preference events arrive as a stream and
    * the UNDIRECTED win matrix (lo, hi, n, w_lo) is maintained as a
    * running keyed aggregate in update mode, each batch re-emitting
    * the pairs it touched (a last-write-wins sink keeps the current
    * matrix; the fit reads it whenever it wants fresh strengths —
    * rebuild ≡ maintained, the merge≡rebuild contract of the stored
    * index sinks). The outcome projection is the SHARED [[prefGames]]
    * definition. State is ONE row per (lo, hi) pair — M²-bounded by
    * the model catalog FOREVER, independent of stream length, so no
    * watermark is needed or wanted: a preference log never stops
    * counting. The directed expansion is stateless and happens at
    * read time ([[btMatrix]]'s union shape). */
  def prefMatrixStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    prefGames(events)
      .groupBy($"lo", $"hi")
      .agg(count(lit(1)).as("n"),
        sum(when($"lo_wins", 1L).otherwise(0L)).as("w_lo"))
  }

  /** The staged win matrix, memoized per (session, dir) — shared by
    * the fit and the transitivity audit, one materialization. */
  private def stagedMatrix(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.checkpointed(spark, s"labeling.btmat|$dir")(
      btMatrix(Tables.load(spark, dir, "events")))

  /** BRADLEY–TERRY RANKING from a pairwise preference log — the
    * RLHF-side "which model do raters prefer" fit. The log collapses
    * to a ≤ M²-row directed win matrix in ONE shuffle (staged — the
    * only data-proportional step at any corpus size); the strengths
    * are [[BtIters]] fixed-point iterations of the Zermelo/MM update
    * s_i ← W_i / Σ_j n_ij/(s_i+s_j), run on the collected matrix
    * (bounded metadata: M² rows for a fixed model catalog, the
    * zone-map-manifest collect pattern) in integer arithmetic at
    * scale 1e6, normalized to Σs = M·1e6 and clamped ≥ 1 each round —
    * the exact sequence the oracle replays as unrolled CTEs.
    * Output: model, games, wins, win_permille, strength_x1e6. */
  def qPrefBradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mat = stagedMatrix(spark, dir)
    val rows = mat.select($"i", $"j", $"n", $"w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val models = rows.map(_._1).distinct.sorted
    val wins = models.map(i => i -> rows.filter(_._1 == i).map(_._4).sum).toMap
    var s = models.map(_ -> BtScale).toMap
    for (_ <- 0 until BtIters) {
      val raw = models.map { i =>
        val d = rows.filter(_._1 == i)
          .map { case (_, j, n, _) => n * BtScale * BtScale / (s(i) + s(j)) }
          .sum
        i -> (if (d == 0) 1L
              else math.max(1L, wins(i) * BtScale * BtScale / d))
      }.toMap
      val tot = raw.values.sum
      s = raw.map { case (i, v) =>
        i -> math.max(1L, v * (models.length * BtScale) / tot)
      }
    }
    val strengths = models
      .map(i => (i, s(i))).toSeq.toDF("model", "strength_x1e6")
    mat.groupBy($"i".as("model"))
      .agg(sum($"n").as("games"), sum($"w").as("wins"))
      .withColumn("win_permille", expr("(wins * 1000) div games"))
      .join(broadcast(strengths), Seq("model"))
      .select($"model", $"games", $"wins", $"win_permille", $"strength_x1e6")
      .orderBy($"model")
  }

  // --- Fleiss' kappa --------------------------------------------------

  /** Per-rater flip rates (permille) of the 3 synthetic annotators —
    * rater 2 is the noisy one, which is what drags kappa visibly
    * below 1. */
  private[graft] val KappaNoisePermille = Seq(50L, 150L, 300L)
  private[graft] val KappaNoiseHex: Seq[String] =
    KappaNoisePermille.map(p => f"${p * (1L << 24) / 1000}%06x")

  /** Rater k's label for a doc, as SQL shared by both engines: true
    * label = doc_id % 3; with probability noise(k) (md5 slice below
    * the rater's threshold) the rater reports the systematically
    * biased label (true + 1 + k%2) % 3 — never the true one, so a
    * "flip" is always a disagreement. `engine` picks the md5-argument
    * spelling ("spark": binary cast; "duck": varchar concat) — the
    * hash input bytes are identical. */
  private def raterLabelSql(k: Int, engine: String): String = {
    val h = s"substring(md5(${if (engine == "spark") s"cast(concat('lab|$k|', cast(doc_id as string)) as binary)" else s"'lab|$k|' || CAST(doc_id AS VARCHAR)"}), 1, 6)"
    s"CASE WHEN $h < '${KappaNoiseHex(k)}' " +
      s"THEN (doc_id % 3 + ${1 + k % 2}) % 3 ELSE doc_id % 3 END"
  }

  /** FLEISS' KAPPA — chance-corrected agreement of 3 synthetic raters
    * over the document corpus, per source (the labeled-data QA gate:
    * a source whose annotations don't beat chance shouldn't train a
    * reward model). Labels are per-row expressions; per-doc agreeing
    * pairs = (Σ_c n_c² − 3) / 2 of 3 rater pairs; one groupBy(source)
    * produces P_o, P_e and kappa in ppm with truncating division —
    * all integer, oracle-replayed verbatim. */
  def qLabelKappa(spark: SparkSession, dir: String): DataFrame =
    kappaOf(Tables.load(spark, dir, "documents"))

  /** Adds the three raters' labels (`l0`..`l2`) to any frame with a
    * `doc_id` — THE shared projection behind kappa, majority vote,
    * rater quality and the streaming annotation monitor: every
    * consumer of "what did the raters say" reads one definition. */
  private[graft] def withRaterLabels(df: DataFrame): DataFrame =
    df.withColumn("l0", expr(raterLabelSql(0, "spark")))
      .withColumn("l1", expr(raterLabelSql(1, "spark")))
      .withColumn("l2", expr(raterLabelSql(2, "spark")))

  /** Core of [[qLabelKappa]] over any (doc_id, source) frame —
    * separated so the perfect-agreement fixture spec can drive it
    * with doc_ids chosen to draw no flips. */
  private[graft] def kappaOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val labeled = withRaterLabels(docs)
    val withCounts = labeled
      .withColumn("n0", expr("cast(l0 = 0 as bigint) + cast(l1 = 0 as bigint) + cast(l2 = 0 as bigint)"))
      .withColumn("n1", expr("cast(l0 = 1 as bigint) + cast(l1 = 1 as bigint) + cast(l2 = 1 as bigint)"))
      .withColumn("n2", expr("cast(l0 = 2 as bigint) + cast(l1 = 2 as bigint) + cast(l2 = 2 as bigint)"))
      .withColumn("pairs", expr("(n0*n0 + n1*n1 + n2*n2 - 3) div 2"))
    withCounts.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"pairs").as("sum_pairs"),
        sum($"n0").as("c0"), sum($"n1").as("c1"), sum($"n2").as("c2"))
      .withColumn("po_ppm", expr("(sum_pairs * 1000000) div (3 * n_docs)"))
      .withColumn("pe_ppm", expr(
        """cast((cast(c0 as decimal(38,0)) * c0 + cast(c1 as decimal(38,0)) * c1
          |  + cast(c2 as decimal(38,0)) * c2) * 1000000
          |  div (cast(n_docs as decimal(38,0)) * n_docs * 9) as bigint)"""
          .stripMargin))
      .withColumn("kappa_ppm", expr(
        "((po_ppm - pe_ppm) * 1000000) div nullif(1000000 - pe_ppm, 0L)"))
      .select($"source", $"n_docs", $"po_ppm", $"pe_ppm", $"kappa_ppm")
      .orderBy($"source")
  }

  /** MAJORITY-VOTE LABEL AGGREGATION — the step after kappa: collapse
    * the 3 raters' labels to one training label per doc and audit the
    * result per source against the known true label (majority = the
    * label ≥ 2 raters chose; a 1/1/1 three-way tie aggregates to the
    * −1 sentinel and can never be correct). Kappa says whether raters
    * agree; this says whether the AGGREGATED labels are accurate
    * enough to train on. Same per-row label expressions, one
    * groupBy(source). */
  def qLabelMajority(spark: SparkSession, dir: String): DataFrame =
    majorityOf(Tables.load(spark, dir, "documents"))

  private[graft] def majorityOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withRaterLabels(docs)
      .withColumn("majority", expr(
        """CASE WHEN l0 = l1 OR l0 = l2 THEN l0
          |     WHEN l1 = l2 THEN l1 ELSE -1L END""".stripMargin))
      .withColumn("margin", expr(
        """cast(l0 = l1 as bigint) + cast(l0 = l2 as bigint)
          |  + cast(l1 = l2 as bigint)""".stripMargin))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr("margin = 3"), 1L).otherwise(0L)).as("n_unanimous"),
        sum(when(expr("margin = 1"), 1L).otherwise(0L)).as("n_split_2_1"),
        sum(when(expr("margin = 0"), 1L).otherwise(0L)).as("n_tied"),
        sum(when(expr("majority = doc_id % 3"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000) div n_docs"))
      .select($"source", $"n_docs", $"n_unanimous", $"n_split_2_1",
        $"n_tied", $"n_correct", $"acc_ppm")
      .orderBy($"source")
  }

  /** TEMPORAL-SPLIT ENTITY LEAKAGE — the eval-hygiene audit for
    * event-sequence models: split the event log at the 80% point of
    * its time range (train before, test after — the standard temporal
    * holdout) and measure, per event type, how many TEST-period users
    * also act in the TRAIN period and what share of test events they
    * produce. A user-level model evaluated on returning users is
    * partially memorizing, not generalizing — this quantifies how
    * much of the holdout that concern covers.
    *
    * Shape: the cutoff is a 1-row min/max broadcast (integer-µs
    * arithmetic, engine-shared); sides are scan expressions; then one
    * (type, user) combine and one type rollup. */
  def qTimeSplitOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    val bounds = events.agg(
      min(unix_micros($"ts")).as("t_min"), max(unix_micros($"ts")).as("t_max"))
    val sided = events.crossJoin(broadcast(bounds))
      .withColumn("cut_us", expr("t_min + ((t_max - t_min) * 4) div 5"))
      .withColumn("side",
        when(unix_micros($"ts") < $"cut_us", "train").otherwise("test"))
    val users = sided.groupBy($"event_type", $"user_id")
      .agg(max(when($"side" === "train", 1L).otherwise(0L)).as("in_train"),
        sum(when($"side" === "test", 1L).otherwise(0L)).as("test_events"))
    users.groupBy($"event_type")
      .agg(sum($"in_train").as("n_train_users"),
        sum(when($"test_events" > 0, 1L).otherwise(0L)).as("n_test_users"),
        sum(when($"test_events" > 0 && $"in_train" === 1L, 1L).otherwise(0L))
          .as("n_overlap_users"),
        sum($"test_events").as("n_test_events"),
        sum(when($"in_train" === 1L, $"test_events").otherwise(0L))
          .as("n_leaky_test_events"))
      .withColumn("user_overlap_ppm", expr(
        "(n_overlap_users * 1000000) div nullif(n_test_users, 0L)"))
      .withColumn("event_overlap_ppm", expr(
        "(n_leaky_test_events * 1000000) div nullif(n_test_events, 0L)"))
      .orderBy($"event_type")
  }

  /** PREFERENCE TRANSITIVITY AUDIT — Bradley–Terry ASSUMES a total
    * strength order; real preference logs contain cycles (judges that
    * prefer A>B>C>A), and a fit over a cyclic log silently averages
    * them away. Per model triple i<j<k: the majority direction of each
    * pair (+1 lower-indexed wins, −1 loses, 0 exact tie) and whether
    * the triple is CYCLIC (directions consistent with no linear
    * order). The synthetic log's true strengths are linear, so cycles
    * here are sampling noise — the audit quantifies how much the MM
    * fit is smoothing over. Reads the SAME staged matrix as the fit
    * (one materialization per session); the triple lattice is
    * C(M,3) = 10 rows via two equi-joins on the tiny pair frame. */
  def qPrefTransitivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // undirected rows (i < j) with the majority direction
    val pairs = stagedMatrix(spark, dir)
      .filter($"i" < $"j")
      .select($"i", $"j",
        expr("CASE WHEN w * 2 > n THEN 1L WHEN w * 2 < n THEN -1L ELSE 0L END")
          .as("dir"))
    val ij = pairs.select($"i".as("ti"), $"j".as("tj"), $"dir".as("dir_ij"))
    val jk = pairs.select($"i".as("tj2"), $"j".as("tk"), $"dir".as("dir_jk"))
    val ik = pairs.select($"i".as("ti2"), $"j".as("tk2"), $"dir".as("dir_ik"))
    ij.join(jk, $"tj" === $"tj2")
      .join(ik, $"ti" === $"ti2" && $"tk" === $"tk2")
      .select($"ti".as("i"), $"tj".as("j"), $"tk".as("k"),
        $"dir_ij", $"dir_jk", $"dir_ik")
      .withColumn("cyclic", expr(
        """(dir_ij = 1 AND dir_jk = 1 AND dir_ik = -1)
          | OR (dir_ij = -1 AND dir_jk = -1 AND dir_ik = 1)""".stripMargin))
      .orderBy($"i", $"j", $"k")
  }

  /** ONE-STEP DAWID–SKENE RATER QUALITY — the crowdsourcing E-step
    * readout: score each rater against the CONSENSUS (majority over
    * non-tied docs) and against the known truth, side by side. The
    * Dawid & Skene (1979) insight this demonstrates is that consensus
    * agreement estimates true accuracy without gold labels — the two
    * ppm columns land close, and their gap is the estimator's bias on
    * a 3-rater panel. Ties (majority = −1) are excluded from scoring,
    * reported per rater as `n_tied_excluded`. One scan (labels +
    * majority as row expressions, 3-way posexplode) and one 3-row
    * rollup. */
  def qLabelRaterQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lab = withRaterLabels(Tables.load(spark, dir, "documents"))
      .withColumn("majority", expr(
        """CASE WHEN l0 = l1 OR l0 = l2 THEN l0
          |     WHEN l1 = l2 THEN l1 ELSE -1L END""".stripMargin))
      .select($"doc_id", $"majority",
        posexplode(array($"l0", $"l1", $"l2")).as(Seq("rater", "label")))
    lab.groupBy($"rater".cast("long").as("rater"))
      .agg(
        sum(when($"majority" >= 0, 1L).otherwise(0L)).as("n_scored"),
        sum(when($"majority" < 0, 1L).otherwise(0L)).as("n_tied_excluded"),
        sum(when($"majority" >= 0 && $"label" === $"majority", 1L)
          .otherwise(0L)).as("n_agree"),
        sum(when($"majority" >= 0 && $"label" === expr("doc_id % 3"), 1L)
          .otherwise(0L)).as("n_true"))
      .withColumn("acc_vs_consensus_ppm",
        expr("(n_agree * 1000000) div nullif(n_scored, 0L)"))
      .withColumn("acc_vs_truth_ppm",
        expr("(n_true * 1000000) div nullif(n_scored, 0L)"))
      .orderBy($"rater")
  }

  /** SFT PROMPT-CONFLICT AUDIT — the instruction-data hygiene check:
    * documents sharing a prompt key (the SAME 8-token
    * `Dedup.headFingerprint` the incremental-dedup layers key on)
    * but diverging afterwards are "same instruction, different
    * response" groups — exact duplicates merely waste tokens, but
    * CONFLICTING responses to one prompt actively teach a reward
    * model noise, so the two verdicts are separated. Per collided
    * prompt: group size, distinct full responses, distinct sources
    * (cross-source conflicts are usually scraper mirrors, not real
    * disagreement), and the verdict. One groupBy on the 16-byte
    * prompt digest — the exact-dedup shuffle shape. */
  def qSftPromptConflicts(spark: SparkSession, dir: String): DataFrame =
    sftPromptConflicts(Tables.load(spark, dir, "documents"))

  private[graft] def sftPromptConflicts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("prompt_fp", graft.dedup.Dedup.headFingerprint($"text"))
      .withColumn("resp_fp", md5($"text".cast("binary")))
      .groupBy($"prompt_fp")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct($"resp_fp").as("n_responses"),
        count_distinct($"source").as("n_sources"),
        min($"doc_id").as("first_doc_id"))
      .filter($"n_docs" >= 2)
      .withColumn("verdict",
        when($"n_responses" > 1, "conflict").otherwise("exact_dup"))
      .select($"prompt_fp", $"n_docs", $"n_responses", $"n_sources",
        $"first_doc_id", $"verdict")
      .orderBy($"prompt_fp")
  }

  /** STREAMING ANNOTATION-QUALITY MONITOR — Fleiss' kappa per
    * event-time window over a live labeling stream (one row per
    * labeled doc carrying the panel's 3 labels via the SHARED
    * [[withRaterLabels]] projection): per-doc agreement pairs are
    * row expressions, so the whole window readout is ONE watermarked
    * append-mode aggregate — state is one sum-tuple per open window —
    * and P_o/P_e/κ derive statelessly from the emitted sums with the
    * SAME ppm arithmetic as the batch query. The monitor a labeling
    * vendor dashboard needs: a window whose κ drops is a rater (or
    * instruction change) gone wrong, caught while the batch is still
    * open for re-work. */
  def kappaHourly(docs: DataFrame, tsCol: String,
      watermark: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withRaterLabels(docs)
      .withColumn("n0", expr("cast(l0 = 0 as bigint) + cast(l1 = 0 as bigint) + cast(l2 = 0 as bigint)"))
      .withColumn("n1", expr("cast(l0 = 1 as bigint) + cast(l1 = 1 as bigint) + cast(l2 = 1 as bigint)"))
      .withColumn("n2", expr("cast(l0 = 2 as bigint) + cast(l1 = 2 as bigint) + cast(l2 = 2 as bigint)"))
      .withColumn("pairs", expr("(n0*n0 + n1*n1 + n2*n2 - 3) div 2"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"pairs").as("sum_pairs"),
        sum($"n0").as("c0"), sum($"n1").as("c1"), sum($"n2").as("c2"))
      .withColumn("po_ppm", expr("(sum_pairs * 1000000) div (3 * n_docs)"))
      .withColumn("pe_ppm", expr(
        """cast((cast(c0 as decimal(38,0)) * c0 + cast(c1 as decimal(38,0)) * c1
          |  + cast(c2 as decimal(38,0)) * c2) * 1000000
          |  div (cast(n_docs as decimal(38,0)) * n_docs * 9) as bigint)"""
          .stripMargin))
      .withColumn("kappa_ppm", expr(
        "((po_ppm - pe_ppm) * 1000000) div nullif(1000000 - pe_ppm, 0L)"))
      .select($"window.start".as("window_start"), $"n_docs",
        $"po_ppm", $"pe_ppm", $"kappa_ppm")
  }

  // --- pass@k, length bias, token F1 ----------------------------------

  /** Attempts per eval task. */
  private[graft] val PassAttempts = 10
  /** The k values reported — pass@1 / pass@5 / pass@10. */
  private[graft] val PassKs = Seq(1, 5, 10)

  /** Exact binomial coefficient — tiny arguments (≤ [[PassAttempts]]),
    * shared by the Spark CASE, the DuckDB CASE and the spec replay so
    * all three read one table. */
  private[graft] def comb(m: Int, k: Int): Long =
    if (k < 0 || k > m) 0L
    else (1 to k).foldLeft(1L)((acc, i) => acc * (m - k + i) / i)

  /** Indicator (as SQL shared by both engines up to the md5-argument
    * spelling) that attempt `a` on task `doc_id` succeeded: success
    * probability is (d+1)/8 for difficulty d = doc_id % 4, decided
    * divisionlessly as u·8 < 16^6·(d+1). */
  private def passIndicator(a: Int, engine: String): String = {
    val md5Arg =
      if (engine == "spark")
        s"cast(concat('pass|$a|', cast(doc_id as string)) as binary)"
      else s"'pass|$a|' || CAST(doc_id AS VARCHAR)"
    val u =
      if (engine == "spark") hex6ToLongSpark(s"substring(md5($md5Arg), 1, 6)")
      else hex6ToLongDuck(s"substring(md5($md5Arg), 1, 6)")
    val cast = if (engine == "spark") "bigint" else "BIGINT"
    s"cast($u * 8 < ${1L << 24} * (doc_id % 4 + 1) as $cast)"
  }

  /** CASE mapping the per-task success count c to C(n−c, k) — the
    * numerator of the unbiased pass@k estimator, generated from
    * [[comb]] for both engines (the ELSE 0 arm is unreachable: c is a
    * sum of n indicators). */
  private def combCaseSql(k: Int, suffix: String): String =
    (0 to PassAttempts)
      .map(c => s"WHEN c = $c THEN ${comb(PassAttempts - c, k)}$suffix")
      .mkString("CASE ", " ", s" ELSE 0$suffix END")

  /** PASS@K EVAL SCORING — the unbiased estimator of Chen et al. 2021
    * ("Evaluating Large Language Models Trained on Code", §2.1): with
    * n attempts per task of which c succeed, pass@k per task is
    * 1 − C(n−c, k)/C(n, k), and the corpus estimate is its mean over
    * tasks. Every document is one synthetic eval task with difficulty
    * d = doc_id % 4 (success probability (d+1)/8 per attempt); the
    * n = 10 attempt outcomes are md5-slice draws computed as TEN row
    * expressions — no explode, no shuffle until the per-source rollup.
    * The mean needs no per-task truncation: C(n, k) is constant, so
    * Σ_tasks C(n−c, k) is an integer and
    * pass@k = ((N·C(n,k) − ΣC(n−c,k)) · 1e6) div (N·C(n,k)) exactly,
    * identical in both engines. Output per source: task count and
    * pass@1/5/10 in ppm (monotone in k by construction). */
  def qEvalPassAtK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cExpr = (0 until PassAttempts)
      .map(passIndicator(_, "spark")).mkString(" + ")
    val withC = Tables.load(spark, dir, "documents")
      .withColumn("c", expr(cExpr))
    val aggs = PassKs.map(k =>
      sum(expr(combCaseSql(k, "L"))).as(s"s$k"))
    val rolled = withC.groupBy($"source")
      .agg(count(lit(1)).as("n_tasks"), aggs: _*)
    PassKs.foldLeft(rolled) { (df, k) =>
      val cnk = comb(PassAttempts, k)
      df.withColumn(s"pass${k}_ppm",
        expr(s"((n_tasks * $cnk - s$k) * 1000000) div (n_tasks * $cnk)"))
    }
      .select($"source" +: $"n_tasks" +:
        PassKs.map(k => col(s"pass${k}_ppm")): _*)
      .orderBy($"source")
  }

  /** STREAMING PASS@K MONITOR — [[qEvalPassAtK]] per event-time hour
    * window over a live eval-result stream (one row per finished task,
    * the n = 10 attempt outcomes already computable from the task id):
    * the per-task success count and the three C(n−c, k) numerators are
    * the SAME row expressions as the batch query, so the window
    * readout is ONE watermarked append-mode aggregate (state = one
    * sum-tuple per open (window, source)) and the pass@k ppm derive
    * statelessly from the emitted sums by the batch query's exact
    * integer arithmetic. The eval dashboard a capability regression
    * shows up on first: a window whose pass@k drops is a model or
    * harness change, visible while the eval batch is still running. */
  def passAtKHourly(docs: DataFrame, tsCol: String,
      watermark: String): DataFrame =
    passAtKWindowed(docs.withWatermark(tsCol, watermark), tsCol)

  /** The batch replay of [[passAtKHourly]] — the spec pins
    * stream == batch on one corpus. */
  private[graft] def passAtKHourlyBatch(docs: DataFrame,
      tsCol: String): DataFrame = passAtKWindowed(docs, tsCol)

  /** One shared plan for the streaming monitor and its batch replay —
    * the c/numerator expressions are [[qEvalPassAtK]]'s, the grouping
    * is the event-time window instead of the source. */
  private def passAtKWindowed(docs: DataFrame, tsCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cExpr = (0 until PassAttempts)
      .map(passIndicator(_, "spark")).mkString(" + ")
    val aggs = PassKs.map(k => sum(expr(combCaseSql(k, "L"))).as(s"s$k"))
    val rolled = docs
      .withColumn("c", expr(cExpr))
      .groupBy(window(col(tsCol), "1 hour"), $"source")
      .agg(count(lit(1)).as("n_tasks"), aggs: _*)
    PassKs.foldLeft(rolled) { (df, k) =>
      val cnk = comb(PassAttempts, k)
      df.withColumn(s"pass${k}_ppm",
        expr(s"((n_tasks * $cnk - s$k) * 1000000) div (n_tasks * $cnk)"))
    }
      .select($"window.start".as("window_start") +: $"source" +:
        $"n_tasks" +: PassKs.map(k => col(s"pass${k}_ppm")): _*)
  }

  /** Per-game response lengths for both sides — the shared projection
    * behind the batch length-bias audit and its streaming monitor.
    * Lengths are md5 draws PLANTED with the real-world confound the
    * audit exists to catch: stronger models are more verbose
    * (len = 100 + model·50 + u mod 200, overlapping bands), and since
    * strength drives wins, "longer response wins" shows up without any
    * rater length preference in the generator — exactly the
    * correlation a verbosity audit flags for a causal follow-up. */
  private[graft] def withLengthBiasCols(events: DataFrame): DataFrame =
    lengthBiasCols(prefGames(events))

  /** The length/verdict columns over an already-projected game frame —
    * shared by the filtered batch path and the unfiltered monitor
    * path. */
  private def lengthBiasCols(games: DataFrame): DataFrame = {
    def lenSql(side: String): String = {
      val u = hex6ToLongSpark(
        s"substring(md5(cast(concat('len|', cast($side as string), '|', " +
          "cast(event_id as string)) as binary)), 1, 6)")
      s"100L + $side * 50L + $u % 200L"
    }
    games
      .withColumn("len_lo", expr(lenSql("lo")))
      .withColumn("len_hi", expr(lenSql("hi")))
      .withColumn("gap_bucket", expr("abs(len_lo - len_hi) div 50"))
      .withColumn("is_len_tie", expr("len_lo = len_hi"))
      .withColumn("longer_wins", expr(
        "(len_lo > len_hi AND lo_wins) OR (len_hi > len_lo AND NOT lo_wins)"))
  }

  /** PREFERENCE LENGTH-BIAS AUDIT — the RLHF verbosity check: does the
    * LONGER response win more often than chance, and does the effect
    * grow with the length gap? A reward model fit on a length-biased
    * log learns verbosity as a reward. Per length-gap bucket (50-char
    * bands): games, exact-length ties, longer-side wins, and the
    * longer-win rate in permille (ties excluded from the rate).
    * Everything up to the ≤ 9-row bucket rollup is scan expressions
    * over the shared [[prefGames]] outcome + [[withLengthBiasCols]]
    * length draws — one shuffle at any log size. */
  def qPrefLengthBias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withLengthBiasCols(Tables.load(spark, dir, "events"))
      .groupBy($"gap_bucket")
      .agg(count(lit(1)).as("n_games"),
        sum(when($"is_len_tie", 1L).otherwise(0L)).as("n_len_ties"),
        sum(when($"longer_wins", 1L).otherwise(0L)).as("n_longer_wins"))
      .withColumn("longer_win_permille", expr(
        "(n_longer_wins * 1000) div nullif(n_games - n_len_ties, 0L)"))
      .orderBy($"gap_bucket")
  }

  /** STREAMING LENGTH-BIAS MONITOR — [[qPrefLengthBias]] folded to a
    * per-event-time-hour dashboard row: games, ties, longer-side wins
    * and the longer-win rate per window, as ONE watermarked
    * append-mode aggregate over the SAME shared projection (state =
    * one sum-tuple per open window; the permille derives statelessly
    * from the emitted sums). The live view of the same verdict: a
    * window whose longer-win rate jumps is a rater pool or generation
    * config drifting toward verbosity preference, caught while the
    * batch is still re-workable. */
  def lengthBiasHourly(events: DataFrame, tsCol: String,
      watermark: String): DataFrame =
    lengthBiasWindowed(events.withWatermark(tsCol, watermark), tsCol)

  /** The batch replay of [[lengthBiasHourly]]'s window readout — the
    * spec pins stream == batch on one corpus. */
  private[graft] def lengthBiasHourlyBatch(events: DataFrame,
      tsCol: String): DataFrame = lengthBiasWindowed(events, tsCol)

  /** One shared plan for the streaming monitor and its batch replay
    * (the [[passAtKWindowed]] pattern). Self-pairs are excluded by a
    * PREDICATE inside the aggregate, never a filter operator — a
    * pushed-down filter would drop rows below the watermark node and
    * a micro-batch of only non-game events could then never advance
    * event time (see [[prefGameCols]]); this way every ingested event
    * is a watermark heartbeat, and a window with zero games still
    * reports its zero row. */
  private def lengthBiasWindowed(events: DataFrame,
      tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    lengthBiasCols(prefGameCols(events))
      .withColumn("is_game", $"lo" =!= $"hi")
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(sum(when($"is_game", 1L).otherwise(0L)).as("n_games"),
        sum(when($"is_game" && $"is_len_tie", 1L).otherwise(0L))
          .as("n_len_ties"),
        sum(when($"is_game" && $"longer_wins", 1L).otherwise(0L))
          .as("n_longer_wins"))
      .select($"window.start".as("window_start"), $"n_games",
        $"n_len_ties", $"n_longer_wins",
        expr("(n_longer_wins * 1000) div nullif(n_games - n_len_ties, 0L)")
          .as("longer_win_permille"))
  }

  /** Reference length (tokens) for the F1 scorer. */
  private[graft] val F1RefTokens = 16

  /** TOKEN-LEVEL F1 EVAL SCORING — the SQuAD-style reference-overlap
    * metric run as a corpus job: per doc the reference is the first
    * [[F1RefTokens]] whitespace tokens, the "model prediction" is a
    * synthetic noisy copy (per position, an md5 hex digit drops the
    * token on '0'/'1' — p = 1/8 — or substitutes a wrong token on
    * '2' — p = 1/16), and F1 = 2·|multiset overlap| / (|pred| + |ref|).
    * Per source both aggregations of the per-doc scores: micro
    * (corpus-pooled counts — one exact integer ratio) and macro (mean
    * of per-doc ppm scores; the per-doc truncation is the SHARED
    * convention, applied identically by the oracle).
    *
    * Shape: tokens explode once; ref and pred rows stack into one
    * (doc, token) combine (map-side) giving min(cnt_r, cnt_p) overlap
    * terms; then a doc rollup and a source rollup. No joins — the
    * multiset intersection is conditional counting on the stacked
    * frame. */
  def qEvalTokenF1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = "substring(md5(cast(concat('f1|', cast(doc_id as string), '|', " +
      "cast(pos as string)) as binary)), 1, 1)"
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source",
        posexplode(expr(s"slice(split(text, ' '), 1, $F1RefTokens)"))
          .as(Seq("pos", "tok")))
      .withColumn("pred", expr(
        s"""CASE WHEN $h IN ('0', '1') THEN NULL
           |     WHEN $h = '2' THEN 'xx' ELSE tok END""".stripMargin))
    val stacked = toks.select($"doc_id", $"source",
        explode(array(
          struct($"tok".as("t"), lit("r").as("kind")),
          struct($"pred".as("t"), lit("p").as("kind")))).as("e"))
      .select($"doc_id", $"source", $"e.t".as("t"), $"e.kind".as("kind"))
      .filter($"t".isNotNull)
    val perDoc = stacked
      .groupBy($"doc_id", $"source", $"t")
      .agg(sum(when($"kind" === "r", 1L).otherwise(0L)).as("cnt_r"),
        sum(when($"kind" === "p", 1L).otherwise(0L)).as("cnt_p"))
      .groupBy($"doc_id", $"source")
      .agg(sum(least($"cnt_r", $"cnt_p")).as("overlap"),
        sum($"cnt_r").as("len_r"), sum($"cnt_p").as("len_p"))
      .withColumn("f1_ppm", expr(
        "(2 * overlap * 1000000) div nullif(len_r + len_p, 0L)"))
    perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"overlap").as("sum_overlap"),
        sum($"len_r").as("sum_len_r"), sum($"len_p").as("sum_len_p"),
        sum($"f1_ppm").as("sum_f1"))
      .withColumn("micro_f1_ppm", expr(
        "(2 * sum_overlap * 1000000) div nullif(sum_len_r + sum_len_p, 0L)"))
      .withColumn("macro_f1_ppm", expr("sum_f1 div n_docs"))
      .select($"source", $"n_docs", $"micro_f1_ppm", $"macro_f1_ppm")
      .orderBy($"source")
  }

  // --- Best-of-N, SFT turn audit ---------------------------------------

  /** Reward samples per eval task. */
  private[graft] val BonSamples = 10
  /** The n values of the Best-of-N scaling curve. */
  private[graft] val BonNs = Seq(1, 2, 4, 8)

  /** Sample `a`'s reward on task `doc_id` — an md5 draw in [0, 999]
    * whose floor rises with task "difficulty" (doc_id % 4), so the
    * per-source curves separate. Same SQL both engines up to the
    * md5-argument spelling. */
  private def bonRewardSql(a: Int, engine: String): String = {
    val md5Arg =
      if (engine == "spark")
        s"cast(concat('bon|$a|', cast(doc_id as string)) as binary)"
      else s"'bon|$a|' || CAST(doc_id AS VARCHAR)"
    val u =
      if (engine == "spark") hex6ToLongSpark(s"substring(md5($md5Arg), 1, 6)")
      else hex6ToLongDuck(s"substring(md5($md5Arg), 1, 6)")
    s"($u % 600 + (doc_id % 4) * 100)"
  }

  /** BEST-OF-N REWARD SCALING CURVE — the order-statistics estimator
    * (Nakano et al. 2021, WebGPT appendix; the pass@k construction
    * applied to E[max]): from N observed rewards per task, the
    * unbiased estimate of the expected best of a random n-subset is
    * Σ_{i=n..N} r_(i)·C(i−1, n−1) / C(N, n) over the ascending order
    * statistics r_(i) — how much reward best-of-n sampling buys at
    * each n is THE capability-vs-inference-cost readout an RLHF
    * pipeline tracks. The N = 10 rewards, the sort and every
    * numerator are ONE row expression (`array_sort` of 10 md5 draws,
    * no explode); Σ_i C(i−1, n−1) = C(N, n), so the per-source mean
    * is one exact integer ratio — numerators summed, ONE division at
    * the rollup, no per-task truncation, [[comb]] shared with pass@k
    * and the oracle. Output per source: the curve in milli-reward
    * units, monotone in n by construction. */
  def qEvalBestOfN(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rewards = (0 until BonSamples).map(bonRewardSql(_, "spark"))
    val withNums = BonNs.foldLeft(
      Tables.load(spark, dir, "documents")
        .withColumn("rs", expr(s"array_sort(array(${rewards.mkString(", ")}))"))
    ) { (df, n) =>
      df.withColumn(s"num$n", expr(
        (n to BonSamples)
          .map(i => s"element_at(rs, $i) * ${comb(i - 1, n - 1)}L")
          .mkString(" + ")))
    }
    val aggs = BonNs.map(n => sum(col(s"num$n")).as(s"s$n"))
    val rolled = withNums.groupBy($"source")
      .agg(count(lit(1)).as("n_tasks"), aggs: _*)
    BonNs.foldLeft(rolled) { (df, n) =>
      df.withColumn(s"bon${n}_milli", expr(
        s"(s$n * 1000) div (n_tasks * ${comb(BonSamples, n)})"))
    }
      .select($"source" +: $"n_tasks" +:
        BonNs.map(n => col(s"bon${n}_milli")): _*)
      .orderBy($"source")
  }

  /** The k values of the self-consistency curve — odd, so majority
    * vote never ties. */
  private[graft] val ConsKs = Seq(1, 3, 5)

  /** Numerator table of the unbiased cons@k estimator: with c of
    * [[PassAttempts]] samples correct, the number of k-subsets whose
    * majority is correct is Σ_{j>k/2} C(c, j)·C(n−c, k−j) — shared by
    * Spark, DuckDB and the spec replay via [[comb]]. */
  private[graft] def consNum(c: Int, k: Int): Long =
    ((k / 2 + 1) to k)
      .map(j => comb(c, j) * comb(PassAttempts - c, k - j)).sum

  private def consCaseSql(k: Int, suffix: String): String =
    (0 to PassAttempts)
      .map(c => s"WHEN c = $c THEN ${consNum(c, k)}$suffix")
      .mkString("CASE ", " ", s" ELSE 0$suffix END")

  /** SELF-CONSISTENCY CONS@K — the majority-vote companion of pass@k
    * (Wang et al. 2023, "Self-Consistency Improves Chain of Thought
    * Reasoning"): the probability that the MAJORITY of k sampled
    * answers is correct, estimated unbiasedly from the n = 10
    * observed attempts as Σ_{j>k/2} C(c,j)·C(n−c,k−j) / C(n,k) per
    * task (k odd — no ties). Unlike pass@k this is NOT monotone in k:
    * sampling more helps exactly the tasks whose per-sample success
    * rate clears ½ and hurts the rest, which is the decision the
    * readout informs (is majority voting worth k× inference here?).
    * Same shape as [[qEvalPassAtK]]: the same 10 md5 attempt draws,
    * a different combinatorial CASE, one rollup, one exact division.
    * cons@1 ≡ pass@1 by construction — the spec pins the identity. */
  def qEvalConsAtK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cExpr = (0 until PassAttempts)
      .map(passIndicator(_, "spark")).mkString(" + ")
    val withC = Tables.load(spark, dir, "documents")
      .withColumn("c", expr(cExpr))
    val aggs = ConsKs.map(k => sum(expr(consCaseSql(k, "L"))).as(s"s$k"))
    val rolled = withC.groupBy($"source")
      .agg(count(lit(1)).as("n_tasks"), aggs: _*)
    ConsKs.foldLeft(rolled) { (df, k) =>
      val cnk = comb(PassAttempts, k)
      df.withColumn(s"cons${k}_ppm",
        expr(s"(s$k * 1000000) div (n_tasks * $cnk)"))
    }
      .select($"source" +: $"n_tasks" +:
        ConsKs.map(k => col(s"cons${k}_ppm")): _*)
      .orderBy($"source")
  }

  /** Per-game projection of the judged pairwise eval with PLANTED
    * position bias — the shared definition behind the audit and the
    * spec replay. Each event is one judged comparison: presentation
    * order is an md5 coin, and the judge gives the FIRST-position
    * response a +1 strength bonus (the documented LLM-judge failure
    * mode, Zheng et al. 2023 §3.1), so P(first wins) =
    * (first+2)/(lo+hi+3), decided divisionlessly. */
  private[graft] def judgedGames(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val uPos = hex6ToLongSpark(
      "substring(md5(cast(concat('pos|', cast(event_id as string)) as binary)), 1, 6)")
    val uOut = hex6ToLongSpark(
      "substring(md5(cast(concat('jout|', cast(event_id as string)) as binary)), 1, 6)")
    events
      .withColumn("a", expr("event_id % 5"))
      .withColumn("b", expr("(event_id div 5) % 5"))
      .filter($"a" =!= $"b")
      .withColumn("lo", least($"a", $"b"))
      .withColumn("hi", greatest($"a", $"b"))
      .withColumn("lo_first", expr(s"$uPos % 2 = 0"))
      .withColumn("first", expr("IF(lo_first, lo, hi)"))
      .withColumn("second", expr("IF(lo_first, hi, lo)"))
      .withColumn("first_wins",
        expr(s"$uOut * (lo + hi + 3) < ${1L << 24} * (first + 2)"))
      .withColumn("lo_wins", expr("lo_first = first_wins"))
      .select($"event_id", $"lo", $"hi", $"lo_first", $"first_wins", $"lo_wins")
  }

  /** LLM-JUDGE POSITION-BIAS AUDIT — pairwise judged evals prefer the
    * first-presented response (Zheng et al. 2023); a leaderboard read
    * off raw judgments inherits that bias, and the standard mitigation
    * is to swap presentation orders and average. Per model pair: games
    * by presentation order, the lo-side win rate in EACH order, the
    * raw first-position win rate (the bias readout — ~500‰ means no
    * bias), and the swap-debiased lo-side rate ((rate_when_first +
    * rate_when_second) div 2 — each model judged in each seat equally
    * often, so the seat bonus cancels). Scan expressions over the
    * shared [[judgedGames]] projection + one ≤ C(M,2)-row rollup. */
  def qJudgePositionBias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    judgedGames(Tables.load(spark, dir, "events"))
      .groupBy($"lo", $"hi")
      .agg(count(lit(1)).as("n_games"),
        sum(when($"lo_first", 1L).otherwise(0L)).as("n_lo_first"),
        sum(when($"first_wins", 1L).otherwise(0L)).as("n_first_wins"),
        sum(when($"lo_first" && $"lo_wins", 1L).otherwise(0L))
          .as("lo_wins_when_first"),
        sum(when(!$"lo_first" && $"lo_wins", 1L).otherwise(0L))
          .as("lo_wins_when_second"))
      .withColumn("first_win_permille",
        expr("(n_first_wins * 1000) div n_games"))
      .withColumn("debiased_lo_permille", expr(
        """((lo_wins_when_first * 1000) div nullif(n_lo_first, 0L)
          | + (lo_wins_when_second * 1000)
          |   div nullif(n_games - n_lo_first, 0L)) div 2""".stripMargin))
      .orderBy($"lo", $"hi")
  }

  /** REWARD–QUALITY RANK CORRELATION — the reward-hacking smoke test:
    * Spearman rank correlation (ppm) between a reward-model score and
    * an independent quality proxy (token count), per source, side by
    * side for a PLANTED-correlated reward (3·tokens + noise) and a
    * pure-noise control. A reward that correlates with nothing a
    * human would recognize as quality is measuring something else;
    * the control column calibrates what "nothing" reads as at this n.
    * Ranks are per-source `row_number` over the deterministic
    * (value, doc_id) order (documented tie convention, identical in
    * both engines), so ρ = 1 − 6·Σd²/(n(n²−1)) is exact integer
    * arithmetic. One scan + two partitioned rank windows per reward +
    * one rollup. */
  def qRewardCorrelation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def u(salt: String) = hex6ToLongSpark(
      s"substring(md5(cast(concat('$salt|', cast(doc_id as string)) as binary)), 1, 6)")
    val base = Tables.load(spark, dir, "documents")
      .withColumn("q", expr("size(split(text, ' '))").cast("long"))
      .withColumn("r_corr", expr(s"q * 3 + ${u("rew")} % 200"))
      .withColumn("r_noise", expr(s"${u("rnz")} % 1000"))
    def rk(c: String) = row_number().over(
      Window.partitionBy($"source").orderBy(col(c), $"doc_id")).cast("long")
    val ranked = base
      .withColumn("rank_q", rk("q"))
      .withColumn("rank_c", rk("r_corr"))
      .withColumn("rank_n", rk("r_noise"))
    // Σd² and the ρ ratio in DECIMAL(38): at corpus scale n³ outruns
    // BIGINT long before the per-source frame is large (n ≈ 2M), and
    // the oracle's HUGEINT must see the same exact integers
    def rho(d2: String) = expr(
      s"""cast(1000000 - (cast($d2 as decimal(38,0)) * 6000000)
         |  div (cast(n_docs as decimal(38,0)) * n_docs * n_docs - n_docs)
         |  as bigint)""".stripMargin)
    ranked.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("cast(rank_q - rank_c as decimal(38,0))" +
          " * (rank_q - rank_c)")).as("d2_corr"),
        sum(expr("cast(rank_q - rank_n as decimal(38,0))" +
          " * (rank_q - rank_n)")).as("d2_noise"))
      .withColumn("rho_corr_ppm", rho("d2_corr"))
      .withColumn("rho_noise_ppm", rho("d2_noise"))
      .select($"source", $"n_docs", $"rho_corr_ppm", $"rho_noise_ppm")
      .orderBy($"source")
  }

  /** Session gap (µs) splitting a user's event stream into
    * conversations — 30 minutes, the classic sessionization cut. */
  private[graft] val TurnGapUs = 1800L * 1000000L

  /** SFT TURN-STRUCTURE AUDIT — multi-turn conversation hygiene for
    * instruction-tuning data: sessionize each user's event stream
    * (30-min gaps) into conversations, assign each turn a role
    * (user/assistant strictly alternating from user, flipped with
    * p = 1/8 by an md5 draw — the planted defect rate), and audit the
    * three SFT-breaking defects per conversation-length bucket:
    * consecutive same-role turns (broken alternation), conversations
    * STARTING with the assistant (no instruction to learn from), and
    * conversations ENDING on a user turn (a dangling prompt that
    * trains nothing). Every window is partitioned by (user) or
    * (user, conversation) and ordered by the unique (ts, event_id)
    * pair — scale-safe and deterministic in both engines; one
    * conversation rollup + one ≤10-row bucket rollup. */
  def qSftTurnAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"us", $"event_id")
    val roleU = hex6ToLongSpark(
      "substring(md5(cast(concat('role|', cast(event_id as string)) as binary)), 1, 6)")
    val turns = Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(byUser))
      .withColumn("new_conv", when(
        $"prev_us".isNull || $"us" - $"prev_us" > TurnGapUs, 1L).otherwise(0L))
      .withColumn("conv", sum($"new_conv").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byConv = Window.partitionBy($"user_id", $"conv")
      .orderBy($"us", $"event_id")
    val roled = turns
      .withColumn("turn_idx", row_number().over(byConv))
      .withColumn("role", expr(
        s"CASE WHEN $roleU % 8 = 0 THEN turn_idx % 2 ELSE (turn_idx + 1) % 2 END"))
      .withColumn("prev_role", lag($"role", 1).over(byConv))
    val convs = roled.groupBy($"user_id", $"conv")
      .agg(count(lit(1)).as("n_turns"),
        sum(when($"role" === $"prev_role", 1L).otherwise(0L)).as("n_viol"),
        max(when($"turn_idx" === 1, $"role")).as("first_role"),
        max(struct($"turn_idx", $"role")).as("last").getField("role")
          .as("last_role"))
    convs
      .withColumn("len_bucket", least($"n_turns", lit(10L)))
      .groupBy($"len_bucket")
      .agg(count(lit(1)).as("n_convs"),
        sum($"n_viol").as("n_violations"),
        sum(when($"first_role" === 1L, 1L).otherwise(0L))
          .as("n_assistant_first"),
        sum(when($"last_role" === 0L, 1L).otherwise(0L)).as("n_dangling_user"),
        sum($"n_turns").as("n_turns_total"))
      .withColumn("viol_permille", expr(
        "(n_violations * 1000) div n_turns_total"))
      .orderBy($"len_bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_cons_at_k" -> qEvalConsAtK,
    "q_judge_position_bias" -> qJudgePositionBias,
    "q_reward_correlation" -> qRewardCorrelation,
    "q_eval_best_of_n" -> qEvalBestOfN,
    "q_sft_turn_audit" -> qSftTurnAudit,
    "q_eval_pass_at_k" -> qEvalPassAtK,
    "q_pref_length_bias" -> qPrefLengthBias,
    "q_eval_token_f1" -> qEvalTokenF1,
    "q_sft_prompt_conflicts" -> qSftPromptConflicts,
    "q_ab_bootstrap" -> qAbBootstrap,
    "q_pref_bradley_terry" -> qPrefBradleyTerry,
    "q_pref_transitivity" -> qPrefTransitivity,
    "q_label_kappa" -> qLabelKappa,
    "q_label_majority" -> qLabelMajority,
    "q_label_rater_quality" -> qLabelRaterQuality,
    "q_time_split_overlap" -> qTimeSplitOverlap)

  /** The DuckDB replay of [[prefGames]] aggregated to undirected
    * pairs — ONE oracle definition shared by the fit and the
    * transitivity audit (mirrors the Spark-side [[stagedMatrix]]
    * sharing). */
  private def btPairsCte: String = {
    val u = hex6ToLongDuck("substring(md5('pref|' || CAST(event_id AS VARCHAR)), 1, 6)")
    s"""g AS MATERIALIZED (
       |  SELECT least(event_id % 5, (event_id // 5) % 5) AS lo,
       |    greatest(event_id % 5, (event_id // 5) % 5) AS hi,
       |    CASE WHEN $u * (least(event_id % 5, (event_id // 5) % 5)
       |        + greatest(event_id % 5, (event_id // 5) % 5) + 2)
       |      < ${1L << 24} * (least(event_id % 5, (event_id // 5) % 5) + 1)
       |      THEN 1 ELSE 0 END AS lo_wins
       |  FROM events
       |  WHERE event_id % 5 <> (event_id // 5) % 5),
       |pg AS MATERIALIZED (
       |  SELECT lo, hi, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(lo_wins) AS BIGINT) AS w_lo
       |  FROM g GROUP BY 1, 2)""".stripMargin
  }

  /** The unrolled-CTE DuckDB replay of the driver-side MM loop —
    * generated by the same iteration count and the same integer ops,
    * so a BtIters/BtScale change updates both engines together. */
  private def btOracle: String = {
    // every per-iteration CTE is MATERIALIZED: it$k is referenced
    // twice (both join sides) and raw$k three times (rows + the two
    // scalar subqueries), so inlining would re-derive the whole
    // upstream chain ~4× per iteration — 4^BtIters re-evaluations of
    // the event scan
    val iters = (0 until BtIters).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT m.i AS model,
         |    sum((m.n * ${BtScale * BtScale}) // (si.s + sj.s)) AS d
         |  FROM mat m
         |  JOIN it$k si ON si.model = m.i
         |  JOIN it$k sj ON sj.model = m.j
         |  GROUP BY 1),
         |raw$k AS MATERIALIZED (
         |  SELECT w.model,
         |    CASE WHEN d.d = 0 THEN 1
         |         ELSE greatest(1, (w.wins * ${BtScale * BtScale}) // d.d)
         |    END AS s
         |  FROM wins w JOIN d$k d USING (model)),
         |it${k + 1} AS MATERIALIZED (
         |  SELECT model,
         |    greatest(1, (s * (SELECT count(*) * $BtScale FROM raw$k))
         |      // (SELECT sum(s) FROM raw$k)) AS s
         |  FROM raw$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $btPairsCte,
       |mat AS MATERIALIZED (
       |  SELECT lo AS i, hi AS j, n, w_lo AS w FROM pg
       |  UNION ALL
       |  SELECT hi AS i, lo AS j, n, n - w_lo AS w FROM pg),
       |wins AS MATERIALIZED (
       |  SELECT i AS model, sum(n) AS games, sum(w) AS wins
       |  FROM mat GROUP BY 1),
       |it0 AS (SELECT model, $BtScale AS s FROM wins),
       |$iters
       |SELECT w.model, CAST(w.games AS BIGINT) AS games,
       |  CAST(w.wins AS BIGINT) AS wins,
       |  CAST((w.wins * 1000) // w.games AS BIGINT) AS win_permille,
       |  CAST(f.s AS BIGINT) AS strength_x1e6
       |FROM wins w JOIN it$BtIters f USING (model)
       |ORDER BY w.model""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_eval_cons_at_k" -> {
      val cExpr = (0 until PassAttempts)
        .map(passIndicator(_, "duck")).mkString(" + ")
      val sCols = ConsKs.map(k =>
        s"CAST(sum(${consCaseSql(k, "")}) AS BIGINT) AS s$k").mkString(",\n    ")
      val ppmCols = ConsKs.map { k =>
        s"CAST((s$k * 1000000) // (n_tasks * ${comb(PassAttempts, k)}) AS BIGINT) AS cons${k}_ppm"
      }.mkString(",\n  ")
      s"""WITH cc AS (
         |  SELECT source, $cExpr AS c
         |  FROM documents),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tasks,
         |    $sCols
         |  FROM cc GROUP BY 1)
         |SELECT source, n_tasks,
         |  $ppmCols
         |FROM agg ORDER BY source""".stripMargin
    },

    "q_judge_position_bias" -> {
      val uPos = hex6ToLongDuck(
        "substring(md5('pos|' || CAST(event_id AS VARCHAR)), 1, 6)")
      val uOut = hex6ToLongDuck(
        "substring(md5('jout|' || CAST(event_id AS VARCHAR)), 1, 6)")
      s"""WITH g AS (
         |  SELECT event_id,
         |    least(event_id % 5, (event_id // 5) % 5) AS lo,
         |    greatest(event_id % 5, (event_id // 5) % 5) AS hi,
         |    $uPos % 2 = 0 AS lo_first
         |  FROM events
         |  WHERE event_id % 5 <> (event_id // 5) % 5),
         |w AS (
         |  SELECT lo, hi, lo_first,
         |    $uOut * (lo + hi + 3)
         |      < ${1L << 24} * ((CASE WHEN lo_first THEN lo ELSE hi END) + 2)
         |      AS first_wins
         |  FROM g),
         |agg AS (
         |  SELECT lo, hi, CAST(count(*) AS BIGINT) AS n_games,
         |    CAST(sum(CASE WHEN lo_first THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_lo_first,
         |    CAST(sum(CASE WHEN first_wins THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_first_wins,
         |    CAST(sum(CASE WHEN lo_first AND first_wins THEN 1 ELSE 0 END)
         |      AS BIGINT) AS lo_wins_when_first,
         |    CAST(sum(CASE WHEN NOT lo_first AND NOT first_wins THEN 1 ELSE 0 END)
         |      AS BIGINT) AS lo_wins_when_second
         |  FROM w GROUP BY 1, 2)
         |SELECT lo, hi, n_games, n_lo_first, n_first_wins,
         |  lo_wins_when_first, lo_wins_when_second,
         |  (n_first_wins * 1000) // n_games AS first_win_permille,
         |  ((lo_wins_when_first * 1000) // nullif(n_lo_first, 0)
         |    + (lo_wins_when_second * 1000) // nullif(n_games - n_lo_first, 0))
         |    // 2 AS debiased_lo_permille
         |FROM agg ORDER BY lo, hi""".stripMargin
    },

    "q_reward_correlation" -> {
      def u(salt: String) = hex6ToLongDuck(
        s"substring(md5('$salt|' || CAST(doc_id AS VARCHAR)), 1, 6)")
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS q
         |  FROM documents),
         |rw AS (
         |  SELECT doc_id, source, q,
         |    q * 3 + ${u("rew")} % 200 AS r_corr,
         |    ${u("rnz")} % 1000 AS r_noise
         |  FROM base),
         |rk AS (
         |  SELECT source,
         |    row_number() OVER (PARTITION BY source ORDER BY q, doc_id)
         |      AS rank_q,
         |    row_number() OVER (PARTITION BY source ORDER BY r_corr, doc_id)
         |      AS rank_c,
         |    row_number() OVER (PARTITION BY source ORDER BY r_noise, doc_id)
         |      AS rank_n
         |  FROM rw),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    sum(CAST(rank_q - rank_c AS HUGEINT) * (rank_q - rank_c))
         |      AS d2_corr,
         |    sum(CAST(rank_q - rank_n AS HUGEINT) * (rank_q - rank_n))
         |      AS d2_noise
         |  FROM rk GROUP BY 1)
         |SELECT source, n_docs,
         |  CAST(1000000 - (d2_corr * 6000000)
         |    // (CAST(n_docs AS HUGEINT) * n_docs * n_docs - n_docs) AS BIGINT)
         |    AS rho_corr_ppm,
         |  CAST(1000000 - (d2_noise * 6000000)
         |    // (CAST(n_docs AS HUGEINT) * n_docs * n_docs - n_docs) AS BIGINT)
         |    AS rho_noise_ppm
         |FROM agg ORDER BY source""".stripMargin
    },

    "q_eval_best_of_n" -> {
      val rewards = (0 until BonSamples).map(bonRewardSql(_, "duck"))
      val numCols = BonNs.map { n =>
        (n to BonSamples)
          .map(i => s"rs[$i] * ${comb(i - 1, n - 1)}")
          .mkString("(", " + ", s") AS num$n")
      }.mkString(",\n    ")
      val sCols = BonNs.map(n => s"sum(num$n) AS s$n").mkString(", ")
      val outCols = BonNs.map { n =>
        s"CAST((s$n * 1000) // (n_tasks * ${comb(BonSamples, n)}) AS BIGINT) AS bon${n}_milli"
      }.mkString(",\n  ")
      s"""WITH rs AS (
         |  SELECT source,
         |    list_sort([${rewards.mkString(",\n      ")}]) AS rs
         |  FROM documents),
         |nums AS (
         |  SELECT source,
         |    $numCols
         |  FROM rs),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tasks, $sCols
         |  FROM nums GROUP BY 1)
         |SELECT source, n_tasks,
         |  $outCols
         |FROM agg ORDER BY source""".stripMargin
    },

    "q_sft_turn_audit" -> {
      val roleU = hex6ToLongDuck(
        "substring(md5('role|' || CAST(event_id AS VARCHAR)), 1, 6)")
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
         |l AS (
         |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |    AS prev_us FROM e),
         |c AS (
         |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > $TurnGapUs
         |    THEN 1 ELSE 0 END AS new_conv FROM l),
         |s AS (
         |  SELECT *, sum(new_conv) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS conv FROM c),
         |t AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, conv
         |    ORDER BY us, event_id) AS turn_idx FROM s),
         |r AS (
         |  SELECT *, CASE WHEN $roleU % 8 = 0 THEN turn_idx % 2
         |    ELSE (turn_idx + 1) % 2 END AS role FROM t),
         |p AS (
         |  SELECT *, lag(role) OVER (PARTITION BY user_id, conv
         |    ORDER BY us, event_id) AS prev_role FROM r),
         |conv AS (
         |  SELECT user_id, conv, CAST(count(*) AS BIGINT) AS n_turns,
         |    CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_viol,
         |    max(CASE WHEN turn_idx = 1 THEN role END) AS first_role,
         |    max_by(role, turn_idx) AS last_role
         |  FROM p GROUP BY 1, 2),
         |b AS (
         |  SELECT least(n_turns, 10) AS len_bucket,
         |    CAST(count(*) AS BIGINT) AS n_convs,
         |    CAST(sum(n_viol) AS BIGINT) AS n_violations,
         |    CAST(sum(CASE WHEN first_role = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_assistant_first,
         |    CAST(sum(CASE WHEN last_role = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dangling_user,
         |    CAST(sum(n_turns) AS BIGINT) AS n_turns_total
         |  FROM conv GROUP BY 1)
         |SELECT len_bucket, n_convs, n_violations, n_assistant_first,
         |  n_dangling_user, n_turns_total,
         |  (n_violations * 1000) // n_turns_total AS viol_permille
         |FROM b ORDER BY len_bucket""".stripMargin
    },

    "q_eval_pass_at_k" -> {
      val cExpr = (0 until PassAttempts)
        .map(passIndicator(_, "duck")).mkString(" + ")
      val sCols = PassKs.map(k =>
        s"CAST(sum(${combCaseSql(k, "")}) AS BIGINT) AS s$k").mkString(",\n    ")
      val ppmCols = PassKs.map { k =>
        val cnk = comb(PassAttempts, k)
        s"CAST(((n_tasks * $cnk - s$k) * 1000000) // (n_tasks * $cnk) AS BIGINT) AS pass${k}_ppm"
      }.mkString(",\n  ")
      s"""WITH cc AS (
         |  SELECT source, $cExpr AS c
         |  FROM documents),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tasks,
         |    $sCols
         |  FROM cc GROUP BY 1)
         |SELECT source, n_tasks,
         |  $ppmCols
         |FROM agg ORDER BY source""".stripMargin
    },

    "q_pref_length_bias" -> {
      val uPref = hex6ToLongDuck(
        "substring(md5('pref|' || CAST(event_id AS VARCHAR)), 1, 6)")
      def uLen(side: String) = hex6ToLongDuck(
        s"substring(md5('len|' || CAST($side AS VARCHAR) || '|' " +
          "|| CAST(event_id AS VARCHAR)), 1, 6)")
      s"""WITH g AS (
         |  SELECT event_id,
         |    least(event_id % 5, (event_id // 5) % 5) AS lo,
         |    greatest(event_id % 5, (event_id // 5) % 5) AS hi
         |  FROM events
         |  WHERE event_id % 5 <> (event_id // 5) % 5),
         |w AS (
         |  SELECT lo, hi,
         |    $uPref * (lo + hi + 2) < ${1L << 24} * (lo + 1) AS lo_wins,
         |    100 + lo * 50 + ${uLen("lo")} % 200 AS len_lo,
         |    100 + hi * 50 + ${uLen("hi")} % 200 AS len_hi
         |  FROM g),
         |b AS (
         |  SELECT abs(len_lo - len_hi) // 50 AS gap_bucket,
         |    CASE WHEN len_lo = len_hi THEN 1 ELSE 0 END AS tie,
         |    CASE WHEN (len_lo > len_hi AND lo_wins)
         |           OR (len_hi > len_lo AND NOT lo_wins)
         |      THEN 1 ELSE 0 END AS lw
         |  FROM w),
         |agg AS (
         |  SELECT CAST(gap_bucket AS BIGINT) AS gap_bucket,
         |    CAST(count(*) AS BIGINT) AS n_games,
         |    CAST(sum(tie) AS BIGINT) AS n_len_ties,
         |    CAST(sum(lw) AS BIGINT) AS n_longer_wins
         |  FROM b GROUP BY 1)
         |SELECT gap_bucket, n_games, n_len_ties, n_longer_wins,
         |  (n_longer_wins * 1000) // nullif(n_games - n_len_ties, 0)
         |    AS longer_win_permille
         |FROM agg ORDER BY gap_bucket""".stripMargin
    },

    "q_eval_token_f1" -> {
      val h = "substring(md5('f1|' || CAST(doc_id AS VARCHAR) || '|' " +
        "|| CAST(pos AS VARCHAR)), 1, 1)"
      s"""WITH base AS (
         |  SELECT doc_id, source, string_split(text, ' ')[1:$F1RefTokens] AS toks
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, source, p.pos - 1 AS pos, toks[p.pos] AS tok
         |  FROM base CROSS JOIN (SELECT unnest(range(1, ${F1RefTokens + 1})) AS pos) p
         |  WHERE p.pos <= len(toks)),
         |pt AS (
         |  SELECT doc_id, source, tok,
         |    CASE WHEN $h IN ('0', '1') THEN NULL
         |         WHEN $h = '2' THEN 'xx' ELSE tok END AS pred
         |  FROM tok),
         |stacked AS (
         |  SELECT doc_id, source, tok AS t, 'r' AS kind FROM pt
         |  UNION ALL
         |  SELECT doc_id, source, pred AS t, 'p' AS kind FROM pt
         |  WHERE pred IS NOT NULL),
         |cnt AS (
         |  SELECT doc_id, source, t,
         |    sum(CASE WHEN kind = 'r' THEN 1 ELSE 0 END) AS cnt_r,
         |    sum(CASE WHEN kind = 'p' THEN 1 ELSE 0 END) AS cnt_p
         |  FROM stacked GROUP BY 1, 2, 3),
         |doc AS (
         |  SELECT doc_id, source, sum(least(cnt_r, cnt_p)) AS overlap,
         |    sum(cnt_r) AS len_r, sum(cnt_p) AS len_p
         |  FROM cnt GROUP BY 1, 2),
         |scored AS (
         |  SELECT source, overlap, len_r, len_p,
         |    (2 * overlap * 1000000) // nullif(len_r + len_p, 0) AS f1_ppm
         |  FROM doc)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST((2 * sum(overlap) * 1000000)
         |    // nullif(sum(len_r) + sum(len_p), 0) AS BIGINT) AS micro_f1_ppm,
         |  CAST(sum(f1_ppm) // count(*) AS BIGINT) AS macro_f1_ppm
         |FROM scored GROUP BY 1 ORDER BY source""".stripMargin
    },

    // prompt key = md5 of the first 8 tokens — the headFingerprint
    // definition (list slice clamps like Spark's slice)
    "q_sft_prompt_conflicts" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prompt_fp,
        |    md5(text) AS resp_fp
        |  FROM documents),
        |g AS (
        |  SELECT prompt_fp, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT resp_fp) AS BIGINT) AS n_responses,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    min(doc_id) AS first_doc_id
        |  FROM h GROUP BY 1)
        |SELECT prompt_fp, n_docs, n_responses, n_sources, first_doc_id,
        |  CASE WHEN n_responses > 1 THEN 'conflict' ELSE 'exact_dup' END AS verdict
        |FROM g WHERE n_docs >= 2
        |ORDER BY prompt_fp""".stripMargin,

    "q_ab_bootstrap" -> {
      val w = poissonCaseDuck(
        "substring(md5('boot|' || CAST(t.r AS VARCHAR) || '|' " +
          "|| CAST(u.user_id AS VARCHAR)), 1, 6)")
      s"""WITH u AS (
         |  SELECT event_type, user_id,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
         |    user_id % 2 AS variant
         |  FROM events GROUP BY event_type, user_id),
         |reps AS (
         |  SELECT u.event_type, t.r, u.variant, u.cents, $w AS w
         |  FROM u CROSS JOIN (SELECT unnest(range(0, $BootReps)) AS r) t),
         |cells AS (
         |  SELECT event_type, r,
         |    sum(CASE WHEN variant = 0 THEN w ELSE 0 END) AS n_a,
         |    sum(CASE WHEN variant = 1 THEN w ELSE 0 END) AS n_b,
         |    sum(CASE WHEN variant = 0 THEN w * cents ELSE 0 END) AS wc_a,
         |    sum(CASE WHEN variant = 1 THEN w * cents ELSE 0 END) AS wc_b
         |  FROM reps GROUP BY 1, 2),
         |diffs AS (
         |  SELECT event_type, r,
         |    CAST((CAST(wc_b AS HUGEINT) * 1000000) // nullif(n_b, 0)
         |      - (CAST(wc_a AS HUGEINT) * 1000000) // nullif(n_a, 0) AS BIGINT) AS diff
         |  FROM cells),
         |v AS (SELECT * FROM diffs WHERE diff IS NOT NULL),
         |rk AS (
         |  SELECT event_type, diff,
         |    row_number() OVER (PARTITION BY event_type ORDER BY diff, r) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS cnt
         |  FROM v),
         |ci AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = 2 THEN diff END) AS boot_lo_ucents,
         |    max(CASE WHEN rn = cnt - 1 THEN diff END) AS boot_hi_ucents,
         |    max(cnt) AS n_reps_valid
         |  FROM rk GROUP BY 1),
         |pt AS (
         |  SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n_users,
         |    CAST((CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS HUGEINT) * 1000000)
         |        // nullif(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END), 0)
         |      - (CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS HUGEINT) * 1000000)
         |        // nullif(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS diff_ucents
         |  FROM u GROUP BY 1)
         |SELECT pt.event_type, pt.n_users, pt.diff_ucents,
         |  ci.boot_lo_ucents, ci.boot_hi_ucents,
         |  CAST(coalesce(ci.n_reps_valid, 0) AS BIGINT) AS n_reps_valid
         |FROM pt LEFT JOIN ci USING (event_type)
         |ORDER BY pt.event_type""".stripMargin
    },

    "q_pref_bradley_terry" -> btOracle,

    "q_pref_transitivity" ->
      s"""WITH $btPairsCte,
         |p AS MATERIALIZED (
         |  SELECT lo AS i, hi AS j,
         |    CAST(CASE WHEN w_lo * 2 > n THEN 1
         |              WHEN w_lo * 2 < n THEN -1 ELSE 0 END AS BIGINT) AS dir
         |  FROM pg)
         |SELECT a.i, a.j, b.j AS k,
         |  a.dir AS dir_ij, b.dir AS dir_jk, c.dir AS dir_ik,
         |  ((a.dir = 1 AND b.dir = 1 AND c.dir = -1)
         |    OR (a.dir = -1 AND b.dir = -1 AND c.dir = 1)) AS cyclic
         |FROM p a
         |JOIN p b ON b.i = a.j
         |JOIN p c ON c.i = a.i AND c.j = b.j
         |ORDER BY 1, 2, 3""".stripMargin,

    "q_label_rater_quality" -> {
      val ls = (0 to 2).map(k => s"${raterLabelSql(k, "duck")} AS l$k")
        .mkString(",\n    ")
      s"""WITH lab AS (
         |  SELECT doc_id,
         |    $ls
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, l0, l1, l2,
         |    CASE WHEN l0 = l1 OR l0 = l2 THEN l0
         |         WHEN l1 = l2 THEN l1 ELSE -1 END AS majority
         |  FROM lab),
         |r AS (
         |  SELECT doc_id, majority, 0 AS rater, l0 AS label FROM m
         |  UNION ALL
         |  SELECT doc_id, majority, 1 AS rater, l1 AS label FROM m
         |  UNION ALL
         |  SELECT doc_id, majority, 2 AS rater, l2 AS label FROM m),
         |agg AS (
         |  SELECT rater,
         |    CAST(sum(CASE WHEN majority >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
         |    CAST(sum(CASE WHEN majority < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied_excluded,
         |    CAST(sum(CASE WHEN majority >= 0 AND label = majority THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_agree,
         |    CAST(sum(CASE WHEN majority >= 0 AND label = doc_id % 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_true
         |  FROM r GROUP BY 1)
         |SELECT CAST(rater AS BIGINT) AS rater, n_scored, n_tied_excluded,
         |  n_agree, n_true,
         |  (n_agree * 1000000) // nullif(n_scored, 0) AS acc_vs_consensus_ppm,
         |  (n_true * 1000000) // nullif(n_scored, 0) AS acc_vs_truth_ppm
         |FROM agg ORDER BY rater""".stripMargin
    },

    "q_label_majority" -> {
      val ls = (0 to 2).map(k => s"${raterLabelSql(k, "duck")} AS l$k")
        .mkString(",\n    ")
      s"""WITH lab AS (
         |  SELECT doc_id, source,
         |    $ls
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, source,
         |    CASE WHEN l0 = l1 OR l0 = l2 THEN l0
         |         WHEN l1 = l2 THEN l1 ELSE -1 END AS majority,
         |    CAST(l0 = l1 AS BIGINT) + CAST(l0 = l2 AS BIGINT)
         |      + CAST(l1 = l2 AS BIGINT) AS margin
         |  FROM lab)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN margin = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_unanimous,
         |  CAST(sum(CASE WHEN margin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_2_1,
         |  CAST(sum(CASE WHEN margin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied,
         |  CAST(sum(CASE WHEN majority = doc_id % 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  CAST((sum(CASE WHEN majority = doc_id % 3 THEN 1 ELSE 0 END) * 1000000)
         |    // count(*) AS BIGINT) AS acc_ppm
         |FROM m GROUP BY source ORDER BY source""".stripMargin
    },

    "q_time_split_overlap" ->
      """WITH b AS (
        |  SELECT min(epoch_us(ts)) AS t_min, max(epoch_us(ts)) AS t_max
        |  FROM events),
        |sided AS (
        |  SELECT e.event_type, e.user_id,
        |    CASE WHEN epoch_us(e.ts)
        |      < b.t_min + ((b.t_max - b.t_min) * 4) // 5
        |      THEN 'train' ELSE 'test' END AS side
        |  FROM events e CROSS JOIN b),
        |u AS (
        |  SELECT event_type, user_id,
        |    max(CASE WHEN side = 'train' THEN 1 ELSE 0 END) AS in_train,
        |    sum(CASE WHEN side = 'test' THEN 1 ELSE 0 END) AS test_events
        |  FROM sided GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type,
        |    CAST(sum(in_train) AS BIGINT) AS n_train_users,
        |    CAST(sum(CASE WHEN test_events > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_test_users,
        |    CAST(sum(CASE WHEN test_events > 0 AND in_train = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overlap_users,
        |    CAST(sum(test_events) AS BIGINT) AS n_test_events,
        |    CAST(sum(CASE WHEN in_train = 1 THEN test_events ELSE 0 END) AS BIGINT)
        |      AS n_leaky_test_events
        |  FROM u GROUP BY 1)
        |SELECT event_type, n_train_users, n_test_users, n_overlap_users,
        |  n_test_events, n_leaky_test_events,
        |  (n_overlap_users * 1000000) // nullif(n_test_users, 0) AS user_overlap_ppm,
        |  (n_leaky_test_events * 1000000) // nullif(n_test_events, 0) AS event_overlap_ppm
        |FROM agg ORDER BY event_type""".stripMargin,

    "q_label_kappa" -> {
      val ls = (0 to 2).map(k => s"${raterLabelSql(k, "duck")} AS l$k")
        .mkString(",\n    ")
      s"""WITH lab AS (
         |  SELECT doc_id, source,
         |    $ls
         |  FROM documents),
         |cnt AS (
         |  SELECT source,
         |    CAST(l0 = 0 AS BIGINT) + CAST(l1 = 0 AS BIGINT) + CAST(l2 = 0 AS BIGINT) AS n0,
         |    CAST(l0 = 1 AS BIGINT) + CAST(l1 = 1 AS BIGINT) + CAST(l2 = 1 AS BIGINT) AS n1,
         |    CAST(l0 = 2 AS BIGINT) + CAST(l1 = 2 AS BIGINT) + CAST(l2 = 2 AS BIGINT) AS n2
         |  FROM lab),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum((n0*n0 + n1*n1 + n2*n2 - 3) // 2) AS BIGINT) AS sum_pairs,
         |    CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1,
         |    CAST(sum(n2) AS BIGINT) AS c2
         |  FROM cnt GROUP BY 1),
         |pp AS (
         |  SELECT source, n_docs,
         |    (sum_pairs * 1000000) // (3 * n_docs) AS po_ppm,
         |    CAST((CAST(c0 AS HUGEINT) * c0 + CAST(c1 AS HUGEINT) * c1
         |      + CAST(c2 AS HUGEINT) * c2) * 1000000
         |      // (CAST(n_docs AS HUGEINT) * n_docs * 9) AS BIGINT) AS pe_ppm
         |  FROM agg)
         |SELECT source, n_docs, po_ppm, pe_ppm,
         |  ((po_ppm - pe_ppm) * 1000000) // nullif(1000000 - pe_ppm, 0) AS kappa_ppm
         |FROM pp ORDER BY source""".stripMargin
    })
}
