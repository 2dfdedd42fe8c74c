package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SessionCache, Tables}

/** Graph analytics over the part co-occurrence graph (two parts are
  * adjacent iff some order contains both — the classic co-purchase
  * graph; reference analog: the event-stream entity graph the report
  * page walks row-by-row, `routes/events.js` lookups generalized to
  * whole-graph analytics).
  *
  * Everything is integer arithmetic so the DuckDB oracle hash-matches
  * bit-exactly, and every step is a plain equi-join/aggregate — the
  * shapes that scale:
  *
  *  - the edge list is built once per (session, dir) and staged to
  *    parquet (at 100 TB it IS a stored table, partitioned by src);
  *  - PageRank is the standard edge-partitioned iteration — each round
  *    is one join (ranks to edges, co-partitioned on the join key) and
  *    one map-side-combined aggregate; rounds are fixed (3) and ranks
  *    are fixed-point BIGINT so replay/oracle are exact;
  *  - triangle counting uses DEGREE ORIENTATION (orient each edge from
  *    the (degree, id)-smaller endpoint to the larger): out-degrees are
  *    bounded by O(sqrt m), so the wedge join stays near-linear instead
  *    of blowing up on hub nodes — the standard skew-proof formulation.
  */
object GraphOps {

  private final val Scale = 1000000000L // fixed-point 1e9 = rank 1.0
  private final val Damp = 85L          // damping 0.85 as a percentage
  private final val Iterations = 3

  /** Canonical (src < dst) distinct co-occurrence edges. Staged once,
    * as a projection of the WEIGHTED edge table: distinct (src, dst)
    * is exactly the weighted groupBy's key set, so deriving both from
    * one staged fan-out runs the C(order,2) pair generation (13.1M
    * rows at sf0.1) once per session instead of twice — previously
    * canonicalEdges and weightedEdges each ran the identical lineitem
    * self-join (r15; the weighted copy was charged to q_graph_sssp's
    * first touch). */
  private def canonicalEdges(spark: SparkSession, dir: String): DataFrame =
    SessionCache.checkpointed(spark, s"graph.edges|$dir") {
      weightedEdges(spark, dir).select(col("src"), col("dst"))
    }

  /** Force the one-time edge staging (the SessionCache parquet write
    * happens on construct) — the bench calls this so the staging cost
    * gets its own labeled line instead of landing on whichever
    * q_graph_* query runs first (same attribution policy as
    * q_tr_staging). */
  def stageEdges(spark: SparkSession, dir: String): Unit = {
    canonicalEdges(spark, dir); ()
  }

  /** Both directions of every undirected edge. */
  private def symmetricEdges(spark: SparkSession, dir: String): DataFrame = {
    val ce = canonicalEdges(spark, dir)
    ce.union(ce.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Fixed-point PageRank, 3 rounds, damping 0.85.
    *
    * r_{k+1}(v) = 0.15·Scale + 0.85 · Σ_{u→v} (r_k(u) div outdeg(u)),
    * all BIGINT (div = integral division; identical in DuckDB with //
    * since every operand is positive). Every node of this graph has a
    * neighbor, and that neighbor has outdeg ≥ 1, so each round's
    * aggregate covers every node — no dangling-mass term is needed.
    * Each round = one equi-join + one aggregate; at scale the edge
    * table is hash-partitioned on src once and every round reuses that
    * partitioning (ranks arrive shuffled on node, the small side). */
  def qGraphPagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankOnEdges(symmetricEdges(spark, dir))

  /** Core iteration over an explicit symmetric (src, dst) edge frame —
    * factored out so specs can replay it on fixtures. All arithmetic is
    * BIGINT end to end: `div` (integral division) matches DuckDB's `//`
    * exactly, with no double round-trip even past 2^53. */
  private[graft] def pagerankOnEdges(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = deg.select(col("src").as("node"), lit(Scale).as("pr"))
    for (_ <- 1 to Iterations) {
      val contrib = ranks.join(deg, ranks("node") === deg("src"))
        .select(ranks("node").as("cnode"), expr("pr div outdeg").as("c"))
      // build the shuffled hash join on the node-sized contrib frame;
      // without the hint the planner broadcasts the EDGE side (its
      // staged parquet sits under the broadcast threshold) — backwards
      // at any scale, and it re-broadcasts every round. Shuffling
      // partitions edges on src once; ReuseExchange shares it.
      ranks = edges.join(contrib.hint("shuffle_hash"),
          edges("src") === col("cnode"))
        .groupBy(edges("dst").as("node"))
        .agg(expr(s"cast(${Scale * 15 / 100}L + ($Damp * sum(c)) div 100 as bigint)")
          .as("pr"))
        .select(col("node"), col("pr"))
    }
    ranks
      .join(deg, ranks("node") === deg("src"))
      .select(col("node").as("part"), col("outdeg").as("degree"), col("pr"))
      .orderBy(col("part"))
  }

  /** KATZ CENTRALITY (Katz 1953, public method): x_{t+1}(v) = β +
    * α·Σ_{u→v} x_t(u) with α = 1/4, β = Scale (10⁹), x_0 = 0, 3 rounds — the
    * "influence through ALL walks, geometrically damped" centrality
    * (PageRank normalizes by out-degree; Katz lets a prolific hub
    * transmit full weight on every edge, which is the right model for
    * co-purchase influence). All BIGINT, `div 4` on positives so the
    * DuckDB unrolled-round oracle replays it exactly; same round-join
    * protocol as PageRank — each round one shuffled-hash join of the
    * node-sized score frame onto the staged edge table + one map-side
    * combined aggregate. */
  def qGraphKatz(spark: SparkSession, dir: String): DataFrame =
    katzOnEdges(symmetricEdges(spark, dir))

  private[graft] def katzOnEdges(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct()
    var x = nodes.select(col("node"), lit(0L).as("katz"))
    for (_ <- 1 to 3) {
      val contrib = x.select(col("node").as("cnode"), col("katz").as("c"))
      x = edges.join(contrib.hint("shuffle_hash"),
          edges("src") === col("cnode"))
        .groupBy(edges("dst").as("node"))
        .agg(expr(s"cast($Scale + sum(c) div 4 as bigint)").as("katz"))
        .select(col("node"), col("katz"))
    }
    x.orderBy(col("node")).select(col("node").as("part"), col("katz"))
  }

  /** Per-node triangle counts via degree orientation + adjacency
    * intersection.
    *
    * Orient {a,b} from the (degree, id)-smaller to the larger endpoint;
    * a triangle u→v, u→w, v→w (ord u < v < w) then surfaces EXACTLY
    * once at its base edge (u, v) as w ∈ N⁺(u) ∩ N⁺(v) — membership of
    * w in N⁺(v) IS the closing edge, so no wedge materialization and
    * no closing semi-join. The r7 rewrite replaced the wedge-join
    * formulation (≈Σ outdeg² rows shuffled — 20M at sf0.1, 11.6 s)
    * with per-edge `array_intersect` over collected out-neighbor
    * arrays: rows produced = actual triangles (closed wedges only).
    * Out-degree under this orientation is bounded ~sqrt m (hub nodes
    * take IN-edges), so the arrays stay small and the per-edge
    * intersection cost is bounded — the standard skew-proof edge-
    * iterator formulation. Each triangle row credits its 3 corners. */
  def qGraphTriangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOnEdges(canonicalEdges(spark, dir))

  /** Core triangle counting over an explicit canonical (src < dst)
    * edge frame — factored out so specs can run it on fixtures. */
  private[graft] def trianglesOnEdges(ce: DataFrame): DataFrame = {
    val deg = ce.union(ce.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))

    // oriented edge (u -> v) with ord(u) < ord(v) under (degree, id)
    val oriented = ce
      .join(deg.select(col("node").as("sn"), col("d").as("sd")), col("src") === col("sn"))
      .join(deg.select(col("node").as("dn"), col("d").as("dd")), col("dst") === col("dn"))
      .select(
        when(col("sd") < col("dd") || (col("sd") === col("dd") && col("src") < col("dst")),
          col("src")).otherwise(col("dst")).as("u"),
        when(col("sd") < col("dd") || (col("sd") === col("dd") && col("src") < col("dst")),
          col("dst")).otherwise(col("src")).as("v"))

    // out-neighbor arrays, bounded ~sqrt m by the orientation
    val adj = oriented.groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u").as("a"), col("v").as("b"),
        explode(array_intersect(col("nu"), col("nv"))).as("c"))

    tri.select(col("a").as("part"))
      .union(tri.select(col("b").as("part")))
      .union(tri.select(col("c").as("part")))
      .groupBy(col("part")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("part"))
  }

  private final val CoreK = 80
  private final val CoreRounds = 3
  private final val LpaRounds = 3

  /** k-core peeling, k=80, 3 synchronous rounds.
    *
    * Round r keeps the nodes whose degree within round r-1's survivor
    * subgraph is >= k; the output is the final survivor set with its
    * degree inside that set. Fixed rounds keep the oracle an unrolled
    * CTE (exact integer match); at scale you run rounds to fix-point —
    * each round is two equi-joins against the (shrinking) survivor set
    * plus one map-side-combined count, with the edge table
    * hash-partitioned on src once and reused, and the survivor side
    * broadcast as soon as AQE sees it shrink. Measured on this corpus
    * (k=80): 1903 -> 1878 -> 1865 survivors — a genuine multi-round
    * cascade, stable and non-empty. */
  def qGraphKcore(spark: SparkSession, dir: String): DataFrame =
    kcoreOnEdges(symmetricEdges(spark, dir), CoreK, CoreRounds)

  /** Core peeling over an explicit symmetric edge frame — factored out
    * so specs can replay it with arbitrary (k, rounds) on fixtures.
    * A survivor whose surviving neighbors all dropped has no edges left
    * and therefore no output row (degree-0 nodes are not in the core). */
  private[graft] def kcoreOnEdges(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    // build both survivor joins on the node-sized alive frame (see
    // lpaOnEdges: the edge scan would otherwise be the broadcast side)
    def degWithin(alive: DataFrame): DataFrame = sym
      .join(alive.select(col("node").as("sa")).hint("shuffle_hash"),
        col("src") === col("sa"))
      .join(alive.select(col("node").as("da")).hint("shuffle_hash"),
        col("dst") === col("da"))
      .groupBy(col("src").as("n")).agg(count(lit(1)).as("d"))
    // round 1's survivor set is "all nodes": degree comes straight off
    // the edge table, no identity joins
    var alive = sym.groupBy(col("src").as("n")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k).select(col("n").as("node"))
    for (_ <- 2 to rounds)
      alive = degWithin(alive).filter(col("d") >= k).select(col("n").as("node"))
    degWithin(alive)
      .select(col("n").as("part"), col("d").as("degree"))
      .orderBy(col("part"))
  }

  /** Label-propagation communities: 3 synchronous rounds of
    * neighbor-majority voting with a deterministic (count desc, label
    * asc) tie-break, labels seeded with each node's own id.
    *
    * Each round is one equi-join of the edge table against the label
    * frame (co-partitioned on the node key) followed by two map-side-
    * combined aggregates: the (node, label) vote counts, then the
    * per-node argmin over (-count, label) — `min_by` on a struct key,
    * which is exactly ROW_NUMBER()=1 under (count DESC, label ASC) in
    * the oracle. Deterministic end to end, O(m) rows shuffled per
    * round. On this corpus the label count contracts 2000 -> 95 -> 42
    * -> 3 communities in 3 rounds. */
  def qGraphCommunities(spark: SparkSession, dir: String): DataFrame =
    stagedLpa(spark, dir)
      .select(col("node").as("part"), col("community"))
      .orderBy(col("part"))

  /** The LPA label frame staged once per (session, dir) — read by the
    * communities query AND by modularity's three label joins, so the
    * 3 voting rounds run exactly once per corpus. */
  private def stagedLpa(spark: SparkSession, dir: String): DataFrame =
    SessionCache.checkpointed(spark, s"graph.lpa|$dir") {
      lpaOnEdges(symmetricEdges(spark, dir), LpaRounds)
        .select(col("part").as("node"), col("community"))
    }

  /** Core LPA rounds over an explicit symmetric edge frame — factored
    * out so specs can replay them on fixtures.
    *
    * The per-node argmax-count/argmin-label vote is realized as a
    * plain `max` over the packed BIGINT `c * 2^40 - lbl`: maximizing
    * it maximizes the count and, on ties, minimizes the label, and a
    * plain min/max aggregate is hash-aggregable with map-side partial
    * combine — `min_by` over a struct ordering key falls back to
    * SortAggregate (measured: two extra whole-grid sorts per round).
    * The label is shifted by one inside the key (ids are 0-based), so
    * the packing requires 0 <= label < 2^40 - 1 (~1.1e12) and
    * count < 2^23 — both loudly safe for part keys and degree-bounded
    * votes. Decoding: c = (key div 2^40) + 1, lbl = c·2^40 - key - 1. */
  private[graft] def lpaOnEdges(sym: DataFrame, rounds: Int): DataFrame = {
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      // shuffled hash join, building on the per-node label frame: the
      // staged edge parquet sits under the broadcast threshold, so the
      // planner would otherwise broadcast the EDGE side every round —
      // backwards at any scale (labels is the node-sized frame, edges
      // the m-sized one). Shuffling instead partitions edges on src
      // ONCE (ReuseExchange shares it across rounds) and labels tiny.
      val votes = sym.join(labels.hint("shuffle_hash"),
          sym("src") === labels("node"))
        .groupBy(sym("dst").as("n"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("n").as("node"))
        .agg(max(expr("c * 1099511627776L - (lbl + 1L)")).as("k"))
        .select(col("node"),
          expr("((k div 1099511627776L) + 1L) * 1099511627776L - k - 1L").as("lbl"))
    }
    labels.select(col("node").as("part"), col("lbl").as("community"))
      .orderBy(col("part"))
  }

  private final val CcRounds = 3

  /** Connected components by synchronous min-label propagation, 3
    * rounds: every node adopts the minimum id seen among itself and its
    * neighbors — after r rounds a node's label is the minimum id within
    * r hops, so on any component of diameter ≤ 3 the label IS the
    * component id. Fixed rounds keep the oracle an unrolled CTE
    * (exact integer match); at scale you run to fix-point — or switch
    * to the O(log d) pointer-doubling variant `dedup.Dedup` already
    * uses for cluster closure ([[graft.dedup.Dedup]] components; this
    * query is the oracle-checkable simple-iteration form). Each round
    * is one shuffled-hash join of the edge table against the node-sized
    * label frame + one map-side-combined min + one node-keyed least —
    * identical round shape to [[qGraphCommunities]]. */
  def qGraphCc(spark: SparkSession, dir: String): DataFrame =
    ccOnEdges(symmetricEdges(spark, dir), CcRounds)

  /** Core min-label rounds over an explicit symmetric edge frame —
    * factored out so specs can replay them on fixtures. */
  private[graft] def ccOnEdges(sym: DataFrame, rounds: Int): DataFrame = {
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      // same build-side policy as lpaOnEdges: shuffle-hash on the
      // node-sized label frame so the edge exchange is built once and
      // shared across rounds instead of re-broadcasting the edge scan
      val nbrMin = sym.join(labels.hint("shuffle_hash"),
          sym("src") === labels("node"))
        .groupBy(sym("dst").as("node")).agg(min(col("lbl")).as("nl"))
      labels = labels.join(nbrMin.hint("shuffle_hash"), Seq("node"))
        .select(col("node"), least(col("lbl"), col("nl")).as("lbl"))
    }
    labels.select(col("node").as("part"), col("lbl").as("component"))
      .orderBy(col("part"))
  }

  private final val BfsRounds = 3

  /** Personalized PageRank from the deterministic seed set
    * `partkey % 500 == 0` (the same flagged set [[qGraphBfs]] labels):
    * rank mass teleports back to the SEEDS instead of uniformly, so
    * high-pr nodes are "entities most reachable from the flagged set
    * by short weighted walks" — the recommendation / risk-propagation
    * query. Same fixed-point BIGINT arithmetic and per-round shape as
    * [[qGraphPagerank]] plus one node-keyed shuffled-hash join per
    * round to re-apply the seed-only base term (the seed frame reuses
    * the node partitioning round to round). */
  def qGraphPpr(spark: SparkSession, dir: String): DataFrame =
    pprOnEdges(symmetricEdges(spark, dir))

  /** Core personalized-PageRank iteration over an explicit symmetric
    * edge frame — factored out so specs can replay it on fixtures.
    *
    * r_0(v)    = Scale·1{v ∈ S}
    * r_{k+1}(v) = 15·Scale/100·1{v ∈ S} + (85 · Σ_{u→v} (r_k(u) div outdeg(u))) div 100
    *
    * Non-seed zero ranks still flow through the join (contrib 0) so
    * every round covers every node with an in-edge — no frontier
    * bookkeeping, identical round shape to the global PageRank. */
  private[graft] def pprOnEdges(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .withColumn("base",
        when(col("src") % 500 === 0, lit(Scale * 15 / 100)).otherwise(lit(0L)))
    var ranks = deg.select(col("src").as("node"),
      when(col("src") % 500 === 0, lit(Scale)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to Iterations) {
      val contrib = ranks.join(deg, ranks("node") === deg("src"))
        .select(ranks("node").as("cnode"), expr("pr div outdeg").as("c"))
      ranks = edges.join(contrib.hint("shuffle_hash"),
          edges("src") === col("cnode"))
        .groupBy(edges("dst").as("node"))
        .agg(sum(col("c")).as("s"))
        .join(deg.select(col("src").as("node"), col("base")).hint("shuffle_hash"),
          Seq("node"))
        .select(col("node"),
          expr(s"cast(base + ($Damp * s) div 100 as bigint)").as("pr"))
    }
    ranks
      .join(deg, ranks("node") === deg("src"))
      .select(col("node").as("part"), col("outdeg").as("degree"), col("pr"))
      .orderBy(col("part"))
  }

  /** Multi-source BFS hop labeling: every node's shortest-path distance
    * (capped at 3 hops) from the deterministic seed set
    * `partkey % 500 == 0` — the "blast radius" query (which entities
    * sit within k hops of a flagged set). On this corpus the frontier
    * exhausts at hop 2 (4 → 424 → 1572 at sf0.01), so the cap is
    * observably not the binding constraint. */
  def qGraphBfs(spark: SparkSession, dir: String): DataFrame =
    bfsOnEdges(symmetricEdges(spark, dir),
      seeds = symmetricEdges(spark, dir)
        .select(col("src").as("node")).distinct()
        .filter(col("node") % 500 === 0),
      rounds = BfsRounds)

  /** Core BFS rounds over explicit symmetric edges + seed frame —
    * factored out so specs can replay them on fixtures. Each round is
    * one shuffled hash join of the edge table against the (node-sized)
    * frontier plus one anti join against the accumulated levels; the
    * edge exchange is shared across rounds (ReuseExchange), and the
    * frontier shrinks once the graph saturates. */
  private[graft] def bfsOnEdges(sym: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    var levels = seeds.select(col("node"), lit(0L).as("level"))
    for (r <- 1 to rounds) {
      val frontier = levels.filter(col("level") === (r - 1))
        .select(col("node").as("fnode"))
      val next = sym
        .join(frontier.hint("shuffle_hash"), col("src") === col("fnode"))
        .select(col("dst").as("node")).distinct()
        .join(levels.select(col("node")).hint("shuffle_hash"),
          Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("level"))
      levels = levels.union(next)
    }
    levels.select(col("node").as("part"), col("level"))
      .orderBy(col("part"))
  }

  /** Modularity breakdown of the LPA communities — the quality metric
    * that says whether a clustering is better than chance: per
    * community c, `Q_c = e_c/m − (d_c/2m)²` (internal-edge share minus
    * the expected share under the configuration model); Σ Q_c is
    * Newman–Girvan modularity. Labels come from the SAME `lpaOnEdges`
    * rounds as [[qGraphCommunities]] (shared-definition rule), and the
    * contribution is carried ×10⁹ in DECIMAL(38,0) integral divisions
    * (d_c² overflows BIGINT at corpus scale) so Spark `div` and DuckDB
    * `//` agree exactly.
    *
    * Shape: two node-keyed shuffled-hash joins of the canonical edges
    * against the label frame, one degree rollup, a per-community
    * aggregate, and a 1-row edge-count broadcast. */
  def qGraphModularity(spark: SparkSession, dir: String): DataFrame = {
    val ce = canonicalEdges(spark, dir)
    // the label frame feeds THREE joins below; staged once per
    // (session, dir) so the 3 LPA rounds run once, not once per join
    // (unstaged, the bench measured 15.5 s — 3× the communities query)
    val labels = stagedLpa(spark, dir)
    val m = ce.agg(count(lit(1)).as("m"))
    val internal = ce
      .join(labels.select(col("node").as("src"), col("community").as("cs"))
        .hint("shuffle_hash"), Seq("src"))
      .join(labels.select(col("node").as("dst"), col("community").as("cd"))
        .hint("shuffle_hash"), Seq("dst"))
      .filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    val degs = symmetricEdges(spark, dir)
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    degs.join(labels.hint("shuffle_hash"), Seq("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("degree_sum"))
      .join(internal, Seq("community"), "left_outer")
      .na.fill(0L, Seq("internal_edges"))
      .crossJoin(broadcast(m))
      .withColumn("q_contrib_x1e9", expr(
        """cast((cast(internal_edges as decimal(38,0)) * 1000000000) div m
          | - (cast(degree_sum as decimal(38,0)) * degree_sum * 1000000000)
          |   div (cast(4 as decimal(38,0)) * m * m) as bigint)""".stripMargin))
      .select(col("community"), col("n_nodes"), col("internal_edges"),
        col("degree_sum"), col("q_contrib_x1e9"))
      .orderBy(col("community"))
  }

  private final val LinkPredTopK = 5

  /** Seed-anchored link prediction by the Resource-Allocation index
    * (Zhou–Lü–Zhang 2009): for each flagged seed s (`partkey % 500 ==
    * 0`, the same set [[qGraphBfs]]/[[qGraphPpr]] use) and every
    * non-adjacent two-hop candidate v,
    * `RA(s,v) = Σ_{w ∈ N(s)∩N(v)} 1/deg(w)`, carried exactly as
    * `1000000 div deg(w)` — RA, unlike Adamic–Adar's `1/ln(deg)`, is
    * RATIONAL, so the oracle hash-matches with no ulp risk. Top-5
    * candidates per seed — the "recommend what the flagged entities
    * are two co-purchases away from" query.
    *
    * Scale shape: anchoring on the seed set is what bounds wedge
    * enumeration — the seed-neighbor base is |S|·d̄ rows, so the
    * two-hop expansion costs one pass over the edge table instead of
    * the Σ deg² all-pairs wedge blowup (run whole-graph RA per seed
    * batch, never unanchored). The tiny seed frame broadcasts; the
    * candidate expansion, middle-degree lookup and known-edge anti
    * join follow the module's shuffled-hash round-join policy (never
    * broadcast the edge scan); the per-seed top-5 window partitions
    * by seed. */
  def qGraphLinkPred(spark: SparkSession, dir: String): DataFrame = {
    val sym = symmetricEdges(spark, dir)
    linkPredOnEdges(sym, sym.select(col("src").as("node")).distinct()
      .filter(col("node") % 500 === 0))
  }

  /** Core RA scoring over explicit symmetric edges + seed frame —
    * factored out so specs can replay it on fixtures. */
  private[graft] def linkPredOnEdges(sym: DataFrame, seeds: DataFrame): DataFrame = {
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val sn = sym.join(broadcast(seeds.select(col("node").as("s"))),
        col("src") === col("s"))
      .select(col("s"), col("dst").as("w"))
    val wedges = sym.join(sn.hint("shuffle_hash"), sym("src") === sn("w"))
      .select(col("s"), col("w"), sym("dst").as("cand"))
      .filter(col("cand") =!= col("s"))
    val open = wedges.join(
      sym.select(col("src").as("s"), col("dst").as("cand")).hint("shuffle_hash"),
      Seq("s", "cand"), "left_anti")
    val scored = open
      .join(deg.withColumnRenamed("node", "w").hint("shuffle_hash"), Seq("w"))
      .groupBy(col("s"), col("cand"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000 div d")).as("ra_x1e6"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(col("ra_x1e6").desc, col("cand"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= LinkPredTopK)
      .select(col("s").as("part"), col("rank"), col("cand"),
        col("common_neighbors"), col("ra_x1e6"))
      .orderBy(col("part"), col("rank"))
  }

  /** PageRank over the INCREMENTALLY-maintained edge table: the
    * membership rows arrive in three batches split on the PART key, so
    * an order's parts deliberately straddle batches — every merge must
    * produce cross-batch pairs (the ΔR ⋈ R_old term of the delta rule,
    * not just ΔR ⋈ ΔR) and dedupe pairs that recur across orders seen
    * in different batches. Built by [[EdgeMaintenance.rebuild]] + two
    * [[EdgeMaintenance.mergeBatch]] deltas. The oracle is VERBATIM the
    * batch [[qGraphPagerank]] oracle — the driver hash proves the
    * incrementally-grown graph is indistinguishable from the
    * rebuilt-from-scratch one. */
  def qGraphPagerankInc(spark: SparkSession, dir: String): DataFrame =
    pagerankOnEdges(symmetrize(incrementalEdges(spark, dir)))

  private def symmetrize(ce: DataFrame): DataFrame =
    ce.union(ce.select(col("dst").as("src"), col("src").as("dst")))

  /** Stage-once incremental edge build: rebuild from the first third
    * of the membership rows, merge the other two thirds as deltas. */
  private def incrementalEdges(spark: SparkSession, dir: String): DataFrame =
    SessionCache.checkpointed(spark, s"graph.edges.inc|$dir") {
      val base = s"target/graft-stage/${spark.sparkContext.applicationId}/edgeinc_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      EdgeMaintenance.rebuild(li.filter(col("l_partkey") % 3 === 0), base)
      EdgeMaintenance.mergeBatch(li.filter(col("l_partkey") % 3 === 1), base, 1L)
      EdgeMaintenance.mergeBatch(li.filter(col("l_partkey") % 3 === 2), base, 2L)
      EdgeMaintenance.edges(spark, base)
    }

  /** WEIGHTED canonical co-occurrence edges: (src < dst, n_orders
    * containing both) — the tie-strength the unweighted edge table
    * discards. Staged once per (session, dir), same shuffles as
    * [[canonicalEdges]] plus the count. */
  private def weightedEdges(spark: SparkSession, dir: String): DataFrame =
    SessionCache.checkpointed(spark, s"graph.wedges|$dir") {
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
    }

  private final val SsspRounds = 3

  /** Bounded-hop WEIGHTED shortest paths (Bellman–Ford relaxation)
    * from the flagged seed set — the "how cheaply can the flagged
    * entities reach X" query [[qGraphBfs]]'s hop counts can't answer:
    * edge cost is `10⁶ div n_orders` (strong co-purchase ties are
    * cheap), distance is the exact BIGINT min path cost within 3
    * hops. Unlike BFS, a relaxation round can IMPROVE already-labeled
    * nodes (a 2-hop path through strong ties may undercut a direct
    * weak tie), so each round re-mins the full node-sized distance
    * frame instead of expanding a shrinking frontier: one
    * shuffled-hash join of distances onto edges + one min-combine per
    * round — the textbook distributed Bellman–Ford shape. */
  def qGraphSssp(spark: SparkSession, dir: String): DataFrame = {
    val w = weightedEdges(spark, dir)
    val sym = w.union(w.select(col("dst").as("src"), col("src").as("dst"), col("cnt")))
      .withColumn("w", expr("1000000L div cnt"))
    val seeds = sym.select(col("src").as("node")).distinct()
      .filter(col("node") % 500 === 0)
    ssspOnEdges(sym, seeds, SsspRounds)
  }

  /** Core relaxation rounds over explicit symmetric weighted edges
    * (src, dst, w) + seed frame — factored out for spec replay. */
  private[graft] def ssspOnEdges(sym: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    var dist = seeds.select(col("node"), lit(0L).as("d"))
    for (_ <- 1 to rounds) {
      val relaxed = sym
        .join(dist.withColumnRenamed("node", "src").hint("shuffle_hash"),
          Seq("src"))
        .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("d")).as("d"))
    }
    dist.select(col("node").as("part"), col("d").as("dist_x1e6"))
      .orderBy(col("part"))
  }

  /** DEGREE ASSORTATIVITY — do hubs attach to hubs (r > 0) or to
    * leaves (r < 0)? Newman's r is the Pearson correlation of
    * (deg(src), deg(dst)) over the DIRECTED edge list; on a symmetric
    * edge list the two marginals coincide, so r collapses to the
    * RATIONAL `(m·Σxy − (Σx)²) / (m·Σx² − (Σx)²)` — no square root,
    * hence exactly representable ×10⁶ (negative values divide by
    * magnitude, the module's sign convention). Products ride
    * DECIMAL(38,0) (m·Σxy tops BIGINT at corpus scale). One degree
    * join per edge side + a 1-row moment readout — the cheapest graph
    * statistic in the module. */
  def qGraphAssortativity(spark: SparkSession, dir: String): DataFrame =
    assortativityOnEdges(symmetricEdges(spark, dir))

  /** Core over an explicit symmetric edge frame — factored for spec
    * replay on fixtures. */
  private[graft] def assortativityOnEdges(sym: DataFrame): DataFrame = {
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val pairs = sym
      .join(deg.select(col("src"), col("d").as("dx")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("d").as("dy"))
        .hint("shuffle_hash"), Seq("dst"))
    pairs.agg(count(lit(1)).as("m2"),
        sum(col("dx")).as("sx"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("m2"), col("sx"), col("sxx"), col("sxy"),
        expr(
          """cast(CASE
            |  WHEN cast(m2 as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx = 0
            |    THEN 0
            |  WHEN cast(m2 as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sx < 0
            |    THEN -(((cast(sx as decimal(38,0)) * sx - cast(m2 as decimal(38,0)) * sxy) * 1000000)
            |           div (cast(m2 as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx))
            |  ELSE ((cast(m2 as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sx) * 1000000)
            |       div (cast(m2 as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx)
            |END as bigint)""".stripMargin).as("r_ppm"))
  }

  /** Directed purchase edges customer → supplier (an order by customer
    * c containing a line supplied by s). Staged once per (session,
    * dir): the orders⋈lineitem join shuffles on orderkey, the distinct
    * on the (cust, supp) pair — at 100 TB this IS a stored table,
    * partitioned by cust. */
  private def bipartiteEdges(spark: SparkSession, dir: String): DataFrame =
    SessionCache.checkpointed(spark, s"graph.bip|$dir") {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
    }

  /** Force the one-time bipartite-edge staging (same attribution
    * policy as [[stageEdges]] — the bench charges it to its own line
    * instead of whichever HITS run goes first). */
  def stageBipartite(spark: SparkSession, dir: String): Unit = {
    bipartiteEdges(spark, dir); ()
  }

  /** HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    * customer → supplier purchase graph — the two-sided score the
    * undirected family can't express (on an undirected graph hubs ≡
    * authorities, which is why PageRank/PPR run on the co-occurrence
    * graph and HITS gets the bipartite one). Authority(s) = how much
    * hub mass points at supplier s; Hub(c) = how much authority mass
    * customer c points at.
    *
    * Two mutual-reinforcement rounds, L1-normalized each half-step so
    * scores are shares ×10⁹: `score = raw · 10⁹ div Σraw`, the product
    * carried in DECIMAL(38,0) (raw sums reach n·10⁶, so the ×10⁹
    * product overflows BIGINT at corpus scale) — Spark decimal `div`
    * ≡ DuckDB HUGEINT `//` on positives, so the oracle hash-matches
    * exactly.
    *
    * Shape per half-step: one equi-join of the node-sized score frame
    * onto the edge table (shuffled-hash per the module's round-join
    * policy — never broadcast the edge scan) + one map-side-combined
    * aggregate + a 1-row total broadcast. Edge exchanges on cust and
    * on supp are each reused across rounds (ReuseExchange). */
  def qGraphHits(spark: SparkSession, dir: String): DataFrame =
    hitsOnEdges(bipartiteEdges(spark, dir))

  /** Core HITS rounds over an explicit (cust, supp) edge frame —
    * factored out so specs can replay it on fixtures. */
  private[graft] def hitsOnEdges(bip: DataFrame): DataFrame = {
    def l1norm(raw: DataFrame, key: String, out: String): DataFrame = {
      val tot = raw.agg(sum(col("raw")).as("tot"))
      raw.crossJoin(broadcast(tot))
        .select(col(key), expr(
          s"cast((cast(raw as decimal(38,0)) * 1000000000) div tot as bigint)")
          .as(out))
    }
    val h0 = bip.select(col("cust").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("h"))
    val ar1 = bip.join(h0.hint("shuffle_hash"), bip("cust") === h0("node"))
      .groupBy(col("supp")).agg(sum(col("h")).as("raw"))
    val a1 = l1norm(ar1, "supp", "a")
    val hr1 = bip.join(a1.hint("shuffle_hash"), Seq("supp"))
      .groupBy(col("cust")).agg(sum(col("a")).as("raw"))
    val h1 = l1norm(hr1, "cust", "h")
    val ar2 = bip.join(h1.hint("shuffle_hash"), Seq("cust"))
      .groupBy(col("supp")).agg(sum(col("h")).as("raw"))
    val a2 = l1norm(ar2, "supp", "a")
    a2.select(lit("authority").as("kind"), col("supp").as("node"),
        col("a").as("score_x1e9"))
      .union(h1.select(lit("hub").as("kind"), col("cust").as("node"),
        col("h").as("score_x1e9")))
      .orderBy(col("kind"), col("node"))
  }

  // -----------------------------------------------------------------
  // registration
  // -----------------------------------------------------------------

  /** SEEDED BETWEENNESS (Brandes 2001, public paper — forward sigma +
    * backward dependency accumulation, from the deterministic flagged
    * seed set shared with [[qGraphBfs]]/[[qGraphPpr]], hop-capped at
    * [[BfsRounds]]): the "who brokers the flow" centrality the
    * degree/PageRank family can't see (a low-degree node on every
    * shortest path between two clusters is invisible to both).
    *
    * Forward: per-seed BFS where each frontier node's σ = Σ σ of its
    * predecessors (shortest-path counts — one grouped join per hop,
    * frames keyed (seed, node): |seeds|·|V| rows, seeds constant, so
    * linear in V). Backward: δ(v) = Σ_{v→w in the BFS DAG}
    * (σ_v·(10⁶+δ_w)) div σ_w — Brandes's accumulation carried ×10⁶ in
    * integral division (products in DECIMAL(38,0); σ·δ outgrows BIGINT
    * before the divide), level-by-level so the truncation order is
    * deterministic and the DuckDB oracle replays it bit-for-bit.
    * Output per node: seeds reaching it, total path count, total
    * dependency — the Σ_s δ_s(v) betweenness readout. */
  def qGraphBetweenness(spark: SparkSession, dir: String): DataFrame =
    betweennessOnEdges(symmetricEdges(spark, dir), BfsRounds)

  /** Pivot cap (Brandes–Pich 2007: betweenness from a fixed sample of
    * source pivots): the flagged set grows with the corpus (400 nodes
    * at sf0.1), and per-pivot frames are node-sized — an UNcapped seed
    * set makes the forward pass |flagged|·|V| (80M rows at sf0.1,
    * measured 17s). 16 deterministic pivots (smallest flagged ids)
    * keep the estimate stable across corpus growth and the cost
    * linear in V. */
  private[graft] val BetweennessPivots = 16

  private[graft] def betweennessOnEdges(sym: DataFrame, rounds: Int): DataFrame = {
    val seeds = sym.select(col("src").as("node")).distinct()
      .filter(col("node") % 500 === 0)
      .orderBy(col("node")).limit(BetweennessPivots)
    // forward: (seed, node, level, sigma), one frame per level, each
    // MATERIALIZED (localCheckpoint — level-sized, ≤ pivots·V rows) as
    // soon as it's computed. The previous formulation staged only the
    // final union — but every round references the running union twice
    // (frontier + visited anti-join), so the lineage recomputed each
    // earlier level ~2× per later round (2^rounds blow-up of the BFS
    // joins before the one stage; measured 17.6s at sf0.1, 9.7s with
    // per-level materialization). All pivots advance together in one
    // (seed, node)-keyed frame per hop — one join per level, not one
    // BFS per pivot. localCheckpoint (not parquet staging) per the
    // bounded-ephemeral rule — SCALE.md "Iterative-materialization
    // policy": an executor loss retries the whole seconds-long query.
    val lvl0 = seeds.select(col("node").as("seed"), col("node"),
      lit(0L).as("level"), lit(1L).as("sigma"))
    val lvl = new scala.collection.mutable.ArrayBuffer[DataFrame]()
    lvl += lvl0.localCheckpoint()
    var visited = lvl(0).select(col("seed"), col("node"))
    for (r <- 1 to rounds) {
      val frontier = lvl(r - 1)
        .select(col("seed"), col("node").as("fnode"), col("sigma").as("fsig"))
      val next = sym
        .join(frontier.hint("shuffle_hash"), col("src") === col("fnode"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("fsig")).as("sigma"))
        .join(visited.hint("shuffle_hash"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(r.toLong).as("level"), col("sigma"))
      lvl += next.localCheckpoint()
      visited = visited.union(lvl(r).select(col("seed"), col("node")))
    }
    val levels = lvl.reduce(_ union _)
    // backward: (seed, node, delta) per level, deepest level seeds the
    // recursion at 0. The level-r+1 (σ, δ) pair is pre-joined BEFORE
    // touching the edge fan-out — both operands are level-sized
    // (≤ pivots·V rows), so the pivots·E-sized fan-out frame shuffles
    // through one join per round instead of two.
    val dLvl = new scala.collection.mutable.ArrayBuffer[DataFrame](rounds + 1)
    (0 to rounds).foreach(_ => dLvl += null)
    dLvl(rounds) = lvl(rounds)
      .select(col("seed"), col("node"), lit(0L).as("delta"))
    for (r <- (rounds - 1) to 0 by -1) {
      val cur = lvl(r)
        .select(col("seed"), col("node").as("vnode"), col("sigma").as("vsig"))
      // the deepest level's δ is identically 0 — no join needed to
      // know it, and this shortcut falls in the heaviest round (the
      // deepest levels are the widest frames on a dense graph)
      val wContrib =
        if (r == rounds - 1)
          lvl(r + 1).select(col("seed").as("wseed"), col("node").as("wnode"),
            col("sigma").as("wsig"), lit(0L).as("wdelta"))
        else lvl(r + 1)
          .join(dLvl(r + 1).hint("shuffle_hash"), Seq("seed", "node"))
          .select(col("seed").as("wseed"), col("node").as("wnode"),
            col("sigma").as("wsig"), col("delta").as("wdelta"))
      val contrib = cur
        .join(sym.hint("shuffle_hash"), col("src") === col("vnode"))
        .join(wContrib.hint("shuffle_hash"),
          col("wseed") === col("seed") && col("wnode") === col("dst"))
        .select(col("seed"), col("vnode"),
          expr("cast((cast(vsig as decimal(38,0)) * (1000000 + wdelta)) div wsig as bigint)")
            .as("term"))
        .groupBy(col("seed"), col("vnode"))
        .agg(sum(col("term")).as("d"))
      val layer = cur
        .join(contrib, Seq("seed", "vnode"), "left_outer")
        .select(col("seed"), col("vnode").as("node"),
          coalesce(col("d"), lit(0L)).as("delta"))
      // materialize each backward layer: round r−1 and the final join
      // both re-reference it — unmaterialized, every reference re-ran
      // the whole deeper chain of joins (the forward-pass lesson,
      // recursively)
      dLvl(r) = layer.localCheckpoint()
    }
    val delta = dLvl.reduce(_ union _)
    levels.join(delta, Seq("seed", "node"))
      .filter(col("node") =!= col("seed"))
      .groupBy(col("node").as("part"))
      .agg(count(lit(1)).as("n_seeds"),
        sum(col("sigma")).as("sigma_total"),
        sum(col("delta")).as("betweenness_x1e6"))
      .orderBy(col("part"))
  }

  /** Neighborhood Jaccard similarity of each flagged seed
    * (`partkey % 500 == 0`) with its direct neighbors, top-5 per seed:
    * |N(s)∩N(v)| / |N(s)∪N(v)| in fixed-point ppm — the "structurally
    * interchangeable entities" query (two parts whose co-purchase
    * neighborhoods coincide are substitutes even if never co-bought).
    *
    * Shape is [[qGraphLinkPred]]'s wedge enumeration with the CLOSED
    * wedges kept instead of the open ones: cost is bounded by
    * Σ_{s∈seeds} Σ_{w~s} deg(w) (seed-anchored, never all-pairs), the
    * closure test is one left-semi join against the seed-neighbor
    * frame, and the union size comes off the degree table —
    * |N(s)|+|N(v)|−common, no second traversal. */
  def qGraphJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardOnEdges(symmetricEdges(spark, dir))

  private[graft] def jaccardOnEdges(sym: DataFrame): DataFrame = {
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val seeds = sym.select(col("src").as("s")).distinct()
      .filter(col("s") % 500 === 0)
    val sn = sym.join(seeds.hint("shuffle_hash"), col("src") === col("s"))
      .select(col("s"), col("dst").as("v"))
    val wedges = sym
      .join(sn.select(col("s"), col("v").as("w")).hint("shuffle_hash"),
        col("src") === col("w"))
      .select(col("s"), col("dst").as("v"))
      .filter(col("v") =!= col("s"))
    val common = wedges
      .join(sn, Seq("s", "v"), "left_semi") // keep only (s,v) that ARE edges
      .groupBy(col("s"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    val scored = common
      .join(deg.select(col("node").as("s"), col("d").as("ds")), Seq("s"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("s"), col("v"), col("common_neighbors"),
        expr("cast((1000000 * common_neighbors) div (ds + dv - common_neighbors) as bigint)")
          .as("jaccard_ppm"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("s"))
          .orderBy(col("jaccard_ppm").desc, col("v"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("s").as("part"), col("rank"), col("v").as("neighbor"),
        col("common_neighbors"), col("jaccard_ppm"))
      .orderBy(col("part"), col("rank"))
  }

  /** Hop-capped harmonic closeness of 16 pivot seeds: per seed, the
    * count of nodes at each exact shortest-path distance 1..rounds and
    * the harmonic sum Σ 1/dist carried ×1e6 in integral arithmetic
    * (Σ_r (1e6·n_r) div r) — the "who can reach the most, fastest"
    * centrality, exact within the cap.
    *
    * Per-seed levels are keyed (seed, node) like the betweenness
    * forward pass: each hop is one shuffled-hash join of the edge
    * table against the frontier plus one anti join against the
    * accumulated visited set, each level materialized once. The seed
    * set is capped at [[ClosenessPivots]] deterministic pivots
    * (smallest flagged ids) for the same reason betweenness caps: the
    * flagged set grows with the corpus (400 at sf0.1), and on this
    * dense graph nearly every node is within the hop cap of every
    * seed — uncapped, the level frames are |flagged|·|V| (the same
    * ~80M-row blow-up the betweenness cap closed). */
  def qGraphCloseness(spark: SparkSession, dir: String): DataFrame =
    closenessFromLevels(stagedPivotLevels(spark, dir), BfsRounds)

  /** The pivot-BFS level frame staged once per (session, corpus):
    * TWO queries read it (harmonic closeness and the eccentricity
    * audit) and it is O(pivots·V) — reused-across-queries and
    * corpus-scaled, so per the SCALE.md materialization policy it
    * goes to parquet, not localCheckpoint (the per-level frames
    * INSIDE the BFS remain localCheckpoint — level-sized, single
    * derivation). */
  private def stagedPivotLevels(spark: SparkSession, dir: String): DataFrame =
    SessionCache.checkpointed(spark, s"graph.pivotlevels|$dir")(
      pivotLevels(symmetricEdges(spark, dir), BfsRounds))

  /** Pivot cap, mirrored in the DuckDB oracle (see
    * [[BetweennessPivots]] for the rationale). */
  private[graft] val ClosenessPivots = 16

  /** The batched-pivot BFS levels (seed, node, level ∈ 1..rounds) —
    * ONE protocol shared by harmonic closeness and the eccentricity /
    * diameter audit; all pivots advance together per level, per-level
    * frames localCheckpoint-materialized (bounded ephemeral). */
  private[graft] def pivotLevels(sym: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"pivot BFS needs at least one hop, got $rounds")
    val seeds = sym.select(col("src").as("node")).distinct()
      .filter(col("node") % 500 === 0)
      .orderBy(col("node")).limit(ClosenessPivots)
    val lvl = new scala.collection.mutable.ArrayBuffer[DataFrame]()
    lvl += seeds.select(col("node").as("seed"), col("node"),
      lit(0L).as("level")).localCheckpoint()
    var visited = lvl(0).select(col("seed"), col("node"))
    for (r <- 1 to rounds) {
      val frontier = lvl(r - 1).select(col("seed"), col("node").as("fnode"))
      val next = sym
        .join(frontier.hint("shuffle_hash"), col("src") === col("fnode"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(visited.hint("shuffle_hash"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(r.toLong).as("level"))
      lvl += next.localCheckpoint()
      visited = visited.union(lvl(r).select(col("seed"), col("node")))
    }
    lvl.drop(1).reduce(_ union _)
  }

  private[graft] def closenessOnEdges(sym: DataFrame, rounds: Int): DataFrame =
    closenessFromLevels(pivotLevels(sym, rounds), rounds)

  private[graft] def closenessFromLevels(levels: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"closeness needs at least one hop, got $rounds")
    // level columns and the harmonic formula derive from `rounds` —
    // n1..n_rounds, closeness = Σ_r (1e6·n_r) div r
    val nCols = (1 to rounds).map(r =>
      sum(when(col("level") === r.toLong, 1L).otherwise(0L)).as(s"n$r"))
    val harmonic = (1 to rounds).map {
      case 1 => "1000000 * n1"
      case r => s"(1000000 * n$r) div $r"
    }.mkString(" + ")
    levels
      .groupBy(col("seed").as("part"))
      .agg(nCols.head, nCols.tail: _*)
      .select(Seq(col("part")) ++ (1 to rounds).map(r => col(s"n$r")) :+
        expr(s"cast($harmonic as bigint)").as("closeness_x1e6"): _*)
      .orderBy(col("part"))
  }

  /** Log2-bucketed degree histogram — the one-line answer to "is this
    * graph skewed enough to need the degree-oriented / salted paths".
    * Bucket = floor(log2(degree)) computed EXACTLY as
    * length(bin(degree))−1 (no floating log at bucket boundaries;
    * DuckDB replays it as length(printf('%b', d))−1). One count
    * aggregate over the degree frame — map-side combined, node-sized. */
  /** PIVOT ECCENTRICITY / DIAMETER AUDIT (the iFUB/pivot-BFS family —
    * Crescenzi et al. 2013 use exactly this "max distance from sampled
    * pivots" as the diameter LOWER bound): over the SAME 16-pivot
    * batched BFS levels as harmonic closeness (shared [[pivotLevels]]
    * — the two reachability readouts cannot disagree), each pivot's
    * k-hop capped eccentricity and reach, plus the global diameter
    * and radius lower bounds as 1-row broadcast columns. Within the
    * 3-hop horizon an ecc of 3 means "≥ 3"; a smaller value is EXACT
    * for that pivot (its frontier emptied). The level frame is STAGED
    * once per corpus — whichever of closeness/eccentricity runs first
    * pays the BFS, the other reads parquet. */
  def qGraphEccentricity(spark: SparkSession, dir: String): DataFrame = {
    val per = stagedPivotLevels(spark, dir)
      .groupBy(col("seed").as("part"))
      .agg(count(lit(1)).as("n_reached"), max(col("level")).as("ecc_capped"))
    val g = per.agg(max(col("ecc_capped")).as("diameter_lb"),
      min(col("ecc_capped")).as("radius_lb"))
    per.crossJoin(broadcast(g)).orderBy(col("part"))
  }

  /** LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998) — per node,
    * the share of its neighbor pairs that are themselves connected:
    * lcc = 2·T(v) / (d(v)·(d(v)−1)) in exact ppm, T(v) from the SAME
    * oriented triangle counter the global query uses (shared
    * definition), plus the network average clustering coefficient —
    * the small-world readout — as a 1-row broadcast column. Nodes
    * with degree < 2 have no neighbor pair and are excluded (the
    * standard convention). Two scans of the STAGED edge table, the
    * triangle join tier, one node-keyed combine. */
  def qGraphLcc(spark: SparkSession, dir: String): DataFrame = {
    val ce = canonicalEdges(spark, dir)
    val deg = ce.union(ce.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    val tri = trianglesOnEdges(ce)
      .select(col("part").as("node"), col("n_triangles"))
    val base = deg.filter(col("degree") >= 2)
      .join(tri, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("lcc_ppm",
        expr("(2 * n_triangles * 1000000) div (degree * (degree - 1))"))
      // read by the network-average AND the output — node-sized
      // ephemeral, so the triangle tier derives exactly once
      .localCheckpoint()
    val avg = base.agg(expr("sum(lcc_ppm) div count(1)").as("avg_lcc_ppm"))
    base.crossJoin(broadcast(avg)).orderBy(col("node"))
  }

  def qGraphDegreeHist(spark: SparkSession, dir: String): DataFrame =
    degreeHistOnEdges(symmetricEdges(spark, dir))

  private[graft] def degreeHistOnEdges(sym: DataFrame): DataFrame =
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      .select(expr("cast(length(bin(d)) - 1 as bigint)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_nodes"))
      .select(col("bucket"),
        expr("cast(shiftleft(1L, cast(bucket as int)) as bigint)").as("min_degree"),
        col("n_nodes"))
      .orderBy(col("bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_jaccard" -> qGraphJaccard,
    "q_graph_closeness" -> qGraphCloseness,
    "q_graph_eccentricity" -> qGraphEccentricity,
    "q_graph_degree_hist" -> qGraphDegreeHist,
    "q_graph_betweenness" -> qGraphBetweenness,
    "q_graph_pagerank" -> qGraphPagerank,
    "q_graph_pagerank_inc" -> qGraphPagerankInc,
    "q_graph_triangles" -> qGraphTriangles,
    "q_graph_lcc" -> qGraphLcc,
    "q_graph_kcore" -> qGraphKcore,
    "q_graph_cc" -> qGraphCc,
    "q_graph_communities" -> qGraphCommunities,
    "q_graph_modularity" -> qGraphModularity,
    "q_graph_bfs" -> qGraphBfs,
    "q_graph_linkpred" -> qGraphLinkPred,
    "q_graph_ppr" -> qGraphPpr,
    "q_graph_hits" -> qGraphHits,
    "q_graph_sssp" -> qGraphSssp,
    "q_graph_assortativity" -> qGraphAssortativity,
    "q_graph_katz" -> qGraphKatz)

  private val edgesCte =
    """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |ce AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |       FROM li a JOIN li b
      |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |edges AS (SELECT src, dst FROM ce UNION ALL SELECT dst AS src, src AS dst FROM ce)""".stripMargin

  /** The 3 unrolled pivot-BFS rounds ending in `cnt(part, n1, n2,
    * n3)` — ONE definition shared by the closeness and eccentricity
    * oracles (mirrors [[pivotLevels]]). */
  private val pivotBfsCte =
    """seeds AS (SELECT DISTINCT src AS seed FROM edges
      |          WHERE src % 500 = 0 ORDER BY seed LIMIT 16),
      |l1 AS (SELECT DISTINCT s.seed, e.dst AS node
      |       FROM edges e JOIN seeds s ON e.src = s.seed
      |       WHERE e.dst <> s.seed),
      |l2 AS (SELECT DISTINCT l1.seed, e.dst AS node
      |       FROM edges e JOIN l1 ON e.src = l1.node
      |       WHERE e.dst <> l1.seed
      |         AND NOT EXISTS (SELECT 1 FROM l1 p
      |                         WHERE p.seed = l1.seed AND p.node = e.dst)),
      |l3 AS (SELECT DISTINCT l2.seed, e.dst AS node
      |       FROM edges e JOIN l2 ON e.src = l2.node
      |       WHERE e.dst <> l2.seed
      |         AND NOT EXISTS (SELECT 1 FROM l1 p
      |                         WHERE p.seed = l2.seed AND p.node = e.dst)
      |         AND NOT EXISTS (SELECT 1 FROM l2 p
      |                         WHERE p.seed = l2.seed AND p.node = e.dst)),
      |cnt AS (SELECT seeds.seed AS part,
      |          (SELECT COUNT(*) FROM l1 WHERE l1.seed = seeds.seed) AS n1,
      |          (SELECT COUNT(*) FROM l2 WHERE l2.seed = seeds.seed) AS n2,
      |          (SELECT COUNT(*) FROM l3 WHERE l3.seed = seeds.seed) AS n3
      |        FROM seeds)""".stripMargin

  /** The 3 unrolled LPA label rounds ending in `l3(node, lbl)` — ONE
    * definition shared by the communities and modularity oracles. */
  private val lpaLabelsCte =
    """l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
      |l1 AS (SELECT node, lbl FROM (
      |  SELECT e.dst AS node, r.lbl AS lbl,
      |         ROW_NUMBER() OVER (PARTITION BY e.dst
      |           ORDER BY COUNT(*) DESC, r.lbl) AS rn
      |  FROM edges e JOIN l0 r ON e.src = r.node
      |  GROUP BY e.dst, r.lbl) WHERE rn = 1),
      |l2 AS (SELECT node, lbl FROM (
      |  SELECT e.dst AS node, r.lbl AS lbl,
      |         ROW_NUMBER() OVER (PARTITION BY e.dst
      |           ORDER BY COUNT(*) DESC, r.lbl) AS rn
      |  FROM edges e JOIN l1 r ON e.src = r.node
      |  GROUP BY e.dst, r.lbl) WHERE rn = 1),
      |l3 AS (SELECT node, lbl FROM (
      |  SELECT e.dst AS node, r.lbl AS lbl,
      |         ROW_NUMBER() OVER (PARTITION BY e.dst
      |           ORDER BY COUNT(*) DESC, r.lbl) AS rn
      |  FROM edges e JOIN l2 r ON e.src = r.node
      |  GROUP BY e.dst, r.lbl) WHERE rn = 1)""".stripMargin

  private val pagerankOracle =
    s"""WITH $edgesCte,
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS pr FROM deg),
       |r1 AS (SELECT e.dst AS node,
       |         CAST(150000000 + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
       |       FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON d.src = e.src
       |       GROUP BY e.dst),
       |r2 AS (SELECT e.dst AS node,
       |         CAST(150000000 + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
       |       FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON d.src = e.src
       |       GROUP BY e.dst),
       |r3 AS (SELECT e.dst AS node,
       |         CAST(150000000 + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
       |       FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON d.src = e.src
       |       GROUP BY e.dst)
       |SELECT r3.node AS part, deg.outdeg AS degree, r3.pr
       |FROM r3 JOIN deg ON deg.src = r3.node
       |ORDER BY part""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_graph_betweenness" ->
      s"""WITH $edgesCte,
         |l0 AS (SELECT seed, seed AS node, CAST(1 AS BIGINT) AS sig FROM (
         |         SELECT DISTINCT src AS seed FROM edges WHERE src % 500 = 0
         |         ORDER BY seed LIMIT 16)),
         |l1 AS (SELECT l0.seed, e.dst AS node, CAST(SUM(l0.sig) AS BIGINT) AS sig
         |       FROM edges e JOIN l0 ON e.src = l0.node
         |       WHERE NOT EXISTS (SELECT 1 FROM l0 x
         |                         WHERE x.seed = l0.seed AND x.node = e.dst)
         |       GROUP BY 1, 2),
         |l2 AS (SELECT l1.seed, e.dst AS node, CAST(SUM(l1.sig) AS BIGINT) AS sig
         |       FROM edges e JOIN l1 ON e.src = l1.node
         |       WHERE NOT EXISTS (SELECT 1 FROM l0 x
         |                         WHERE x.seed = l1.seed AND x.node = e.dst)
         |         AND NOT EXISTS (SELECT 1 FROM l1 y
         |                         WHERE y.seed = l1.seed AND y.node = e.dst)
         |       GROUP BY 1, 2),
         |l3 AS (SELECT l2.seed, e.dst AS node, CAST(SUM(l2.sig) AS BIGINT) AS sig
         |       FROM edges e JOIN l2 ON e.src = l2.node
         |       WHERE NOT EXISTS (SELECT 1 FROM l0 x
         |                         WHERE x.seed = l2.seed AND x.node = e.dst)
         |         AND NOT EXISTS (SELECT 1 FROM l1 y
         |                         WHERE y.seed = l2.seed AND y.node = e.dst)
         |         AND NOT EXISTS (SELECT 1 FROM l2 z
         |                         WHERE z.seed = l2.seed AND z.node = e.dst)
         |       GROUP BY 1, 2),
         |d3 AS (SELECT seed, node, CAST(0 AS BIGINT) AS delta FROM l3),
         |d2 AS (SELECT v.seed, v.node,
         |         CAST(COALESCE(SUM((CAST(v.sig AS HUGEINT) * (1000000 + d.delta)) // w.sig), 0)
         |           AS BIGINT) AS delta
         |       FROM l2 v
         |       LEFT JOIN edges e ON e.src = v.node
         |       LEFT JOIN l3 w ON w.seed = v.seed AND w.node = e.dst
         |       LEFT JOIN d3 d ON d.seed = v.seed AND d.node = w.node
         |       GROUP BY 1, 2),
         |d1 AS (SELECT v.seed, v.node,
         |         CAST(COALESCE(SUM((CAST(v.sig AS HUGEINT) * (1000000 + d.delta)) // w.sig), 0)
         |           AS BIGINT) AS delta
         |       FROM l1 v
         |       LEFT JOIN edges e ON e.src = v.node
         |       LEFT JOIN l2 w ON w.seed = v.seed AND w.node = e.dst
         |       LEFT JOIN d2 d ON d.seed = v.seed AND d.node = w.node
         |       GROUP BY 1, 2),
         |d0 AS (SELECT v.seed, v.node,
         |         CAST(COALESCE(SUM((CAST(v.sig AS HUGEINT) * (1000000 + d.delta)) // w.sig), 0)
         |           AS BIGINT) AS delta
         |       FROM l0 v
         |       LEFT JOIN edges e ON e.src = v.node
         |       LEFT JOIN l1 w ON w.seed = v.seed AND w.node = e.dst
         |       LEFT JOIN d1 d ON d.seed = v.seed AND d.node = w.node
         |       GROUP BY 1, 2),
         |lv AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1
         |       UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3),
         |dv AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1
         |       UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
         |SELECT l.node AS part, CAST(COUNT(*) AS BIGINT) AS n_seeds,
         |  CAST(SUM(l.sig) AS BIGINT) AS sigma_total,
         |  CAST(SUM(d.delta) AS BIGINT) AS betweenness_x1e6
         |FROM lv l JOIN dv d ON d.seed = l.seed AND d.node = l.node
         |WHERE l.node <> l.seed
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the incremental build must be indistinguishable from the batch
    // build — SAME oracle, so the driver hash compares them to one SQL
    "q_graph_pagerank_inc" -> pagerankOracle,
    "q_graph_pagerank" -> pagerankOracle,
    "q_graph_katz" ->
      s"""WITH $edgesCte,
         |k1 AS (SELECT dst AS node, CAST(1000000000 AS BIGINT) AS katz
         |       FROM edges GROUP BY dst),
         |k2 AS (SELECT e.dst AS node,
         |         CAST(1000000000 + SUM(k.katz) // 4 AS BIGINT) AS katz
         |       FROM edges e JOIN k1 k ON k.node = e.src GROUP BY e.dst),
         |k3 AS (SELECT e.dst AS node,
         |         CAST(1000000000 + SUM(k.katz) // 4 AS BIGINT) AS katz
         |       FROM edges e JOIN k2 k ON k.node = e.src GROUP BY e.dst)
         |SELECT node AS part, katz FROM k3 ORDER BY part""".stripMargin,
    "q_graph_triangles" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
         |o AS (SELECT
         |        CASE WHEN (da.d < db.d) OR (da.d = db.d AND ce.src < ce.dst)
         |             THEN ce.src ELSE ce.dst END AS u,
         |        CASE WHEN (da.d < db.d) OR (da.d = db.d AND ce.src < ce.dst)
         |             THEN ce.dst ELSE ce.src END AS v
         |      FROM ce
         |      JOIN deg da ON da.node = ce.src
         |      JOIN deg db ON db.node = ce.dst),
         |od AS (SELECT o.u, o.v, dv.d AS vd FROM o JOIN deg dv ON dv.node = o.v),
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |        FROM od e1 JOIN od e2 ON e1.u = e2.u
         |        WHERE ((e1.vd < e2.vd) OR (e1.vd = e2.vd AND e1.v < e2.v))
         |          AND EXISTS (SELECT 1 FROM o WHERE o.u = e1.v AND o.v = e2.v))
         |SELECT part, COUNT(*) AS n_triangles
         |FROM (SELECT a AS part FROM tri
         |      UNION ALL SELECT b FROM tri
         |      UNION ALL SELECT c FROM tri)
         |GROUP BY part
         |ORDER BY part""".stripMargin,
    "q_graph_lcc" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
         |o AS (SELECT
         |        CASE WHEN (da.d < db.d) OR (da.d = db.d AND ce.src < ce.dst)
         |             THEN ce.src ELSE ce.dst END AS u,
         |        CASE WHEN (da.d < db.d) OR (da.d = db.d AND ce.src < ce.dst)
         |             THEN ce.dst ELSE ce.src END AS v
         |      FROM ce
         |      JOIN deg da ON da.node = ce.src
         |      JOIN deg db ON db.node = ce.dst),
         |od AS (SELECT o.u, o.v, dv.d AS vd FROM o JOIN deg dv ON dv.node = o.v),
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |        FROM od e1 JOIN od e2 ON e1.u = e2.u
         |        WHERE ((e1.vd < e2.vd) OR (e1.vd = e2.vd AND e1.v < e2.v))
         |          AND EXISTS (SELECT 1 FROM o WHERE o.u = e1.v AND o.v = e2.v)),
         |tn AS (SELECT part AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
         |       FROM (SELECT a AS part FROM tri
         |             UNION ALL SELECT b FROM tri
         |             UNION ALL SELECT c FROM tri)
         |       GROUP BY part),
         |base AS (
         |  SELECT deg.node, CAST(deg.d AS BIGINT) AS degree,
         |    coalesce(tn.n_triangles, 0) AS n_triangles,
         |    (2 * coalesce(tn.n_triangles, 0) * 1000000)
         |      // (deg.d * (deg.d - 1)) AS lcc_ppm
         |  FROM deg LEFT JOIN tn USING (node) WHERE deg.d >= 2),
         |av AS (SELECT CAST(sum(lcc_ppm) // count(*) AS BIGINT) AS avg_lcc_ppm
         |       FROM base)
         |SELECT base.node, base.degree, base.n_triangles,
         |  CAST(base.lcc_ppm AS BIGINT) AS lcc_ppm, av.avg_lcc_ppm
         |FROM base CROSS JOIN av ORDER BY base.node""".stripMargin,
    "q_graph_kcore" ->
      s"""WITH $edgesCte,
         |a1 AS (SELECT src AS node FROM edges GROUP BY src
         |       HAVING COUNT(*) >= $CoreK),
         |d2 AS (SELECT e.src AS n, COUNT(*) AS d FROM edges e
         |       JOIN a1 s ON e.src = s.node JOIN a1 t ON e.dst = t.node
         |       GROUP BY e.src),
         |a2 AS (SELECT n AS node FROM d2 WHERE d >= $CoreK),
         |d3 AS (SELECT e.src AS n, COUNT(*) AS d FROM edges e
         |       JOIN a2 s ON e.src = s.node JOIN a2 t ON e.dst = t.node
         |       GROUP BY e.src),
         |a3 AS (SELECT n AS node FROM d3 WHERE d >= $CoreK)
         |SELECT e.src AS part, COUNT(*) AS degree FROM edges e
         |JOIN a3 s ON e.src = s.node JOIN a3 t ON e.dst = t.node
         |GROUP BY e.src
         |ORDER BY part""".stripMargin,
    "q_graph_cc" ->
      s"""WITH $edgesCte,
         |c0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
         |c1 AS (SELECT l.node, LEAST(l.lbl, n.nl) AS lbl
         |       FROM c0 l JOIN (SELECT e.dst AS node, MIN(r.lbl) AS nl
         |                       FROM edges e JOIN c0 r ON e.src = r.node
         |                       GROUP BY e.dst) n ON l.node = n.node),
         |c2 AS (SELECT l.node, LEAST(l.lbl, n.nl) AS lbl
         |       FROM c1 l JOIN (SELECT e.dst AS node, MIN(r.lbl) AS nl
         |                       FROM edges e JOIN c1 r ON e.src = r.node
         |                       GROUP BY e.dst) n ON l.node = n.node),
         |c3 AS (SELECT l.node, LEAST(l.lbl, n.nl) AS lbl
         |       FROM c2 l JOIN (SELECT e.dst AS node, MIN(r.lbl) AS nl
         |                       FROM edges e JOIN c2 r ON e.src = r.node
         |                       GROUP BY e.dst) n ON l.node = n.node)
         |SELECT node AS part, lbl AS component FROM c3
         |ORDER BY part""".stripMargin,
    "q_graph_linkpred" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
         |seeds AS (SELECT DISTINCT src AS s FROM edges WHERE src % 500 = 0),
         |sn AS (SELECT seeds.s, edges.dst AS w
         |       FROM edges JOIN seeds ON edges.src = seeds.s),
         |wedges AS (SELECT sn.s, sn.w, e.dst AS cand
         |           FROM edges e JOIN sn ON e.src = sn.w
         |           WHERE e.dst <> sn.s),
         |open AS (SELECT * FROM wedges wg WHERE NOT EXISTS
         |         (SELECT 1 FROM edges x WHERE x.src = wg.s AND x.dst = wg.cand)),
         |scored AS (SELECT s, cand,
         |             CAST(count(*) AS BIGINT) AS common_neighbors,
         |             CAST(sum(1000000 // deg.d) AS BIGINT) AS ra_x1e6
         |           FROM open JOIN deg ON open.w = deg.node
         |           GROUP BY s, cand),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY s
         |            ORDER BY ra_x1e6 DESC, cand) AS BIGINT) AS rank
         |      FROM scored)
         |SELECT s AS part, rank, cand, common_neighbors, ra_x1e6
         |FROM r WHERE rank <= 5 ORDER BY part, rank""".stripMargin,
    "q_graph_jaccard" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
         |seeds AS (SELECT DISTINCT src AS s FROM edges WHERE src % 500 = 0),
         |sn AS (SELECT seeds.s, edges.dst AS v
         |       FROM edges JOIN seeds ON edges.src = seeds.s),
         |wedges AS (SELECT sn.s, e.dst AS v
         |           FROM edges e JOIN sn ON e.src = sn.v
         |           WHERE e.dst <> sn.s),
         |closed AS (SELECT w.s, w.v FROM wedges w WHERE EXISTS
         |           (SELECT 1 FROM edges x WHERE x.src = w.s AND x.dst = w.v)),
         |common AS (SELECT s, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors
         |           FROM closed GROUP BY s, v),
         |scored AS (SELECT c.s, c.v, c.common_neighbors,
         |             CAST((1000000 * c.common_neighbors)
         |               // (ds.d + dv.d - c.common_neighbors) AS BIGINT) AS jaccard_ppm
         |           FROM common c JOIN deg ds ON c.s = ds.node
         |                         JOIN deg dv ON c.v = dv.node),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY s
         |            ORDER BY jaccard_ppm DESC, v) AS BIGINT) AS rank
         |      FROM scored)
         |SELECT s AS part, rank, v AS neighbor, common_neighbors, jaccard_ppm
         |FROM r WHERE rank <= 5 ORDER BY part, rank""".stripMargin,
    "q_graph_closeness" ->
      s"""WITH $edgesCte,
         |$pivotBfsCte
         |SELECT part, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST(n3 AS BIGINT) AS n3,
         |  CAST(1000000 * n1 + (1000000 * n2) // 2 + (1000000 * n3) // 3 AS BIGINT)
         |    AS closeness_x1e6
         |FROM cnt ORDER BY part""".stripMargin,
    "q_graph_eccentricity" ->
      s"""WITH $edgesCte,
         |$pivotBfsCte,
         |per AS (
         |  SELECT part, CAST(n1 + n2 + n3 AS BIGINT) AS n_reached,
         |    CAST(CASE WHEN n3 > 0 THEN 3 WHEN n2 > 0 THEN 2 ELSE 1 END
         |      AS BIGINT) AS ecc_capped
         |  FROM cnt WHERE n1 + n2 + n3 > 0),
         |g AS (SELECT CAST(max(ecc_capped) AS BIGINT) AS diameter_lb,
         |             CAST(min(ecc_capped) AS BIGINT) AS radius_lb FROM per)
         |SELECT per.part, per.n_reached, per.ecc_capped,
         |       g.diameter_lb, g.radius_lb
         |FROM per CROSS JOIN g ORDER BY per.part""".stripMargin,
    "q_graph_degree_hist" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
         |b AS (SELECT CAST(length(printf('%b', d)) - 1 AS BIGINT) AS bucket
         |      FROM deg)
         |SELECT bucket,
         |  CAST(1 << CAST(bucket AS INTEGER) AS BIGINT) AS min_degree,
         |  CAST(COUNT(*) AS BIGINT) AS n_nodes
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_graph_communities" ->
      s"""WITH $edgesCte,
         |$lpaLabelsCte
         |SELECT node AS part, lbl AS community FROM l3
         |ORDER BY part""".stripMargin,
    "q_graph_modularity" ->
      s"""WITH $edgesCte,
         |$lpaLabelsCte,
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ce),
         |ei AS (SELECT a.lbl AS community, CAST(count(*) AS BIGINT) AS internal_edges
         |       FROM ce JOIN l3 a ON ce.src = a.node JOIN l3 b ON ce.dst = b.node
         |       WHERE a.lbl = b.lbl GROUP BY a.lbl),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
         |        FROM edges GROUP BY src),
         |ds AS (SELECT l3.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
         |              CAST(sum(deg.d) AS BIGINT) AS degree_sum
         |       FROM deg JOIN l3 ON deg.node = l3.node GROUP BY l3.lbl)
         |SELECT ds.community, ds.n_nodes,
         |  CAST(COALESCE(ei.internal_edges, 0) AS BIGINT) AS internal_edges,
         |  ds.degree_sum,
         |  CAST((CAST(COALESCE(ei.internal_edges, 0) AS HUGEINT) * 1000000000) // m.m
         |    - (CAST(ds.degree_sum AS HUGEINT) * ds.degree_sum * 1000000000)
         |      // (CAST(4 AS HUGEINT) * m.m * m.m) AS BIGINT) AS q_contrib_x1e9
         |FROM ds LEFT JOIN ei ON ds.community = ei.community CROSS JOIN m
         |ORDER BY ds.community""".stripMargin,
    "q_graph_bfs" ->
      s"""WITH $edgesCte,
         |l0 AS (SELECT DISTINCT src AS node FROM edges WHERE src % 500 = 0),
         |f1 AS (SELECT DISTINCT e.dst AS node FROM edges e
         |       JOIN l0 ON e.src = l0.node
         |       WHERE e.dst NOT IN (SELECT node FROM l0)),
         |f2 AS (SELECT DISTINCT e.dst AS node FROM edges e
         |       JOIN f1 ON e.src = f1.node
         |       WHERE e.dst NOT IN (SELECT node FROM l0)
         |         AND e.dst NOT IN (SELECT node FROM f1)),
         |f3 AS (SELECT DISTINCT e.dst AS node FROM edges e
         |       JOIN f2 ON e.src = f2.node
         |       WHERE e.dst NOT IN (SELECT node FROM l0)
         |         AND e.dst NOT IN (SELECT node FROM f1)
         |         AND e.dst NOT IN (SELECT node FROM f2))
         |SELECT node AS part, CAST(0 AS BIGINT) AS level FROM l0
         |UNION ALL SELECT node, CAST(1 AS BIGINT) FROM f1
         |UNION ALL SELECT node, CAST(2 AS BIGINT) FROM f2
         |UNION ALL SELECT node, CAST(3 AS BIGINT) FROM f3
         |ORDER BY part""".stripMargin,
    "q_graph_assortativity" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
         |        FROM edges GROUP BY src),
         |p AS (SELECT dx.d AS dx, dy.d AS dy
         |      FROM edges e JOIN deg dx ON e.src = dx.src
         |                   JOIN deg dy ON e.dst = dy.src),
         |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         |         CAST(SUM(dx) AS BIGINT) AS sx,
         |         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         |         CAST(SUM(dx * dy) AS BIGINT) AS sxy
         |       FROM p)
         |SELECT m2, sx, sxx, sxy,
         |  CAST(CASE
         |    WHEN CAST(m2 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN 0
         |    WHEN CAST(m2 AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx < 0
         |      THEN -(((CAST(sx AS HUGEINT) * sx - CAST(m2 AS HUGEINT) * sxy) * 1000000)
         |             // (CAST(m2 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx))
         |    ELSE ((CAST(m2 AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx) * 1000000)
         |         // (CAST(m2 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
         |  END AS BIGINT) AS r_ppm
         |FROM mo""".stripMargin,
    "q_graph_sssp" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |wce AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |          CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM li a JOIN li b
        |          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |        GROUP BY a.l_partkey, b.l_partkey),
        |sym AS (SELECT src, dst, 1000000 // cnt AS w FROM wce
        |        UNION ALL SELECT dst, src, 1000000 // cnt FROM wce),
        |d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS d
        |       FROM sym WHERE src % 500 = 0),
        |d1 AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM (
        |  SELECT node, d FROM d0
        |  UNION ALL SELECT sym.dst, d0.d + sym.w FROM sym
        |    JOIN d0 ON sym.src = d0.node) GROUP BY node),
        |d2 AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM (
        |  SELECT node, d FROM d1
        |  UNION ALL SELECT sym.dst, d1.d + sym.w FROM sym
        |    JOIN d1 ON sym.src = d1.node) GROUP BY node),
        |d3 AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM (
        |  SELECT node, d FROM d2
        |  UNION ALL SELECT sym.dst, d2.d + sym.w FROM sym
        |    JOIN d2 ON sym.src = d2.node) GROUP BY node)
        |SELECT node AS part, d AS dist_x1e6 FROM d3
        |ORDER BY part""".stripMargin,
    "q_graph_hits" ->
      """WITH bip AS (SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |             FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |h0 AS (SELECT DISTINCT cust AS node, CAST(1000000 AS BIGINT) AS h FROM bip),
        |ar1 AS (SELECT supp, SUM(h0.h) AS raw FROM bip
        |        JOIN h0 ON bip.cust = h0.node GROUP BY supp),
        |a1 AS (SELECT supp, CAST((CAST(raw AS HUGEINT) * 1000000000)
        |         // (SELECT SUM(raw) FROM ar1) AS BIGINT) AS a FROM ar1),
        |hr1 AS (SELECT cust, SUM(a1.a) AS raw FROM bip
        |        JOIN a1 ON bip.supp = a1.supp GROUP BY cust),
        |h1 AS (SELECT cust, CAST((CAST(raw AS HUGEINT) * 1000000000)
        |         // (SELECT SUM(raw) FROM hr1) AS BIGINT) AS h FROM hr1),
        |ar2 AS (SELECT supp, SUM(h1.h) AS raw FROM bip
        |        JOIN h1 ON bip.cust = h1.cust GROUP BY supp),
        |a2 AS (SELECT supp, CAST((CAST(raw AS HUGEINT) * 1000000000)
        |         // (SELECT SUM(raw) FROM ar2) AS BIGINT) AS a FROM ar2)
        |SELECT 'authority' AS kind, supp AS node, a AS score_x1e9 FROM a2
        |UNION ALL SELECT 'hub', cust, h FROM h1
        |ORDER BY kind, node""".stripMargin,
    "q_graph_ppr" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src, COUNT(*) AS outdeg,
         |          CASE WHEN src % 500 = 0 THEN CAST(150000000 AS BIGINT)
         |               ELSE CAST(0 AS BIGINT) END AS base
         |        FROM edges GROUP BY src),
         |r0 AS (SELECT src AS node,
         |         CASE WHEN src % 500 = 0 THEN CAST(1000000000 AS BIGINT)
         |              ELSE CAST(0 AS BIGINT) END AS pr FROM deg),
         |r1 AS (SELECT e.dst AS node,
         |         CAST(MIN(d2.base) + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
         |       FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON d.src = e.src
         |       JOIN deg d2 ON d2.src = e.dst
         |       GROUP BY e.dst),
         |r2 AS (SELECT e.dst AS node,
         |         CAST(MIN(d2.base) + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
         |       FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON d.src = e.src
         |       JOIN deg d2 ON d2.src = e.dst
         |       GROUP BY e.dst),
         |r3 AS (SELECT e.dst AS node,
         |         CAST(MIN(d2.base) + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
         |       FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON d.src = e.src
         |       JOIN deg d2 ON d2.src = e.dst
         |       GROUP BY e.dst)
         |SELECT r3.node AS part, deg.outdeg AS degree, r3.pr
         |FROM r3 JOIN deg ON deg.src = r3.node
         |ORDER BY part""".stripMargin)
}
