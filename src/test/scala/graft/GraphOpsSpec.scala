package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Invariant specs for the graph module (VERDICT r6 item 1): PageRank's
  * fixed-point rounds replayed in plain Scala Long arithmetic, and
  * triangle counts checked against brute adjacency-set intersection —
  * on a hand-built fixture AND on the real sf0.001 co-occurrence graph.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Direct Scala replay of the engine's PageRank: same fixed-point
    * BIGINT arithmetic (integral division), 3 rounds, damping 85/100.
    * Input: symmetric edge list. */
  private def replayPagerank(sym: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] = {
    val outdeg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var ranks: Map[Long, Long] = outdeg.map { case (n, _) => n -> Scale }
    for (_ <- 1 to rounds) {
      val contrib = ranks.map { case (n, pr) => n -> pr / outdeg(n) }
      val incoming = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => contrib(e._1)).sum
      }
      ranks = incoming.map { case (v, s) => v -> (Scale * 15 / 100 + (85L * s) / 100) }
    }
    ranks
  }

  /** Brute per-node triangle counts from a canonical (src < dst) edge
    * list: adjacency-set intersection over every edge. */
  private def bruteTriangles(ce: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (ce ++ ce.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    ce.foreach { case (u, v) =>
      (adj(u) intersect adj(v)).foreach { w =>
        // each triangle {u,v,w} found once per edge → 3 times total; only
        // credit when w is the max so every triangle credits corners once
        if (w > v) { counts(u) += 1; counts(v) += 1; counts(w) += 1 }
      }
    }
    counts.toMap
  }

  // Fixture: K4 on {1,2,3,4} (4 triangles, each node in 3), a pendant
  // 5-6 path off node 4, and a hub 7 joined to 1,2 (one more triangle).
  private val fixtureCe: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L),
    (1L, 7L), (2L, 7L))
  private def fixtureSym = fixtureCe ++ fixtureCe.map(e => (e._2, e._1))

  test("fixture triangles: engine == brute enumeration (K4 + pendant + hub)") {
    val ceDf = fixtureCe.toDF("src", "dst")
    val got = GraphOps.trianglesOnEdges(ceDf).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("n_triangles")).toMap
    val want = bruteTriangles(fixtureCe)
    assert(got == want)
    // hand-checked: K4 gives each of 1..4 three triangles; {1,2,7} adds one
    assert(got(1L) == 4 && got(2L) == 4 && got(3L) == 3 && got(4L) == 3)
    assert(got(7L) == 1)
    assert(!got.contains(5L) && !got.contains(6L))
    // each triangle credits exactly 3 corners
    assert(got.values.sum % 3 == 0)
  }

  test("fixture pagerank: engine == direct Scala fixed-point replay") {
    val symDf = fixtureSym.toDF("src", "dst")
    val got = GraphOps.pagerankOnEdges(symDf).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("pr")).toMap
    val want = replayPagerank(fixtureSym)
    assert(got == want)
    // every node keeps at least the teleport mass, hub nodes rank higher
    assert(got.values.forall(_ >= Scale * 15 / 100))
    assert(got(4L) > got(6L)) // degree-5 core node beats the degree-1 leaf
  }

  test("sf0.001 pagerank: exact replay, full coverage, teleport floor") {
    val rows = GraphOps.qGraphPagerank(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // replay the engine arithmetic over the collected edge list
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1)
    val ceSet = byOrder.values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    val want = replayPagerank(sym)
    val got = rows.map(r => r.getAs[Long]("part") -> r.getAs[Long]("pr")).toMap
    assert(got == want)
    // degree column is the true symmetric degree
    val wantDeg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    assert(rows.map(r => r.getAs[Long]("part") -> r.getAs[Long]("degree")).toMap == wantDeg)
  }

  test("randomized Erdős–Rényi graphs: triangles == brute, pagerank == replay") {
    val rnd = new scala.util.Random(7) // deterministic trials
    for (trial <- 1 to 10) {
      val n = 4 + rnd.nextInt(20)
      val pEdge = 0.15 + rnd.nextDouble() * 0.5
      val ce = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < pEdge
      } yield (i.toLong, j.toLong)).toSeq
      if (ce.nonEmpty) {
        val got = GraphOps.trianglesOnEdges(ce.toDF("src", "dst")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == bruteTriangles(ce), s"trial $trial n=$n edges=$ce")
        val sym = ce ++ ce.map(e => (e._2, e._1))
        val gotPr = GraphOps.pagerankOnEdges(sym.toDF("src", "dst")).collect()
          .map(r => r.getAs[Long]("part") -> r.getAs[Long]("pr")).toMap
        assert(gotPr == replayPagerank(sym), s"trial $trial n=$n")
      }
    }
  }

  /** Direct Scala replay of the engine's k-core peeling: round 1 keeps
    * nodes with raw degree >= k, later rounds recompute degree within
    * the survivor set; output = final survivors' degree within the
    * final set (degree-0 survivors drop out, as in the engine). */
  private def replayKcore(sym: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    def degWithin(alive: Set[Long]): Map[Long, Long] =
      sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var alive = sym.groupBy(_._1).filter(_._2.size >= k).keySet
    for (_ <- 2 to rounds)
      alive = degWithin(alive).filter(_._2 >= k).keySet
    degWithin(alive)
  }

  /** Direct Scala replay of synchronous LPA with the engine's
    * deterministic (count desc, label asc) tie-break. */
  private def replayLpa(sym: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    var labels: Map[Long, Long] = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = sym.groupBy(_._2).map { case (v, es) =>
        val votes = es.map(e => labels(e._1)).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("fixture k-core: engine == replay; k=3 peels to K4 at its fix-point") {
    val symDf = fixtureSym.toDF("src", "dst")
    val got = GraphOps.kcoreOnEdges(symDf, k = 3, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("degree")).toMap
    assert(got == replayKcore(fixtureSym, 3, 3))
    // round 1 drops 5/6/7 (degrees 2/1/2); K4 then self-sustains at
    // degree 3 — and 3 rounds have converged (all survivors >= k)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got.values.forall(_ >= 3))
  }

  test("fixture LPA: engine == replay; deterministic tie-breaks") {
    val symDf = fixtureSym.toDF("src", "dst")
    val got = GraphOps.lpaOnEdges(symDf, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("community")).toMap
    assert(got == replayLpa(fixtureSym, 3))
    // every label is a node id of the graph, every node is labeled
    val nodes = fixtureSym.map(_._1).toSet
    assert(got.keySet == nodes && got.values.toSet.subsetOf(nodes))
  }

  test("randomized graphs: k-core and LPA == replay across k") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(18)
      val pEdge = 0.15 + rnd.nextDouble() * 0.5
      val ce = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < pEdge
      } yield (i.toLong, j.toLong)).toSeq
      if (ce.nonEmpty) {
        val sym = ce ++ ce.map(e => (e._2, e._1))
        val symDf = sym.toDF("src", "dst")
        for (k <- Seq(2, 3, 5)) {
          val got = GraphOps.kcoreOnEdges(symDf, k, rounds = 3).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == replayKcore(sym, k, 3), s"kcore trial $trial k=$k edges=$ce")
        }
        val gotL = GraphOps.lpaOnEdges(symDf, rounds = 3).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotL == replayLpa(sym, 3), s"lpa trial $trial edges=$ce")
      }
    }
  }

  /** Direct Scala replay of synchronous min-label propagation: each
    * round every node takes the min of its own label and its neighbors'
    * previous-round labels — after r rounds the label is the min id
    * within r hops. */
  private def replayCc(sym: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = sym.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    var labels: Map[Long, Long] = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = labels.map { case (v, l) =>
        v -> math.min(l, adj.getOrElse(v, Nil).map(labels).min)
      }
    }
    labels
  }

  /** Ground-truth components: min node id per component from a full
    * union-find closure (no round cap). */
  private def trueComponents(sym: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    sym.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    sym.map(_._1).distinct.map(n => n -> find(n)).toMap
  }

  test("fixture CC: engine == replay == union-find (diameter <= 3)") {
    val symDf = fixtureSym.toDF("src", "dst")
    val got = GraphOps.ccOnEdges(symDf, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("component")).toMap
    assert(got == replayCc(fixtureSym, 3))
    // the whole fixture is one component of diameter 3 (6 to 7 via 5-4-1),
    // so 3 rounds converge to the true component labeling: all label 1
    assert(got == trueComponents(fixtureSym))
    assert(got.values.toSet == Set(1L))
  }

  test("two disjoint components get distinct min-id labels") {
    // triangle {1,2,3} and path 10-11-12: diameters 1 and 2, both <= 3
    val ce = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L))
    val sym = ce ++ ce.map(e => (e._2, e._1))
    val got = GraphOps.ccOnEdges(sym.toDF("src", "dst"), rounds = 3).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("component")).toMap
    assert(got == trueComponents(sym))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("randomized graphs: CC rounds == replay; labels never increase") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(18)
      val pEdge = 0.08 + rnd.nextDouble() * 0.4
      val ce = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < pEdge
      } yield (i.toLong, j.toLong)).toSeq
      if (ce.nonEmpty) {
        val sym = ce ++ ce.map(e => (e._2, e._1))
        val got = GraphOps.ccOnEdges(sym.toDF("src", "dst"), rounds = 3).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == replayCc(sym, 3), s"cc trial $trial edges=$ce")
        // a label is always the id of some node within 3 hops, <= own id
        assert(got.forall { case (n2, l) => l <= n2 }, s"trial $trial")
        // and never below the true component min (monotone from above)
        val truth = trueComponents(sym)
        assert(got.forall { case (n2, l) => l >= truth(n2) }, s"trial $trial")
      }
    }
  }

  /** Direct Scala replay of seed-anchored Resource-Allocation link
    * prediction: RA(s,v) = Σ over common neighbors w of 1000000/deg(w)
    * for non-adjacent two-hop candidates, top-5 per seed by
    * (ra desc, cand). */
  private def replayLinkPred(sym: Seq[(Long, Long)],
      seeds: Set[Long]): Seq[(Long, Long, Long, Long, Long)] = {
    val adj = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val deg = adj.map { case (n, ns) => n -> ns.size.toLong }
    seeds.toSeq.sorted.flatMap { s =>
      val cands = adj(s).flatMap(adj(_)).filter(v => v != s && !adj(s)(v))
      cands.toSeq.map { v =>
        val common = adj(s) intersect adj(v)
        (v, common.size.toLong, common.toSeq.map(w => 1000000L / deg(w)).sum)
      }
        .sortBy { case (v, _, ra) => (-ra, v) }.take(5)
        .zipWithIndex.map { case ((v, cn, ra), i) => (s, i + 1L, v, cn, ra) }
    }
  }

  test("fixture link prediction: engine == replay; candidates are open two-hop pairs") {
    val symDf = fixtureSym.toDF("src", "dst")
    val seeds = Set(4L, 7L)
    val got = GraphOps.linkPredOnEdges(symDf,
        seeds.toSeq.toDF("node")).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rank"),
        r.getAs[Long]("cand"), r.getAs[Long]("common_neighbors"),
        r.getAs[Long]("ra_x1e6"))).toSeq
    assert(got == replayLinkPred(fixtureSym, seeds))
    // every prediction is a genuine open pair: non-adjacent, >= 1 shared
    val adj = fixtureSym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    got.foreach { case (s, _, v, cn, ra) =>
      assert(!adj(s)(v) && v != s)
      assert(cn >= 1 && ra > 0)
    }
  }

  test("randomized graphs: link prediction == replay") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 6) {
      val n = 6 + rnd.nextInt(16)
      val pEdge = 0.15 + rnd.nextDouble() * 0.3
      val ce = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < pEdge
      } yield (i.toLong, j.toLong)).toSeq
      if (ce.nonEmpty) {
        val sym = ce ++ ce.map(e => (e._2, e._1))
        val nodes = sym.map(_._1).distinct
        val seeds = nodes.filter(_ % 3 == 0).toSet
        if (seeds.nonEmpty) {
          val got = GraphOps.linkPredOnEdges(sym.toDF("src", "dst"),
              seeds.toSeq.toDF("node")).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4))).toSeq
          assert(got == replayLinkPred(sym, seeds), s"trial $trial edges=$ce")
        }
      }
    }
  }

  test("sf0.001 CC and link prediction: engine == replay on the real graph") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    val gotCc = GraphOps.qGraphCc(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("component")).toMap
    assert(gotCc == replayCc(sym, 3) && gotCc.nonEmpty)
    val seeds = sym.map(_._1).distinct.filter(_ % 500 == 0).toSet
    assert(seeds.nonEmpty)
    val gotLp = GraphOps.qGraphLinkPred(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rank"),
        r.getAs[Long]("cand"), r.getAs[Long]("common_neighbors"),
        r.getAs[Long]("ra_x1e6"))).toSeq
    assert(gotLp == replayLinkPred(sym, seeds) && gotLp.nonEmpty)
  }

  test("sf0.001 modularity: contributions replay from the LPA labels") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    val labels = replayLpa(sym, 3)
    val m = BigInt(ceSet.size)
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val expected = labels.groupBy(_._2).map { case (c, ns) =>
      val nodes = ns.keySet
      val eC = BigInt(ceSet.count { case (u, v) =>
        labels(u) == c && labels(v) == c })
      val dC = BigInt(nodes.toSeq.map(deg).sum)
      c -> ((nodes.size.toLong, eC.toLong, dC.toLong,
        (eC * 1000000000L / m - dC * dC * 1000000000L / (4 * m * m)).toLong))
    }
    val got = GraphOps.qGraphModularity(spark, sf0001).collect().map { r =>
      r.getAs[Long]("community") -> ((r.getAs[Long]("n_nodes"),
        r.getAs[Long]("internal_edges"), r.getAs[Long]("degree_sum"),
        r.getAs[Long]("q_contrib_x1e9")))
    }.toMap
    assert(got == expected && got.nonEmpty)
    // accounting: nodes partition; internal edges never exceed m
    assert(got.values.map(_._1).sum == labels.size.toLong)
    assert(got.values.map(_._2).sum <= m.toLong)
  }

  /** Direct Scala replay of multi-source BFS hop labeling. */
  private def replayBfs(sym: Seq[(Long, Long)], seeds: Set[Long],
      rounds: Int): Map[Long, Long] = {
    val adj = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var levels: Map[Long, Long] = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (r <- 1 to rounds) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long])) -- levels.keySet
      levels ++= next.map(_ -> r.toLong)
      frontier = next
    }
    levels
  }

  test("fixture BFS: every hop level exercised, engine == replay") {
    val symDf = fixtureSym.toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = GraphOps.bfsOnEdges(symDf, seeds, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("level")).toMap
    assert(got == replayBfs(fixtureSym, Set(1L), 3))
    // hand-checked: 1 at 0; K4 peers + hub 7 at 1; 5 via 4 at 2; 6 at 3
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 1L,
      5L -> 2L, 6L -> 3L))
  }

  test("fixture betweenness: Brandes forward/backward replays by hand") {
    // diamond: 0-1, 1-2, 1-3, 2-4, 3-4 — two shortest 0→4 paths, so
    // sigma(4)=2 and the dependency splits 50/50 across the brokers
    val ce = Seq((0L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphOps.betweennessOnEdges(sym, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") ->
        ((r.getAs[Long]("n_seeds"), r.getAs[Long]("sigma_total"),
          r.getAs[Long]("betweenness_x1e6")))).toMap
    // seed set = {0} (node % 500 == 0); hand-computed Brandes:
    // δ(4)=0; δ(2)=δ(3)=(1·10⁶)//2=500000; δ(1)=2·(10⁶+500000)=3·10⁶
    assert(got == Map(
      1L -> ((1L, 1L, 3000000L)),
      2L -> ((1L, 1L, 500000L)),
      3L -> ((1L, 1L, 500000L)),
      4L -> ((1L, 2L, 0L))))
  }

  test("betweenness: a bridge node dominates both endpoints clusters") {
    // two triangles joined by a bridge node 1: {0,2,3} and {1} and {4,5}
    // 0-2,0-3,2-3 triangle; 3-1 bridge; 1-4; 4-5,4-6,5-6 triangle
    val ce = Seq((0L, 2L), (0L, 3L), (2L, 3L), (3L, 1L), (1L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphOps.betweennessOnEdges(sym, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("betweenness_x1e6")).toMap
    // from seed 0, the cut vertices 3 (then 1) carry all downstream flow
    assert(got(3L) > got(2L), got.toString)
    assert(got(3L) > got(1L), got.toString) // 3 is closer to the seed
    assert(got(1L) > got(4L) || !got.contains(4L), got.toString)
  }

  test("randomized graphs: BFS levels == replay") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(18)
      val pEdge = 0.1 + rnd.nextDouble() * 0.4
      val ce = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < pEdge
      } yield (i.toLong, j.toLong)).toSeq
      if (ce.nonEmpty) {
        val sym = ce ++ ce.map(e => (e._2, e._1))
        val nodes = sym.map(_._1).distinct
        val seedSet = nodes.filter(_ % 3 == 0).toSet
        if (seedSet.nonEmpty) {
          val got = GraphOps.bfsOnEdges(sym.toDF("src", "dst"),
              seedSet.toSeq.toDF("node"), rounds = 3).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == replayBfs(sym, seedSet, 3), s"trial $trial edges=$ce")
        }
      }
    }
  }

  test("sf0.001 BFS: engine == replay; frontier exhausts within the cap") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    val seeds = sym.map(_._1).distinct.filter(_ % 500 == 0).toSet
    val got = GraphOps.qGraphBfs(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("level")).toMap
    assert(got == replayBfs(sym, seeds, 3))
    assert(got.nonEmpty && got.values.max <= 3)
  }

  test("sf0.001 k-core and LPA: engine == replay on the real graph") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    // the q_ entry's fixed k=80 empties this small corpus's core — the
    // replay must agree on that; k=70 keeps a non-trivial core, so the
    // factored form is checked there for a non-empty answer
    val gotQ = GraphOps.qGraphKcore(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("degree")).toMap
    assert(gotQ == replayKcore(sym, 80, 3))
    val got70 = GraphOps.kcoreOnEdges(sym.toDF("src", "dst"), k = 70, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want70 = replayKcore(sym, 70, 3)
    assert(got70 == want70 && got70.nonEmpty)
    val gotC = GraphOps.qGraphCommunities(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("community")).toMap
    val wantC = replayLpa(sym, 3)
    assert(gotC == wantC && gotC.nonEmpty)
    // LPA contracts the label space on this corpus
    assert(gotC.values.toSet.size < gotC.size)
  }

  /** Direct Scala replay of personalized PageRank: teleport mass goes
    * only to the seed set (node % 500 == 0), same fixed-point BIGINT
    * arithmetic as the engine. */
  private def replayPpr(sym: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] = {
    val outdeg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    def base(n: Long): Long = if (n % 500 == 0) Scale * 15 / 100 else 0L
    var ranks: Map[Long, Long] =
      outdeg.map { case (n, _) => n -> (if (n % 500 == 0) Scale else 0L) }
    for (_ <- 1 to rounds) {
      val contrib = ranks.map { case (n, pr) => n -> pr / outdeg(n) }
      val incoming = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => contrib(e._1)).sum
      }
      ranks = incoming.map { case (v, s) => v -> (base(v) + (85L * s) / 100) }
    }
    ranks
  }

  // fixture relabeled so the deterministic % 500 seed predicate fires:
  // node 1 -> 500, node 4 -> 1000 (seeds), others keep their small ids
  private def pprFixtureSym: Seq[(Long, Long)] = {
    def m(n: Long): Long = n match { case 1L => 500L; case 4L => 1000L; case x => x }
    fixtureSym.map { case (a, b) => (m(a), m(b)) }
  }

  test("fixture PPR: engine == replay; mass stays near the seed set") {
    val sym = pprFixtureSym
    val got = GraphOps.pprOnEdges(sym.toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("pr")).toMap
    val want = replayPpr(sym)
    assert(got == want)
    // seeds keep their teleport floor; far leaf 6 (3 hops out) ranks
    // below every seed and below the seeds' direct neighbors
    assert(got(500L) >= Scale * 15 / 100 && got(1000L) >= Scale * 15 / 100)
    assert(got(6L) < got(500L) && got(6L) < got(2L))
  }

  test("randomized graphs: PPR == replay (ids scaled so seeds exist)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(18)
      val pEdge = 0.15 + rnd.nextDouble() * 0.5
      // multiply ids by 250 so roughly half the graphs get >=1 seed node
      val ce = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < pEdge
      } yield (i.toLong * 250, j.toLong * 250)).toSeq
      if (ce.nonEmpty) {
        val sym = ce ++ ce.map(e => (e._2, e._1))
        val got = GraphOps.pprOnEdges(sym.toDF("src", "dst")).collect()
          .map(r => r.getAs[Long]("part") -> r.getAs[Long]("pr")).toMap
        assert(got == replayPpr(sym), s"trial $trial edges=$ce")
      }
    }
  }

  test("sf0.001 PPR: engine == replay; non-seeds accrue walk mass only") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    val got = GraphOps.qGraphPpr(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("pr")).toMap
    val want = replayPpr(sym)
    assert(got == want)
    val seeds = sym.map(_._1).distinct.filter(_ % 500 == 0).toSet
    assert(seeds.nonEmpty)
    // global PR gives every node the teleport floor; PPR must not
    assert(got.exists { case (n, pr) => !seeds(n) && pr < Scale * 15 / 100 })
  }

  test("sf0.001 triangles: engine == brute adjacency intersection") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val want = bruteTriangles(ceSet.toSeq)
    val got = GraphOps.qGraphTriangles(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("n_triangles")).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  /** Direct Scala replay of the engine's HITS rounds: BigInt products
    * for the ×10⁹ L1 normalization (the DECIMAL(38,0) path), truncating
    * division on positives. Input: directed (cust, supp) edges. */
  private def replayHits(bip: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val tot = raw.values.map(BigInt(_)).sum
      raw.map { case (k, v) => k -> ((BigInt(v) * 1000000000L) / tot).toLong }
    }
    val h0 = bip.map(_._1).distinct.map(_ -> 1000000L).toMap
    val a1 = norm(bip.groupBy(_._2).map { case (s, es) => s -> es.map(e => h0(e._1)).sum })
    val h1 = norm(bip.groupBy(_._1).map { case (c, es) => c -> es.map(e => a1(e._2)).sum })
    val a2 = norm(bip.groupBy(_._2).map { case (s, es) => s -> es.map(e => h1(e._1)).sum })
    (h1, a2)
  }

  test("fixture HITS: engine == BigInt replay; shares sum to ~1e9") {
    // two "hub" customers (1, 2) buying from popular suppliers, a
    // long-tail customer 3, suppliers 10 (popular), 11, 12 (niche)
    val bip = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 10L))
    val got = GraphOps.hitsOnEdges(bip.toDF("cust", "supp")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("node")) -> r.getAs[Long]("score_x1e9"))
      .toMap
    val (h1, a2) = replayHits(bip)
    assert(got.collect { case (("hub", n), s) => n -> s }.toMap == h1)
    assert(got.collect { case (("authority", n), s) => n -> s }.toMap == a2)
    // L1 normalization: each side's shares sum to 1e9 minus truncation
    val hubSum = h1.values.sum; val authSum = a2.values.sum
    assert(hubSum <= 1000000000L && hubSum > 1000000000L - h1.size)
    assert(authSum <= 1000000000L && authSum > 1000000000L - a2.size)
    // the popular supplier out-ranks the niche ones; the two-supplier
    // hubs out-rank the single-supplier tail customer
    assert(got(("authority", 10L)) > got(("authority", 11L)))
    assert(got(("hub", 1L)) > got(("hub", 3L)))
  }

  test("randomized bipartite graphs: HITS == BigInt replay") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 8) {
      val nc = 3 + rnd.nextInt(12); val ns = 2 + rnd.nextInt(6)
      val bip = (for {
        c <- 1 to nc; s <- 1 to ns if rnd.nextDouble() < 0.4
      } yield (c.toLong, 100L + s)).toSeq
      if (bip.nonEmpty) {
        val (h1, a2) = replayHits(bip)
        val got = GraphOps.hitsOnEdges(bip.toDF("cust", "supp")).collect()
          .map(r => (r.getString(0), r.getAs[Long]("node")) -> r.getAs[Long]("score_x1e9"))
          .toMap
        assert(got.collect { case (("hub", n), s) => n -> s }.toMap == h1)
        assert(got.collect { case (("authority", n), s) => n -> s }.toMap == a2)
      }
    }
  }

  /** Direct Scala Bellman–Ford replay: min path cost within `rounds`
    * hops over symmetric weighted edges. */
  private def replaySssp(sym: Seq[(Long, Long, Long)], seeds: Set[Long],
      rounds: Int): Map[Long, Long] = {
    var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = sym.flatMap { case (s, t, w) =>
        dist.get(s).map(d => t -> (d + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  test("fixture SSSP: relaxation can undercut a direct weak tie") {
    // seed 1; direct edge 1-4 is weak (w=9), but 1-2-4 through strong
    // ties costs 2+2=4 — round 2 must IMPROVE node 4's round-1 label
    val ce = Seq((1L, 2L, 2L), (2L, 4L, 2L), (1L, 4L, 9L), (4L, 5L, 1L))
    val sym = ce ++ ce.map(e => (e._2, e._1, e._3))
    val got = GraphOps.ssspOnEdges(
        sym.toDF("src", "dst", "w"), Seq(1L).toDF("node"), 3)
      .collect().map(r => r.getAs[Long]("part") -> r.getAs[Long]("dist_x1e6")).toMap
    assert(got == replaySssp(sym, Set(1L), 3))
    assert(got(4L) == 4L) // the 2-hop path, not the direct 9
    assert(got(5L) == 5L) // 3 hops through the improved label
  }

  test("sf0.001 SSSP: engine == Bellman-Ford replay on the real graph") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val wce = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case ((a, b), xs) =>
      (a, b, 1000000L / xs.size)
    }.toSeq
    val sym = wce ++ wce.map(e => (e._2, e._1, e._3))
    val seeds = sym.map(_._1).distinct.filter(_ % 500 == 0).toSet
    val want = replaySssp(sym, seeds, 3)
    val got = GraphOps.qGraphSssp(spark, sf0001).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("dist_x1e6")).toMap
    assert(got == want)
    assert(got.nonEmpty && seeds.forall(s => got(s) == 0L))
  }

  /** Direct BigInt replay of the rational assortativity. */
  private def replayAssort(sym: Seq[(Long, Long)]): Long = {
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val xs = sym.map { case (s, t) => (BigInt(deg(s)), BigInt(deg(t))) }
    val m2 = BigInt(xs.length)
    val sx = xs.map(_._1).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val cov = m2 * sxy - sx * sx
    val vr = m2 * sxx - sx * sx
    if (vr == 0) 0L
    else if (cov < 0) -((-cov * 1000000) / vr).toLong
    else ((cov * 1000000) / vr).toLong
  }

  test("assortativity: fixture signs, BigInt replay, bounds") {
    // a star (hub to leaves) is maximally DISassortative
    val star = (2L to 6L).map(l => (1L, l))
    val starSym = star ++ star.map(e => (e._2, e._1))
    val rStar = GraphOps.assortativityOnEdges(starSym.toDF("src", "dst"))
      .collect().head.getAs[Long]("r_ppm")
    assert(rStar == replayAssort(starSym))
    assert(rStar == -1000000L, s"star must be r = -1, got $rStar")
    // two disjoint cliques of different sizes: every node links only
    // to same-degree nodes — perfectly assortative
    val k3 = for (i <- 1L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val k4 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val cliqueSym = (k3 ++ k4) ++ (k3 ++ k4).map(e => (e._2, e._1))
    val rCliques = GraphOps.assortativityOnEdges(cliqueSym.toDF("src", "dst"))
      .collect().head.getAs[Long]("r_ppm")
    assert(rCliques == replayAssort(cliqueSym))
    assert(rCliques == 1000000L, s"disjoint cliques must be r = +1, got $rCliques")
    // the real graph: engine == replay, r within [-1, 1]
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ceSet = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = ceSet.toSeq ++ ceSet.toSeq.map(e => (e._2, e._1))
    val r = GraphOps.qGraphAssortativity(spark, sf0001)
      .collect().head.getAs[Long]("r_ppm")
    assert(r == replayAssort(sym))
    assert(math.abs(r) <= 1000000L)
  }

  test("sf0.001 HITS: engine == BigInt replay on the real purchase graph") {
    val o = Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect().toMap
    val l = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_suppkey").as[(Long, Long)].collect()
    val bip = l.flatMap { case (ok, sk) => o.get(ok).map(ck => (ck, sk)) }
      .distinct.toSeq
    val (h1, a2) = replayHits(bip)
    val got = GraphOps.qGraphHits(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Long]("node")) -> r.getAs[Long]("score_x1e9"))
      .toMap
    assert(got.collect { case (("hub", n), s) => n -> s }.toMap == h1)
    assert(got.collect { case (("authority", n), s) => n -> s }.toMap == a2)
  }

  test("fixture katz: hand-computed 3-round recurrence on a path") {
    // path 1-2-3 (symmetric): indeg 1:1, 2:2, 3:1. S = 1e9.
    // x1 = S everywhere.
    // x2(1) = S + S//4; x2(2) = S + 2S//4; x2(3) = S + S//4
    // x3(1) = S + x2(2)//4 ; x3(2) = S + (x2(1)+x2(3))//4 ; x3(3) = S + x2(2)//4
    val ce = Seq((1L, 2L), (2L, 3L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val s = 1000000000L
    val x21 = s + s / 4
    val x22 = s + 2 * s / 4
    val want = Map(
      1L -> (s + x22 / 4),
      2L -> (s + (x21 + x21) / 4),
      3L -> (s + x22 / 4))
    val got = GraphOps.katzOnEdges(sym).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("katz")).toMap
    assert(got == want, s"got $got want $want")
    // the center of the path is strictly more central
    assert(got(2L) > got(1L) && got(2L) > got(3L))
  }

  test("fixture jaccard: hand-computed top-5 with tie-break on neighbor id") {
    // K4 on {0,1,2,3} plus a pendant 2-5; seed = 0 (node % 500 == 0).
    // N(0)={1,2,3} N(1)={0,2,3} N(2)={0,1,3,5} N(3)={0,1,2}
    // J(0,1) = |{2,3}| / (3+3-2) = 2/4 -> 500000 ppm
    // J(0,2) = |{1,3}| / (3+4-2) = 2/5 -> 400000 ppm
    // J(0,3) = |{1,2}| / (3+3-2) = 2/4 -> 500000 ppm
    // ranks order by ppm desc then v asc: (1, 500000), (3, 500000), (2, 400000)
    val ce = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (2L, 5L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphOps.jaccardOnEdges(sym).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("neighbor"), r.getAs[Long]("common_neighbors"),
          r.getAs[Long]("jaccard_ppm")))).toMap
    assert(got == Map(
      (0L, 1L) -> ((1L, 2L, 500000L)),
      (0L, 2L) -> ((3L, 2L, 500000L)),
      (0L, 3L) -> ((2L, 2L, 400000L))))
  }

  test("fixture closeness: 3-hop level counts and harmonic sum by hand") {
    // path-ish graph with TWO flagged seeds: 0-1, 1-2, 2-500, 500-3.
    // From 0:   L1={1}   L2={2}   L3={500} -> 1e6 + 5e5 + 333333
    // From 500: L1={2,3} L2={1}   L3={0}   -> 2e6 + 5e5 + 333333
    val ce = Seq((0L, 1L), (1L, 2L), (2L, 500L), (500L, 3L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphOps.closenessOnEdges(sym, rounds = 3).collect()
      .map(r => r.getAs[Long]("part") ->
        ((r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("n3"),
          r.getAs[Long]("closeness_x1e6")))).toMap
    assert(got == Map(
      0L -> ((1L, 1L, 1L, 1833333L)),
      500L -> ((2L, 1L, 1L, 2833333L))))
  }

  test("fixture eccentricity: capped ecc, reach, and the bound columns by hand") {
    // same path graph as the closeness fixture: 0-1-2-500-3.
    // From 0: levels {1},{2},{500} -> ecc capped at 3, reach 3
    // From 500: {2,3},{1},{0}      -> ecc 3, reach 4
    val ce = Seq((0L, 1L), (1L, 2L), (2L, 500L), (500L, 3L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val levels = GraphOps.pivotLevels(sym, rounds = 3)
    val per = levels.groupBy($"seed")
      .agg(count(lit(1)).as("n"), max($"level").as("ecc"))
      .collect().map(r => r.getAs[Long]("seed") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("ecc")))).toMap
    assert(per == Map(0L -> ((3L, 3L)), 500L -> ((4L, 3L))))
    // a short star from the pivot: ecc is EXACT (frontier empties)
    val star = Seq((0L, 7L), (0L, 8L))
    val ssym = (star ++ star.map(e => (e._2, e._1))).toDF("src", "dst")
    val sPer = GraphOps.pivotLevels(ssym, rounds = 3)
      .groupBy($"seed").agg(max($"level").as("ecc")).collect()
    assert(sPer.length == 1 && sPer.head.getAs[Long]("ecc") == 1L)
  }

  test("closeness: level columns and harmonic formula derive from rounds") {
    val ce = Seq((0L, 1L), (1L, 2L), (2L, 500L), (500L, 3L))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val two = GraphOps.closenessOnEdges(sym, rounds = 2)
    assert(two.columns.toSeq == Seq("part", "n1", "n2", "closeness_x1e6"))
    val got = two.collect().map(r => r.getAs[Long]("part") ->
      r.getAs[Long]("closeness_x1e6")).toMap
    // rounds=2 stops at L2: from 0 -> 1e6 + 5e5; from 500 -> 2e6 + 5e5
    assert(got == Map(0L -> 1500000L, 500L -> 2500000L))
    intercept[IllegalArgumentException] {
      GraphOps.closenessOnEdges(sym, rounds = 0)
    }
  }

  test("closeness: seed set capped to the 16 smallest flagged pivots") {
    // star: center 1, leaves 0, 500, 1000, ..., 9500 (20 flagged nodes)
    val ce = (0 until 20).map(k => (1L, 500L * k))
    val sym = (ce ++ ce.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphOps.closenessOnEdges(sym, rounds = 3).collect()
      .map(_.getAs[Long]("part")).toSet
    assert(got == (0 until 16).map(_ * 500L).toSet,
      s"expected the 16 smallest pivots, got ${got.toSeq.sorted}")
  }

  test("fixture degree histogram: log2 buckets by hand") {
    // fixtureSym degrees: 1->4 2->4 3->3 4->4 5->2 6->1 7->2
    // bucket floor(log2 d): d=1 -> 0; d in {2,3} -> 1; d=4 -> 2
    val symDf = fixtureSym.toDF("src", "dst")
    val got = GraphOps.degreeHistOnEdges(symDf).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("min_degree"), r.getAs[Long]("n_nodes")))).toMap
    assert(got == Map(
      0L -> ((1L, 1L)),   // node 6
      1L -> ((2L, 3L)),   // nodes 3, 5, 7
      2L -> ((4L, 3L)))) // nodes 1, 2, 4
  }
}
