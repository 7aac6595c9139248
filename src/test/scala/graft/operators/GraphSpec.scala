package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Integer-exact PageRank pinned against a plain-Scala mirror of the
  * fixed-point iteration — determinism is the whole contract. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 1 - 2 - 3 path, both directions: node 2 is the center
  private val edgeList = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))

  private def reference(iters: Int): Map[Long, Long] = {
    val SCALE = 1000000000000L
    val deg = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = edgeList.map(_._1).distinct
    val n = nodes.size.toLong
    var r = nodes.map(_ -> SCALE / n).toMap
    for (_ <- 1 to iters) {
      val s = edgeList.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(nd => nd -> ((15L * SCALE / 100L) / n + 85L * s.getOrElse(nd, 0L) / 100L)).toMap
    }
    r
  }

  test("pagerank equals the integer reference after 3 iterations") {
    import spark.implicits._
    val got = Graph.pageRankIntExact(edgeList.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(3))
    // structure: the center out-ranks the symmetric leaves, which tie
    assert(got(2L) > got(1L))
    assert(got(1L) === got(3L))
  }

  test("deep iteration runs in bounded time and matches the reference") {
    // 25 iterations would unroll a quadratically-growing plan without
    // the lineage guard; with it the run must stay comfortably inside
    // a wall-clock budget AND stay bit-identical to the plain-Scala
    // fixed-point reference (checkpointing materializes integer rank
    // tables — it cannot change a single unit).
    import spark.implicits._
    val t0 = System.nanoTime()
    val got = Graph.pageRankIntExact(edgeList.toDF("src", "dst"), iters = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dt = (System.nanoTime() - t0) / 1e9
    assert(got === reference(25))
    assert(dt < 120.0, f"25-iteration run took $dt%.1f s — lineage guard lost?")
  }

  test("checkpoint cadence does not change ranks (forced on a small run)") {
    import spark.implicits._
    val plain = Graph.pageRankIntExact(edgeList.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val checkpointed = Graph.pageRankIntExact(edgeList.toDF("src", "dst"),
      iters = 5, checkpointEvery = 2, checkpointThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(checkpointed === plain)
    assert(plain === reference(5))
  }

  test("zero iterations returns the uniform fixed-point mass") {
    import spark.implicits._
    val got = Graph.pageRankIntExact(edgeList.toDF("src", "dst"), iters = 0)
      .collect().map(r => r.getLong(1)).toSet
    assert(got === Set(1000000000000L / 3))
  }

  /** Brute-force triangle truth: every id-ordered vertex triple whose
    * three edges are all present. */
  private def naiveTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val set = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && set((a, b))
      c <- nodes if b < c && set((b, c)) && set((a, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  private def countTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: K4 gives every vertex 3, and matches brute force") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val got = countTriangles(k4)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got === naiveTriangles(k4))
  }

  test("triangles: a triangle-free path graph yields no rows") {
    assert(countTriangles(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("triangles: hub graph — degree orientation still counts exactly") {
    // hub 1 connects to 2..8; rim edges close SOME wedges only:
    // (2,3), (4,5), (5,6) → triangles {1,2,3}, {1,4,5}, {1,5,6}.
    // The hub is the HIGH-degree endpoint of every spoke, so the
    // orientation points spokes AT it — exactly the case where a
    // naive id-orientation (hub has the smallest id) would enumerate
    // all C(7,2) wedges at the hub; the count must not care.
    val edges = (2L to 8L).map(x => (1L, x)) ++
      Seq((2L, 3L), (4L, 5L), (5L, 6L))
    val got = countTriangles(edges)
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 1L,
      4L -> 1L, 5L -> 2L, 6L -> 1L))
    assert(got === naiveTriangles(edges))
  }

  test("triangles: degree ties broken by id — overlapping triangles exact") {
    // two triangles sharing edge (2,3): all of 1,2,3,4 have degree
    // ties somewhere in the orientation order
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = countTriangles(edges)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    assert(got === naiveTriangles(edges))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagation(edges.toDF("u", "v"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Plain-Scala synchronous LPA mirror: min-label tie-break, labels
    * after exactly `iters` rounds. */
  private def naiveLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val dirx = edges ++ edges.map(_.swap)
    val nbrs = dirx.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var l = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      l = nbrs.map { case (n, ns) =>
        val counts = ns.map(l).groupBy(identity).map { case (lab, xs) => (lab, xs.size) }
        n -> counts.toSeq.minBy { case (lab, c) => (-c, lab) }._1
      }
    }
    l
  }

  test("LPA: two triangles joined by a bridge settle into two communities") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))
    val got = lpa(edges, 4)
    assert(got === naiveLpa(edges, 4))
    // community structure: each triangle shares one label, and the
    // bridge does not merge them
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(4L), got(5L), got(6L)).size === 1)
    assert(got(1L) !== got(4L))
  }

  test("LPA: synchronous rounds match the mirror at every depth (incl. oscillation)") {
    // a 4-cycle is bipartite — sync LPA oscillates; the contract is
    // "after exactly k rounds", so every k must match the mirror
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 5L))
    for (k <- 0 to 5) assert(lpa(edges, k) === naiveLpa(edges, k),
      s"mismatch at iters=$k")
  }

  test("LPA: deep run (checkpoint cadence) equals the mirror bit-for-bit") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L), (7L, 8L))
    assert(lpa(edges, 12) === naiveLpa(edges, 12))
  }

  test("LPA: adversarial ties break to the LOWEST label under hostile partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two 4-cliques feeding a hub that sees TWO members of each —
    // permanent equal-count label ties at the hub once the cliques
    // converge — plus a pendant chain whose first rounds are
    // all-count-1 ties across every neighbor
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (2L, 9L), (3L, 9L), (6L, 9L), (7L, 9L),
      (9L, 10L), (10L, 11L))
    for (k <- 0 to 4)
      assert(lpa(edges, k) === naiveLpa(edges, k), s"iters=$k")
    // ordering hostility: shuffled input order and odd partition
    // widths permute the TypedImperativeAggregate's partial-map merge
    // order; mode(deterministic = true) must still tie to the lowest
    // label (the contract this spec pins against Spark upgrades)
    for (seed <- Seq(1, 7); parts <- Seq(1, 3, 5)) {
      val shuffled = new scala.util.Random(seed).shuffle(edges)
        .toDF("u", "v")
        .repartition(parts, expr(s"pmod(u * 7 + v * 13, $parts)"))
      val got = Graph.labelPropagation(shuffled, 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === naiveLpa(edges, 3), s"seed=$seed parts=$parts")
    }
    // bit-identity with the FORMER two-exchange count+argmax shape
    // (what the fused single-exchange mode aggregation replaced)
    val e = edges.toDF("u", "v")
    val dir = e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
    var labels = dir.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to 3) {
      labels = dir
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    }
    val twoStep = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoStep === naiveLpa(edges, 3),
      "fused mode shape diverged from the count+argmax reference")
  }

  test("BFS: level claiming, min-seed tiebreak, depth bound, unreachable excluded") {
    import spark.implicits._
    // two seeds 1, 2; path 1-3-4-5-...  and 2-4 shortcut:
    //   1-3, 3-4, 2-4, 4-5, 5-6, 6-7, and isolated island 90-91
    val edges = Seq((1L, 3L), (3L, 4L), (2L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (90L, 91L)).toDF("u", "v")
    val seeds = Seq(1L, 2L).toDF("node")
    val got = Graph.bfsDistances(edges, seeds, maxDepth = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === (0L, 1L) && got(2L) === (0L, 2L))
    assert(got(3L) === (1L, 1L), "3 is 1 hop from seed 1")
    // 4 is reachable at hop 1 from seed 2 AND hop 2 from seed 1:
    // first level wins, so dist 1 via seed 2
    assert(got(4L) === (1L, 2L), "first level claims the node")
    assert(got(5L) === (2L, 2L))
    assert(got(6L) === (3L, 2L))
    assert(!got.contains(7L), "beyond maxDepth")
    assert(!got.contains(90L) && !got.contains(91L), "unreachable island")
    // min-seed tiebreak: both seeds reach 40 at the same level
    val tie = Graph.bfsDistances(
      Seq((1L, 40L), (2L, 40L)).toDF("u", "v"), seeds, maxDepth = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tie(40L) === (1L, 1L), "equal-level tie breaks to the smaller seed")
  }

  test("weighted PageRank: mass follows edge weight; driver mirror bit-for-bit") {
    import spark.implicits._
    // hub 1 splits its mass 9:1 between 2 and 3; 2 and 3 return all
    // mass to 1. Node 2 must outrank node 3, and every unit must
    // match a plain-Scala fixed-point mirror exactly.
    val und = Seq((1L, 2L, 9L), (1L, 3L, 1L))
    val dirEdges = (und ++ und.map(e => (e._2, e._1, e._3)))
    val got = Graph.pageRankWeightedIntExact(
      dirEdges.toDF("src", "dst", "w"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // mirror
    val SCALE = 1000000000000L
    val base = 15L * SCALE / 100L
    val nodes = dirEdges.map(_._1).distinct
    val wsum = dirEdges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> SCALE / nodes.size).toMap
    for (_ <- 1 to 4) {
      val s = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      dirEdges.foreach { case (src, dst, w) =>
        s(dst) += pr(src) * w / wsum(src)
      }
      pr = nodes.map(n => n -> (base / nodes.size + 85L * s(n) / 100L)).toMap
    }
    assert(got === pr)
    assert(got(2L) > got(3L), "the 9:1 weight split must rank 2 above 3")
  }

  test("weighted PageRank: a near-overflow edge weight computes exactly, no silent wrap") {
    import spark.implicits._
    // Two nodes exchanging all mass over edges weighted 10^10: after
    // round 1, r ≈ 0.925·10^12, so r·w ≈ 9.25·10^21 — PAST 2^63
    // (~9.22·10^18). The old long product wrapped silently; the
    // decimal(38,0) route must match a BigInt driver mirror exactly.
    val bigW = 10000000000L
    val dirEdges = Seq((1L, 2L, bigW), (2L, 1L, bigW))
    val got = Graph.pageRankWeightedIntExact(
      dirEdges.toDF("src", "dst", "w"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val SCALE = BigInt("1000000000000")
    val base = BigInt(15) * SCALE / 100
    val nodes = Seq(1L, 2L)
    val wsum = dirEdges.groupBy(_._1).view
      .mapValues(es => BigInt(es.map(_._3).sum)).toMap
    var pr = nodes.map(_ -> SCALE / nodes.size).toMap
    for (_ <- 1 to 3) {
      val s = scala.collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
      dirEdges.foreach { case (src, dst, w) =>
        s(dst) += pr(src) * w / wsum(src)
      }
      pr = nodes.map(n => n -> (base / nodes.size + BigInt(85) * s(n) / 100)).toMap
    }
    assert(got === pr.map { case (k, v) => k -> v.toLong })
    // sanity: the fixture actually exercised the overflow region
    assert(pr.values.exists(_ * bigW > BigInt(Long.MaxValue)),
      "fixture must push r*w past 2^63 or the test proves nothing")
  }

  private def kcore(edges: Seq[(Long, Long)], rounds: Int,
      num: Int = 1, den: Int = 10): Map[Long, Long] = {
    import spark.implicits._
    Graph.kCorePeel(edges.toDF("u", "v"), rounds, num, den)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side mirror of the bounded peel: exact same k rule
    * (smallest degree whose cumulative node count reaches
    * ceil(n·num/den)) and round semantics. */
  private def naiveKcore(edges0: Seq[(Long, Long)], rounds: Int,
      num: Int, den: Int): Map[Long, Long] = {
    def deg(e: Seq[(Long, Long)]): Map[Long, Long] =
      e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
    val d0 = deg(edges0)
    val n = d0.size
    val sorted = d0.values.toSeq.sorted
    val k = sorted.zipWithIndex
      .collectFirst { case (d, i) if (i + 1) * den >= n.toLong * num => d }
      .getOrElse(Long.MaxValue)
    var e = edges0
    for (_ <- 1 to rounds) {
      val s = deg(e).collect { case (node, d) if d >= k => node }.toSet
      e = e.filter(p => s(p._1) && s(p._2))
    }
    deg(e)
  }

  test("k-core peel: matches the driver mirror at every round depth") {
    // star fringe around a clique: clique 1-2-3-4 (all pairs) plus
    // pendant leaves — the leaves peel, the clique survives
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val edges = clique ++ Seq((1L, 10L), (2L, 11L), (3L, 12L), (10L, 13L))
    for (r <- 0 to 4)
      assert(kcore(edges, r, 1, 2) === naiveKcore(edges, r, 1, 2),
        s"mismatch at rounds=$r")
  }

  test("k-core peel: fixture graph matches the driver mirror; peeling is monotone") {
    // The dense co-order graph does NOT reach its peel fixpoint in 3
    // rounds (its quantile-k keeps biting — measured 181→166→141→69
    // survivors over rounds 1–4 at sf0.001), which is exactly why the
    // shipped contract is BOUNDED peeling, not "the k-core": this
    // pins the bounded semantics against an independent driver-side
    // mirror on the real fixture, plus the monotone-shrinkage law.
    val edgeDf = graft.operators.NorthStar.coOrderEdges(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val edges = edgeDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    var prevNodes = Long.MaxValue
    for (r <- 1 to 4) {
      val got = Graph.kCorePeel(edgeDf, r).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === naiveKcore(edges, r, 1, 10), s"fixture mismatch at rounds=$r")
      assert(got.size <= prevNodes, "survivor set must shrink monotonically")
      prevNodes = got.size
    }
    edgeDf.unpersist(false)
  }

  test("k-core peel: deep run (checkpoint cadence) equals the shallow-unrolled result") {
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val edges = clique ++ Seq((1L, 10L), (2L, 11L))
    // rounds > checkpointThreshold routes through localCheckpoint
    // truncation; values must be bit-identical to the unrolled form
    import spark.implicits._
    val deep = Graph.kCorePeel(edges.toDF("u", "v"), 10, 1, 2,
      checkpointEvery = 2, checkpointThreshold = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deep === naiveKcore(edges, 10, 1, 2))
  }
}
