package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames — the Pregel-style
  * join/aggregate loop, complementing the one-shot connected
  * components in [[Dedup.connectedComponents]].
  *
  * PageRank here is INTEGER-EXACT: ranks live in fixed-point units
  * (scale 10^12) and every step is integer floor-division and integer
  * summation — deterministic under any execution order, any engine,
  * any parallelism. The float formulation's per-node sums would be
  * order-dependent across engines; the fixed-point one is
  * bit-reproducible, which is what lets the DuckDB oracle re-derive
  * the whole iteration (and what makes a production run auditable).
  * The quantization error per step is bounded by deg·1 unit = 10^-12
  * per contribution — far below any ranking-relevant difference.
  *
  * Scale shape per iteration: one join of ranks to edges on src (both
  * sides key-partitioned on the join key — bucketing the edge list by
  * src makes the per-iteration shuffle the ranks side only, exactly
  * the classic Pregel layout), one map-side-combined sum by dst.
  * State is O(nodes); iterations are a fixed small count. */
object Graph {

  /** `iters` rounds of damped PageRank (d = 0.85) over `edges`
    * (src, dst) — every node must appear as a src (no dangling
    * mass). Returns (node, rank_units) with Σ ranks ≈ SCALE.
    *
    * LINEAGE GUARD: the loop extends `pr`'s logical plan every round;
    * left unchecked, analysis/optimization cost grows quadratically
    * with iteration count and a deep run re-derives every prior round
    * on any recompute. At small `iters` the unrolled, uncached plan is
    * the measured winner (cache experiment rejected with numbers —
    * docs/PLANS.md), so the fast path is untouched; past
    * `checkpointThreshold` total iterations the loop truncates lineage
    * every `checkpointEvery` rounds via eager `localCheckpoint`
    * (block-manager-backed; zero-config). Checkpointing only
    * materializes the integer rank table — it cannot change values;
    * the spec pins checkpointed ≡ unrolled bit-for-bit. On a cluster
    * where executor loss during a long run matters, prefer a reliable
    * `checkpoint()` dir — same cadence, durable storage. */
  def pageRankIntExact(edges: DataFrame, iters: Int,
      checkpointEvery: Int = 6, checkpointThreshold: Int = 8): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(checkpointEvery > 0, s"checkpointEvery must be > 0, got $checkpointEvery")
    val SCALE = 1000000000000L // 10^12 fixed-point units
    val base = 15L * SCALE / 100L // undamped teleport mass numerator
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // Materialize the DEGREE-ANNOTATED edge list once, hash-partitioned
    // on the join key (the labelPropagation dirEdges pattern): `deg` is
    // loop-INVARIANT, yet the unrolled plan re-joined it — and re-derived
    // the edge list — every round. With the eager partitioned checkpoint
    // each round is one join + one aggregation and only the O(nodes)
    // rank table moves; join reassociation (pr⋈edges)⋈deg → pr⋈(edges⋈deg)
    // cannot change rows (inner equi-joins on the same keys).
    val edgesDeg0 = edges.join(deg, "src").select(col("src"), col("dst"), col("deg"))
    val edgesDeg = if (iters > 1) {
      val width = edges.sparkSession.sessionState.conf.numShufflePartitions
      val h = edgesDeg0.repartition(width, col("src")).localCheckpoint(true)
      ckpts += h; h
    } else edgesDeg0
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n"))
    var pr = nodes.crossJoin(broadcast(nTot))
      .select(col("node"), expr(s"$SCALE div n").as("r"))
    for (i <- 1 to iters) {
      val contrib = pr
        .join(edgesDeg, pr("node") === edgesDeg("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("node"),
          expr(s"($base div n) + ((85 * coalesce(s, 0)) div 100)").as("r"))
      if (iters > checkpointThreshold && i % checkpointEvery == 0 && i < iters) {
        pr = pr.localCheckpoint(true)
        ckpts += pr
      }
    }
    releaseAfter(pr.select(col("node"), col("r").as("rank_units")), ckpts.toSeq)
  }

  /** WEIGHTED damped PageRank, same integer-exact discipline as
    * [[pageRankIntExact]]: each node divides its rank over out-edges
    * PROPORTIONALLY TO EDGE WEIGHT (contribution = r·w div W(src),
    * all integer floor arithmetic — bit-reproducible anywhere). On a
    * co-occurrence graph this is the formulation that actually ranks:
    * a part sharing 40 orders with a hub should pull 40× the mass of
    * a one-order acquaintance, which the unweighted walk flattens.
    * Input edges are DIRECTED (src, dst, w); every node must appear
    * as a src. Overflow safety: r can reach the total mass 10^12, so
    * a single edge weight ≥ ~9.2·10^6 would wrap r·w past 2^63
    * SILENTLY under non-ANSI long arithmetic — the r·w product is
    * therefore routed through decimal(38,0) (exact integers to
    * 10^38; `div` on decimals is still integral division and lands
    * back on BIGINT), the basketLift fix. Every in-range value is
    * bit-identical to the long path; out-of-range values now compute
    * exactly instead of wrapping. Same per-iteration scale shape and
    * checkpoint cadence as the unweighted form. */
  def pageRankWeightedIntExact(edges: DataFrame, iters: Int,
      checkpointEvery: Int = 6, checkpointThreshold: Int = 8): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(checkpointEvery > 0, s"checkpointEvery must be > 0, got $checkpointEvery")
    val SCALE = 1000000000000L
    val base = 15L * SCALE / 100L
    // NOTE (round 14): folding the loop-invariant `wsum` into an
    // eager partitioned edge checkpoint (the pageRankIntExact
    // edgesDeg change) was tried here and MEASURED WORSE on the
    // weighted callers (g06 min 0.68 s lazy vs ≥1.3 s checkpointed):
    // their edge input is already a checkpointed co-order memo, so
    // the derivation is free, and the lazy loop lets one adaptive
    // execution broadcast the tiny rank/weight tables — while a
    // checkpointed LogicalRDD loses runtime size stats and pushed
    // the per-round join to a narrow sort-merge. Kept lazy.
    val wsum = edges.groupBy("src").agg(sum(col("w")).as("wsum"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n"))
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var pr = nodes.crossJoin(broadcast(nTot))
      .select(col("node"), expr(s"$SCALE div n").as("r"))
    for (i <- 1 to iters) {
      val contrib = pr
        .join(edges, pr("node") === edges("src"))
        .join(wsum, "src")
        .select(col("dst").as("node"),
          expr("(cast(r as decimal(38,0)) * w) div wsum").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("node"),
          expr(s"($base div n) + ((85 * coalesce(s, 0)) div 100)").as("r"))
      if (iters > checkpointThreshold && i % checkpointEvery == 0 && i < iters) {
        pr = pr.localCheckpoint(true)
        ckpts += pr
      }
    }
    releaseAfter(pr.select(col("node"), col("r").as("rank_units")), ckpts.toSeq)
  }

  /** Lineage-guard block hygiene: when a loop left eager
    * `localCheckpoint` intermediates in the block manager, cut the
    * result over to its OWN (single, O(result)-sized) checkpoint and
    * unpersist the intermediates immediately. Without this, every
    * call in a long-lived session parks its per-round tables in
    * storage until the ContextCleaner happens to GC the handles.
    * Safe by construction: the final eager checkpoint copies the
    * result into fresh blocks, so nothing downstream reads the
    * released ones. */
  private def releaseAfter(result: DataFrame, ckpts: Seq[DataFrame]): DataFrame =
    if (ckpts.isEmpty) result
    else {
      val out = result.localCheckpoint(true)
      ckpts.foreach(_.unpersist(false))
      out
    }

  /** SYNCHRONOUS label propagation (community detection) over an
    * undirected graph — `iters` rounds of "adopt the most frequent
    * label among your neighbors", the Raghavan/Albert/Kumara LPA made
    * DETERMINISTIC for cross-engine oracle-ability: updates are
    * synchronous (round t+1 reads only round t — no order-dependent
    * in-place adoption) and ties break to the SMALLEST label. The
    * classic caveat applies and is part of the contract: sync LPA can
    * oscillate on near-bipartite structures, so the result is "labels
    * after exactly `iters` rounds", not a fixed point — identical in
    * every engine, which is what lets the oracle unroll the loop.
    *
    * Input `edges` is the canonical undirected edge list (u < v, one
    * row per edge); output is (node, label) for every non-isolated
    * node, label = node id seeding.
    *
    * Scale shape per round: one hash join of the O(nodes) label table
    * to the directed edge list on src (the edge side can be bucketed
    * on src so only labels move), one map-side-combined (dst, label)
    * count, and one map-side-combined per-node argmax folded as
    * max(struct(count, -label)) — an aggregate, never a window, so no
    * per-node sort materializes. State is O(nodes); lineage is
    * checkpoint-truncated on the PageRank cadence for deep runs. */
  def labelPropagation(edges: DataFrame, iters: Int,
      checkpointEvery: Int = 6, checkpointThreshold: Int = 8): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val dirEdges0 = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
    // Materialize the directed edge list ONCE when it will be read
    // every round: the unrolled loop plan repeats the edge subtree
    // per iteration and Spark does not share common subplans across
    // it — with a derived edge list (e.g. the co-order DISTINCT
    // self-join) each round would re-pay the derivation (measured
    // 4×-ish on g03 at sf0.1). localCheckpoint = block-manager-backed;
    // a cluster run that must survive executor loss swaps in a
    // reliable checkpoint dir, same cadence note as pageRank's.
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // Materialize the edge list ALREADY HASH-PARTITIONED on the join
    // key: localCheckpoint preserves outputPartitioning in the
    // LogicalRDD, so every round's labels⋈edges join reuses it and
    // only the O(nodes) label table moves — without this the O(edges)
    // side re-shuffles on src once per round (measured ~35% of g03).
    val dirEdges = if (iters > 1) {
      val h = dirEdges0.repartition(col("src")).localCheckpoint(true)
      ckpts += h; h
    } else dirEdges0
    var labels = dirEdges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (i <- 1 to iters) {
      // ONE exchange per round: the per-node argmax is folded into
      // the neighbor aggregation via the deterministic `mode`
      // aggregate (a TypedImperativeAggregate — per-label counts
      // build and MERGE map-side, so only per-(node, partition)
      // partial count maps cross the wire, then ties break to the
      // LOWEST label — bit-identical to the former two-step
      // count-by-(dst,label) + max(struct(c, -label)) shape, which
      // paid a second full exchange on (dst, label) every round).
      labels = dirEdges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"))
        .agg(mode(col("label"), deterministic = true).as("label"))
      if (iters > checkpointThreshold && i % checkpointEvery == 0 && i < iters) {
        labels = labels.localCheckpoint(true)
        ckpts += labels
      }
    }
    releaseAfter(labels, ckpts.toSeq)
  }

  /** Per-node TRIANGLE counts over an undirected graph — the core of
    * clustering-coefficient / community-density analytics. Input is
    * the canonical distinct edge list (`u` < `v`, one row per
    * undirected edge); output is (node, n_triangles) for every node
    * in ≥1 triangle.
    *
    * Scale shape — degree-ordered orientation (the Cohen / MapReduce
    * triangle-counting construction): orient every edge from its
    * lower-(degree, id) endpoint to the higher one, so a triangle
    * {x ≺ y ≺ z} materializes exactly once, as the wedge at its
    * MINIMUM vertex closed by the oriented edge (y, z). Out-degrees
    * under this orientation are bounded by O(√m), so the wedge join
    * generates O(m^1.5) candidates worst-case — on a skewed graph
    * orders of magnitude below the naive id-orientation, whose wedge
    * count explodes at any high-degree low-id hub. Three hash
    * exchanges total: the wedge self-join on the wedge apex and the
    * closing equi-join on (b, c) — no OR-predicates, no nested-loop
    * fallback (the orientation makes the closing edge's direction
    * KNOWN, keeping the join a plain two-key hash probe); the final
    * per-node count map-side combines after a 3-way corner explode.
    * Degree attach is two broadcast-sized joins at realistic node
    * counts, and plain hash joins beyond. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    // total order ≺ = (deg, id) lexicographic; plain booleans inline
    // into codegen'd predicates
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"))
    // Edge-iterator over ADJACENCY ARRAYS instead of a wedge join: a
    // triangle x ≺ y ≺ z closes exactly once, at its (x, y) edge,
    // with z ∈ N⁺(x) ∩ N⁺(y). Attaching the two out-neighbor arrays
    // costs two m-row hash joins on single keys; the intersection is
    // a per-row O(outdeg) kernel. Nothing wedge-sized ever hits an
    // exchange — the O(m^1.5) candidate space that the wedge-join
    // formulation shuffles (measured 5–13 s/stage at sf0.1) stays
    // inside each task's array intersection here.
    val adj = oriented.groupBy(col("src").as("node"))
      .agg(collect_list(col("dst")).as("nbrs"))
    // Re-derive each (src, dst) edge by EXPLODING the adjacency row
    // itself: the src side's array rides the explode for free, so
    // only ONE m-row array-carrying join remains (attaching the dst
    // side) instead of two — the edge list never joins back to its
    // own adjacency index. Oriented edges are distinct, so the
    // explode reproduces the edge set exactly.
    // EXPLICIT width on the UNIQUE (src, dst) edge key: the
    // intersection stage is CPU-heavy (per-row O(outdeg) array
    // intersect + 3-way credit explode) over BYTE-small rows, exactly
    // the shape AQE's byte-based coalescing collapses to a handful of
    // tasks (measured at sf0.1: 5 tasks / 3.9 s — the whole query's
    // dominant stage — vs sub-second at session width). Round 13
    // keyed this exchange on `dst` alone — but `dst` is the
    // power-law end of the orientation, and a REPARTITION_BY_NUM
    // exchange is exempt from AQE's skew-join splitting as well as
    // its coalescing: a hub node's whole adjacency landed on one
    // task with the escape hatch turned off. Keying on the (src,
    // dst) PAIR keeps the explicit width but makes the stage
    // skew-proof by construction — oriented edges are distinct, so
    // every key has multiplicity 1. The adjacency side broadcasts
    // (it is the aggregated index, far smaller than the exploded
    // edge side), so the intersect/filter/credit pipeline all runs
    // in the one repartitioned stage; if a giant graph ever pushes
    // the join to sort-merge, its own ENSURE_REQUIREMENTS exchanges
    // on `dst` take over with AQE's skew split available. The width
    // is the session's configured shuffle width, so cluster runs
    // keep their own sizing; counts are exact aggregates —
    // partitioning cannot change the result.
    val width = edges.sparkSession.sessionState.conf.numShufflePartitions
    val withAdj = adj
      .select(col("node").as("src"), col("nbrs").as("na"),
        explode(col("nbrs")).as("dst"))
      .repartition(width, col("src"), col("dst"))
      .join(adj.select(col("node").as("dst"), col("nbrs").as("nb")), "dst")
      .select(col("src"), col("dst"),
        array_intersect(col("na"), col("nb")).as("common"))
      .filter(size(col("common")) > 0)
    // Per-triangle credits: the edge endpoints each earn one per
    // common neighbor; each common neighbor earns one. Weighted
    // corner rows keep the post-filter volume at 3·|triangles|.
    // Spelled as one explode over common ++ [src, dst] with the
    // weight chosen per row — NOT a transform(common, c -> struct)
    // lambda: higher-order functions are CodegenFallback, and that
    // one lambda knocked the whole credit stage out of whole-stage
    // codegen. The `when` is exact: under the ≺ orientation src ∉
    // na (no self-loops) and dst ∉ nb, so neither endpoint can
    // appear in common = na ∩ nb, and the endpoint rows are exactly
    // the two appended entries.
    withAdj.select(col("src"), col("dst"), col("common"),
        explode(concat(col("common"), array(col("src"), col("dst")))).as("node"))
      .groupBy("node")
      .agg(sum(when(col("node") === col("src") || col("node") === col("dst"),
        size(col("common")).cast("long")).otherwise(lit(1L))).as("n_triangles"))
  }

  /** Multi-source BFS shortest-hop distances over an undirected graph,
    * bounded to `maxDepth` levels — the reachability/proximity kernel
    * (nearest-warehouse, blast-radius, "within N hops of a flagged
    * node" analytics). Output: (node, dist, nearest_seed) for every
    * node within `maxDepth` hops of the seed set, where dist is the
    * TRUE minimum hop count (synchronous level-at-a-time expansion —
    * a node is claimed by the FIRST level that reaches it) and
    * nearest_seed deterministically breaks ties as the minimum seed
    * id among the frontier parents that reach it at that level.
    * Bounded depth is the contract, not a shortcut: it is what makes
    * the loop unrollable by a SQL oracle and what bounds the job DAG.
    *
    * Scale shape per level: one hash join of the O(frontier) table to
    * the directed edge list on src, one map-side-combined min-seed
    * aggregate, one broadcast-able anti-join against the settled set.
    * Frontiers only ever carry (node, seed) — no paths materialize.
    * The directed edge list is localCheckpoint'd once when looping
    * (the same re-derivation guard as [[labelPropagation]]); settled
    * state is O(reached nodes). */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val dirEdges0 = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // same pre-partitioned checkpoint as labelPropagation: each
    // level's frontier⋈edges join moves only the frontier
    val dirEdges = if (maxDepth > 1) {
      val h = dirEdges0.repartition(col("src")).localCheckpoint(true)
      ckpts += h; h
    } else dirEdges0
    var settled = seeds.select(col("node"), lit(0L).as("dist"),
      col("node").as("nearest_seed"))
    var frontier = settled
    for (d <- 1 to maxDepth) {
      val reached = dirEdges
        .join(frontier.select(col("node").as("src"), col("nearest_seed")), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("nearest_seed")).as("nearest_seed"))
      frontier = reached
        .join(settled.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(d.toLong).as("dist"), col("nearest_seed"))
      settled = settled.unionByName(frontier)
      // settle each level before the next expands: the anti-join must
      // see a STABLE settled set, and checkpointing it also keeps the
      // lineage linear instead of doubling per level
      if (d < maxDepth) {
        settled = settled.localCheckpoint(true)
        ckpts += settled
        frontier = settled.filter(col("dist") === d.toLong)
      }
    }
    releaseAfter(settled, ckpts.toSeq)
  }

  /** Bounded K-CORE PEELING — `rounds` rounds of "drop every node
    * whose degree in the SURVIVING subgraph is below k", the
    * dense-subgraph filter behind core decomposition (graph curation:
    * keep the well-connected center of a co-occurrence graph, shed
    * the sparse fringe). Bounded rounds is the contract, exactly like
    * [[bfsDistances]]' bounded depth: the result is "the subgraph
    * after exactly `rounds` peels" — deterministic, engine-agnostic,
    * and SQL-unrollable; on a graph whose peeling converges within
    * the bound it IS the k-core, and on one that hasn't converged yet
    * (the dense co-order fixture is still shedding at round 4) it is
    * an honest intermediate the spec pins against a driver mirror
    * round by round.
    *
    * `k` is SCALE-FREE: the smallest degree whose cumulative node
    * count reaches `rankNum/rankDen` of all nodes (the exact
    * lower-tail degree quantile, integer ceil rank). A fixed absolute
    * k is useless across corpus sizes — on the dense co-order graph
    * it either no-ops (k below the degree floor) or annihilates the
    * graph in one round; the quantile form peels the same FRACTION of
    * fringe at any scale. Computed from the degree HISTOGRAM: a
    * map-side-combined (deg → node count) aggregate — O(distinct
    * degrees) rows — then one tiny cumulative window and a min. The
    * full degree table is never sorted and no per-node rank window
    * ever runs (the 100 TB trap an exact-quantile-by-sort would be).
    *
    * Scale shape per round: one map-side-combined degree aggregate
    * over surviving edges and two semi-joins of the edge list against
    * the O(nodes) survivor set (broadcast-able while survivors are
    * small; plain hash semi joins beyond). The edge set shrinks
    * monotonically, so every round costs at most the first. Output is
    * (node, deg) — each surviving node's degree inside the final
    * surviving subgraph. */
  def kCorePeel(edges: DataFrame, rounds: Int,
      rankNum: Int = 1, rankDen: Int = 10,
      checkpointEvery: Int = 6, checkpointThreshold: Int = 8): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(rankNum > 0 && rankDen > 0 && rankNum <= rankDen,
      s"rank fraction must sit in (0, 1], got $rankNum/$rankDen")
    import org.apache.spark.sql.expressions.Window
    def degrees(e: DataFrame): DataFrame = e
      .select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val deg0 = degrees(edges)
    val hist = deg0.groupBy("deg").agg(count(lit(1)).as("c"))
    // cum ≥ ceil(n·num/den)  ⟺  cum·den ≥ n·num (integer-exact ceil)
    val cumW = Window.orderBy("deg")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // k is a MODEL PARAMETER, resolved once with one bounded job (the
    // IVF-centroid pattern: driver-side scalars are fine when they are
    // O(1), data rows are not): one histogram aggregate + a 1-row
    // head. Inlining it as a literal keeps every round's filter a
    // plain codegen'd comparison and the returned frame fully lazy —
    // no checkpoint has to hide the peel plan from downstream
    // optimization (or from the plan-shape specs).
    val kRow = hist
      .withColumn("cum", sum(col("c")).over(cumW))
      .crossJoin(broadcast(deg0.agg(count(lit(1)).as("n"))))
      .filter(col("cum") * rankDen >= col("n") * rankNum)
      .agg(min(col("deg")).as("k"))
      .head()
    val k: Long = if (kRow.isNullAt(0)) Long.MaxValue else kRow.getLong(0)
    var e = edges.select("u", "v")
    for (r <- 1 to rounds) {
      val survivors = degrees(e)
        .filter(col("deg") >= lit(k))
        .select("node")
      e = e
        .join(survivors.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(survivors.select(col("node").as("v")), Seq("v"), "left_semi")
      if (rounds > checkpointThreshold && r % checkpointEvery == 0 && r < rounds) {
        e = e.localCheckpoint(true)
        ckpts += e
      }
    }
    releaseAfter(degrees(e), ckpts.toSeq)
  }
}
