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
    val nodes = edges.select(col("src").as("node")).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n"))
    var pr = nodes.crossJoin(broadcast(nTot))
      .select(col("node"), expr(s"$SCALE div n").as("r"))
    for (i <- 1 to iters) {
      val contrib = pr
        .join(edges, pr("node") === edges("src"))
        .join(deg, "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("node"),
          expr(s"($base div n) + ((85 * coalesce(s, 0)) div 100)").as("r"))
      if (iters > checkpointThreshold && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint(true)
    }
    pr.select(col("node"), col("r").as("rank_units"))
  }
}
