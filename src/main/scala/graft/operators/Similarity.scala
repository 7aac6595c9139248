package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.SketchExpressions

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-LSH (random-hyperplane) bucketed variant as the scale path
  * (north-star mandate, SURVEY.md §1.4).
  *
  * Vector math is higher-order array expressions (`zip_with` +
  * `aggregate`) — codegen-compatible, no UDF. The LSH hyperplanes are
  * derived from `xxhash64(plane, dim)` so signatures are deterministic
  * across sessions with zero stored model state.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = SketchExpressions.floatDot(a, b)

  def l2Norm(a: Column): Column = sqrt(SketchExpressions.floatDot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Cosine from a precomputed-norm pair: norms are computed once per
    * ROW upstream instead of once per candidate PAIR (the pair space
    * is orders of magnitude larger). */
  private[operators] def cosineWithNorms(dotC: Column, normA: Column, normB: Column): Column =
    when(normA * normB > 0, dotC / (normA * normB)).otherwise(lit(0.0))

  /** Per-query top-k with ranks, heap-pruned: the custom
    * [[graft.plans.TopKPerKey]] node keeps each query's k best
    * candidates in one bounded-heap pass (no sort of the full scored
    * candidate stream — the first thing to spill at scale), then the
    * row_number window ranks only the surviving k-per-key rows,
    * reusing the same keyed exchange. Identical output to ranking the
    * full stream (the heap keeps exactly the rows `rank <= k` keeps,
    * same ordering + tiebreak). */
  private[operators] def rankTopK(scored: DataFrame, keyCol: String,
      scoreCol: String, tieCol: String, k: Int): DataFrame = {
    val pruned = graft.plans.TopK.topKPerKey(
      scored, Seq(keyCol), scoreCol, k, tieBreakers = Seq(tieCol))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    pruned.withColumn("rank", row_number().over(w))
  }

  /** Exact top-k neighbors for the query rows (default: all rows) by
    * brute-force cosine: block-nested-loop join + per-query top-k.
    * O(|q|·n) — the correctness baseline and perfectly fine when |q|
    * is small or n fits a broadcast; the ANN below is the 100 TB
    * path. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queries: Option[DataFrame] = None): DataFrame = {
    // Null embeddings carry no signal: excluded on BOTH sides here and
    // in every other vector operator (LSH bucket joins would drop them
    // anyway — null keys never join — so the explicit filter keeps the
    // exact and approximate paths agreeing instead of brute force
    // emitting null-cosine rows the ANN paths can't produce). Same
    // contract as the text operators' "contentless doc never pairs".
    val corpus = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .withColumn("nbr_norm", l2Norm(col("nbr_vec")))
    def finish(scored: DataFrame): DataFrame =
      rankTopK(scored, "query_id", "cosine", "nbr_id", k)
        .select(col("query_id"), col("nbr_id"),
          graft.functions.Quantize.quantize4(col("cosine")).as("cosine"),
          col("rank").cast("long").as("rank"))
    queries match {
      case Some(qdf) =>
        val q = qdf.filter(col(vecCol).isNotNull)
          .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
          .withColumn("query_norm", l2Norm(col("query_vec")))
        finish(q.crossJoin(corpus)
          .filter(col("query_id") =!= col("nbr_id"))
          .withColumn("cosine", cosineWithNorms(
            dot(col("query_vec"), col("nbr_vec")), col("query_norm"), col("nbr_norm")))
          .select(col("query_id"), col("nbr_id"), col("cosine")))
      case None =>
        // ALL-pairs: cosine is symmetric (float multiply commutes, the
        // accumulation order is positional), so score each unordered
        // pair once on the upper triangle and mirror — HALF the dot
        // products of the naive q×c matrix. The half-matrix rides a
        // scope (the mirror union consumes it twice) and the result is
        // sealed — cached, materialized, intermediates released — so
        // no hidden cache outlives the call (CacheScope contract).
        val scope = new CacheScope
        val half = scope.pin(corpus
          .select(col("nbr_id").as("id_a"), col("nbr_vec").as("vec_a"), col("nbr_norm").as("norm_a"))
          .crossJoin(corpus.select(
            col("nbr_id").as("id_b"), col("nbr_vec").as("vec_b"), col("nbr_norm").as("norm_b")))
          .filter(col("id_a") < col("id_b"))
          .withColumn("cosine", cosineWithNorms(
            dot(col("vec_a"), col("vec_b")), col("norm_a"), col("norm_b")))
          .select(col("id_a"), col("id_b"), col("cosine")))
        val scored = half
          .select(col("id_a").as("query_id"), col("id_b").as("nbr_id"), col("cosine"))
          .unionByName(half.select(
            col("id_b").as("query_id"), col("id_a").as("nbr_id"), col("cosine")))
        scope.sealResult(finish(scored))
    }
  }

  /** Exact top-k by INNER PRODUCT — maximum-inner-product search
    * (MIPS), the scoring rule of recommender user×item retrieval and
    * unnormalized embedding stores, where a long vector SHOULD beat a
    * well-aligned short one and cosine's norm divide is wrong. Brute
    * force O(|q|·n): the correctness baseline; [[mipsAnnTopK]] is the
    * 100 TB path. Scores quantized to 1e-4 like every vector surface
    * here so the DuckDB oracle (positional list_dot_product, same
    * IEEE accumulation) hash-matches. */
  def mipsTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queries: DataFrame): DataFrame = {
    val corpus = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = q.crossJoin(corpus)
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        dot(col("query_vec"), col("nbr_vec")).as("ip"))
    rankTopK(scored, "query_id", "ip", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"),
        graft.functions.Quantize.quantize4(col("ip")).as("dot"),
        col("rank").cast("long").as("rank"))
  }

  /** Approximate MIPS via the ORDER-PRESERVING AUGMENTATION
    * (Bachrach et al., RecSys'14 "Speeding up the Xbox recommender";
    * Shrivastava & Li, NIPS'14 asymmetric LSH — both public
    * literature): with M = max corpus norm, map corpus x ↦
    * [x, √(M²−‖x‖²)] and query q ↦ [q, 0]. Every augmented corpus
    * vector then has norm exactly M, so for a fixed query
    * cos(q̃, x̃) = (q·x)/(‖q‖·M) is MONOTONE in the inner product —
    * cosine neighbor order IS inner-product order, and the whole
    * sign-LSH machinery built for cosine applies unchanged to a
    * problem it could not otherwise index (random hyperplanes are
    * blind to magnitude).
    *
    * Scale shape: M is one broadcast scalar off a map-side-combined
    * max; augmentation is a per-row projection (no shuffle); buckets
    * are ASYMMETRIC — the corpus is indexed once, queries probe the
    * same hyperplanes — and the only exchanges are the bucket join
    * keyed on (table, bucket) and the top-k's query-keyed exchange
    * (bounded-heap pruned). Hot buckets are capped at `maxBucket`
    * corpus members (dropped LOUDLY in the count, like every bucketed
    * candidate generator here). Candidates are re-scored with the
    * EXACT inner product on the ORIGINAL vectors, so any augmentation
    * rounding affects only candidate generation, never final order:
    * output ≡ [[mipsTopK]] restricted to candidate hits — recall is
    * the only approximation, which is exactly what the v20 gate
    * certificate measures. */
  def mipsAnnTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queries: DataFrame, tables: Int = 10, maxBucket: Int = 2000): DataFrame = {
    val scope = new CacheScope
    val corpus = scope.pin(df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .withColumn("sqn", SketchExpressions.floatDot(col("nbr_vec"), col("nbr_vec"))))
    val q = scope.pin(queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val m2 = broadcast(corpus.agg(max(col("sqn")).as("m2")))
    // occupancy-64 plane sizing, same rationale as lshBuckets
    val n = corpus.count().max(1)
    val p = math.max(4, math.ceil(math.log(n.toDouble / 64) / math.log(2)).toInt)
    def tableBuckets(aug: Column, idC: Column, idName: String, src: DataFrame) =
      src.select(idC.as(idName), explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), lshBucket(aug, p, t).as("b"))): _*)).as("tb"))
        .select(col(idName), col("tb.t").as("table_idx"), col("tb.b").as("bucket"))
    val corpusAug = concat(col("nbr_vec"),
      array(sqrt(greatest(col("m2") - col("sqn"), lit(0.0))).cast("float")))
    val cBuckets = tableBuckets(corpusAug, col("nbr_id"), "nbr_id",
      corpus.crossJoin(m2))
    val qAug = concat(col("query_vec"), array(lit(0.0f)))
    val qBuckets = tableBuckets(qAug, col("query_id"), "query_id", q)
    // cap pathological buckets by CORPUS occupancy before the probe —
    // an aggregate + anti join (the overflow list is tiny), never a
    // window sort over the full bucket stream
    val hot = cBuckets.groupBy("table_idx", "bucket")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
      .select("table_idx", "bucket")
    val keptBuckets = cBuckets.join(broadcast(hot),
      Seq("table_idx", "bucket"), "left_anti")
    val cand = qBuckets.join(keptBuckets, Seq("table_idx", "bucket"))
      .select(col("query_id"), col("nbr_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .distinct()
    val scored = cand
      .join(q, "query_id")
      .join(corpus.select(col("nbr_id"), col("nbr_vec")), "nbr_id")
      .select(col("query_id"), col("nbr_id"),
        dot(col("query_vec"), col("nbr_vec")).as("ip"))
    scope.sealResult(rankTopK(scored, "query_id", "ip", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"),
        graft.functions.Quantize.quantize4(col("ip")).as("dot"),
        col("rank").cast("long").as("rank")))
  }

  /** Symmetric per-vector int8 quantization — the 4× embedding
    * compression a 100 TB vector corpus wants for storage/IO/cache
    * (float32 → int8 + one float scale per vector). Cosine is
    * SCALE-INVARIANT, so similarity search needs no dequantization:
    * the integer vectors are scored directly, and the only quality
    * loss is per-dimension rounding (|err| ≤ scale/2; recall bound
    * spec-asserted). The rounding is `floor(x + 0.5)` — the
    * engine-portable half-up both DuckDB and Spark evaluate
    * identically (plain `round` disagrees across engines on halves),
    * which is what lets the quantized search be hash-oracled (v09).
    * Zero vectors quantize to zeros (no 0/0). */
  /** Seeded ±1 RANDOM PROJECTION (Johnson–Lindenstrauss / Achlioptas
    * sign variant) from `inDim` to `outDim` dimensions — the
    * shrink-before-index step of an embedding pipeline: a 4×-smaller
    * vector preserves pairwise angles to ~1/√outDim, and every
    * downstream ANN/near-dup stage pays proportionally less compute,
    * shuffle, and storage. Per-row array expressions, zero shuffle,
    * zero stored model: the sign matrix is a pure function of
    * (inDim, outDim, seed) via the portable mix
    * ([[SketchExpressions.projectionSigns]]).
    *
    * INTEGER-EXACT on purpose: inputs quantize to micro-units
    * (floor-half-up at 1e-6 — far below embedding noise), and each
    * output coordinate is an INTEGER sum of signed micro-units —
    * order-independent under any parallelism and bit-reproducible in
    * the DuckDB oracle, the same contract as the exact-moments and
    * PageRank formulations. Output is EXPLODED (id, dim_j, y_units):
    * one row per projected coordinate, hash-comparable without
    * cross-engine array-equality semantics. Downstream consumers
    * re-assemble with collect_list over dim_j or divide by
    * (1e6·√outDim) for the float view. Rows whose vector is null or
    * not exactly `inDim` wide are excluded (dim-homogeneous corpus
    * contract, same as every vector operator here). */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int = 64, outDim: Int = 16, seed: Long = 25214903917L): DataFrame = {
    val signs = SketchExpressions.projectionSigns(inDim, outDim, seed)
    val qv = transform(col(vecCol),
      x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === inDim)
      .select(col(idCol), qv.as("__qv"))
      .select(col(idCol), posexplode(array((0 until outDim).map { j =>
        aggregate(
          zip_with(col("__qv"), typedLit(signs(j).toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)
      }: _*)))
      .select(col(idCol), col("pos").cast("long").as("dim_j"),
        col("col").as("y_units"))
  }

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .withColumn("__ma", array_max(transform(col(vecCol), x => abs(x))).cast("double"))
      .select(col(idCol),
        when(col("__ma") > 0,
          transform(col(vecCol), x =>
            floor(x.cast("double") / col("__ma") * 127 + lit(0.5)).cast("tinyint")))
          .otherwise(transform(col(vecCol), _ => lit(0).cast("tinyint"))).as("qvec"),
        (col("__ma") / 127.0d).cast("float").as("scale"))

  /** Exact top-k over the int8-quantized corpus: quantize, score the
    * integer vectors with the same brute-force kernel (values ≤ 127
    * are float-exact; the dot accumulates in a double), rank. The
    * compressed twin of [[bruteForceTopK]] — at scale the 4×-smaller
    * vectors are what makes the scoring pass cache-resident. */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queries: Option[DataFrame] = None): DataFrame = {
    def asFloats(d: DataFrame): DataFrame =
      d.select(col(idCol), transform(col("qvec"), x => x.cast("float")).as(vecCol))
    val corpus = asFloats(quantizeInt8(df, idCol, vecCol))
    val q = queries.map(qdf => asFloats(quantizeInt8(qdf, idCol, vecCol)))
    bruteForceTopK(corpus, idCol, vecCol, k, q)
  }

  /** Sign-LSH bucket id: `planes` pseudo-random hyperplanes, bit p =
    * sign(Σ_i vec[i] · h(table, p, i)) with h a zero-state hash in
    * [−1, 1]. Same-bucket vectors are likely cosine-close. Fused
    * imperative loop via the custom SignLshBucket expression. */
  def lshBucket(vec: Column, planes: Int, table: Int): Column =
    SketchExpressions.signLshBucket(vec, planes, table)

  /** Approximate top-k: candidates = rows sharing an LSH bucket in any
    * of `tables` independent hash tables, then exact cosine + top-k
    * within candidates. Shuffles on bucket ids only — the all-pairs
    * space is never built. `planes` trades recall for bucket size
    * (2^planes expected buckets per table); `planes = 0` sizes it
    * from the corpus so mean bucket occupancy is ~64 regardless of
    * scale — candidate volume stays ~64·n, linear, instead of
    * n²/2^planes blowing up as the corpus grows past the tuning SF. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 0, tables: Int = 10, maxBucket: Int = 2000): DataFrame = {
    // The vector table is the expensive artifact: cache it once; the
    // bucket stream derives from it in ONE scan (all hash tables
    // evaluated in one projection and exploded), and the candidate
    // scoring joins back against it by id.
    val scope = new CacheScope
    // null embeddings excluded — see bruteForceTopK's contract note
    val base = scope.pin(df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("norm", l2Norm(col("vec"))))
    // occupancy 64: measured against occupancy 32 (one more plane),
    // recall@5 is IDENTICAL on the fixture while candidate scoring
    // drops ~30% of wall time — the extra plane was splitting buckets
    // whose members the other 9 tables re-covered anyway.
    val buckets = lshBuckets(base, planes, tables, occupancy = 64)

    // Candidates are (id, id) pairs ONLY — deduped across tables
    // while still 16 bytes wide — then the two joins against the
    // cached vector table (broadcast when small; hash join on id at
    // scale) attach vectors for exactly one scoring pass per unique
    // pair. ANN needs BOTH directions of each pair → mirror after
    // scoring.
    // Pinned: the mirror union below consumes this subtree twice, and
    // without a cache each branch re-runs the whole candidate scoring
    // pipeline (exchange reuse does not span the differing final
    // projections).
    val half = scope.pin(Dedup.bucketSelfJoinPairs(buckets, Seq("table_idx", "bucket"),
      Seq("id"), maxBucket, scope, dedupPairs = true)
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b")), "id_b")
      .withColumn("cosine", cosineWithNorms(
        dot(col("vec_a"), col("vec_b")), col("norm_a"), col("norm_b")))
      .select(col("id_a"), col("id_b"), col("cosine")))
    val scored = half.select(
        col("id_a").as("query_id"), col("id_b").as("nbr_id"), col("cosine"))
      .unionByName(half.select(
        col("id_b").as("query_id"), col("id_a").as("nbr_id"), col("cosine")))
    scope.sealResult(rankTopK(scored, "query_id", "cosine", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"), graft.functions.Quantize.quantize4(col("cosine")).as("cosine"), col("rank").cast("long").as("rank")))
  }

  /** One bucket row per (vector, hash table): all `tables` bucket ids
    * are evaluated in a single projection over the cached vector table
    * and exploded — one scan, no per-table passes. `planes = 0` sizes
    * the bucket space from the corpus so mean occupancy stays ~64
    * at any scale. `planes < 0` is the EXHAUSTIVE degeneration: zero
    * hyperplanes put every vector in one bucket of one table, so the
    * candidate set is all pairs — the v06-style trick that pins the
    * whole LSH pipeline (bucketing, pair expansion, scoring, ranking)
    * to the brute-force ground truth. */
  private def lshBuckets(base: DataFrame, planes: Int, tables: Int,
      occupancy: Int = 32): DataFrame = {
    if (planes < 0)
      return base.select(col("id"), lit(0).as("table_idx"), lit(0L).as("bucket"))
    val p =
      if (planes > 0) planes
      else {
        // target mean bucket occupancy `occupancy`: candidate volume
        // stays ~occupancy·n·tables (linear in corpus size) instead of
        // n²/2^planes blowing up past the tuning SF. Near-dup pair
        // recovery keeps 32 (the oracled exact-set claim rests on it);
        // top-k uses 64 (same measured recall, ~30% cheaper).
        val n = base.count().max(1)
        math.max(4, math.ceil(math.log(n.toDouble / occupancy) / math.log(2)).toInt)
      }
    base.select(col("id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), lshBucket(col("vec"), p, t).as("b"))): _*)).as("tb"))
      .select(col("id"), col("tb.t").as("table_idx"), col("tb.b").as("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH bucket candidates →
    * one exact-cosine scoring pass per unique (id_a < id_b) pair →
    * threshold filter. A DIRECT pair pipeline, not top-k reuse: the
    * per-query window ranking annTopK needs is pure overhead here
    * (near-dup wants the ≥ t pair set, not ranks), and dropping it
    * removes the mirror-union and the rank exchange entirely.
    * `tables = 16` holds the per-pair miss probability at ~1e-7 for
    * 0.95-cosine pairs at the tuning SF — the pair set is
    * deterministically the exact ≥ t set in practice, which is what
    * lets the DuckDB exhaustive-cosine oracle hash-match it. */
  /** v21: RADIUS (range) search — every corpus row whose cosine to a
    * query is ≥ `minCosine`, the "all neighbors within ε" predicate
    * (dedup radii, retrieval cutoffs, clustering ε-neighborhoods) as
    * opposed to top-k's fixed fan-out. Shape: the bounded query set
    * broadcasts and the corpus streams past it ONCE — no shuffle, no
    * candidate index, linear in n and embarrassingly parallel, which
    * IS the production plan for a bounded query set at any corpus
    * size (the scan is the floor every index must beat, and at low
    * thresholds sign-LSH can't: collision probability per plane for
    * cosine 0.3 is ~0.6, so auto-sized tables lose most true
    * neighbors once planes grow with n — measured in the round-7
    * z-fixture work. The HIGH-similarity radius regime (τ ≥ 0.95) is
    * served by the LSH pair route, [[cosineNearDupPairs]]/v03.)
    * Cosine quantized at 1e-4 (engine-portable) BEFORE the threshold
    * compare so both engines cut the identical set. */
  def rangeSearch(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, queries: DataFrame): DataFrame = {
    // null embeddings excluded — see bruteForceTopK's contract note
    val corpus = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .withColumn("nbr_norm", l2Norm(col("nbr_vec")))
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("query_norm", l2Norm(col("query_vec")))
    corpus.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", graft.functions.Quantize.quantize4(cosineWithNorms(
        dot(col("query_vec"), col("nbr_vec")), col("query_norm"), col("nbr_norm"))))
      .filter(col("cosine") >= minCosine)
      .select(col("query_id"), col("nbr_id"), col("cosine"))
  }

  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, tables: Int = 16,
      maxBucket: Int = 2000): DataFrame = {
    val scope = new CacheScope
    scope.sealResult(cosineNearDupPairsUnsealed(
      df, idCol, vecCol, threshold, planes, tables, maxBucket, scope))
  }

  /** UNSEALED twin of [[cosineNearDupPairs]] (see
    * [[Dedup.ngramJaccardPairsExhaustiveUnsealed]] for the contract):
    * pins ride the caller's scope, the returned frame is lazy — for
    * consumers like connectedComponents that materialize once anyway. */
  private[operators] def cosineNearDupPairsUnsealed(df: DataFrame,
      idCol: String, vecCol: String, threshold: Double, planes: Int,
      tables: Int, maxBucket: Int, scope: CacheScope): DataFrame = {
    // null embeddings excluded — see bruteForceTopK's contract note
    val base = scope.pin(df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("norm", l2Norm(col("vec"))))
    val buckets = lshBuckets(base, planes, tables)
    Dedup.bucketSelfJoinPairs(buckets, Seq("table_idx", "bucket"),
      Seq("id"), maxBucket, scope, dedupPairs = true)
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b")), "id_b")
      .withColumn("cosine", graft.functions.Quantize.quantize4(cosineWithNorms(
        dot(col("vec_a"), col("vec_b")), col("norm_a"), col("norm_b"))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
