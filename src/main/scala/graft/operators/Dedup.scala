package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines (north-star
  * mandate, SURVEY.md §1.4): exact, MinHash+LSH, SimHash and n-gram
  * Jaccard. All are shuffle-on-key-only designs:
  *
  *  - signatures/sketches are computed **per row with array
  *    expressions** (no UDF, no shuffle, stays in whole-stage
  *    codegen);
  *  - candidate generation shuffles on **bucket keys** (LSH bands /
  *    SimHash chunks / posting shingles), never all-pairs;
  *  - exact verification runs only on bucket-joined candidates.
  *
  * That shape is what survives 100 TB: the O(n²) comparison space is
  * never materialized; every stage is a hash-partitioned join or
  * aggregation Catalyst/AQE can re-plan.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content hash: one hash-aggregate (map-side partial
    * applies), keep the smallest id per distinct text. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated view itself: one surviving row per content. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** INCREMENTAL exact dedup: keep only increment rows whose content
    * is new — not present in the corpus, and not an echo of an earlier
    * row within the increment itself (smallest id wins, as in
    * [[exactDedup]]). The corpus contributes ONE distinct-hash
    * projection (in production the persisted hash index, maintained
    * additively batch over batch) and is never re-deduped; the
    * anti-join keys on the 16-byte hash, so corpus text never moves.
    * Scale shape: one hash-aggregate over Δ + one key-partitioned
    * anti-join — both AQE-broadcastable when Δ is small, which is the
    * daily-increment case. */
  def incrementalExactDedup(corpus: DataFrame, increment: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // Null text carries no content to compare: md5(null) is null, the
    // anti-join condition can never match it, and exactDedup would
    // collapse all null rows into one "survivor" — a contentless row
    // sneaking into the corpus as "new". Excluded on both sides.
    val seen = corpus.filter(col(textCol).isNotNull)
      .select(md5(col(textCol)).as("__seen_hash")).distinct()
    exactDedup(increment.filter(col(textCol).isNotNull), idCol, textCol)
      .join(seen, md5(col(textCol)) === col("__seen_hash"), "left_anti")
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature of the k-word shingle set: `numHashes`
    * independent seeded hashes, each the min over the set. Computed by
    * the custom [[graft.functions.SketchExpressions.MinHashSignature]]
    * expression from the token array — shingling happens inside the
    * imperative loop; the HOF formulation was interpreted and orders
    * of magnitude slower. */
  def minhashSignature(text: Column, numHashes: Int, shingleK: Int): Column =
    graft.functions.SketchExpressions.minhashSignature(
      TextFunctions.tokens(text), numHashes, shingleK)

  /** Candidate near-dup pairs via banded LSH: split the signature into
    * `bands` bands, hash each band, bucket-join on (band, bandHash).
    * Pairs sharing ≥1 band collide; with numHashes=64, bands=16 the
    * collision threshold sits around Jaccard ≈ (1/16)^(1/4) ≈ 0.5.
    * Then verify exact shingle Jaccard and keep pairs ≥ `threshold`.
    *
    * Skew guard: buckets larger than `maxBucket` (degenerate content,
    * e.g. empty docs) are dropped — at 100 TB one pathological bucket
    * would otherwise quadratically dominate a task.
    *
    * Boundary semantics: the threshold compares the 4-dp QUANTIZED
    * jaccard — deliberately, and matched by this operator's DuckDB
    * oracle, which quantizes before filtering too. The ngram variants
    * instead filter the unrounded value (their prefix-filter bound is
    * derived from the exact threshold); each operator is aligned with
    * its own oracle, so do not "unify" one side without the other. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 4000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val scope = new CacheScope
    // ONE tokenize+hash pass computes the sorted shingle-hash set (for
    // exact verification), and the MinHash signature (for banding) is
    // derived FROM it with the affine family — the signature re-uses
    // the shingle hashes instead of re-tokenizing; pinned so the band
    // explode and the verification joins share it. (Distinctness note:
    // signatures over the DISTINCT shingle set equal signatures over
    // the raw shingle stream — min is idempotent to duplicates.)
    val base = scope.pin(df.select(col(idCol).as("id"),
        graft.functions.SketchExpressions.shingleHashes(col(textCol), shingleK).as("sh"))
      .withColumn("sig",
        graft.functions.SketchExpressions.minhashFromHashes(col("sh"), numHashes)))
    val banded = base
      .select(col("id"), posexplode(
        graft.functions.SketchExpressions.bandHashes(col("sig"), bands)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")

    // Candidates carry ids ONLY: the 16× band explode shuffles 8-byte
    // ids instead of full document text; shingle sets join back for
    // the (much smaller) candidate set. At cluster scale these are
    // two hash joins on the doc id — never a text broadcast.
    val cands = bucketSelfJoinPairs(banded, Seq("band_idx", "band_hash"),
      Seq("id"), maxBucket, scope)
    val ja = graft.functions.SketchExpressions.sortedLongJaccard(col("sh_a"), col("sh_b"))
    scope.sealResult(cands
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", graft.functions.Quantize.quantize4(ja))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard")))
  }

  /** INCREMENTAL near-dup detection: the pairs a NEW batch introduces
    * against an existing corpus (new×old and new×new), never
    * re-pairing the corpus with itself — the only shape that works
    * when the corpus is 100 TB and the daily increment is 0.1% of it.
    * Full re-dedup pays candidate generation over pairs(corpus+Δ);
    * this pays one banded bucket join of Δ against the corpus index
    * plus pairs(Δ) — the corpus side is touched once to sketch+band
    * (and in production that projection `(id, sh, sig)` IS the saved
    * index artifact, amortized across every increment the way
    * [[graft.operators.IvfIndex]] saves centroids+assignments).
    *
    * Same sketch family, verification, quantized-threshold semantics
    * and output contract as [[minhashPairs]] (`id_a < id_b`, exact
    * Jaccard ≥ threshold), so with identical parameters the result
    * equals `minhashPairs(corpus ∪ increment)` restricted to pairs
    * touching the increment — the equivalence its spec and DuckDB
    * oracle both pin.
    *
    * Hot-bucket guard: COMBINED (old + new) bucket occupancy above
    * `maxBucket` drops the bucket on both joins, mirroring the
    * self-join variant's worst-case task bound. Ids must be globally
    * unique and mutually ordered across the two inputs. */
  def incrementalMinhashPairs(corpus: DataFrame, increment: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 4000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val scope = new CacheScope
    def prep(df: DataFrame) = df.select(col(idCol).as("id"),
        graft.functions.SketchExpressions.shingleHashes(col(textCol), shingleK).as("sh"))
      .withColumn("sig",
        graft.functions.SketchExpressions.minhashFromHashes(col("sh"), numHashes))
    def banded(base: DataFrame) = base.select(col("id"), posexplode(
        graft.functions.SketchExpressions.bandHashes(col("sig"), bands)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val keys = Seq("band_idx", "band_hash")
    val keyCols = keys.map(col)
    val oldBase = scope.pin(prep(corpus))
    val newBase = scope.pin(prep(increment))
    // Both banded sides feed the occupancy count AND a join — pin the
    // 16× explode rather than re-derive it from the sketch cache.
    val bOld = scope.pin(banded(oldBase))
    val bNew = scope.pin(banded(newBase))
    val hot = bOld.select(keyCols: _*).union(bNew.select(keyCols: _*))
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(keyCols: _*)
    val coolOld = bOld.join(broadcast(hot), keys, "left_anti")
    val coolNew = bNew.join(broadcast(hot), keys, "left_anti")
    // new×old: ids-only bucket join — the corpus side never enumerates
    // its own pairs. Normalized to id_a < id_b like every pair op.
    val cross = coolOld.select(keyCols :+ col("id").as("__o"): _*)
      .join(coolNew.select(keyCols :+ col("id").as("__i"): _*), keys)
      .select(least(col("__o"), col("__i")).as("id_a"),
        greatest(col("__o"), col("__i")).as("id_b"))
    // new×new: the increment self-joins with the shared guard applied.
    val selfCands = bucketSelfJoinPairs(coolNew, keys, Seq("id"), maxBucket, scope)
    val cands = cross.union(selfCands).dropDuplicates("id_a", "id_b")
    val allBase = oldBase.union(newBase)
    val ja = graft.functions.SketchExpressions.sortedLongJaccard(col("sh_a"), col("sh_b"))
    scope.sealResult(cands
      .join(allBase.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(allBase.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", graft.functions.Quantize.quantize4(ja))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard")))
  }

  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash of the token stream (classic: bit b is the sign
    * of Σ_tokens ±1 by bit b of the token's hash), via the custom
    * [[graft.functions.SketchExpressions.SimHash64]] expression.
    * `portable = true` uses the SQL-expressible token hash so an
    * external engine can recompute identical sketches. */
  def simhash64(text: Column, portable: Boolean = false): Column =
    graft.functions.SketchExpressions.simhash64(TextFunctions.tokens(text), portable)

  /** Near-dup pairs by SimHash: pigeonhole the 64 bits into `chunks`
    * near-equal chunks — any pair within Hamming distance `chunks − 1`
    * shares ≥1 exact chunk — bucket-join on (chunk index, chunk
    * value), verify `bit_count(a XOR b) <= maxHamming`. The output is
    * exactly the hamming ≤ `maxHamming` pair set for ANY chunk count
    * > maxHamming (pigeonhole guarantees recall; the verify filter
    * removes the rest), so chunk count is purely a candidate-volume
    * knob: 7 chunks of 9-10 bits halve the expected bucket collisions
    * of 8×8 while still covering maxHamming = 6 (a one-token edit on
    * a short doc routinely flips 4-6 bits; 4×16 chunks missed those). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6, chunks: Int = 7, maxBucket: Int = 4000,
      portable: Boolean = false): DataFrame = {
    require(chunks > maxHamming, "pigeonhole needs chunks > maxHamming")
    require(chunks <= 64, "at most one chunk per bit")
    val scope = new CacheScope
    val widths = Array.tabulate(chunks)(j => 64 / chunks + (if (j < 64 % chunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val withSim = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simhash64(col("text"), portable))
    // Width-64 mask must be -1L explicitly: JVM shifts are mod 64, so
    // (1L << 64) - 1 evaluates to 0 and chunks = 1 would bucket every
    // doc under chunk_val 0 (then the hot-bucket guard drops them all).
    def mask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1
    val chunked = withSim
      .withColumn("chunk", explode(array((0 until chunks).map(j =>
        struct(lit(j).as("j"),
          shiftrightunsigned(col("sim"), offsets(j))
            .bitwiseAND(lit(mask(widths(j)))).as("v"))): _*)))
      .select(col("id"), col("sim"), col("chunk.j").as("chunk_idx"), col("chunk.v").as("chunk_val"))

    // Hamming-filter BEFORE the cross-chunk dedup: bit_count is a
    // codegen'd long op, so pruning the ~7× chunk-collision stream
    // first leaves dropDuplicates a small survivor set.
    scope.sealResult(bucketSelfJoinPairs(chunked, Seq("chunk_idx", "chunk_val"),
      Seq("id", "sim"), maxBucket, scope, dedupPairs = false)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b"))
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard pairs via the full inverted-index join:
    * explode distinct shingles into postings, pair within postings,
    * count common shingles, compute |A∩B| / (|A|+|B|−|A∩B|). Every
    * shared shingle contributes one pair occurrence — exhaustive and
    * O(Σ|posting|²). Caveat: the hot-bucket guard drops postings
    * larger than `maxPosting`, so a hot shingle counts as NOT shared
    * and Jaccard is underestimated for pairs sharing it; the
    * prefix-filtered [[ngramJaccardPairs]] verifies with full sets and
    * stays exact even then — the two agree whenever no posting exceeds
    * the guard. */
  def ngramJaccardPairsExhaustive(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.4, maxPosting: Int = 1000): DataFrame = {
    val scope = new CacheScope
    scope.sealResult(ngramJaccardPairsExhaustiveUnsealed(
      df, idCol, textCol, n, threshold, maxPosting, scope))
  }

  /** UNSEALED twin of [[ngramJaccardPairsExhaustive]]: pins the
    * intermediates into the CALLER's scope and returns the lazy pair
    * frame. For compositions whose downstream consumer materializes
    * exactly once anyway (connectedComponents caches + drains its
    * edges), sealing the pair set first pays a full extra
    * count-materialization chain purely to unpersist early — the
    * caller's `scope.release()`/`sealResult` does that instead, after
    * the one real consumer has run. */
  private[operators] def ngramJaccardPairsExhaustiveUnsealed(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxPosting: Int, scope: CacheScope): DataFrame = {
    // Postings carry 8-byte shingle HASHES (sorted-distinct kernel),
    // not shingle strings: the posting shuffle and the self-join key
    // shrink ~4×, and the whole pairing path stays in codegen. Null
    // text → null shingles, excluded in BOTH variants so they agree:
    // a contentless doc never pairs.
    val base = df.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.shingleHashes(col(textCol), n).as("sh"))
      .filter(col("sh").isNotNull)
      .withColumn("set_size", size(col("sh")))
    val postings = base
      .select(col("id"), col("set_size"), explode(col("sh")).as("gh"))
    // Keep only shingles appearing in 2..maxPosting docs: a df=1
    // shingle cannot contribute a pair (set sizes ride on the rows,
    // so dropping it changes nothing), and on real corpora MOST
    // shingles are df=1 — this prunes the self-join input, the
    // quadratic stage. Document frequency comes from ONE window count
    // over the gh-partitioned postings — not a groupBy + semi-join
    // back (two exchanges + a second pass over postings): the single
    // window exchange both counts and prunes in-place, AND leaves the
    // survivors hash-partitioned by gh, which is exactly the
    // self-join's key — the join below runs with no further exchange.
    // Pinned: the self-join consumes `cool` on BOTH sides.
    val cool = scope.pin(postings
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("gh")))
      .filter(col("__df") >= 2 && col("__df") <= maxPosting)
      .drop("__df"))
    // Sort-merge/shuffled-hash self-join on the 8-byte key, then one
    // partial-aggregating groupBy: each shared shingle contributes one
    // pair occurrence, counted as |A∩B|.
    val pairs = cool.select(col("gh"), col("id").as("id_a"), col("set_size").as("set_size_a"))
      .join(cool.select(col("gh"), col("id").as("id_b"), col("set_size").as("set_size_b")), Seq("gh"))
      .filter(col("id_a") < col("id_b"))
      // Length filter (AllPairs family), EXACT: J(A,B) ≤ min/max of
      // the set sizes, so J ≥ t needs min ≥ t·max. Applied inside the
      // join stage it drops size-incompatible candidates before the
      // counting aggregation ever buffers them; the epsilon only ever
      // loosens (keeps) — exactness rests on the final J ≥ t filter.
      .filter(col("set_size_a") >= col("set_size_b") * threshold - 1e-9 &&
        col("set_size_b") >= col("set_size_a") * threshold - 1e-9)
    pairs
      .groupBy(col("id_a"), col("id_b"), col("set_size_a"), col("set_size_b"))
      .agg(count(lit(1)).as("inter"))
      // threshold on the UNROUNDED value (rounding first would admit
      // borderline pairs the prefix variant rightly prunes)
      .filter(col("inter") / (col("set_size_a") + col("set_size_b") - col("inter")) >= threshold)
      .withColumn("jaccard",
        graft.functions.Quantize.quantize4(col("inter") / (col("set_size_a") + col("set_size_b") - col("inter"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** DIRECTED n-gram CONTAINMENT pairs — the asymmetric twin of the
    * Jaccard resemblance pairs: C(A,B) = |sh(A) ∩ sh(B)| / |sh(A)|,
    * the fraction of A's shingles that also appear in B. Resemblance
    * misses doc-in-doc duplication by construction (a 50-line excerpt
    * inside a 5000-line page has Jaccard ≈ 1%, containment ≈ 100%);
    * containment is the published remedy (Broder's original
    * resemblance/containment pair) and the pretraining-dedup shape
    * for quotes, mirrors-with-chrome, and re-hosted excerpts.
    *
    * Emits (contained_id, container_id, containment ≥ threshold) —
    * DIRECTED rows, both directions evaluated from ONE undirected
    * intersection count (near-identical docs legitimately emit both).
    * Scale shape is exactly [[ngramJaccardPairsExhaustive]]'s: 8-byte
    * shingle hashes, df-pruned postings counted and filtered by one
    * gh-keyed window that leaves the self-join pre-partitioned on its
    * key, one partial-aggregated count per surviving pair. The
    * hot-shingle cap (`maxPosting`) is the same documented guard. No
    * length prefilter exists for containment (the container may be
    * arbitrarily larger — that asymmetry is the point); the scale
    * route is [[containmentPairsPrefix]]'s asymmetric rare-shingle
    * prefix filter, spec-pinned equivalent. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxPosting: Int = 1000): DataFrame = {
    val scope = new CacheScope
    val base = df.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.shingleHashes(col(textCol), n).as("sh"))
      .filter(col("sh").isNotNull)
      .withColumn("set_size", size(col("sh")))
    val postings = base
      .select(col("id"), col("set_size"), explode(col("sh")).as("gh"))
    val cool = scope.pin(postings
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("gh")))
      .filter(col("__df") >= 2 && col("__df") <= maxPosting)
      .drop("__df"))
    // pinned: both directed projections below consume the one
    // undirected intersection count
    val counted = scope.pin(
      cool.select(col("gh"), col("id").as("id_a"), col("set_size").as("sa"))
        .join(cool.select(col("gh"), col("id").as("id_b"), col("set_size").as("sb")), Seq("gh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "sa", "sb")
        .agg(count(lit(1)).as("inter")))
    def directed(cid: Column, tid: Column, sz: Column) =
      counted.filter(col("inter") / sz >= threshold)
        .select(cid.as("contained_id"), tid.as("container_id"),
          graft.functions.Quantize.quantize4(col("inter") / sz).as("containment"))
    scope.sealResult(
      directed(col("id_a"), col("id_b"), col("sa"))
        .unionByName(directed(col("id_b"), col("id_a"), col("sb"))))
  }

  /** PREFIX-FILTERED twin of [[containmentPairs]] — the 100 TB route
    * (same exhaustive-vs-prefix trade as the Jaccard pair): the
    * asymmetric prefix theorem says C(A,B) ≥ t means fewer than
    * (1−t)·|A| + 1 of A's shingles fall outside B, so among A's
    * ⌊(1−t)·|A|⌋+1 globally RAREST shingles at least one is in B —
    * only contained-side prefixes generate candidates, probed by the
    * container side's FULL shingle postings (the Ed-Join asymmetric
    * index/probe shape), then a posting-band counting join verifies.
    * MEASURED (z03/z04 bench rows, 8k-doc boilerplate-zipfian
    * corpus): 3.1× faster than the exhaustive counting join — the
    * asymmetric probe is viable precisely because the prefix ranks
    * over the FULL shingle set (globally-unique shingles fill prefix
    * slots for free) and verification never ships arrays; both were
    * measured blowups before this formulation (57 s and 63 s
    * variants vs 8.3 s exhaustive on the same corpus). Equivalence
    * with the exhaustive formulation is spec-asserted on both corpus
    * shapes. */
  def containmentPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxPosting: Int = 1000): DataFrame = {
    val scope = new CacheScope
    val base = scope.pin(df.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.shingleHashes(col(textCol), n).as("sh"))
      .filter(col("sh").isNotNull)
      .withColumn("set_size", size(col("sh"))))
    val postings = base.select(col("id"), col("set_size"), explode(col("sh")).as("gh"))
    // global df fused into one gh-keyed window over ALL postings; the
    // cool band [2, maxPosting] feeds the candidate probe and the
    // intersection count (df=1 cannot be shared; hot is capped)
    val dfd = scope.pin(postings
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("gh"))))
    val counted = dfd.filter(col("__df") >= 2 && col("__df") <= maxPosting)
    // The PREFIX ranks over the FULL shingle set — df = 1 shingles
    // included. They are the theorem's ideal prefix members: globally
    // unique, so they occupy prefix slots while generating ZERO
    // candidates (nothing to join in `counted`). The first
    // formulation ranked over the cool band only, which silently
    // promoted mid-band shingles into every prefix and exploded the
    // asymmetric probe (prefix × full postings) ~6× past the
    // exhaustive route on a boilerplate-heavy corpus (z03/z04 bench
    // rows). Recall stays exact w.r.t. the capped containment
    // metric: the pigeonhole needs only SOME size-⌊(1−t)|A|⌋+1
    // subset of A's shingles, and a cool shingle shared with B is in
    // `counted`, so the candidate surfaces whichever slots the
    // unique shingles fill. (ngramJaccardPairs always ranked over
    // the full set — this aligns the two.)
    val prefix = dfd
      .withColumn("__rank", row_number().over(
        Window.partitionBy("id").orderBy(col("__df").asc, col("gh").asc)))
      // epsilon lengthens only — same guard as ngramJaccardPairs
      .filter(col("__rank") <=
        floor((lit(1.0) - threshold) * col("set_size") + lit(1e-9)) + 1)
      .select(col("gh"), col("id").as("contained_id"))
    val cands = prefix
      .join(counted.select(col("gh"), col("id").as("container_id")), Seq("gh"))
      .filter(col("contained_id") =!= col("container_id"))
      .select("contained_id", "container_id").distinct()
    // VERIFY BY COUNTING, NOT ARRAYS. The intersection is re-counted
    // over the SAME cool posting band [2, maxPosting] the exhaustive
    // twin counts — candidate pairs explode into narrow (pair, gh)
    // rows against the contained side's postings, the container side
    // joins co-keyed on (container_id, gh), one pair-keyed count.
    // Structural equivalence with the exhaustive formulation at any
    // cap falls out (hot shingles are simply not in `counted`), and
    // the verify shuffle is candidates × |A's cool postings| × 24 B
    // instead of candidates × 2·|sh| full ARRAY payloads — the array
    // attach measured 4-5× the exhaustive route's entire cost on a
    // boilerplate-heavy zipfian corpus (z03/z04 bench rows) before
    // this rewrite; counting brings the probe-side asymmetry the
    // containment theorem forces back under the prefix win.
    val inter = cands
      .join(counted.select(col("id").as("contained_id"), col("gh")),
        Seq("contained_id"))
      .join(counted.select(col("id").as("container_id"), col("gh")),
        Seq("container_id", "gh"))
      .groupBy("contained_id", "container_id")
      .agg(count(lit(1)).as("__inter"))
    scope.sealResult(inter
      .join(base.select(col("id").as("contained_id"), col("set_size").as("sa")),
        Seq("contained_id"))
      .withColumn("__c", col("__inter") / col("sa"))
      .filter(col("__c") >= threshold)
      .select(col("contained_id"), col("container_id"),
        graft.functions.Quantize.quantize4(col("__c")).as("containment")))
  }

  /** EDIT-DISTANCE similarity join — the record-linkage / fuzzy-match
    * family: all pairs of strings within Levenshtein distance
    * `maxDist`, found without an all-pairs product, via Ed-Join-style
    * q-gram PREFIX filtering:
    *
    *  - candidates: only each string's `gram·maxDist + 1` globally
    *    RAREST distinct grams (its PREFIX under the (df, gram) order)
    *    are indexed; the probe side uses ALL grams. Exact recall:
    *    ≤ maxDist edits destroy at most `gram·maxDist` of the other
    *    string's gram occurrences, so at least one of its prefix
    *    grams survives INTACT inside this string — the probe hits it.
    *    Hot grams (the candidate-explosion source on repetitive
    *    corpora — measured 40 s at sf0.1 with any-shared-bigram
    *    blocking) almost never appear in prefixes, so candidate
    *    volume tracks RARE-gram frequencies.
    *  - a length filter (|len(a) − len(b)| ≤ maxDist, a trivial ED
    *    lower bound) prunes inside the join;
    *  - `levenshtein` verification gives exact precision, so the
    *    result is independent of the candidate route.
    *
    * Strings shorter than `gram·(maxDist+1) + maxDist` are excluded:
    * below that bound an intact gram is not guaranteed (the
    * pigeonhole needs maxDist+1 segments covering len − maxDist
    * chars) — documented contract; short-string linkage wants a
    * smaller `gram`. `maxPosting` caps a PREFIX gram's posting list
    * (a gram among the rarest of > maxPosting strings means a
    * pathologically uniform key space — same hot-bucket guard and
    * caveat as every candidate generator here).
    *
    * Scale shape: one distinct-gram explode, one gram-keyed df
    * count fused into the posting window, one per-string rank
    * window (bounded by string length, never corpus-sized), the
    * prefix⨝all-grams join keyed on the gram, pair dedup, one
    * verify join. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2, gram: Int = 5, maxPosting: Int = 1000): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(gram >= 2, s"gram must be >= 2, got $gram")
    val minLen = gram * (maxDist + 1) + maxDist
    val prefixLen = gram * maxDist + 1
    val scope = new CacheScope
    val base = scope.pin(df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= minLen)
      .withColumn("len", length(col("s"))))
    // distinct grams + global df, counted and carried by one
    // gh-partitioned window (the fused count-and-prune shape)
    val grams = scope.pin(base.select(col("id"), col("len"),
      explode(array_distinct(transform(
        sequence(lit(1), length(col("s")) - gram + 1),
        i => col("s").substr(i, lit(gram))))).as("g"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("__df") >= 2)) // a df=1 gram cannot produce a pair
    val prefix = grams
      .withColumn("__rank", row_number().over(
        Window.partitionBy("id").orderBy(col("__df").asc, col("g").asc)))
      .filter(col("__rank") <= prefixLen && col("__df") <= maxPosting)
    val cands = prefix.select(col("g"), col("id").as("id_p"), col("len").as("len_p"))
      .join(grams.select(col("g"), col("id").as("id_q"), col("len").as("len_q")), Seq("g"))
      .filter(col("id_p") =!= col("id_q") &&
        abs(col("len_p") - col("len_q")) <= maxDist)
      .select(least(col("id_p"), col("id_q")).as("id_a"),
        greatest(col("id_p"), col("id_q")).as("id_b"))
      .distinct()
    scope.sealResult(cands
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist"))
  }

  /** Exact n-gram Jaccard pairs with PREFIX FILTERING (the
    * AllPairs/PPJoin family): under any global total order on
    * shingles, J(A,B) ≥ t implies the (⌊(1−t)·|A|⌋+1)-prefixes of A
    * and B intersect — so only each doc's prefix (its globally RAREST
    * shingles, ordered by document frequency so prefixes collide
    * seldom) generates candidates, and the full shingle sets verify
    * exact Jaccard afterwards. No false negatives by the theorem
    * (modulo the shared hot-bucket guard: a prefix bucket larger than
    * `maxPosting` is dropped, same caveat as every candidate
    * generator here); no false positives by verification.
    * Candidate volume drops from Σ|posting|² over all shingles to
    * Σ|prefix-posting|² over rare ones.
    *
    * MEASURED route selection (z01/z02 bench rows, 8k-doc corpora):
    * the prefix route wins when mid-band posting mass dominates —
    * boilerplate-heavy zipfian text (the real-crawl shape: shared
    * footers/chrome under the hot cap) runs 2.2× faster prefix than
    * exhaustive. When cool-band sharing is thin — the uniform
    * fixture vocabulary (1.7×) and even a PURE zipf corpus with no
    * boilerplate band (~2.5×) — the exhaustive counting join wins:
    * counting co-occurrences through one 8-byte-hash aggregate is so
    * cheap that prefix+verify overhead only pays for itself once
    * Σdf² explodes. Threshold matters too: at t = 0.4 the prefix
    * keeps ⌊0.6·|A|⌋+1 shingles — structurally weak pruning at any
    * corpus shape; the theorem's leverage is at high thresholds. */
  /** CROSS-TABLE similarity join (R-S, not self): every (query,
    * corpus) pair with shingle-Jaccard ≥ `threshold` — the fuzzy
    * lookup behind record linkage, fuzzy enrichment, and
    * query-against-corpus contamination checks, where the two sides
    * are DIFFERENT tables and the self-join's `id_a < id_b`
    * normalization doesn't apply (a query matches a corpus row, never
    * another query).
    *
    * Scale shape — the PPJoin prefix principle in its R-S form: both
    * sides index only the ⌊(1−t)·|X|⌋+1 globally-rarest shingles of
    * each row (rarity = document frequency over the UNION of both
    * sides, so the total order is consistent across sides — an
    * inconsistent order voids the theorem), candidates come from one
    * equi-join of the two prefix posting lists, and exact Jaccard
    * verifies. Per-side prefix length ⌊(1−t)|X|⌋+1 is recall-exact
    * for the cross join too: a match needs overlap ≥ t/(1+t)·(|A|+|B|)
    * ≥ ⌈t·|X|⌉ for either side, so skipping beyond that bound on
    * both sides cannot erase every shared shingle (same bound the
    * d09/z02 self-join gate certifies). Shingles whose combined
    * prefix-posting count exceeds `maxPosting` are dropped before the
    * join — the documented hot-bucket trade (d09's): at fixture scale
    * nothing trips it (the exhaustive oracle certifies exact recall);
    * at 100 TB it is the quadratic-blowup valve.
    *
    * Output: (query_id, corpus_id, jaccard) — jaccard quantized to
    * 4 dp exactly like the self-join surface. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.4, maxPosting: Int = 1000): DataFrame = {
    val scope = new CacheScope
    def prep(df: DataFrame) = scope.pin(df.select(col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), n).as("shingles"))
      .withColumn("set_size", size(col("shingles"))))
    val l = prep(left)
    val r = prep(right)
    def postings(base: DataFrame) = base
      .select(col("id"), col("set_size"), explode(col("shingles")).as("sh"))
      .filter(col("sh").isNotNull)
    val pl = postings(l)
    val pr = postings(r)
    // one consistent rarity order across BOTH sides
    val dfreq = scope.pin(pl.select("sh").unionByName(pr.select("sh"))
      .groupBy("sh").agg(count(lit(1)).as("__df")))
    def prefix(p: DataFrame) = p.join(dfreq, Seq("sh"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy("id").orderBy(col("__df").asc, col("sh").asc)))
      // epsilon: same float-floor guard as the self-join route
      .filter(col("__rank") <=
        floor((lit(1.0) - threshold) * col("set_size") + lit(1e-9)) + 1)
      .select(col("id"), col("sh"))
    // each side's prefix is read twice (hot-bucket census + candidate
    // join) — pin both, or the join+window chain runs twice per side
    val lp = scope.pin(prefix(pl))
    val rp = scope.pin(prefix(pr))
    val hot = lp.select("sh").unionByName(rp.select("sh"))
      .groupBy("sh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxPosting)
      .select("sh")
    val cands = lp.join(broadcast(hot), Seq("sh"), "left_anti")
      .select(col("id").as("query_id"), col("sh"))
      .join(rp.join(broadcast(hot), Seq("sh"), "left_anti")
        .select(col("id").as("corpus_id"), col("sh")), Seq("sh"))
      .select("query_id", "corpus_id")
      .dropDuplicates("query_id", "corpus_id")
    val withSets = cands
      .join(l.select(col("id").as("query_id"), col("shingles").as("sh_a")),
        Seq("query_id"))
      .join(r.select(col("id").as("corpus_id"), col("shingles").as("sh_b")),
        Seq("corpus_id"))
    scope.sealResult(withSets
      .withColumn("__j", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("__j") >= threshold)
      .withColumn("jaccard", graft.functions.Quantize.quantize4(col("__j")))
      .select("query_id", "corpus_id", "jaccard"))
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.4, maxPosting: Int = 1000): DataFrame = {
    val scope = new CacheScope
    val base = scope.pin(df.select(col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), n).as("shingles"))
      .withColumn("set_size", size(col("shingles"))))
    // consumed by postings and twice by verification
    val postings = base.select(col("id"), col("set_size"), explode(col("shingles")).as("sh"))
      .filter(col("sh").isNotNull) // contentless docs never pair (both variants)
    val dfreq = postings.groupBy("sh").agg(count(lit(1)).as("__df"))
    val ranked = postings.join(dfreq, Seq("sh"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy("id").orderBy(col("__df").asc, col("sh").asc)))
    // Prefix length ⌊(1−t)·|A|⌋+1, computed with an epsilon: Spark
    // evaluates (1.0−0.8)*5 as 0.9999999999999998, whose bare floor
    // would shorten the prefix below the theorem's bound and silently
    // drop true positives. The epsilon only ever lengthens a prefix —
    // always safe.
    val prefix = ranked
      .filter(col("__rank") <=
        floor((lit(1.0) - threshold) * col("set_size") + lit(1e-9)) + 1)
      .select(col("id"), col("sh"))
    val cands = bucketSelfPairs(prefix, Seq("sh"), Seq("id"), maxPosting, scope)
    val withSets = cands
      .join(base.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
    scope.sealResult(withSets
      .withColumn("__j", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("__j") >= threshold) // unrounded, matching exhaustive
      .withColumn("jaccard", graft.functions.Quantize.quantize4(col("__j")))
      .select("id_a", "id_b", "jaccard"))
  }

  /** LINE-level corpus dedup — the boilerplate-removal stage of the
    * published pretraining pipelines (headers, footers, nav chrome:
    * lines repeated across many documents carry no signal and skew
    * n-gram statistics). A line with document frequency >
    * `maxDocFreq` (counted once per doc, only lines of at least
    * `minLineChars` chars are candidates — blank/trivial lines are
    * never stripped) is removed from every document; remaining lines
    * keep their original order and within-doc repetitions.
    *
    * Scale shape: one line explode, one distinct + count aggregate
    * (map-side partials) to find the boilerplate set, one anti join
    * back — all shuffles keyed on the line text, never a doc×doc
    * space. Returns (id, text_clean, n_lines_kept, n_lines_removed);
    * fully-stripped documents yield an empty clean text, not a
    * dropped row. */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Int, minLineChars: Int = 1): DataFrame = {
    val scope = new CacheScope
    val lines = scope.pin(df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "line"))
    val boiler = lines
      .filter(length(col("line")) >= minLineChars)
      .select(col("id"), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select(col("line"))
    val kept = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy("id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("idx").as("i"), col("line").as("l")))),
          s => s.getField("l")), "\n").as("text_clean"),
        count(lit(1)).as("n_lines_kept"))
    val totals = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).cast("long").as("__n_total"))
    scope.sealResult(totals.join(kept, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__n_total") - coalesce(col("n_lines_kept"), lit(0L))).as("n_lines_removed")))
  }

  /** CROSS-DOCUMENT duplicate-span coverage — the detection side of
    * exact-substring dedup (the published pipelines remove token
    * spans that recur verbatim across documents; see Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better").
    * A position's k-gram is "duplicated" when the same k tokens occur
    * in at least one OTHER document; the per-doc metric is the
    * fraction of tokens covered by the union of duplicated spans
    * `[pos, pos+k)`, plus the raw duplicated-position count.
    *
    * Scale shape: one positional-gram explode; the heavy cross-doc
    * count runs on 8-byte gram HASHES (the posting shuffle shrinks
    * ~6× vs gram strings, same trade as [[ngramJaccardPairs]]), and
    * the duplicate DECISION is then re-verified on the gram STRINGS
    * of the surviving candidate sliver — a hash collision can only
    * add a candidate, never fabricate a duplicate, so the result is
    * exact. The semi join back carries ids+positions only, and the
    * interval union is a `lag` window KEYED ON id (tokens newly
    * covered = `min(k, pos - prev)`), so no per-corpus ordering
    * exists anywhere — every shuffle is keyed on the gram (hash) or
    * the doc id. Docs shorter than k tokens have no grams and
    * coverage 0. Returns (id, n_tokens, n_dup_grams, dup_cov). */
  def dupSpanCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val scope = new CacheScope
    val toks = TextFunctions.tokens(col(textCol))
    val grams = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    val base = scope.pin(df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), size(toks).cast("long").as("n_tokens"),
        grams.as("gs")))
    val ex = scope.pin(base.select(col("id"), posexplode(col("gs")))
      .withColumnRenamed("col", "g")
      .withColumn("__h", xxhash64(col("g"))))
    val candHashes = ex.select(col("id"), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > 1).select(col("__h"))
    // not pinned: both consumers re-derive it from the CACHED ex with
    // one cheap semi join — a pin would cost a full materialization
    // chain to save two in-memory probes
    val candRows = ex.join(candHashes, Seq("__h"), "left_semi")
    val crossDoc = candRows.select(col("id"), col("g")).distinct()
      .groupBy("g").agg(count(lit(1)).as("__ndg"))
      .filter(col("__ndg") > 1).select(col("g"))
    val w = Window.partitionBy("id").orderBy("pos")
    val cov = candRows.join(crossDoc, Seq("g"), "left_semi")
      .withColumn("__prev", lag(col("pos"), 1).over(w))
      .groupBy("id")
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(when(col("__prev").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("pos") - col("__prev"))))
          .as("__cov"))
    scope.sealResult(base.select(col("id"), col("n_tokens"))
      .join(cov, Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        graft.functions.Quantize.quantize4(
          when(col("n_tokens") > 0,
            coalesce(col("__cov"), lit(0L)).cast("double") / col("n_tokens").cast("double"))
            .otherwise(lit(0.0))).as("dup_cov")))
  }

  /** Connected components over a near-dup pair set: every doc that
    * appears in a pair gets the MINIMUM id reachable through pairs as
    * its `cluster_id` — the transitive-closure step that turns
    * pairwise similarity into dedup groups (keep one doc per
    * cluster). Pairs alone under-dedup: A~B and B~C must collapse to
    * one cluster even when A~C was never scored.
    *
    * Algorithm: iterative min-label propagation. labels(v) starts at
    * v; each round every vertex takes the min of its own and its
    * neighbors' labels; stop when a round changes nothing. Rounds =
    * O(component diameter) — near-dup components are shallow (stars/
    * short chains), so 2-4 rounds in practice; each round is one
    * shuffle-join on vertex id plus one aggregation, the same
    * propagation loop GraphX/GraphFrames runs under the hood, without
    * the dependency. The driver only sees a one-long convergence
    * count per round, never vertex data. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 20,
      smallGraphEdges: Long = 2L * 1000 * 1000): DataFrame = {
    val spark = pairs.sparkSession
    // Integral ids only, normalized to LongType up front: the labels
    // are min-reachable-ids, which needs a total order, and the two
    // execution paths (driver union-find vs distributed propagation)
    // must emit the SAME schema regardless of which one the edge
    // count selects.
    Seq(aCol, bCol).foreach { c =>
      val dt = pairs.schema(c).dataType
      val integral = dt match {
        case _: org.apache.spark.sql.types.ByteType |
             _: org.apache.spark.sql.types.ShortType |
             _: org.apache.spark.sql.types.IntegerType |
             _: org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      require(integral, s"connectedComponents needs integral id columns; $c is $dt")
    }
    // The probe below collects up to smallGraphEdges+1 rows; a Long
    // threshold at or past Int.MaxValue would silently truncate the
    // collect and mis-classify a huge graph as small (wrong clusters).
    require(smallGraphEdges >= 0 && smallGraphEdges < Int.MaxValue,
      s"smallGraphEdges must be in [0, Int.MaxValue): $smallGraphEdges")
    // The UNDIRECTED pair list, cached BEFORE the probe: on the small
    // path the cache write is a small overhead the collect pays once,
    // but on the BIG path — the one where the pair machinery is
    // genuinely expensive — the probe's collect would otherwise
    // execute the full upstream lineage and the later cache fill
    // would execute it a second time. Scale correctness beats the
    // one-job fixture saving (measured and reverted r5). The
    // symmetrize + distinct the distributed loop needs stays deferred
    // to the big path — union-find is direction- and duplicate-
    // agnostic, so the small path skips those exchanges entirely.
    val undirected = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .cache()

    // Small-graph fast path — the broadcast-join analogue: a pair
    // graph under ~2M edges (32 MB of longs) is driver-trivial with
    // union-find, while each distributed round costs several fixed
    // job latencies. Probed with ONE job: limit(max+1).collect() both
    // answers "is it small?" and, when yes, already holds every edge —
    // the separate count() the probe used to run was pure added
    // latency on the path taken by every near-dup-sized graph.
    // Near-dup pair graphs are usually MUCH smaller than the corpus
    // (that's the point of dedup); the distributed loop below remains
    // the path for genuinely huge pair sets.
    val probe = undirected.limit(smallGraphEdges.toInt + 1).collect()
    if (probe.length <= smallGraphEdges) {
      import spark.implicits._
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrDefault(root, root) != root) root = parent.get(root)
        var cur = x // path compression
        while (parent.getOrDefault(cur, cur) != root) {
          val nxt = parent.get(cur); parent.put(cur, root); cur = nxt
        }
        root
      }
      probe.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        parent.putIfAbsent(a, find(a)); parent.putIfAbsent(b, find(b))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.keySet().forEach(v => out += ((v, find(v))))
      undirected.unpersist()
      return out.toSeq.toDF("doc_id", "cluster_id")
    }

    // Distributed path: min-label propagation needs each vertex to see
    // ALL its neighbors, so symmetrize + dedup here (reading the
    // cached pair list, not re-running the pair machinery).
    val edges = undirected
      .unionByName(undirected.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()

    // The label graph is orders of magnitude smaller than the corpus
    // that produced the pairs (only docs appearing in a pair), so the
    // propagation rounds' shuffles should be sized to |V|, not to the
    // session's scan parallelism — at 32 partitions each tiny round
    // pays 32 tasks × fixed overhead per stage. A production run on a
    // huge pair graph raises this the same way it sizes any join.
    //
    // The sizing is scoped to a CLONED session (shared SparkContext
    // and cache, private SQLConf) instead of temporarily mutating the
    // caller's session-global shuffle.partitions: queries planned
    // concurrently on the caller's session — other threads, streaming
    // micro-batches — keep their own parallelism, and there is no
    // restore race with other conf writers.
    val loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", "8")
    val loopEdges = loop.createDataFrame(edges.toDF().rdd, edges.schema).cache()
    try connectedComponentsLoop(loopEdges, maxRounds)
    finally { edges.unpersist(); undirected.unpersist() }
  }

  private def connectedComponentsLoop(edges: DataFrame, maxRounds: Int): DataFrame = {
    // `cached` is the handle actually registered with the cache
    // manager; `labels` is the (id, label) projection the next round
    // consumes. They must be tracked separately: unpersist() with
    // cascade=false only releases an EXACT plan match, so calling it
    // on the projection would silently leak every round's cache.
    var cached = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var labels = cached
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // neighbor-min: for each vertex, the smallest label among its
      // neighbors; then take min(own, neighbor-min). Carrying the old
      // label through lets ONE count() both materialize the round's
      // cache and decide convergence — one job per round.
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "dlabel"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dlabel")).as("nbr_label"))
      // (Pointer jumping — label := label(label) — was measured here
      // and REGRESSED: near-dup components are shallow stars/chains
      // that converge in 2-3 rounds anyway, and the extra join
      // re-evaluates the round's plan twice. Worth revisiting only
      // for deep-diameter graphs.)
      val next = labels.withColumnRenamed("label", "old")
        .join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("old"), coalesce(col("nbr_label"), col("old"))).as("label"),
          col("old"))
        .cache()
      converged = next.filter(col("label") =!= col("old")).count() == 0L
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("label"))
      round += 1
    }
    // A silent exit here would return labels that LOOK valid but split
    // genuine components — and it only triggers on the huge-graph
    // path, exactly where long near-dup chains (diameter > maxRounds)
    // become plausible. Fail loudly instead.
    if (!converged) {
      cached.unpersist()
      edges.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds: " +
          "a component's diameter exceeds maxRounds and the labels are " +
          "not yet stable; re-run with a larger maxRounds")
    }
    val out = labels.select(col("id").as("doc_id"), col("label").as("cluster_id")).cache()
    out.count()
    cached.unpersist()
    edges.unpersist()
    out
  }

  /** Join-based twin of [[bucketSelfPairs]]: pairs come from a
    * self-JOIN on the bucket keys instead of per-bucket list
    * expansion. A hot bucket's n² pairs then spread across join tasks
    * (AQE skew-split), instead of landing in ONE task's array loop —
    * so the hot-bucket cap can sit ~4× higher for the same worst-case
    * latency, buying recall on skewed key spaces (measured: simhash
    * chunk buckets of 1.7k docs on the uniform-vocab fixture, dropped
    * at cap 1000, kept at 4000 → exact hamming recall). Same output
    * contract as [[bucketSelfPairs]]. */
  private[operators] def bucketSelfJoinPairs(df: DataFrame, keys: Seq[String],
      payload: Seq[String], maxBucket: Int, scope: CacheScope,
      dedupPairs: Boolean = true): DataFrame = {
    require(payload.contains("id"), "payload must carry the id column")
    val cached = scope.pin(df)
    val keyCols = keys.map(col)
    val hot = cached.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(keyCols: _*)
    val cool = cached.join(broadcast(hot), keys, "left_anti")
    val a = cool.select(keyCols ++ payload.map(c => col(c).as(s"${c}_a")): _*)
    val b = cool.select(keyCols ++ payload.map(c => col(c).as(s"${c}_b")): _*)
    val out = a.join(b, keys)
      .filter(col("id_a") < col("id_b"))
      .select(payload.map(c => col(s"${c}_a")) ++ payload.map(c => col(s"${c}_b")): _*)
    if (dedupPairs) out.dropDuplicates("id_a", "id_b") else out
  }

  /** Shared candidate generator: all (id_a < id_b) pairs of rows
    * sharing a bucket key, in ONE pass.
    *
    * Shape: (1) a cheap `groupBy(keys).count` finds hot buckets
    * (degenerate content — e.g. a stop-shingle in every doc — that
    * would otherwise explode quadratically or OOM an aggregation
    * buffer); the tiny hot-key set is broadcast-anti-joined away
    * BEFORE any list is materialized. (2) survivors are
    * `collect_list`'d per bucket (bounded ≤ maxBucket by
    * construction) and pairs are expanded in-bucket with array
    * expressions. Both aggregations shuffle on the same keys, so the
    * exchange is reusable; compare the naïve self-join, which
    * computes the (expensive, sketch-bearing) child twice and
    * shuffles three times.
    *
    * `payload` must contain `id`; pairs are normalized so
    * `id_a < id_b` (collect_list order is nondeterministic), then
    * deduped across buckets. */
  private[operators] def bucketSelfPairs(df: DataFrame, keys: Seq[String],
      payload: Seq[String], maxBucket: Int, scope: CacheScope,
      dedupPairs: Boolean = true): DataFrame = {
    require(payload.contains("id"), "payload must carry the id column")
    // The input carries the expensive sketch columns and is consumed
    // twice (hot-bucket count, then the pair expansion). Materialize
    // it once — this IS the index artifact a production pipeline would
    // persist to storage; recomputing signatures per consumer doubles
    // the dominant cost. cache(), not localCheckpoint(): measured 6×
    // slower via checkpoint (eager row-copy materialization dominates).
    // Pinned into the operator's CacheScope: released when the
    // operator seals its result.
    val cached = scope.pin(df)
    val keyCols = keys.map(col)
    val hot = cached.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(keyCols: _*)
    val cool = cached.join(broadcast(hot), keys, "left_anti")
    val member = struct(payload.map(col): _*)
    val buckets = cool.groupBy(keyCols: _*)
      .agg(collect_list(member).as("__ms"))
      .filter(size(col("__ms")) >= 2)
    val rawPairs = buckets.select(explode(flatten(
      transform(col("__ms"), (a, i) =>
        transform(slice(col("__ms"), i + 2, size(col("__ms"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
    val norm = rawPairs.select(
      when(col("p.a.id") < col("p.b.id"), col("p"))
        .otherwise(struct(col("p.b").as("a"), col("p.a").as("b"))).as("p"))
    val out = norm.select(
      payload.map(c => col(s"p.a.$c").as(s"${c}_a")) ++
        payload.map(c => col(s"p.b.$c").as(s"${c}_b")): _*)
    if (dedupPairs) out.dropDuplicates("id_a", "id_b") else out
  }

}
