package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions
import graft.operators.{AsOfJoin, Dedup, RangeJoin, Similarity}

/** Fluent user-facing surface: `import graft.syntax._` gives every
  * DataFrame the engine's training-data operators as methods, so a
  * pipeline reads as one chain —
  *
  * {{{
  * import graft.syntax._
  * docs.withQualityScore("text")
  *     .filter($"quality" > 0.5)
  *     .minhashNearDups("doc_id", "text")
  * }}}
  *
  * Thin delegation only: each method forwards to the
  * [[graft.operators]] / [[graft.functions]] implementation, which
  * stays independently callable and tested. */
object syntax {

  implicit class GraftDatasetOps(private val df: DataFrame) extends AnyVal {

    // ------------------------------------------------------------ dedup
    /** One surviving row per distinct `textCol` (smallest id wins). */
    def dedupExact(idCol: String, textCol: String): DataFrame =
      Dedup.exactDedup(df, idCol, textCol)

    /** (content_hash, keep_id, n_copies) per distinct content. */
    def exactDedupGroups(idCol: String, textCol: String): DataFrame =
      Dedup.exactGroups(df, idCol, textCol)

    /** Near-dup pairs by MinHash-LSH with exact-Jaccard verification. */
    def minhashNearDups(idCol: String, textCol: String,
        threshold: Double = 0.5): DataFrame =
      Dedup.minhashPairs(df, idCol, textCol, threshold = threshold)

    /** Near-dup pairs within `maxHamming` SimHash bits. */
    def simhashNearDups(idCol: String, textCol: String,
        maxHamming: Int = 6): DataFrame =
      Dedup.simhashPairs(df, idCol, textCol, maxHamming = maxHamming)

    /** Exact n-gram-Jaccard pairs (prefix-filtered AllPairs). */
    def ngramJaccardNearDups(idCol: String, textCol: String,
        n: Int = 3, threshold: Double = 0.4): DataFrame =
      Dedup.ngramJaccardPairs(df, idCol, textCol, n, threshold)

    // ------------------------------------------------------- similarity
    /** Exact cosine top-k over an `array<float>` column. */
    def knnTopK(idCol: String, vecCol: String, k: Int): DataFrame =
      Similarity.bruteForceTopK(df, idCol, vecCol, k)

    /** Approximate cosine top-k via sign-LSH buckets. */
    def annTopK(idCol: String, vecCol: String, k: Int,
        tables: Int = 10): DataFrame =
      Similarity.annTopK(df, idCol, vecCol, k, tables = tables)

    /** Embedding pairs with cosine ≥ `threshold`. */
    def cosineNearDups(idCol: String, vecCol: String,
        threshold: Double): DataFrame =
      Similarity.cosineNearDupPairs(df, idCol, vecCol, threshold)

    // ---------------------------------------------------- temporal joins
    /** Attach the latest `right` row with `rightTs <= leftTs` per key
      * (point-in-time lookup; LEFT semantics, nulls when none). */
    def asOfJoin(right: DataFrame, key: String, leftTs: String,
        rightTs: String, rightCols: Map[String, String]): DataFrame =
      AsOfJoin.asOf(df, right, key, leftTs, rightTs, rightCols)

    /** All (this, right) pairs with `right.ts` in
      * `[this.ts + lowerUs, this.ts + upperUs]` — banded equi-join,
      * never a nested-loop theta product. `bandUs` tunes candidate
      * volume for wide windows over dense events (see
      * [[RangeJoin.intervalJoin]]). */
    def rangeJoin(right: DataFrame, leftTs: String, rightTs: String,
        lowerUs: Long, upperUs: Long,
        equiKeys: Seq[String] = Seq.empty,
        bandUs: Option[Long] = None): DataFrame =
      RangeJoin.intervalJoin(df, right, leftTs, rightTs, lowerUs, upperUs,
        equiKeys, bandUs)

    // ------------------------------------------------------------ graph
    /** Damped integer-exact PageRank over this (src, dst) edge frame
      * (every node must appear as a src; see
      * [[graft.operators.Graph.pageRankIntExact]]). */
    def pageRank(iters: Int): DataFrame =
      graft.operators.Graph.pageRankIntExact(df, iters)

    /** Per-node triangle counts over this canonical (u < v) edge
      * frame. */
    def triangleCounts(): DataFrame =
      graft.operators.Graph.triangleCounts(df)

    /** Community labels after `iters` synchronous min-label LPA
      * rounds over this canonical (u < v) edge frame. */
    def labelPropagation(iters: Int): DataFrame =
      graft.operators.Graph.labelPropagation(df, iters)

    // --------------------------------------------------- decontamination
    /** Any-overlap decontamination audit: non-benchmark docs (ids ≥
      * `benchBelow`) with their count of n-gram shingles shared with
      * the benchmark slice. */
    def decontaminationFlags(n: Int, benchBelow: Long): DataFrame =
      graft.operators.NorthStar.decontaminationOf(df, n, benchBelow)

    /** The published removal rule: overlap FRACTION in basis points
      * plus the `contaminated` flag at `thresholdBp`. */
    def decontaminationFractions(n: Int, benchBelow: Long,
        thresholdBp: Int = 5000): DataFrame =
      graft.operators.NorthStar.decontaminationFractionOf(df, n, benchBelow,
        thresholdBp)

    // ------------------------------------------------- text enrichment
    def withTokenCount(textCol: String, out: String = "n_tokens"): DataFrame =
      df.withColumn(out, TextFunctions.tokenCount(col(textCol)))

    def withQualityScore(textCol: String, out: String = "quality"): DataFrame =
      df.withColumn(out, TextFunctions.qualityScore(col(textCol)))

    def withLangId(textCol: String, out: String = "lang_pred"): DataFrame =
      df.withColumn(out, TextFunctions.langId(col(textCol)))

    def withFingerprint(textCol: String, out: String = "fingerprint"): DataFrame =
      df.withColumn(out, TextFunctions.fingerprint64(col(textCol)))

    private def col(name: String): Column = df.col(name)
  }
}
