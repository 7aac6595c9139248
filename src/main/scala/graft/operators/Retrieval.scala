package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword retrieval over the corpus: BM25 top-k — the lexical
  * complement of the vector search operators (Similarity/IvfIndex),
  * and the scorer behind "find the training docs matching these
  * terms" audits.
  *
  * Scale shape — the whole design is "never build corpus-wide
  * postings":
  *  - the query term set is broadcast and the corpus token stream is
  *    filtered against it BEFORE any aggregation, so the postings
  *    (doc, term, tf) exist only for query terms — at 100 TB the
  *    alternative (a full inverted index) is a different, persisted
  *    artifact; scoring an ad-hoc query set needs only this pruned
  *    pass;
  *  - document lengths and corpus stats (N, avgdl) are one per-row
  *    kernel pass plus one tiny aggregate attached as a broadcast
  *    1-row frame (the RangeJoin stats pattern);
  *  - per-term df comes from the pruned postings (≤ |query terms|
  *    rows) and broadcasts back;
  *  - the final top-k per query is window-formulated here (fixture
  *    exactness); at scale the identical selection routes through the
  *    bounded-heap TopKPerKey plan node, as d19/q35 do.
  *
  * Engine portability: every score is quantized to integer
  * micro-units per (query, doc, term) contribution and SUMMED AS
  * INTEGERS, so the aggregate is order-independent and the DuckDB
  * oracle reproduces it bit-for-bit (the qsum discipline from
  * Relational.scala). All floating-point steps are IEEE +,-,*,/ on
  * identical inputs (associativity fixed by construction) plus one
  * `ln` — quantization at 1e-6 makes a cross-libm ulp flip
  * astronomically unlikely, and the spec pins Spark against an
  * independent Scala recompute. */
object Retrieval {

  /** TF-IDF keyword extraction: the top `k` terms per document by
    * tf·idf (sklearn-style smoothed idf, `ln((N+1)/(df+1)) + 1`) —
    * "what is this document about", the per-doc summarization pass
    * corpus audits and topic browsing run.
    *
    * Unlike [[bm25TopK]], this op inherently needs corpus-wide
    * postings: ONE explode into a map-side-combined (doc, term)
    * aggregate is the corpus-sized pass, then df and the score join
    * are vocabulary-keyed (AQE broadcasts df when the vocab fits).
    * Each score is a single product — no order-sensitive float sum at
    * all — quantized to integer micro-units, so the oracle recomputes
    * the exact ranking. Top-k per doc is a doc-partitioned window
    * (maximally parallel — every document is its own partition);
    * rank ties break on term, a total order. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tokenized = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    val tf = tokenized
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = tokenized.agg(count(lit(1)).as("n"))
    val score = col("tf").cast("double") *
      (log((col("n").cast("double") + lit(1.0)) / (col("df").cast("double") + lit(1.0))) + lit(1.0))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        floor(score * lit(1000000) + lit(0.5)).cast("long").as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** BM25 top-k docs per query. `queries` carries (query_id, term)
    * — terms already normalized like [[TextFunctions.tokens]] output.
    * Returns (query_id, doc_id, score_micro, rank), rank 1..k by
    * (score desc, doc_id asc) — a total order, so results are
    * deterministic under ties. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val id = col(idCol)
    val toks = TextFunctions.tokens(col(textCol))

    val tokenized = docs
      .filter(col(textCol).isNotNull)
      .select(id.as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)

    val doclen = tokenized.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    // N and avgdl: one tiny aggregate, broadcast onto every scored row
    val stats = doclen.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    val terms = queries.select(col("term")).distinct()
    // postings restricted to query terms: filter BEFORE the tf
    // aggregate — the broadcast semi-join prunes the exploded token
    // stream to |query-term| hits per doc
    val tf = tokenized
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // ln(1 + (N - df + 0.5)/(df + 0.5)) — association mirrored
    // EXACTLY by the SQL oracle (see SparkEntry r01)
    val idf: Column =
      log(lit(1.0) + (((col("n") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))))
    val num: Column = col("tf").cast("double") * (lit(k1) + lit(1.0))
    val den: Column = col("tf").cast("double") +
      lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl").cast("double") / col("avgdl")))

    val contrib = tf
      .join(broadcast(df), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(queries.select("query_id", "term").distinct()), "term")
      .select(col("query_id"), col("doc_id"),
        floor(idf * (num / den) * lit(1000000) + lit(0.5)).cast("long").as("c"))

    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** RECIPROCAL-RANK FUSION — the standard way production search
    * combines heterogeneous rankings (lexical BM25 + vector ANN +
    * anything else): each ranking contributes 1/(c + rank) per item
    * and the sums re-rank. Rank-based, so incomparable score scales
    * (BM25 micro-units vs cosine) fuse without calibration — the
    * reason RRF beats score interpolation in practice (Cormack et
    * al.'s TREC result).
    *
    * Inputs are (query_id, item_id, rank) frames — the output shape
    * of [[bm25TopK]] and [[graft.operators.Similarity.bruteForceTopK]]
    * (and any other ranker). Weights are INTEGER micro-units
    * (`1e6 div (c + rank)`) so the fused ordering is exact and
    * engine-portable — ties broken by item id.
    *
    * Scale shape: a union of the (already top-depth-pruned) ranking
    * frames, one map-side-combined sum keyed on (query, item), one
    * per-query window. The window partition is bounded by
    * modalities × depth BY CONSTRUCTION (each input carries ≤ depth
    * rows per query), so no bounded-heap prune is needed at any
    * query count — the prune already happened inside each ranker. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val pooled = rankings
      .map(_.select(col("query_id"), col("item_id"),
        expr(s"CAST(1000000 div ($c + rank) AS BIGINT)").as("w")))
      .reduce(_ unionByName _)
      .groupBy("query_id", "item_id")
      .agg(sum(col("w")).as("rrf_units"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_units").desc, col("item_id"))
    pooled.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
