package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BM25 top-k pinned against an independent plain-Scala recompute
  * mirroring the operator's exact double association — any drift in
  * formula, tokenization, quantization, or tie-break surfaces as an
  * exact mismatch. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana"),
    (4L, "durian"))
  private val querySet = Seq(
    (100L, "apple"), (100L, "banana"),
    (200L, "durian"), (200L, "zzz")) // zzz: in no doc, contributes 0

  /** Mirror of Retrieval.bm25TopK in driver-side Scala. */
  private def reference(k: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val n = toks.size.toLong
    val avgdl = dl.values.sum.toDouble / n
    val qterms = querySet.map(_._2).toSet
    val tf = toks.flatMap { case (id, ts) => ts.filter(qterms).map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), hits) => (id, t, hits.size.toLong) }.toSeq
    val df = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
    val contrib = for {
      (qid, term) <- querySet.distinct
      (docId, t, f) <- tf if t == term
    } yield {
      val d = df(term)
      val idf = math.log(1.0 + ((n - d).toDouble + 0.5) / (d.toDouble + 0.5))
      val num = f.toDouble * (1.2 + 1.0)
      val den = f.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * (dl(docId).toDouble / avgdl))
      ((qid, docId), math.floor(idf * (num / den) * 1000000 + 0.5).toLong)
    }
    contrib.groupBy(_._1).toSeq
      .map { case ((qid, docId), cs) => (qid, docId, cs.map(_._2).sum) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
          .map { case ((qid, docId, s), i) => (qid, docId, s, i + 1L) }
      }.sortBy(r => (r._1, r._4))
  }

  test("bm25 equals the independent recompute bit-for-bit") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(
      corpus.toDF("doc_id", "text"),
      "doc_id", "text",
      querySet.toDF("query_id", "term"), k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === reference(3))
    assert(got.nonEmpty)
  }

  test("ranks are contiguous and scores non-increasing within a query") {
    import spark.implicits._
    val rows = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      querySet.toDF("query_id", "term"), k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).values.foreach { qs =>
      assert(qs.map(_._3).toSeq === (1L to qs.length).toSeq)
      assert(qs.map(_._2).toSeq === qs.map(_._2).sortBy(-_).toSeq)
    }
  }

  test("tfidf keywords equal the independent recompute bit-for-bit") {
    import spark.implicits._
    val got = Retrieval.tfidfKeywords(corpus.toDF("doc_id", "text"),
      "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

    val toks = corpus.map { case (id, t) => id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = toks.size.toLong
    val tf = toks.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), hits) => (id, t, hits.size.toLong) }.toSeq
    val df = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
    val expected = tf.map { case (id, t, f) =>
      val score = f.toDouble * (math.log((n.toDouble + 1.0) / (df(t).toDouble + 1.0)) + 1.0)
      (id, t, math.floor(score * 1000000 + 0.5).toLong)
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
        .map { case ((id, t, s), i) => (id, t, s, i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("only docs containing a query term are scored") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq((9L, "cherry")).toDF("query_id", "term"), k = 10).collect()
    assert(got.map(_.getLong(1)).toSet === Set(2L))
  }

  test("rrf fusion: consensus beats a single #1; singletons still surface") {
    import spark.implicits._
    // item 10: rank 2 in both lists → 2·(1e6 div 62) = 32256
    // item 11: rank 1 lexical only  → 1e6 div 61     = 16393
    // item 12: rank 1 vector only   → same            = 16393 (tie → id order)
    // item 13: rank 3 lexical only  → 1e6 div 63     = 15873
    val lex = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 13L, 3L))
      .toDF("query_id", "item_id", "rank")
    val vec = Seq((1L, 12L, 1L), (1L, 10L, 2L))
      .toDF("query_id", "item_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (10L, 2L * (1000000L / 62), 1L),
      (11L, 1000000L / 61, 2L),
      (12L, 1000000L / 61, 3L),
      (13L, 1000000L / 63, 4L)))
  }
}
