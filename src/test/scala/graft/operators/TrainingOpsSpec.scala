package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables
import graft.functions.TextFunctions

/** Invariants of the training-data prep operators (d16-d18) that the
  * DuckDB oracles cannot express directly: assignment determinism,
  * token conservation across chunking, and decontamination recall on
  * a constructed overlap. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("train split covers every doc exactly once and is re-run stable") {
    val s1 = NorthStar.trainSplit(spark, dir).collect()
    val s2 = NorthStar.trainSplit(spark, dir).collect()
    assert(s1.toSeq == s2.toSeq, "split assignment must be deterministic")
    val n = Tables.documents(spark, dir)
      .filter(col("text").isNotNull &&
        TextFunctions.tokenCount(col("text")) > 0).count()
    assert(s1.length == n, "every tokenful doc gets exactly one split")
    val bySplit = s1.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // 80/10/10 in expectation; allow wide slack on 500 docs
    assert(bySplit("train") > bySplit.getOrElse("val", 0))
    assert(bySplit("train") > bySplit.getOrElse("test", 0))
  }

  test("token chunking conserves the token stream") {
    val chunks = NorthStar.tokenChunks(spark, dir)
    val totalChunked = chunks.agg(sum("n_tokens")).head.getLong(0)
    val totalTokens = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .agg(sum(TextFunctions.tokenCount(col("text")))).head.getLong(0)
    assert(totalChunked == totalTokens, "chunk token counts must sum to the corpus")
    // every chunk except a doc's last is exactly full
    val short = chunks.withColumn("max_idx",
        max("chunk_idx").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(col("chunk_idx") < col("max_idx") && col("n_tokens") =!= 32)
    assert(short.count() == 0, "only a doc's final chunk may be partial")
  }

  test("sequence packing: token conservation and full interior sequences") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val manifest = NorthStar.packSequences(spark, dir, seqLen = 256L).cache()
    // conservation: each doc's manifest contributions sum to its token count
    val perDoc = manifest.groupBy("doc_id").agg(sum("n_tokens").as("packed"))
    val counts = graft.core.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
    assert(perDoc.join(counts, "doc_id").filter(col("packed") =!= col("n")).count() === 0,
      "packing lost or duplicated tokens")
    assert(perDoc.count() === counts.count(), "every tokenful doc must be packed")
    // every sequence except each language's LAST holds exactly seqLen tokens
    val perSeq = manifest.groupBy("lang", "seq_id").agg(sum("n_tokens").as("t"))
    val lastSeq = perSeq.groupBy("lang").agg(max("seq_id").as("last"))
    val interior = perSeq.join(lastSeq, "lang").filter(col("seq_id") < col("last"))
    assert(interior.filter(col("t") =!= 256L).count() === 0,
      "interior sequences must be exactly full")
    manifest.unpersist()
  }

  test("decontamination flags a constructed benchmark copy") {
    import spark.implicits._
    // doc 3 is benchmark (id < 10); doc 12 repeats its text verbatim →
    // must be flagged with every distinct shingle shared
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, "one two three four five six"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta"),
      (15L, "totally unrelated words nothing in common here at all")
    ).toDF("doc_id", "text")
    val flagged = NorthStar.decontaminationOf(docs, n = 5, benchBelow = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(12L), s"expected only doc 12 flagged, got $flagged")
    assert(flagged(12L) == 4, "8 tokens -> 4 distinct 5-gram shingles, all shared")
  }
}
