package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables

/** Stream-static incremental dedup (s08): the streaming gate must
  * emit exactly the content-hash set a batch recompute derives —
  * verbatim re-crawls dropped by the static index, in-stream echoes
  * collapsed, new content kept — independent of arrival order. */
class StreamingQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming gate equals the batch-derived new-content hash set") {
    val got = StreamingQueries.incrementalDedupStream(spark, dir)
      .collect().map(_.getString(0)).toSet

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val src = docs.filter(col("doc_id") < 40 && col("text").isNotNull)
    val incHashes = src.select(md5(col("text")).as("h"))
      .unionByName(src.select(md5(concat(col("text"), lit(" graftmark"))).as("h")))
      .distinct()
    val corpus = docs.filter(col("text").isNotNull)
      .select(md5(col("text")).as("h")).distinct()
    val expected = incHashes.join(corpus, Seq("h"), "left_anti")
      .collect().map(_.getString(0)).toSet

    assert(got === expected)
    assert(got.nonEmpty, "mutated texts must survive the gate")
    // verbatim re-crawls must NOT survive
    val corpusSet = corpus.collect().map(_.getString(0)).toSet
    assert(got.intersect(corpusSet).isEmpty)
  }
}
