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

  test("a generation-mixed events glob fails loudly, not with nulls") {
    // events.parquet carries a real timestamp; a sibling glob match
    // carries the OTHER generation's shape (raw nanos-as-long). One
    // declared stream schema cannot read both — eventsStream must
    // refuse rather than stream one file through the wrong type.
    val dir = java.nio.file.Files.createTempDirectory("graft_mixed_gen").toString
    spark.sql("SELECT 1L AS event_id, timestamp'2024-01-02 03:04:05' AS ts, " +
        "7L AS user_id, 'click' AS event_type, 1.5 AS value, '{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.sql("SELECT 2L AS event_id, 1704164645000000000 AS ts, " +
        "8L AS user_id, 'view' AS event_type, 2.5 AS value, '{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events_late.parquet")
    val e = intercept[IllegalArgumentException] {
      StreamingQueries.eventsStream(spark, dir)
    }
    assert(e.getMessage.contains("generation-mixed"))
  }

  test("streaming outlier gate equals the batch outlier query") {
    val streamed = StreamingQueries.streamingValueOutliers(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.operators.Relational.valueOutliers(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "fixture must contain outliers for the gate to prove anything")
  }

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
