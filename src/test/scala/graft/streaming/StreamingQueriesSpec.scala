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

  test("s10: view maintenance genuinely iterates and ends at the batch truth") {
    val viewRoot = java.nio.file.Files.createTempDirectory("graft_s10_spec").toString
    val got = StreamingQueries.incrementalAggStream(spark, dir, Some(viewRoot))
      .collect().map(_.toString).toSeq

    // one committed view version per micro-batch: 4 staged files at
    // maxFilesPerTrigger=1 → versions v0..v3 (a single-pass shortcut
    // would leave exactly one)
    val v = graft.pipeline.Warehouse.currentVersion(spark, viewRoot)
    assert(v === Some(3L), s"expected 4 maintenance commits, got version $v")

    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("total_cents"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
      .collect().map(_.toString).toSeq
    assert(got === batch)

    // intermediate versions are time-travelable partial states:
    // monotone event counts, final version dominating
    val counts = (0L to 3L).map { ver =>
      spark.read.parquet(graft.pipeline.Warehouse.versionPath(viewRoot, ver))
        .agg(sum(col("n_events"))).collect()(0).getLong(0)
    }
    assert(counts === counts.sorted, s"event mass must grow monotonically: $counts")
    assert(counts.last === Tables.events(spark, dir).count())
  }

  test("s11: late rows land in the DLQ, all from the planted cohort, deterministically") {
    val rows = StreamingQueries.lateDataDlq(spark, dir).collect()
    assert(rows.nonEmpty, "the planted cohort must produce late arrivals")
    // the batches are equal time quartiles (~7.5 d band) and the delay
    // is 48 h, so in-quartile rows can never be late: every DLQ row
    // must be a planted (2-batches-late) event
    assert(rows.forall(_.getLong(0) % 17 == 0),
      "only the planted cohort can fall behind the watermark")
    // a late row's arrival batch strictly follows its time quartile
    assert(rows.forall(r => r.getInt(2) >= 2), "planted rows arrive in batch 2+")
    // the capture is replay-deterministic
    val again = StreamingQueries.lateDataDlq(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
