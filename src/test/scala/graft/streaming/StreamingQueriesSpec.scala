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

  test("s14 vs s05: a re-stamped redelivery dedups only under the within-watermark contract") {
    // fixture: event 1 delivered twice with DIFFERENT event times (the
    // broker-retry re-stamp), event 2 clean
    val root = java.nio.file.Files.createTempDirectory("graft_s14").toString
    spark.sql(
      "SELECT * FROM VALUES " +
        "(1L, timestamp'2024-01-02 03:04:05', 7L, 'click', 1.5D, '{}')," +
        "(1L, timestamp'2024-01-02 03:04:06', 7L, 'click', 1.5D, '{}')," +
        "(2L, timestamp'2024-01-02 03:05:00', 8L, 'view', 2.5D, '{}')" +
        " AS t(event_id, ts, user_id, event_type, value, props)")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/events.parquet")
    val s14 = StreamingQueries.dedupedEventsWithinWatermark(spark, root)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(s14 === Seq(1L, 2L),
      s"within-watermark dedup must collapse the re-stamped redelivery, got $s14")
    val s05 = StreamingQueries.dedupedEvents(spark, root)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(s05 === Seq(1L, 1L, 2L),
      s"the ts-in-key form keeps both stamps (that's its contract), got $s05")
  }

  test("s12: sessions spanning micro-batch boundaries merge in the state store") {
    // Split the fixture into two time-halves at the global MEDIAN
    // event (so the cut lands mid-session for active users), replay
    // one file per micro-batch in time order, and the emitted
    // sessions must equal the single-batch run byte for byte — the
    // cross-batch case is exactly what session_window's merging
    // state exists for, and the single-file gate never exercises it.
    val root = java.nio.file.Files.createTempDirectory("graft_s12_split").toString
    val ev = Tables.events(spark, dir).orderBy("ts", "event_id").localCheckpoint(true)
    val n = ev.count()
    val cutUs = ev.select(unix_micros(col("ts")).as("us"))
      .orderBy("us").limit((n / 2).toInt + 1)
      .agg(max("us")).head().getLong(0)
    val raw = spark.read.parquet(s"$dir/events.parquet") // physical rows, stream schema
    val tsUs: org.apache.spark.sql.Column =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("ts div 1000") // nanos-as-long generation
      else unix_micros(col("ts").cast("timestamp"))
    raw.filter(tsUs <= cutUs).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    raw.filter(tsUs > cutUs).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/events_b.parquet")
    // pin mtimes so the file source replays halves in time order
    def touch(p: String, t: Long): Unit = {
      val d = new java.io.File(p)
      (d +: Option(d.listFiles()).getOrElse(Array.empty).toSeq)
        .foreach(f => f.setLastModified(t))
    }
    val base = System.currentTimeMillis() - 120000
    touch(s"$root/events.parquet", base)
    touch(s"$root/events_b.parquet", base + 60000)
    val multi = StreamingQueries
      .sessionWindowStream(spark, root, maxFilesPerTrigger = Some(1))
      .collect().map(_.toString).toSeq
    val single = StreamingQueries.sessionWindowStream(spark, dir)
      .collect().map(_.toString).toSeq
    assert(multi === single, "cross-batch session merge diverged from single-batch run")
    // the cut must actually have split sessions: some user has events
    // on both sides of cutUs closer than the 30-minute gap
    val spanning = ev.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(max(when(col("us") <= cutUs, col("us"))).as("lastA"),
        min(when(col("us") > cutUs, col("us"))).as("firstB"))
      .filter(col("firstB") - col("lastA") < 1800000000L)
      .count()
    assert(spanning > 0, "fixture cut produced no cross-batch session — test proves nothing")
    ev.unpersist(false)
  }
}
