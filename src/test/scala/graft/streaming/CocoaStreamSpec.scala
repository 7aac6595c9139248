package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.{CocoaGen, Warehouse}

/** The streaming pipeline variant must land the same warehouse state
  * as the batch pipeline, and the checkpoint log must prevent
  * reprocessing (exactly-once file semantics replacing the
  * reference's archive marker, SURVEY.md §2.1/§4). */
class CocoaStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("available-now drain merges landing files; re-run is a no-op via checkpoint") {
    val root = Files.createTempDirectory("cocoa_stream").toString
    val (landing, wh, ckpt) = (s"$root/landing", s"$root/warehouse", s"$root/ckpt")

    CocoaGen.writeLandingFiles(spark, landing, 2, 100, seed = 10)
    CocoaStream.runAvailableNow(spark, landing, wh, ckpt)
    assert(Warehouse.read(spark, wh).count() === 200)
    assert(Warehouse.read(spark, wh).select("shipment_id").distinct().count() === 200)

    // drain again with nothing new: checkpoint log must skip seen files
    CocoaStream.runAvailableNow(spark, landing, wh, ckpt)
    assert(Warehouse.read(spark, wh).count() === 200)

    // add an overlapping batch: keys 100..299 (100..199 overlap)
    CocoaGen.writeLandingFiles(spark, landing, 1, 200, seed = 11, idOffset = 100)
    CocoaStream.runAvailableNow(spark, landing, wh, ckpt)
    assert(Warehouse.read(spark, wh).count() === 300, "LWW merge over streamed batches")
  }

  test("maxFilesPerTrigger throttles the drain into multiple micro-batches") {
    // The reference processes its landing zone 5 files per parallel
    // task (BATCH_SIZE=5 — SURVEY §2 O3); the streaming analogue is
    // the file source's maxFilesPerTrigger. A 10-file landing at 5
    // files per trigger must drain in >1 micro-batch (AvailableNow
    // honors the rate limit) and land the same warehouse state a
    // single-batch drain produces.
    val root = Files.createTempDirectory("cocoa_throttle").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

    CocoaGen.writeLandingFiles(spark, s"$root/landing", 10, 30, seed = 21)
    val batches = CocoaStream.runAvailableNow(spark, s"$root/landing",
      s"$root/wh", s"$root/ckpt", maxFilesPerTrigger = Some(5),
      processedAt = Some(ts))
    assert(batches >= 2, s"10 files at 5/trigger drained in $batches micro-batch(es)")

    // same landing, unthrottled, fresh warehouse+checkpoint
    CocoaGen.writeLandingFiles(spark, s"$root/landing2", 10, 30, seed = 21)
    val one = CocoaStream.runAvailableNow(spark, s"$root/landing2",
      s"$root/wh2", s"$root/ckpt2", processedAt = Some(ts))
    assert(one === 1L, s"unthrottled drain took $one micro-batches")

    val a = Warehouse.read(spark, s"$root/wh").orderBy("shipment_id")
      .collect().map(_.toString).toSeq
    val b = Warehouse.read(spark, s"$root/wh2").orderBy("shipment_id")
      .collect().map(_.toString).toSeq
    assert(a === b, "throttled and unthrottled drains must land identical state")
  }

  test("streaming daily stats matches the batch computation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.dailyEventStats(spark, dir).collect()
    val batch = graft.operators.Relational.dailyEventStats(spark, dir).collect()
    assert(streamed.map(_.toString).sorted.toSeq === batch.map(_.toString).sorted.toSeq)
  }

  test("stateful flatMapGroupsWithState sessionization equals batch windows") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StatefulSessions.sessionize(spark, dir).collect()
    val batch = graft.operators.Relational.sessionize(spark, dir).collect()
    assert(streamed.map(_.toString).sorted.toSeq === batch.map(_.toString).sorted.toSeq)
    // most sessions must come from real streaming state, not the
    // open-session flush
    val closedOnly = StatefulSessions.sessionize(spark, dir, flushOpen = false).count()
    assert(closedOnly >= batch.length * 0.8,
      s"$closedOnly of ${batch.length} sessions emitted by state logic")
  }

  test("session counter survives an event-time timeout (no duplicate session ids)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import StatefulSessions.{Ev, SessionState}
    import org.apache.spark.api.java.Optional
    // batch 1: one session, then a timeout fires
    val s1 = TestGroupState.create[SessionState](
      optionalState = Optional.empty[SessionState](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(0L)).asInstanceOf[Optional[Long]], hasTimedOut = false)
    StatefulSessions.updateUser(1L, Iterator(Ev(1L, 10L, 1000L)), s1).toList
    assert(s1.get.sessionId === 1L && s1.get.n === 1L)
    // timeout closes session 1 but must keep the counter
    val s2 = TestGroupState.create[SessionState](
      optionalState = Optional.of(s1.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(10000000L)).asInstanceOf[Optional[Long]], hasTimedOut = true)
    val closed = StatefulSessions.updateUser(1L, Iterator.empty, s2).toList
    assert(closed.map(_.session_id) === List(1L))
    assert(s2.get.n === 0L, "sentinel retained")
    // next event must open session 2, not restart at 1
    val s3 = TestGroupState.create[SessionState](
      optionalState = Optional.of(s2.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(10000000L)).asInstanceOf[Optional[Long]], hasTimedOut = false)
    StatefulSessions.updateUser(1L, Iterator(Ev(1L, 99L, 20000000L)), s3).toList
    assert(s3.get.sessionId === 2L, "counter resumed after timeout")
  }

  test("streaming JDBC drain: checkpoint skips seen files; replay is idempotent") {
    import graft.pipeline.JdbcWarehouse
    val root = Files.createTempDirectory("cocoa_stream_jdbc").toString
    val (landing, ckpt) = (s"$root/landing", s"$root/ckpt")
    val url = s"jdbc:derby:$root/db;create=true"
    val ts = Some(new java.sql.Timestamp(1000000L))

    CocoaGen.writeLandingFiles(spark, landing, 2, 100, seed = 21)
    CocoaStream.runAvailableNowJdbc(spark, landing, url, "wh", ckpt, processedAt = ts)
    val after1 = JdbcWarehouse.read(spark, url, "wh")
    assert(after1.count() === 200)
    val snapshot1 = after1.collect().toSet

    // drain again with nothing new: the checkpointed file-source log
    // must skip every seen file — no JDBC writes at all
    CocoaStream.runAvailableNowJdbc(spark, landing, url, "wh", ckpt, processedAt = ts)
    assert(JdbcWarehouse.read(spark, url, "wh").collect().toSet === snapshot1)

    // crash-replay simulation: WIPE the checkpoint so the same files
    // reprocess from scratch — the at-least-once redelivery case. The
    // key-deduped upsert must leave the table bit-identical.
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    CocoaStream.runAvailableNowJdbc(spark, landing, url, "wh", ckpt, processedAt = ts)
    assert(JdbcWarehouse.read(spark, url, "wh").collect().toSet === snapshot1,
      "full redelivery must be idempotent through the keyed upsert")
  }

  test("watermarked windowed counts emit closed windows") {
    val out = StreamingQueries.windowedEventCounts(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
  }

  test("stream-stream interval join equals the batch range join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.viewPurchaseJoin(spark, dir).collect()
    val ev = graft.core.Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val batch = v.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("vts") && col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("gap_us"))
      .collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString).sorted.toSeq === batch.map(_.toString).sorted.toSeq)
  }

  test("crash between commit and checkpoint: restart replays idempotently, never duplicates") {
    val root = Files.createTempDirectory("cocoa_crash").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    CocoaGen.writeLandingFiles(spark, s"$root/landing", 4, 50, seed = 31)
    // crash after batch 1's warehouse commit (file 1 merged, not
    // checkpointed)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CocoaStream.runAvailableNow(spark, s"$root/landing", s"$root/wh",
        s"$root/ckpt", maxFilesPerTrigger = Some(1), processedAt = Some(ts),
        crashAfterBatches = Some(1L))
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.isInstanceOf[CocoaStream.SimulatedCrash]),
      "the failure must be the planted crash, not something else")
    val midCount = Warehouse.read(spark, s"$root/wh").count()
    assert(midCount > 0 && midCount < 200, "crash must land mid-drain")
    val vMid = Warehouse.currentVersion(spark, s"$root/wh").get

    // restart from the SAME checkpoint: replays the uncheckpointed
    // batch (content-identical commit — idempotent LWW), drains the
    // remaining files exactly once
    CocoaStream.runAvailableNow(spark, s"$root/landing", s"$root/wh",
      s"$root/ckpt", maxFilesPerTrigger = Some(1), processedAt = Some(ts))
    assert(Warehouse.read(spark, s"$root/wh").count() === 200,
      "recovered drain must land every row exactly once")
    // the replayed batch really committed again (a new version), and
    // its content equals the pre-crash snapshot it replayed over
    val vAfter = Warehouse.currentVersion(spark, s"$root/wh").get
    assert(vAfter > vMid, "replay must have produced new commits")

    // reference run without a crash: byte-identical final warehouse
    CocoaGen.writeLandingFiles(spark, s"$root/landing2", 4, 50, seed = 31)
    CocoaStream.runAvailableNow(spark, s"$root/landing2", s"$root/wh2",
      s"$root/ckpt2", processedAt = Some(ts))
    val a = Warehouse.read(spark, s"$root/wh").collect().map(_.toString).sorted.toSeq
    val b = Warehouse.read(spark, s"$root/wh2").collect().map(_.toString).sorted.toSeq
    assert(a === b, "crash+recovery diverged from the clean run")
  }
}
