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

  test("watermarked windowed counts emit closed windows") {
    val out = StreamingQueries.windowedEventCounts(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
  }
}
