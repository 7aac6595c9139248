package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.Warehouse
import graft.sources.v2.GraftStreamSink

case class SinkKV(id: String, v: Double)

/** `writeStream.format("graft")` ([[GraftStreamSink]]): per-batch
  * fenced commits, keyed upsert semantics, exactly-once via the
  * in-snapshot epoch marker, checkpoint-restart without duplicates. */
class GraftStreamSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("graft_sink").toString

  private def rows(root: String): Map[String, Double] =
    Warehouse.read(spark, root,
      Encoders.product[SinkKV].schema).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("streaming upsert: batches land as versions; restart adds nothing") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val ms = MemoryStream[SinkKV](Encoders.product[SinkKV], spark)
    def drain(): Unit = {
      val q = ms.toDF().writeStream.format("graft")
        .option("mergeKey", "id")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(root)
      q.awaitTermination(60000)
    }
    ms.addData(SinkKV("a", 1.0), SinkKV("b", 2.0), SinkKV("c", 3.0))
    drain()
    assert(rows(root) === Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
    val v0 = Warehouse.versions(spark, root).max
    // second batch: update b, insert d — a keyed upsert commit
    ms.addData(SinkKV("b", 20.0), SinkKV("d", 4.0))
    drain()
    assert(rows(root) === Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0, "d" -> 4.0))
    // each batch time-travelable
    assert(spark.read.parquet(Warehouse.versionPath(root, v0)).count() === 3)
    // restart with nothing new: checkpoint says all batches done
    val before = Warehouse.versions(spark, root)
    drain()
    assert(Warehouse.versions(spark, root) === before,
      "an empty restart must publish no versions")
  }

  test("exactly-once: a replayed epoch is a durable no-op, even via a fresh sink") {
    import spark.implicits._
    val root = freshRoot()
    val sink = new GraftStreamSink(spark, root, Some("id"), "app1", OutputMode.Append())
    sink.addBatch(0, Seq(SinkKV("a", 1.0), SinkKV("b", 2.0)).toDF())
    sink.addBatch(1, Seq(SinkKV("b", 9.0)).toDF())
    assert(rows(root) === Map("a" -> 1.0, "b" -> 9.0))
    val versions = Warehouse.versions(spark, root)
    // a crash between sink-commit and checkpoint-commit replays the
    // batch — possibly through a brand-new sink instance after restart
    new GraftStreamSink(spark, root, Some("id"), "app1", OutputMode.Append())
      .addBatch(1, Seq(SinkKV("b", 999.0)).toDF())
    assert(rows(root) === Map("a" -> 1.0, "b" -> 9.0), "replay must not re-apply")
    assert(Warehouse.versions(spark, root) === versions)
    // a DIFFERENT appId has its own epoch line
    new GraftStreamSink(spark, root, Some("id"), "app2", OutputMode.Append())
      .addBatch(0, Seq(SinkKV("c", 5.0)).toDF())
    assert(rows(root) === Map("a" -> 1.0, "b" -> 9.0, "c" -> 5.0))
  }

  test("complete mode replaces the snapshot; duplicate keys in one batch are loud") {
    import spark.implicits._
    val root = freshRoot()
    val sink = new GraftStreamSink(spark, root, Some("id"), "agg", OutputMode.Complete())
    sink.addBatch(0, Seq(SinkKV("a", 1.0), SinkKV("b", 2.0)).toDF())
    sink.addBatch(1, Seq(SinkKV("a", 3.0)).toDF())
    assert(rows(root) === Map("a" -> 3.0), "complete mode = recomputed result alone")
    val upsert = new GraftStreamSink(spark, root, Some("id"), "agg2", OutputMode.Update())
    val e = intercept[IllegalArgumentException] {
      upsert.addBatch(0, Seq(SinkKV("x", 1.0), SinkKV("x", 2.0)).toDF())
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
