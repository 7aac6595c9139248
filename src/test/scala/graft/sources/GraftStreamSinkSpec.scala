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

  test("end-to-end replication: sink + auto-CDF -> CDC stream -> sink") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val a = freshRoot(); val b = freshRoot()
    // table A: upsert key + auto change-data-feed
    graft.sources.v2.GraftCatalog.writeProps(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf()),
      a, Map("mergeKey" -> "id", "changeFeed" -> "true"))
    val sinkA = new GraftStreamSink(spark, a, Some("id"), "repl", OutputMode.Update())
    sinkA.addBatch(0, Seq(SinkKV("a", 1.0), SinkKV("b", 2.0)).toDF()) // v0 (no feed due)
    sinkA.addBatch(1, Seq(SinkKV("b", 20.0), SinkKV("c", 3.0)).toDF()) // v1 + feed
    sinkA.addBatch(2, Seq(SinkKV("a", 10.0)).toDF()) // v2 + feed
    // initial load of the replica = A's v0 snapshot; the stream then
    // applies every subsequent change feed through the connector sink
    Warehouse.commit(spark, b,
      Warehouse.readVersion(spark, a, 0L, Encoders.product[SinkKV].schema))
    val ckpt = Files.createTempDirectory("graft_repl_ckpt").toString
    def replicate(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(a)
        .filter(col("change_type") =!= "delete")
        .select(col("id"), col("new_image.v").as("v"))
        .writeStream.format("graft").option("mergeKey", "id")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(b)
      q.awaitTermination(60000)
    }
    replicate()
    assert(rows(b) === Map("a" -> 10.0, "b" -> 20.0, "c" -> 3.0),
      "replica must converge to the source's upserted state")
    assert(rows(b) === rows(a))
    // more changes on A; an incremental replication run catches up
    sinkA.addBatch(3, Seq(SinkKV("d", 4.0)).toDF())
    replicate()
    assert(rows(b) === rows(a))
  }

  test("manifest mode: each micro-batch is an O(Δ) commit, epoch marker rides atomically") {
    val root = freshRoot()
    // seed + opt in: the first streamed batch converts zero-copy
    Warehouse.commit(spark, root, spark.createDataFrame(
      java.util.Arrays.asList(Row("a", 1.0), Row("b", 2.0)),
      Encoders.product[SinkKV].schema).repartition(2))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root), root,
      Map("mergeKey" -> "id", "commitMode" -> "manifest"))
    val ckpt = Files.createTempDirectory("graft_sink_m_ckpt").toString
    val ms = MemoryStream[SinkKV](Encoders.product[SinkKV], spark)
    def drain(): Unit = {
      val q = ms.toDF().writeStream.format("graft")
        .option("mergeKey", "id")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(root)
      q.awaitTermination(60000)
    }
    ms.addData(SinkKV("b", 20.0), SinkKV("c", 3.0)) // update b, insert c
    drain()
    val fs = graft.sources.v2.GraftTables.fs(spark, root)
    val v1 = Warehouse.versions(spark, root).max
    val m = Warehouse.manifestOf(fs, root, v1).getOrElse(
      fail("a manifest-mode micro-batch must publish a manifest version"))
    assert(m.exists(_.startsWith("v0/")),
      s"the untouched seed file must ride by reference: $m")
    assert(rows(root) === Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0))
    // the exactly-once epoch marker published atomically WITH the rows
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Warehouse.versionPath(root, v1), "_SINK_EPOCH_default")),
      "the epoch marker must live inside the manifest version dir")
    // replay: a fresh sink instance skips the committed epoch
    new GraftStreamSink(spark, root, Some("id"), "default",
      OutputMode.Append())
      .addBatch(0L, spark.createDataFrame(
        java.util.Arrays.asList(Row("zz", 9.9)),
        Encoders.product[SinkKV].schema))
    assert(rows(root) === Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0),
      "a replayed epoch must be a durable no-op in manifest mode too")
    // a second live batch keeps the chain granular
    ms.addData(SinkKV("d", 4.0))
    drain()
    val v2 = Warehouse.versions(spark, root).max
    assert(Warehouse.manifestOf(fs, root, v2).exists(_.toSet
      .intersect(Warehouse.manifestOf(fs, root, v1).get.toSet).nonEmpty),
      "untouched files carry across streamed batches")
    assert(rows(root) === Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0, "d" -> 4.0))
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
