package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Partition evolution: the hive layout belongs to the version — the
  * partitioned re-commit is content-identical, old flat versions stay
  * readable, partition-column predicates prune at PLAN time, and a
  * later plain commit returns the table to a flat layout. */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_partevo").toString
  private def batch(seed: Int, n: Int = 600) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed), new Timestamp(1000000L))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("partitioned re-commit preserves content; both layouts readable; predicates prune") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(11)) // v0: flat
    val flat = rows(Warehouse.read(spark, root))
    val v = Warehouse.commitPartitioned(spark, root,
      Warehouse.read(spark, root), Seq("region"))
    assert(v === 1L)
    assert(rows(Warehouse.read(spark, root)) === flat,
      "partitioned layout changed content")
    // v0 stays readable under its own (flat) layout
    assert(rows(spark.read.schema(CocoaSchema.warehouse)
      .parquet(Warehouse.dataPath(spark, root, 0L))) === flat)
    // v1 is genuinely hive-partitioned: region=<value> dirs exist
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(
        Warehouse.versionPath(root, 1L)))
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("region=")),
      s"expected region=<v> partition dirs, got ${dirs.mkString(",")}")
    // the whole point: a region predicate becomes a PartitionFilter
    val q = Warehouse.read(spark, root).filter(col("region") === "Ashanti")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "region predicate must plan as a partition filter")
    assert(plan.contains("region"), "partition filter must carry the column")
    // and it prunes: the filtered SCAN selects a strict subset of
    // partition dirs (inputFiles ignores pruning — ask the scan node)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // finalize AQE stages
      graft.PlanWalk.collectAll(df.queryExecution.executedPlan) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(s.selectedPartitions.totalNumberOfFiles)
      }.sum
    }
    val allFiles = scannedFiles(Warehouse.read(spark, root))
    val prunedFiles = scannedFiles(
      Warehouse.read(spark, root).filter(col("region") === "Ashanti"))
    assert(prunedFiles < allFiles,
      s"no pruning: $prunedFiles of $allFiles files read")
    // correctness under pruning
    assert(rows(q) === flat.filter(_.contains("Ashanti")).map(identity))
  }

  test("a later plain commit returns the table to a flat layout (layout is per-version)") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(12, n = 200))
    Warehouse.commitPartitioned(spark, root,
      Warehouse.read(spark, root), Seq("region"))
    val content = rows(Warehouse.read(spark, root))
    Warehouse.commit(spark, root, Warehouse.read(spark, root))
    assert(rows(Warehouse.read(spark, root)) === content)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(
        Warehouse.versionPath(root, 2L)))
      .map(_.getPath.getName)
    assert(names.exists(_.startsWith("part-")) &&
      !names.exists(_.startsWith("region=")),
      s"v2 should be flat, got ${names.mkString(",")}")
  }

  test("unknown partition columns fail before anything publishes") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(13, n = 50))
    val e = intercept[IllegalArgumentException] {
      Warehouse.commitPartitioned(spark, root,
        Warehouse.read(spark, root), Seq("no_such_col"))
    }
    assert(e.getMessage.contains("no_such_col"))
    assert(Warehouse.currentVersion(spark, root) === Some(0L))
  }
}
