package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hive partitioning × manifest commits — the round-13 composition:
  * partition PRUNING and O(Δ) file-granular DML together (the
  * Delta/Iceberg pairing; until now choosing manifest mode meant a
  * flat layout). The manifest relpaths keep their `k=v` fragments as
  * the partition-value store, `_MANIFEST_PARTS` names the columns,
  * and BOTH read doors (connector and Scala API) plan over
  * [[graft.sources.v2.ManifestFileIndex]] — partition pruning, stats
  * skipping, zero listing, one cost model. */
class PartitionedManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_pmani").toString
  private def batch(seed: Int, n: Int = 30, idOffset: Int = 0) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
      new Timestamp(1000000L + seed * 1000L))
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
  private def manifest(root: String, v: Long): Seq[String] =
    Warehouse.manifestOf(hfs(root), root, v).getOrElse(
      fail(s"v$v of $root is not a manifest version"))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Files actually scheduled by the query, V1 (Scala path) and V2
    * (connector) scan nodes both counted. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    graft.PlanWalk.collectAll(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(s.selectedPartitions.totalNumberOfFiles)
      case b: BatchScanExec => b.inputPartitions.collect {
        case fp: FilePartition => fp.files.length.toLong }
    }.sum
  }

  /** Every V1 file scan in the plan must be planned over the
    * manifest-backed index — the zero-listing pin for the Scala door. */
  private def scalaScanIsManifestBacked(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect()
    val locs = graft.PlanWalk.collectAll(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(s.relation.location)
    }
    locs.nonEmpty && locs.forall(_.isInstanceOf[graft.sources.v2.ManifestFileIndex])
  }

  test("zero-copy conversion of a hive-partitioned snapshot; appends stay partitioned") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(1, n = 120), Seq("region"))
    val v0Entries = Warehouse.dataFilesOf(spark, root, 0L).toSet
    assert(v0Entries.nonEmpty && v0Entries.forall(_.contains("region=")),
      "fixture must actually be hive-partitioned")
    val v1 = Warehouse.appendFiles(spark, root, batch(2, n = 30, idOffset = 500))
    val m1 = manifest(root, v1)
    // carried BY REFERENCE, partition fragments intact in the relpaths
    assert(m1.count(_.startsWith("v0/region=")) === v0Entries.size,
      "every v0 partition file rides by reference with its fragment")
    assert(m1.filterNot(_.startsWith("v0/")).forall(_.startsWith("v1/region=")),
      "fresh rows land hive-partitioned too")
    assert(Warehouse.manifestParts(hfs(root), root, v1) === Seq("region"))
    // both doors agree with the pre-conversion truth
    val expect = rows(Warehouse.readVersion(spark, root, 0L)) ++
      rows(batch(2, n = 30, idOffset = 500)
        .select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*))
    assert(rows(Warehouse.read(spark, root)) === expect.sorted)
    assert(rows(spark.read.format("graft").load(root)
      .select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*)) ===
      expect.sorted)
  }

  test("partition pruning at planning through BOTH doors (and the Scala door is index-backed)") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(3, n = 200), Seq("region"))
    Warehouse.appendFiles(spark, root, batch(4, n = 50, idOffset = 600))
    // 'Greater Accra' carries a space: the fragment round-trips the
    // hive escaping and _metadata URL-encoding boundaries
    val target = "Greater Accra"
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("region") === target)
    val scalaAll = Warehouse.read(spark, root)
    val scalaHit = hits(Warehouse.read(spark, root))
    assert(scalaScanIsManifestBacked(scalaAll),
      "the Scala read of a manifest version must plan over ManifestFileIndex")
    val all = scannedFiles(Warehouse.read(spark, root))
    val pruned = scannedFiles(hits(Warehouse.read(spark, root)))
    assert(pruned < all, s"Scala door: no partition pruning ($pruned/$all)")
    val connAll = scannedFiles(spark.read.format("graft").load(root))
    val connPruned = scannedFiles(hits(spark.read.format("graft").load(root)))
    assert(connPruned < connAll,
      s"connector door: no partition pruning ($connPruned/$connAll)")
    // pruning is sound: equals the unpruned truth
    assert(rows(scalaHit) ===
      rows(spark.read.format("graft").load(root).filter(col("region") === target)
        .select(scalaHit.columns.map(col).toSeq: _*)))
    assert(scalaHit.count() > 0, "fixture must hit the target partition")
  }

  test("file-granular DML on a partitioned manifest: delete/update/merge carry untouched partitions verbatim") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(5, n = 150), Seq("bean_type"))
    val v1 = Warehouse.appendFiles(spark, root, batch(6, n = 30, idOffset = 700))
    val before = rows(Warehouse.read(spark, root))
    // DELETE keyed on the partition column: only Criollo files rewritten
    val m1 = manifest(root, v1)
    val v2 = Warehouse.deleteWhereFiles(spark, root,
      col("bean_type") === "Criollo" && col("quality_score") < lit(9.0)).get
    val m2 = manifest(root, v2)
    val untouched1 = m1.filterNot(_.contains("bean_type=Criollo"))
    assert(untouched1.forall(m2.contains),
      "non-Criollo partition files must ride VERBATIM through the delete")
    assert(m2.filterNot(m1.contains).forall(_.startsWith(s"v$v2/bean_type=")),
      "rewritten survivors land partitioned")
    assert(before.nonEmpty)
    // exact correctness: equals predicate applied to the old snapshot
    assert(rows(Warehouse.read(spark, root)) ===
      rows(Warehouse.readVersion(spark, root, v1).filter(
        !(coalesce(col("bean_type") === "Criollo" &&
          col("quality_score") < lit(9.0), lit(false))))))
    // UPDATE on a non-partition column; partition-column SET is loud
    val v3 = Warehouse.updateWhereFiles(spark, root,
      col("bean_type") === "Forastero",
      Map("region" -> lit("Reassigned"))).get
    assert(rows(Warehouse.read(spark, root).filter(
      col("bean_type") === "Forastero").select("region")).toSet === Set("[Reassigned]"))
    val e = intercept[IllegalArgumentException] {
      Warehouse.updateWhereFiles(spark, root, lit(true),
        Map("bean_type" -> lit("X")))
    }
    assert(e.getMessage.contains("partition column"))
    // MERGE: updates + inserts, untouched partition files carried
    val m3 = manifest(root, v3)
    val src = Warehouse.read(spark, root).filter(col("bean_type") === "Trinitario")
      .limit(3).withColumn("quality_score", lit(1.23))
      .unionByName(batch(7, n = 2, idOffset = 900))
      .localCheckpoint(true)
    val v4 = Warehouse.mergeFiles(spark, root, src)
    val m4 = manifest(root, v4)
    assert(m3.filterNot(_.contains("bean_type=Trinitario")).count(m4.contains) > 0,
      "some untouched partition files must ride the merge verbatim")
    assert(Warehouse.read(spark, root)
      .filter(col("quality_score") === 1.23).count() === 3)
    assert(Warehouse.read(spark, root).count() ===
      Warehouse.readVersion(spark, root, v3).count() + 2)
  }

  test("stats skipping composes with partition pruning on one scan") {
    val root = freshRoot()
    // 2 partitions × 4 quality-ranged files each
    Warehouse.appendFiles(spark, root,
      batch(8, n = 400).filter(col("bean_type").isin("Criollo", "Forastero"))
        .repartitionByRange(8, col("bean_type"), col("quality_score")),
      partitionBy = Seq("bean_type"))
    val cur = Warehouse.currentVersion(spark, root).get
    val total = Warehouse.dataFilesOf(spark, root, cur).size
    val q = Warehouse.read(spark, root)
      .filter(col("bean_type") === "Criollo" && col("quality_score") > lit(9.5))
    val planned = scannedFiles(q)
    val perPart = Warehouse.dataFilesOf(spark, root, cur)
      .count(_.contains("bean_type=Criollo"))
    assert(planned < perPart,
      s"stats must prune WITHIN the surviving partition ($planned/$perPart of $total)")
    assert(rows(q) === rows(spark.read.format("graft").load(root)
      .filter(col("bean_type") === "Criollo" && col("quality_score") > lit(9.5))
      .select(q.columns.map(col).toSeq: _*)))
  }

  test("null partition values round-trip (__HIVE_DEFAULT_PARTITION__)") {
    import spark.implicits._
    val root = freshRoot()
    Warehouse.appendFiles(spark, root,
      Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("b")))
        .toDF("id", "k"), partitionBy = Seq("k"))
    Warehouse.appendFiles(spark, root,
      Seq((4L, Option.empty[String])).toDF("id", "k"))
    val got = Warehouse.read(spark, root,
      org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))
    assert(got.filter(col("k").isNull).select("id").collect()
      .map(_.getLong(0)).toSet === Set(2L, 4L))
    assert(spark.read.format("graft").load(root)
      .filter(col("k").isNull).count() === 2)
  }

  test("time travel, feeds and vacuum pinning hold on a partitioned manifest chain") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(9, n = 60), Seq("region"))
    val v1 = Warehouse.appendFiles(spark, root, batch(10, n = 10, idOffset = 800))
    val v2 = Warehouse.deleteWhereFiles(spark, root,
      col("quality_score") < lit(8.0)).get
    // time travel: each version exact
    assert(Warehouse.readVersion(spark, root, 0L).count() === 60)
    assert(Warehouse.readVersion(spark, root, v1).count() === 70)
    assert(Warehouse.readVersion(spark, root, v2).count() ===
      Warehouse.readVersion(spark, root, v1)
        .filter(!(col("quality_score") < lit(8.0)) || col("quality_score").isNull)
        .count())
    // feed of the append takes the O(Δ) path and equals the full diff
    Warehouse.publishChangeFeed(spark, root, v1)
    val feed = Warehouse.readChangeFeed(spark, root, v1)
    assert(feed.filter(col("change_type") === "insert").count() === 10)
    // region (the partition col) must be REAL in the feed images, not null
    assert(feed.filter(col("new_image.region").isNull).count() === 0,
      "partition values must surface in feed images on the O(Δ) path")
  }
}
