package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** RENAME COLUMN × manifest commits — the round-13 composition: a
  * rename atop a manifest chain commits a MAP, not a compact (the
  * Delta column-mapping shape). Physical names stay on disk forever;
  * every later manifest commit carries the map forward and translates
  * logical ⇄ physical at its boundaries; time travel stays
  * era-correct through the chain. */
class ManifestRenameSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_mrename").toString
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
  private val renamedSchema = org.apache.spark.sql.types.StructType(
    CocoaSchema.warehouse.fields.map(f =>
      if (f.name == "region") f.copy(name = "zone") else f))

  test("rename atop a manifest chain is METADATA-ONLY: lines verbatim, zero data written") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(1, n = 40).repartition(4))
    val v1 = Warehouse.appendFiles(spark, root, batch(2, n = 10, idOffset = 100))
    val m1 = manifest(root, v1)
    val v2 = Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val m2 = manifest(root, v2)
    assert(m2 === m1, "the rename version carries the file list VERBATIM")
    val fs = hfs(root)
    assert(!fs.exists(new Path(Warehouse.versionPath(root, v2), "_CLONE")),
      "a manifest rename needs no clone pointer — the manifest IS the data")
    assert(Warehouse.manifestOf(fs, root, v2).isDefined)
    // reads translate through BOTH doors
    val scala0 = Warehouse.readMapped(spark, root)
    assert(scala0.columns.contains("zone") && !scala0.columns.contains("region"))
    assert(scala0.count() === 50)
    val conn = spark.read.format("graft").load(root)
    assert(conn.columns.contains("zone") && !conn.columns.contains("region"))
    assert(conn.filter(col("zone").isNotNull).count() === 50)
    // rows identical under the new name
    assert(rows(conn.select(col("zone"))) ===
      rows(Warehouse.readVersion(spark, root, v1).select(col("region"))
        .withColumnRenamed("region", "zone")))
  }

  test("manifest DML AFTER a rename translates: append/delete/merge under logical names, physical bytes") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(3, n = 40).repartition(4))
    Warehouse.appendFiles(spark, root, batch(4, n = 10, idOffset = 200))
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    // APPEND with the logical name
    val incoming = batch(5, n = 5, idOffset = 300).withColumnRenamed("region", "zone")
    val v3 = Warehouse.appendFiles(spark, root, incoming)
    assert(Warehouse.readMapped(spark, root).count() === 55)
    // the fresh files carry the PHYSICAL name (uniform file set)
    val freshFiles = manifest(root, v3).filter(_.startsWith(s"v$v3/"))
      .map(l => hfs(root).makeQualified(
        new Path(root, l.split("\t", 2).head)).toString)
    assert(freshFiles.nonEmpty)
    assert(spark.read.parquet(freshFiles: _*).columns.contains("region"),
      "fresh files land under PHYSICAL names — the Delta column-mapping contract")
    // an append still naming the OLD name is loud
    val e = intercept[IllegalArgumentException] {
      Warehouse.appendFiles(spark, root, batch(6, n = 1, idOffset = 400))
    }
    assert(e.getMessage.contains("zone"),
      s"dropping the renamed column must name it, got: ${e.getMessage}")
    // DELETE with a logical-name predicate, carried lines verbatim
    val mBefore = manifest(root, v3)
    val v4 = Warehouse.deleteWhereFiles(spark, root,
      col("zone") === lit("Volta")).getOrElse(
      fail("fixture must contain Volta rows"))
    val m4 = manifest(root, v4)
    assert(mBefore.toSet.intersect(m4.toSet).nonEmpty,
      "untouched files ride the renamed delete by reference")
    assert(Warehouse.readMapped(spark, root)
      .filter(col("zone") === "Volta").count() === 0)
    // MERGE keyed under the logical schema
    val src = Warehouse.readMapped(spark, root).limit(3)
      .withColumn("quality_score", lit(1.11)).localCheckpoint(true)
    Warehouse.mergeFiles(spark, root, src)
    assert(Warehouse.readMapped(spark, root)
      .filter(col("quality_score") === 1.11).count() === 3)
    // UPDATE under logical names
    Warehouse.updateWhereFiles(spark, root, col("zone") === lit("Ashanti"),
      Map("zone" -> lit("Reassigned")))
    assert(Warehouse.readMapped(spark, root)
      .filter(col("zone") === "Ashanti").count() === 0)
  }

  test("time travel through a renamed manifest chain stays era-correct") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(7, n = 20))
    val v1 = Warehouse.appendFiles(spark, root, batch(8, n = 5, idOffset = 500))
    val v2 = Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val v3 = Warehouse.appendFiles(spark, root,
      batch(9, n = 5, idOffset = 600).withColumnRenamed("region", "zone"))
    // pre-rename era: old names
    assert(Warehouse.readVersionLive(spark, root, v1).columns.contains("region"))
    // post-rename eras: new names, counts exact
    assert(Warehouse.readVersionLive(spark, root, v2).columns.contains("zone"))
    assert(Warehouse.readVersionLive(spark, root, v2).count() === 25)
    assert(Warehouse.readVersionLive(spark, root, v3).count() === 30)
    assert(Warehouse.readVersionLive(spark, root, v3).columns.contains("zone"))
    // connector versionAsOf agrees
    assert(spark.read.format("graft").option("versionAsOf", v1.toString)
      .load(root).columns.contains("region"))
    assert(spark.read.format("graft").option("versionAsOf", v3.toString)
      .load(root).columns.contains("zone"))
    // compact folds the chain AND materializes the logical names
    Warehouse.compact(spark, root)
    val cur = Warehouse.currentVersion(spark, root).get
    assert(Warehouse.manifestOf(hfs(root), root, cur).isEmpty)
    val flat = Warehouse.read(spark, root, renamedSchema)
    assert(flat.count() === 30 && flat.columns.contains("zone"))
  }

  test("rename of the PARTITION column on a partitioned manifest: fragments stay physical, pruning stays live") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(10, n = 100), Seq("region"))
    Warehouse.appendFiles(spark, root, batch(11, n = 20, idOffset = 700))
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val conn = spark.read.format("graft").load(root)
    assert(conn.columns.contains("zone"))
    val prunedBefore = graft.sources.v2.ZoneMapFileIndex.filesPruned.sum()
    val hit = conn.filter(col("zone") === lit("Volta"))
    val n = hit.count()
    assert(graft.sources.v2.ZoneMapFileIndex.filesPruned.sum() > prunedBefore,
      "a logical-name partition predicate must still prune at planning")
    assert(n === Warehouse.readMapped(spark, root,
      schema = CocoaSchema.warehouse)
      .filter(col("zone") === "Volta").count())
    // DML keyed on the renamed partition column
    val v = Warehouse.deleteWhereFiles(spark, root,
      col("zone") === lit("Volta")).get
    assert(spark.read.format("graft").load(root)
      .filter(col("zone") === "Volta").count() === 0)
    assert(manifest(root, v).nonEmpty)
  }

  test("sidecar widening survives a manifest rename (coverage checked in logical space)") {
    val root = freshRoot()
    val base = new java.io.File(root).getParent
    Warehouse.commit(spark, root, batch(20, n = 20))
    graft.sources.v2.GraftCatalog.writeProps(hfs(root), root,
      Map("mergeKey" -> "shipment_id", "commitMode" -> "manifest"))
    spark.conf.set("spark.sql.catalog.graft_mrw_gate",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mrw_gate.base", base)
    val tbl = s"graft_mrw_gate.`${new java.io.File(root).getName}`"
    batch(21, n = 5, idOffset = 300).createOrReplaceTempView("mrw_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM mrw_src") // manifest conversion
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN region TO zone")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (grade STRING)")
    // the declared widening must survive table re-resolution: the
    // sidecar holds LOGICAL names (zone, grade) while the manifest's
    // persisted schema holds PHYSICAL ones (region) — a physical-name
    // coverage check would silently drop the sidecar and 'grade'
    val cols = spark.sql(s"SELECT * FROM $tbl").columns
    assert(cols.contains("zone") && cols.contains("grade") &&
      !cols.contains("region"),
      s"widened+renamed schema must surface, got ${cols.mkString(", ")}")
    assert(spark.sql(s"SELECT grade FROM $tbl WHERE grade IS NULL").count() === 25)
  }

  test("an EMPTIED renamed+partitioned manifest keeps its logical names and layout") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(22, n = 30), Seq("region"))
    Warehouse.appendFiles(spark, root, batch(23, n = 5, idOffset = 400))
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    Warehouse.deleteWhereFiles(spark, root, lit(true)).getOrElse(
      fail("delete-everything must publish"))
    val t = spark.read.format("graft").load(root)
    assert(t.count() === 0)
    assert(t.columns.contains("zone") && !t.columns.contains("region"),
      s"an emptied chain must keep its LOGICAL names, got ${t.columns.mkString(", ")}")
    // and a later append under the logical name still lands
    Warehouse.appendFiles(spark, root,
      batch(24, n = 3, idOffset = 500).withColumnRenamed("region", "zone"))
    assert(spark.read.format("graft").load(root).count() === 3)
  }

  test("feeds stay publishable across a manifest rename (empty at the boundary, era-translated after)") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(12, n = 20))
    val v1 = Warehouse.appendFiles(spark, root, batch(13, n = 5, idOffset = 800))
    val v2 = Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val v3 = Warehouse.appendFiles(spark, root,
      batch(14, n = 4, idOffset = 900).withColumnRenamed("region", "zone"))
    Warehouse.publishChangeFeed(spark, root, v2, schema = renamedSchema)
    assert(Warehouse.readChangeFeed(spark, root, v2).count() === 0,
      "a metadata-only rename changes no rows")
    Warehouse.publishChangeFeed(spark, root, v3, schema = renamedSchema)
    val feed = Warehouse.readChangeFeed(spark, root, v3)
    assert(feed.count() === 4)
    assert(feed.filter(col("new_image.zone").isNull).count() === 0,
      "the renamed column must be REAL in the feed images (not null-filled)")
  }
}
