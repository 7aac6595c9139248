package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end batch pipeline: generate overlapping landing batches →
  * ingest → enrich → merge twice → assert idempotent counts, the
  * value formula, validation quarantine and the O19 aggregate
  * (SURVEY.md §7 "minimum end-to-end slice"). */
class CocoaPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshDirs(): CocoaPipeline.Dirs = {
    val root = Files.createTempDirectory("cocoa").toString
    CocoaPipeline.Dirs(s"$root/landing", s"$root/staging", s"$root/warehouse", s"$root/archive")
  }

  test("two overlapping batches merge idempotently with last writer winning") {
    val dirs = freshDirs()
    // batch 1: keys 0..499; batch 2: keys 250..749 (overlap 250..499)
    CocoaGen.writeLandingFiles(spark, dirs.landing, 2, 250, seed = 1, idOffset = 0)
    val r1 = CocoaPipeline.runBatch(spark, dirs, new Timestamp(1000000L))
    assert(r1.filesQuarantined.isEmpty)
    assert(r1.warehouseRows === 500)

    CocoaGen.writeLandingFiles(spark, dirs.landing, 2, 250, seed = 2, idOffset = 250)
    val r2 = CocoaPipeline.runBatch(spark, dirs, new Timestamp(2000000L))
    assert(r2.warehouseRows === 750, "750 distinct keys after overlap merge")

    val wh = Warehouse.read(spark, dirs.warehouse)
    assert(wh.select("shipment_id").distinct().count() === 750)
    // overlapped keys must carry batch-2's processed_at (last writer)
    val overlapped = wh.filter(col("shipment_id") >= "SHIP-0000000250" &&
      col("shipment_id") <= "SHIP-0000000499")
    assert(overlapped.filter(col("processed_at") =!= new Timestamp(2000000L)).count() === 0)

    // value formula: round(weight * 2.50, 2), null-free since weight is non-null
    val bad = wh.filter(
      abs(col("shipment_value_usd") - round(col("shipment_weight_kg") * 2.5, 2)) > 1e-9)
    assert(bad.count() === 0)

    // O19 aggregate surface over the warehouse
    val agg = wh.groupBy("region").agg(sum("shipment_value_usd").as("total"))
    assert(agg.count() > 0 && agg.count() <= CocoaGen.regions.size)

    // landing drained into archive
    assert(Ingest.discoverCsv(spark, dirs.landing).isEmpty)
    assert(r1.filesProcessed.nonEmpty && r2.filesProcessed.nonEmpty)
  }

  test("file missing a required column is quarantined whole; valid files still load") {
    val dirs = freshDirs()
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 100, seed = 3)
    // hand-write an invalid CSV (no shipment_id column)
    val badDir = new java.io.File(dirs.landing)
    val bad = new java.io.File(badDir, "bad_no_key.csv")
    val w = new java.io.PrintWriter(bad)
    w.println("timestamp,farm_id,region,bean_type,quality_score,shipment_weight_kg,temperature_celsius")
    w.println("2025-01-01T00:00:00,FARM-1,Ashanti,Criollo,8.0,1000,20.0")
    w.close()

    val r = CocoaPipeline.runBatch(spark, dirs)
    assert(r.filesQuarantined.map(p => p.substring(p.lastIndexOf('/') + 1)) === Seq("bad_no_key.csv"))
    assert(r.warehouseRows === 100, "valid file loads; invalid skipped whole, not row-wise")
  }

  test("reordered and quoted-header files load correctly by name") {
    val dirs = freshDirs()
    new java.io.File(dirs.landing).mkdirs()
    // columns deliberately NOT in schema order, header quoted, BOM'd —
    // positional binding would put farm_id into timestamp
    val f = new java.io.File(new java.io.File(dirs.landing), "reordered.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("﻿\"farm_id\",\"shipment_id\",\"region\",\"timestamp\",\"bean_type\",\"quality_score\",\"temperature_celsius\",\"shipment_weight_kg\"")
    w.println("FARM-7,SHIP-A,Ashanti,2025-01-02T03:04:05,Criollo,8.5,21.5,1200")
    w.println("FARM-8,SHIP-B,Volta,2025-01-03T04:05:06,Forastero,9.1,,900")
    w.close()
    val r = CocoaPipeline.runBatch(spark, dirs, new Timestamp(5000000L))
    assert(r.filesQuarantined.isEmpty && r.warehouseRows === 2)
    val wh = Warehouse.read(spark, dirs.warehouse)
    val a = wh.filter(col("shipment_id") === "SHIP-A").head
    assert(a.getAs[String]("farm_id") === "FARM-7")
    assert(a.getAs[Timestamp]("timestamp").toString.startsWith("2025-01-02"))
    assert(a.getAs[Long]("shipment_weight_kg") === 1200L)
    val b = wh.filter(col("shipment_id") === "SHIP-B").head
    assert(b.getAs[Any]("temperature_celsius") === null)
  }

  test("corrupt row VALUES null out; rows with unparseable keys drop (row-level O15 analogue)") {
    val dirs = freshDirs()
    new java.io.File(dirs.landing).mkdirs()
    val f = new java.io.File(new java.io.File(dirs.landing), "dirty_rows.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("shipment_id,timestamp,farm_id,region,bean_type,quality_score,shipment_weight_kg,temperature_celsius")
    w.println("SHIP-OK,2025-01-01T00:00:00,FARM-1,Ashanti,Criollo,8.0,1000,20.0")
    // unparseable numerics: cast -> null, row KEPT (header was valid,
    // and the reference never drops rows for value errors)
    w.println("SHIP-DIRTY,2025-01-01T01:00:00,FARM-2,Volta,Criollo,not_a_number,also_bad,20.0")
    // blank key: would violate the warehouse PK -> row dropped
    w.println(",2025-01-01T02:00:00,FARM-3,Ashanti,Criollo,8.5,1100,19.0")
    w.close()

    val r = CocoaPipeline.runBatch(spark, dirs, new Timestamp(7000000L))
    assert(r.filesQuarantined.isEmpty, "value-level dirt must not quarantine the file")
    assert(r.warehouseRows === 2, "good + nulled-values rows kept; keyless row dropped")
    val wh = Warehouse.read(spark, dirs.warehouse)
    val dirty = wh.filter(col("shipment_id") === "SHIP-DIRTY").head
    assert(dirty.getAs[Any]("quality_score") === null)
    assert(dirty.getAs[Any]("shipment_weight_kg") === null)
    assert(dirty.getAs[Any]("shipment_value_usd") === null,
      "derived value propagates the null, never fabricates a number")
  }

  test("warehouse recovers from a crash between snapshot write and pointer publish") {
    val dirs = freshDirs()
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 31)
    CocoaPipeline.runBatch(spark, dirs)
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 32, idOffset = 1000)
    CocoaPipeline.runBatch(spark, dirs)
    assert(Warehouse.currentVersion(spark, dirs.warehouse) === Some(1L))
    // simulate the crash window: pointer gone, snapshots intact
    val fs = new org.apache.hadoop.fs.Path(dirs.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dirs.warehouse, "_VERSION"), false)
    assert(Warehouse.currentVersion(spark, dirs.warehouse) === Some(1L),
      "recovered from complete snapshots, not read-as-empty")
    assert(Warehouse.read(spark, dirs.warehouse).count() === 100)
    // next commit must NOT reuse/overwrite version numbers
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 33, idOffset = 2000)
    CocoaPipeline.runBatch(spark, dirs)
    assert(Warehouse.currentVersion(spark, dirs.warehouse) === Some(2L))
    assert(Warehouse.read(spark, dirs.warehouse).count() === 150)
  }

  test("empty landing zone is a no-op (O2 branch)") {
    val dirs = freshDirs()
    val r = CocoaPipeline.runBatch(spark, dirs)
    assert(r.version.isEmpty && r.rowsMerged === 0)
    assert(Warehouse.read(spark, dirs.warehouse).count() === 0)
  }

  test("warehouse commit is versioned and vacuumable") {
    val dirs = freshDirs()
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 4)
    CocoaPipeline.runBatch(spark, dirs)
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 5, idOffset = 1000)
    CocoaPipeline.runBatch(spark, dirs)
    assert(Warehouse.currentVersion(spark, dirs.warehouse) === Some(1L))
    Warehouse.vacuum(spark, dirs.warehouse)
    assert(Warehouse.read(spark, dirs.warehouse).count() === 100)
  }

  test("a held commit lock fails the second committer loudly, and release unblocks it") {
    val dirs = freshDirs()
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 14)
    val fs = new org.apache.hadoop.fs.Path(dirs.warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(dirs.warehouse))
    val lock = new org.apache.hadoop.fs.Path(dirs.warehouse, "_COMMIT_LOCK")
    fs.create(lock, false).close() // a concurrent committer holds the lock
    val df = Enrich.enrich(CocoaGen.shipments(spark, 10, seed = 15),
      new java.sql.Timestamp(1000000L))
    val err = intercept[IllegalStateException] {
      Warehouse.commit(spark, dirs.warehouse, df)
    }
    assert(err.getMessage.contains("another commit holds"))
    // the failed attempt must NOT have deleted the other writer's lock
    assert(fs.exists(lock), "loser released a lock it never held")
    fs.delete(lock, false) // holder finishes
    assert(Warehouse.commit(spark, dirs.warehouse, df) === 0L)
  }

  test("snapshot isolation: a reader holding an old version is unaffected by a new commit") {
    val dirs = freshDirs()
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 11)
    CocoaPipeline.runBatch(spark, dirs)
    // resolve the snapshot BEFORE the next commit: read() pins the
    // version path at call time, and v-dirs are immutable until vacuum
    val held = Warehouse.read(spark, dirs.warehouse)
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 12, idOffset = 1000)
    CocoaPipeline.runBatch(spark, dirs)
    assert(held.count() === 50, "held reader still sees its own snapshot")
    assert(Warehouse.read(spark, dirs.warehouse).count() === 100,
      "fresh reader sees the new commit")
  }

  test("vacuum retention: pruned versions fail cleanly, the pointer survives, commits continue") {
    val dirs = freshDirs()
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 6)
    CocoaPipeline.runBatch(spark, dirs)
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 7, idOffset = 1000)
    CocoaPipeline.runBatch(spark, dirs)
    // time travel works pre-vacuum: v0 is the first batch alone
    val v0Path = Warehouse.versionPath(dirs.warehouse, 0L)
    assert(spark.read.schema(CocoaSchema.warehouse).parquet(v0Path).count() === 50)

    // keepLast=1 opts OUT of the default retention floor: this test is
    // about what a pruned version looks like to a late reader
    Warehouse.vacuum(spark, dirs.warehouse, keepLast = 1)

    // the pruned snapshot is GONE — a time-travel read must fail
    // loudly (missing path), not silently return rows from elsewhere
    val err = intercept[Exception] {
      spark.read.schema(CocoaSchema.warehouse).parquet(v0Path).count()
    }
    assert(err.getMessage != null && err.getMessage.toLowerCase.contains("path"),
      s"expected a missing-path failure, got: ${err.getMessage}")
    // the committed pointer still resolves and reads the live snapshot
    assert(Warehouse.currentVersion(spark, dirs.warehouse) === Some(1L))
    assert(Warehouse.read(spark, dirs.warehouse).count() === 100)
    // and the commit protocol keeps counting from the pointer — a
    // vacuumed history must never cause version-number reuse
    CocoaGen.writeLandingFiles(spark, dirs.landing, 1, 50, seed = 8, idOffset = 2000)
    CocoaPipeline.runBatch(spark, dirs)
    assert(Warehouse.currentVersion(spark, dirs.warehouse) === Some(2L))
    assert(Warehouse.read(spark, dirs.warehouse).count() === 150)
  }
}
