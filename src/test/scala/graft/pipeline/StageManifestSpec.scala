package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multi-format staging roundtrips + JSON manifest control plane. */
class StageManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("staging roundtrips preserve data across parquet/orc/json/csv") {
    val root = Files.createTempDirectory("stage").toString
    val df = CocoaGen.shipments(spark, 200, seed = 7)
    val expected = df.count()
    Stage.formats.foreach { fmt =>
      val dir = s"$root/$fmt"
      Stage.write(df, dir, fmt)
      val back = Stage.read(spark, dir, fmt, Some(CocoaSchema.input))
      assert(back.count() === expected, s"$fmt row count")
      assert(back.schema.fieldNames.toSeq === CocoaSchema.input.fieldNames.toSeq, s"$fmt schema")
      // key set survives the roundtrip
      assert(back.select("shipment_id").distinct().count() ===
        df.select("shipment_id").distinct().count(), s"$fmt keys")
      // numeric content survives (sum of weights is format-exact: longs)
      assert(back.agg(sum("shipment_weight_kg")).head.getLong(0) ===
        df.agg(sum("shipment_weight_kg")).head.getLong(0), s"$fmt weights")
    }
  }

  test("manifest write/read/batches reproduce the reference control plane") {
    val root = Files.createTempDirectory("manifest").toString
    CocoaGen.writeLandingFiles(spark, s"$root/landing", 7, 50, seed = 9)
    val files = Manifest.discoverAndWrite(spark, s"$root/landing", s"$root/manifests/found.json")
    assert(files.size === 7)
    val readBack = Manifest.read(spark, s"$root/manifests/found.json")
    assert(readBack.sorted === files.sorted)
    val bs = Manifest.batches(readBack, 5) // reference BATCH_SIZE=5
    assert(bs.map(_.size) === Seq(5, 2))
    // the manifested files are exactly what ingest would read
    val (df, disc) = Ingest.ingest(spark, s"$root/landing")
    assert(disc.valid.sorted === files.sorted)
    assert(df.get.count() === 350)
  }

  test("empty landing produces no manifest and reads as empty") {
    val root = Files.createTempDirectory("manifest_empty").toString
    val files = Manifest.discoverAndWrite(spark, s"$root/landing", s"$root/m.json")
    assert(files.isEmpty)
  }
}
