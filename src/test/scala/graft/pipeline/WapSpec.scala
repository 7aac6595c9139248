package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Audit.RowCheck

/** Write-audit-publish: a staged snapshot that fails its audit must
  * never become a version (no version dir, no pointer, no staging
  * residue), the exception must carry the exact violation counts, and
  * a clean snapshot under the same checks must publish untouched. */
class WapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_wap").toString
  private def batch(seed: Int, n: Int = 40) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed), new Timestamp(1000000L))
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private val checks = Seq(
    RowCheck("quality_not_null", col("quality_score").isNull),
    RowCheck("quality_in_range",
      col("quality_score") < 0.0 || col("quality_score") > 10.0),
    RowCheck("weight_positive", col("shipment_weight_kg") <= 0.0))

  test("a failing audit aborts the commit and leaves the root pristine") {
    val root = freshRoot()
    // every row violates exactly one check: heavy shipments get a
    // NULL quality (null-check violation, and NULL exempts the range
    // check per SQL semantics), the rest go out of range
    val poisoned = batch(1).withColumn("quality_score",
      when(col("shipment_weight_kg") > 500.0, lit(null).cast("double"))
        .otherwise(lit(-1.0)))
    val err = intercept[Warehouse.WapAuditException] {
      Warehouse.commitAudited(spark, root, poisoned, checks, Some(Seq("shipment_id")))
    }
    val report = err.report.toMap
    // every row is either nulled (heavy) or set to -1.0 (the rest):
    // the two counts partition the batch exactly
    assert(report.getOrElse("quality_not_null", 0L)
      + report.getOrElse("quality_in_range", 0L) === 40L)
    assert(!report.contains("weight_positive"), "only non-zero counts reported")
    val fs = hfs(root)
    assert(Warehouse.currentVersion(spark, root) === None,
      "a rejected stage must not publish a version")
    val residue = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(n => n.startsWith("v") || n.startsWith(".v") || n == "_VERSION")
    assert(residue.isEmpty, s"no version or staging residue expected: ${residue.toSeq}")
  }

  test("duplicate keys are caught by the uniqueness check") {
    val root = freshRoot()
    val b = batch(2)
    val err = intercept[Warehouse.WapAuditException] {
      Warehouse.commitAudited(spark, root, b.unionByName(b.limit(7)),
        checks, Some(Seq("shipment_id")))
    }
    assert(err.report.toMap === Map("unique_key" -> 7L))
  }

  test("a clean snapshot publishes byte-identically under the same checks") {
    val root = freshRoot()
    val b = batch(3)
    assert(Warehouse.commitAudited(spark, root, b, checks,
      Some(Seq("shipment_id"))) === 0L)
    val back = Warehouse.read(spark, root)
    assert(back.count() === b.count())
    assert(back.exceptAll(b).count() === 0L, "published data must be untouched")
    // and the gate composes: a second, audited commit versions forward
    assert(Warehouse.commitAudited(spark, root, batch(4), checks,
      Some(Seq("shipment_id"))) === 1L)
  }
}
