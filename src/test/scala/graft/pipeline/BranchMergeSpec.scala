package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Three-way branch merge: disjoint edits fold cleanly (including
  * branch-side deletes), identical edits on both sides converge, real
  * divergence aborts loudly before anything publishes, and the fork
  * contract (branch v0 = the clone) is honored through the pointer. */
class BranchMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_branch").toString
  private def batch(seed: Int, n: Int = 80, idOffset: Long = 0L) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
      new Timestamp(1000000L))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq
  private def fork(): (String, String) = {
    val main = freshRoot(); val br = freshRoot()
    Warehouse.commit(spark, main, batch(41))
    Warehouse.cloneShallow(spark, main, br)
    (main, br)
  }

  test("disjoint edits merge cleanly; branch deletes propagate") {
    val (main, br) = fork()
    // main updates keys 0-9 (new processed_at stamp)
    Warehouse.commit(spark, main, Merge.upsertShipments(
      Warehouse.read(spark, main),
      Enrich.enrich(CocoaGen.shipments(spark, 10, seed = 42),
        new Timestamp(2000000L))))
    // branch DELETES keys 70-79 (content commit without them) and
    // inserts keys 100-104
    val pruned = Warehouse.read(spark, br)
      .filter(expr("CAST(substring(shipment_id, 6) AS BIGINT)") < 70)
    Warehouse.commit(spark, br, pruned.unionByName(
      Enrich.enrich(CocoaGen.shipments(spark, 5, seed = 43, idOffset = 100),
        new Timestamp(3000000L))))
    val v = Warehouse.mergeBranch(spark, main, br)
    val merged = Warehouse.read(spark, main)
    assert(Warehouse.currentVersion(spark, main) === Some(v))
    assert(merged.count() === 80 - 10 + 5, "deletes and inserts must both apply")
    // main's own edits survived
    val stamps = merged.filter(expr("CAST(substring(shipment_id, 6) AS BIGINT)") < 10)
      .select("processed_at").distinct().collect().map(_.getTimestamp(0).getTime)
    assert(stamps.toSeq === Seq(2000000L), "main-side updates must survive the merge")
    // deleted keys are gone
    assert(merged.filter(
      expr("CAST(substring(shipment_id, 6) AS BIGINT) >= 70 AND " +
        "CAST(substring(shipment_id, 6) AS BIGINT) < 80")).count() === 0)
  }

  test("identical edits on both sides converge; true divergence is loud and publishes nothing") {
    val (main, br) = fork()
    val sameEdit = Enrich.enrich(CocoaGen.shipments(spark, 5, seed = 44),
      new Timestamp(2000000L))
    Warehouse.commit(spark, main, Merge.upsertShipments(
      Warehouse.read(spark, main), sameEdit))
    Warehouse.commit(spark, br, Merge.upsertShipments(
      Warehouse.read(spark, br), sameEdit))
    // identical images ⇒ clean merge
    Warehouse.mergeBranch(spark, main, br)
    val converged = rows(Warehouse.read(spark, main))

    // now a REAL divergence on key 0: different quality on each side
    val (main2, br2) = fork()
    def edit(q: Double, ts: Long) = Enrich.enrich(
      CocoaGen.shipments(spark, 1, seed = 45), new Timestamp(ts))
      .withColumn("quality_score", lit(q))
    Warehouse.commit(spark, main2, Merge.upsertShipments(
      Warehouse.read(spark, main2), edit(1.0, 2000000L)))
    Warehouse.commit(spark, br2, Merge.upsertShipments(
      Warehouse.read(spark, br2), edit(9.0, 3000000L)))
    val before = Warehouse.currentVersion(spark, main2)
    val e = intercept[IllegalStateException] {
      Warehouse.mergeBranch(spark, main2, br2)
    }
    assert(e.getMessage.contains("BOTH sides"), e.getMessage)
    assert(Warehouse.currentVersion(spark, main2) === before,
      "a conflicted merge must publish nothing")
    assert(converged.nonEmpty)
  }
}
