package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The bucketed-warehouse merge path: correctness plus the plan-level
  * guarantee that the bucketed (big) side is NOT re-shuffled — the
  * core co-location optimization for a 100 TB keyed merge. */
class BucketedMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def exchanges(plan: SparkPlan): Int =
    plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }.size

  test("bucketed target merges without re-shuffling the big side") {
    spark.sql("DROP TABLE IF EXISTS wh_bucketed")
    val target = Enrich.enrich(CocoaGen.shipments(spark, 2000, seed = 21),
      new Timestamp(1000000L))
    Warehouse.commitBucketed(spark, "wh_bucketed", target, nBuckets = 8)

    // keys 1800..2199: 200 overlap the target's 0..1999, 200 are new
    val updates = Enrich.enrich(
      CocoaGen.shipments(spark, 400, seed = 22, idOffset = 1800),
      new Timestamp(2000000L))
      // pre-shuffle updates into the target's bucket layout
      .repartition(8, col(CocoaSchema.mergeKey))

    val tbl = spark.table("wh_bucketed")
    val merged = Merge.upsertShipments(tbl, updates)
    assert(merged.count() === 2200, "2000 existing ∪ 400 updates with 200 overlapping → 2200 keys")

    // Plan check on the anti-join half (the big-side probe): the scan
    // of the bucketed table must feed the join with NO shuffle on the
    // target side.
    val anti = tbl.join(updates.select(col(CocoaSchema.mergeKey)),
      Seq(CocoaSchema.mergeKey), "left_anti")
    anti.collect()
    val plan = anti.queryExecution.executedPlan
    val nEx = exchanges(plan)
    assert(nEx <= 1, s"expected at most the updates-side shuffle, got $nEx exchanges:\n$plan")
    spark.sql("DROP TABLE IF EXISTS wh_bucketed")
  }
}
