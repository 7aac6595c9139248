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

  // Descend AQE wrapper nodes (AdaptiveSparkPlanExec / query stages):
  // a plain plan.collect stops at stage boundaries and undercounts.
  private def collectAll[T](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, Seq[T]]): Seq[T] = p.collect {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectAll(a.executedPlan)(pf)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      collectAll(q.plan)(pf)
    case n if pf.isDefinedAt(n) => pf(n)
  }.flatten

  test("upsert plans a BROADCAST anti join; no shuffle above the bucketed target") {
    spark.sql("DROP TABLE IF EXISTS wh_bucketed2")
    val target = Enrich.enrich(CocoaGen.shipments(spark, 2000, seed = 23),
      new Timestamp(1000000L))
    Warehouse.commitBucketed(spark, "wh_bucketed2", target, nBuckets = 8)
    val updates = Enrich.enrich(
      CocoaGen.shipments(spark, 400, seed = 24, idOffset = 1800),
      new Timestamp(2000000L))
      .repartition(8, col(CocoaSchema.mergeKey))

    val merged = Merge.upsertShipments(spark.table("wh_bucketed2"), updates)
    merged.collect()
    val plan = merged.queryExecution.executedPlan

    // 1. The anti join runs as BroadcastHashJoin(LeftAnti): the daily
    //    batch's key set broadcasts, the 100 TB target streams.
    val bhjAnti = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => Seq(j)
    }
    assert(bhjAnti.nonEmpty, s"expected BroadcastHashJoin(LeftAnti), plan:\n$plan")

    // 2. No shuffle exchange has the bucketed table's scan beneath it:
    //    only the update side (window dedup / its repartition) may
    //    shuffle in the merge. The descent below the exchange must go
    //    THROUGH AQE query-stage wrappers too (collectAll again), or a
    //    scan hidden inside a materialized child stage would escape.
    val shufflesOverTarget = collectAll(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if collectAll(e) {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
                if s.metadata.get("Location").exists(_.contains("wh_bucketed2")) =>
              Seq(s)
          }.nonEmpty => Seq(e)
    }
    assert(shufflesOverTarget.isEmpty,
      s"bucketed target side was re-shuffled:\n${shufflesOverTarget.mkString("\n")}")
    spark.sql("DROP TABLE IF EXISTS wh_bucketed2")
  }
}
