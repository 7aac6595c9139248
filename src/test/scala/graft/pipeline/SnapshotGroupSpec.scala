package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Consistent snapshot groups: the cross-table pin holds while member
  * tables keep committing (repeatable multi-table reads), republish
  * advances it, and every correct-or-loud contract (pruned member,
  * unknown member, never-published group) actually throws. */
class SnapshotGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_group").toString
  private def batch(seed: Int, n: Int = 120) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed), new Timestamp(1000000L))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def aggOf(root: String) =
    Warehouse.read(spark, root)
      .groupBy("region").agg(count(lit(1)).as("n"),
        sum(col("shipment_value_usd")).as("v"))

  test("the pin holds across member commits; republish advances; pair stays consistent") {
    val facts = freshRoot(); val agg = freshRoot(); val group = freshRoot()
    Warehouse.commit(spark, facts, batch(21))
    Warehouse.commit(spark, agg, aggOf(facts))
    val g0 = Warehouse.publishSnapshotGroup(spark, group,
      Map("facts" -> facts, "agg" -> agg))
    assert(g0 === 0L)
    val aggSchema = aggOf(facts).schema // the agg table's OWN schema
    val factsV0 = rows(Warehouse.read(spark, facts))
    val aggV0 = rows(Warehouse.read(spark, agg, aggSchema))

    // both members advance; the group must NOT move
    Warehouse.commit(spark, facts, batch(22))
    Warehouse.commit(spark, agg, aggOf(facts))
    assert(rows(Warehouse.readGroupMember(spark, group, "facts")) === factsV0,
      "group read observed a commit made after the pin")
    assert(rows(Warehouse.readGroupMember(spark, group, "agg", aggSchema)) === aggV0)
    // the PAIR is consistent: recomputing the aggregate from the
    // group's facts matches the group's agg byte-for-byte — while the
    // members' CURRENT versions have both moved on
    val pinnedFacts = Warehouse.readGroupMember(spark, group, "facts")
    val recomputed = pinnedFacts.groupBy("region")
      .agg(count(lit(1)).as("n"), sum(col("shipment_value_usd")).as("v"))
    assert(rows(recomputed) === aggV0, "pinned pair is not internally consistent")
    assert(rows(Warehouse.read(spark, facts)) !== factsV0, "facts should have moved")

    // republish: the group advances to the new co-existing pair
    val g1 = Warehouse.publishSnapshotGroup(spark, group,
      Map("facts" -> facts, "agg" -> agg))
    assert(g1 === 1L)
    assert(rows(Warehouse.readGroupMember(spark, group, "facts")) ===
      rows(Warehouse.read(spark, facts)))
  }

  test("a vacuumed pinned member fails loudly, never reads empty") {
    val facts = freshRoot(); val group = freshRoot()
    Warehouse.commit(spark, facts, batch(23, n = 40))
    Warehouse.publishSnapshotGroup(spark, group, Map("facts" -> facts))
    // push enough commits that v0 falls outside the retention floor
    Warehouse.commit(spark, facts, batch(24, n = 40))
    Warehouse.commit(spark, facts, batch(25, n = 40))
    Warehouse.vacuum(spark, facts, keepLast = 2)
    val e = intercept[IllegalStateException] {
      Warehouse.readGroupMember(spark, group, "facts").collect()
    }
    assert(e.getMessage.contains("vacuumed") || e.getMessage.contains("missing"))
  }

  test("unknown member and never-published group are loud") {
    val facts = freshRoot(); val group = freshRoot()
    Warehouse.commit(spark, facts, batch(26, n = 20))
    intercept[IllegalStateException] {
      Warehouse.snapshotGroupMembers(spark, group)
    }
    Warehouse.publishSnapshotGroup(spark, group, Map("facts" -> facts))
    val e = intercept[IllegalArgumentException] {
      Warehouse.readGroupMember(spark, group, "nope")
    }
    assert(e.getMessage.contains("nope"))
    // publishing with a memberless root is loud too
    val e2 = intercept[IllegalStateException] {
      Warehouse.publishSnapshotGroup(spark, freshRoot(),
        Map("empty" -> freshRoot()))
    }
    assert(e2.getMessage.contains("no committed snapshot"))
  }
}
