package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.Warehouse

/** Incremental aggregate maintenance ≡ full recompute, exercised over
  * every change class a CDC feed can carry: insert into an existing
  * group, insert creating a NEW group, delete shrinking a group,
  * delete EMPTYING a group (it must vanish from the view), an update
  * that changes the measure in place, an update that MOVES a row
  * across groups (retract old group + assert new group), a null
  * group key, and untouched groups passing through. The p09 gate
  * certifies the same equivalence against DuckDB on the real
  * warehouse; this spec pins the corner semantics the fixture may
  * not produce (deletes never occur in the append-only cocoa run).
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id, group, cents)
  private val v0 = Seq(
    ("a", "east", 100L), ("b", "east", 250L),   // east: survives, updated
    ("c", "west", 300L),                        // moves to east in v1
    ("d", "gone", 400L), ("e", "gone", 50L),    // group emptied in v1
    ("f", null, 70L),                           // null group, untouched
    ("g", "calm", 999L)                         // whole group untouched
  )
  private val v1 = Seq(
    ("a", "east", 100L), ("b", "east", 275L),   // b: in-place measure update
    ("c", "east", 300L),                        // group move west -> east
    ("f", null, 70L),
    ("g", "calm", 999L),
    ("h", "west", 20L),                         // insert into now-empty west
    ("i", "new", 5L)                            // insert creating a group
  )

  private def df(rows: Seq[(String, String, Long)]): DataFrame =
    rows.toDF("id", "grp", "cents")

  private def recompute(rows: DataFrame): DataFrame =
    rows.groupBy($"grp").agg(sum($"cents").as("cents"), count(lit(1)).as("n"))

  private def canon(d: DataFrame): Set[(Option[String], Long, Long)] =
    d.select($"grp", $"cents", $"n").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet

  test("maintained view equals full recompute across all change classes") {
    val changes = Warehouse.diffImages(df(v0), df(v1), Seq("id"))
    val maintained = IncrementalAgg.maintain(
      recompute(df(v0)), changes, "grp",
      Seq("cents" -> (img => img.getField("cents"))), "n")
    assert(canon(maintained) === canon(recompute(df(v1))))
  }

  test("emptied group vanishes; moved row retracts from its old group") {
    val changes = Warehouse.diffImages(df(v0), df(v1), Seq("id"))
    val out = canon(IncrementalAgg.maintain(
      recompute(df(v0)), changes, "grp",
      Seq("cents" -> (img => img.getField("cents"))), "n"))
    assert(!out.exists(_._1.contains("gone")), "count-zero group must drop")
    assert(out.contains((Some("west"), 20L, 1L)), "west = only the new insert")
    assert(out.contains((Some("east"), 675L, 3L)), "east absorbed the move + update")
    assert(out.contains((None, 70L, 1L)), "null group passes through untouched")
  }

  test("empty change feed is the identity") {
    val changes = Warehouse.diffImages(df(v0), df(v0), Seq("id"))
    assert(changes.isEmpty)
    val out = IncrementalAgg.maintain(recompute(df(v0)), changes, "grp",
      Seq("cents" -> (img => img.getField("cents"))), "n")
    assert(canon(out) === canon(recompute(df(v0))))
  }

  test("diffImages carries both images with the right nullness per class") {
    val changes = Warehouse.diffImages(df(v0), df(v1), Seq("id"))
      .select($"id", $"change_type", $"old_image".isNull.as("on"),
        $"new_image".isNull.as("nn"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(changes("h") === (("insert", true, false)))
    assert(changes("d") === (("delete", false, true)))
    assert(changes("b") === (("update", false, false)))
    assert(changes("c") === (("update", false, false)), "group move is an update")
    assert(!changes.contains("a"), "unchanged rows emit no change event")
  }
}
