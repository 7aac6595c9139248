package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** AsOfJoin semantics on hand-built cases: latest-at-or-before match,
  * simultaneous rows visible, no-prior-row → null, key isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of picks the greatest right ts <= left ts per key") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 10L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 20L, 300.0),
      (2L, 50L, 999.0))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "ts",
      Map("ts" -> "r_ts", "v" -> "r_v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got === Set(
      (1L, 10L, "a", Some(10L), Some(200.0)), // simultaneous right row visible
      (1L, 25L, "b", Some(20L), Some(300.0)), // latest at-or-before
      (2L, 10L, "c", None, None)))            // right rows only in the future
  }

  test("matched right row attaches atomically — its null fields stay null") {
    // The matched right row (ts=20) has v=null. Per-column fills would
    // stitch v=100.0 from the OLDER row while tag comes from ts=20;
    // native ASOF semantics attach the whole matched row, nulls
    // included.
    val left = Seq((1L, 25L)).toDF("k", "ts")
    val right = Seq((1L, 5L, Some(100.0), "old"), (1L, 20L, None, "new"))
      .toDF("k", "ts", "v", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "ts",
      Map("v" -> "r_v", "tag" -> "r_tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3))).toSet
    assert(got === Set((1L, 25L, None, "new")))
  }

  test("right rows tied on (key, ts) resolve deterministically") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 10L, "c"))
      .toDF("k", "ts", "tag")
    // Tie-break orders by the payload struct: the LAST in payload
    // order wins. Repartitioning the right side must not change the
    // winner.
    val r1 = AsOfJoin.asOf(left, right, "k", "ts", "ts",
      Map("tag" -> "r_tag")).collect().map(_.getString(2)).toSeq
    val r2 = AsOfJoin.asOf(left, right.repartition(7), "k", "ts", "ts",
      Map("tag" -> "r_tag")).collect().map(_.getString(2)).toSeq
    assert(r1 === Seq("c") && r2 === Seq("c"))
  }
}
