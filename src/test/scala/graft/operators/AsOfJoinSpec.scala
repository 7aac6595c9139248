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
}
