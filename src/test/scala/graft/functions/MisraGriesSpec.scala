package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Misra–Gries heavy-hitters aggregate: exact regime (capacity ≥
  * distinct items — what the q51 gate hashes), and the DECREMENT /
  * MERGE regime's hard guarantees, which are the operator's actual
  * contract at scale: every reported count is a lower bound
  * undercounting by at most n/(k+1), and every item more frequent
  * than n/(k+1) is reported. Counter VALUES in the bound regime
  * legitimately depend on the partition merge tree — only the bounds
  * are order-invariant — so the spec asserts the bounds, never
  * specific decremented values. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sketch(items: Seq[Long], capacity: Int,
      partitions: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = items.toDF("x").repartition(partitions)
    df.agg(MisraGriesAgg.mgSketch(col("x"), capacity).as("sk"))
      .selectExpr("explode(sk) AS h").select("h.item", "h.cnt_lb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("exact regime: capacity ≥ distinct items ⇒ counters are true counts") {
    val items = Seq.fill(7)(1L) ++ Seq.fill(4)(2L) ++ Seq.fill(9)(3L) ++ Seq(4L)
    for (parts <- Seq(1, 4)) {
      val got = sketch(items, capacity = 8, partitions = parts)
      assert(got === Map(1L -> 7L, 2L -> 4L, 3L -> 9L, 4L -> 1L),
        s"exact regime broke at partitions=$parts")
    }
  }

  test("bound regime: undercount ≤ n/(k+1); every true hitter is present") {
    // zipf-ish stream: item i appears 2^(10-i) times, i = 1..10, plus
    // 200 singletons — far more distinct items than capacity
    val heavy = (1 to 10).flatMap(i => Seq.fill(1 << (10 - i))(i.toLong))
    val noise = (1000L until 1200L)
    val items = new scala.util.Random(42).shuffle((heavy ++ noise).toVector).toSeq
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    for (capacity <- Seq(8, 32); parts <- Seq(1, 7)) {
      val got = sketch(items, capacity, parts)
      val slack = n / (capacity + 1)
      assert(got.size <= capacity, "sketch exceeded capacity")
      got.foreach { case (item, cnt) =>
        val t = truth(item)
        assert(cnt <= t, s"cap=$capacity parts=$parts: $item over-counted ($cnt > $t)")
        assert(t - cnt <= slack,
          s"cap=$capacity parts=$parts: $item undercount ${t - cnt} > n/(k+1)=$slack")
      }
      truth.foreach { case (item, t) =>
        if (t > slack)
          assert(got.contains(item),
            s"cap=$capacity parts=$parts: true hitter $item (count $t) missing")
      }
    }
  }

  test("output order is (cnt_lb desc, item asc); rows are structs") {
    import spark.implicits._
    val df = (Seq.fill(3)(7L) ++ Seq.fill(3)(2L) ++ Seq(9L)).toDF("x")
    val arr = df.agg(MisraGriesAgg.mgSketch(col("x"), 8))
      .head().getSeq[Row](0)
    assert(arr.map(r => (r.getLong(0), r.getLong(1))) ===
      Seq((2L, 3L), (7L, 3L), (9L, 1L)))
  }

  test("type misuse fails at analysis time") {
    import spark.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("s").agg(MisraGriesAgg.mgSketch(col("s"), 4)).collect()
    }
    assert(err.getMessage.contains("BIGINT"))
  }
}
