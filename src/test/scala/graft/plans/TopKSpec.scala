package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The custom TopKPerKey plan node: result-equality with the window
  * formulation (incl. ties and null ordering values), and the plan
  * property that justifies its existence — no per-partition sort. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("equals row_number window on the orders fixture") {
    val native = graft.operators.Relational
      .nativeTopOrders(spark, "/root/testdata/sf0.001").collect()
    val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(native.length === windowed.length)
    assert(native.map(_.toString).toSeq === windowed.map(_.toString).toSeq)
  }

  test("nulls sort last and ties break on the tiebreaker") {
    val df = Seq(
      (1L, 10L, Some(5.0)), (1L, 11L, Some(5.0)), (1L, 12L, Some(7.0)),
      (1L, 13L, None), (2L, 20L, None), (2L, 21L, None))
      .toDF("k", "id", "v")
    val got = TopK.topKPerKey(df, Seq("k"), "v", 2, tieBreakers = Seq("id"))
      .orderBy("k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // key 1: 7.0 then the 5.0 tie broken by smaller id; nulls last.
    // key 2: only nulls exist, so they fill the k slots (id order).
    assert(got === Seq((1L, 10L), (1L, 12L), (2L, 20L), (2L, 21L)))
  }

  test("property: equals the window formulation on arbitrary data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.choose(1L, 12L)
      id <- Gen.choose(1L, 500L)
      v <- Gen.option(Gen.choose(0, 50).map(_.toDouble))
    } yield (k, id, v)
    val listGen = Gen.listOfN(300, rowGen)
    (1 to 5).foreach { i =>
      val rows = listGen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
        .distinctBy(r => (r._1, r._2)) // unique (k, id) => total order
      val df = rows.toDF("k", "id", "v")
      val kk = 1 + i % 4
      val native = TopK.topKPerKey(df, Seq("k"), "v", kk, tieBreakers = Seq("id"))
        .orderBy("k", "id").collect().map(_.toString).toSeq
      val w = Window.partitionBy("k").orderBy(col("v").desc_nulls_last, col("id").asc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= kk).drop("rn")
        .orderBy("k", "id").collect().map(_.toString).toSeq
      assert(native === windowed, s"seed $i k=$kk")
    }
  }

  test("spill path: a few-KB budget forces segment merges, same result") {
    // ~3k rows, 40 keys, duplicated (k, id) scores across inserts; a
    // 4 KB budget forces many sorted spill segments per partition, so
    // the k-way merge path (incl. same key spanning segments and the
    // per-group emit cap) produces the answer.
    val rows = (1 to 3000).map { i =>
      val k = i % 40L
      val id = (i * 7919L) % 1000L
      (k, k * 100000 + id, ((i * 31) % 100).toDouble)
    }.distinctBy(r => (r._1, r._2))
    val df = rows.toDF("k", "id", "v").repartition(3)
    val spilled = TopK.topKPerKey(df, Seq("k"), "v", 5, tieBreakers = Seq("id"),
      maxHeldBytes = 4096)
      .orderBy("k", "id").collect().map(_.toString).toSeq
    val inMemory = TopK.topKPerKey(df, Seq("k"), "v", 5, tieBreakers = Seq("id"))
      .orderBy("k", "id").collect().map(_.toString).toSeq
    val w = Window.partitionBy("k").orderBy(col("v").desc_nulls_last, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("k", "id").collect().map(_.toString).toSeq
    assert(inMemory === windowed)
    assert(spilled === windowed)
  }

  test("spill path: k larger than any key's rows loses nothing") {
    val rows = (1 to 500).map(i => (i % 7L, i.toLong, (i % 13).toDouble))
    val df = rows.toDF("k", "id", "v").repartition(2)
    val spilled = TopK.topKPerKey(df, Seq("k"), "v", 1000, tieBreakers = Seq("id"),
      maxHeldBytes = 2048)
      .orderBy("k", "id").collect().map(_.toString).toSeq
    assert(spilled === df.orderBy("k", "id").collect().map(_.toString).toSeq)
  }

  test("bottomKPerKey equals the ascending window formulation") {
    val df = Seq(
      (1L, 10L, Some(5.0)), (1L, 11L, Some(5.0)), (1L, 12L, Some(7.0)),
      (1L, 13L, None), (2L, 20L, Some(1.0)), (2L, 21L, None), (2L, 22L, Some(0.5)))
      .toDF("k", "id", "v")
    val got = TopK.bottomKPerKey(df, Seq("k"), "v", 2, tieBreakers = Seq("id"))
      .orderBy("k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // ascending with NullsFirst mirrors asc_nulls_first: nulls are the
    // "smallest" values, then the real minima; ties break on id.
    val w = Window.partitionBy("k").orderBy(col("v").asc_nulls_first, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .orderBy("k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === windowed)
    assert(got === Seq((1L, 10L), (1L, 13L), (2L, 21L), (2L, 22L)))
  }

  test("plans as the custom operator with no sort, one exchange") {
    val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopK.topKPerKey(o, Seq("o_custkey"), "o_totalprice", 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "custom strategy did not plan the node")
    assert(!p.contains("Sort "), "bounded-heap operator must not sort partitions")
    assert(!p.contains("Window"), "must not fall back to the window formulation")
  }
}
