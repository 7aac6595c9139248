package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables

/** Round-trip fidelity of the non-parquet formats: the io queries'
  * oracles certify this end-to-end per run, but these pin the
  * row-level property directly — the read-back frame equals the
  * source frame, value for value, including doubles (shortest-repr
  * text serialization) and quoted strings. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // sorted multiset, not a Set: a round-trip bug that DUPLICATES rows
  // (stale part-file, writer retry) must fail, not alias away
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("JSON round-trip is lossless for orders (keys, doubles, timestamps)") {
    val back = Formats.jsonRoundtripOrders(spark, dir)
    val src = Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 5000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    assert(back.schema == src.schema)
    assert(rows(back) == rows(src))
  }

  test("CSV round-trip is lossless for customer (quoted names, doubles)") {
    val back = Formats.csvRoundtripCustomer(spark, dir)
    val src = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .filter(col("c_custkey") <= 500)
    assert(back.schema == src.schema)
    assert(rows(back) == rows(src))
  }

  test("ORC round-trip aggregate equals the parquet-side aggregate") {
    val fromOrc = Formats.orcRoundtripAgg(spark, dir).collect().map(_.toString)
    val li = Tables.lineitem(spark, dir)
    val fromParquet = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(org.apache.spark.sql.functions.sum(col("l_quantity")).as("sum_qty"),
        (org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.floor(col("l_extendedprice") * 100 +
            org.apache.spark.sql.functions.lit(0.5))) / 100.0).as("sum_base_price"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString)
    assert(fromOrc.toSeq == fromParquet.toSeq)
  }

  test("schema evolution: old-generation rows fill the new column with null") {
    val merged = Formats.schemaEvolutionOrders(spark, dir)
    assert(merged.columns.toSet ===
      Set("o_orderkey", "o_custkey", "o_totalprice"))
    val src = Tables.orders(spark, dir).filter(col("o_orderkey") <= 20000)
    // every gen-1 (even-key) row null, every gen-2 (odd-key) row backfilled
    assert(merged.filter(col("o_orderkey") % 2 === 0 &&
      col("o_totalprice").isNotNull).count() === 0)
    assert(merged.filter(col("o_orderkey") % 2 === 1 &&
      col("o_totalprice").isNull).count() === 0)
    assert(merged.count() === src.count())
  }
}
