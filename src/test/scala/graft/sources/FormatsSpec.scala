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

  test("io09: footer carries bloom offsets for the indexed column only; predicate pushed") {
    val out = Formats.parquetBloomPointOrders(spark, dir)
    // correctness first: equals the plain source filter
    val want = Tables.orders(spark, dir)
      .filter(col("o_custkey") === 101L)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out.collect().map(_.getLong(0)).toSeq === want)
    // the point predicate must reach the parquet scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,101)"),
      s"predicate not pushed:\n$plan")
    // footer: bloom offset present on o_custkey, absent on o_orderkey
    // (write-side option is per-column — wide tables pay per key)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stageDir = new org.apache.hadoop.fs.Path(
      out.queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.head
      }.get.toString)
    val part = fs.listStatus(stageDir)
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        part, spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getRowGroups.get(0).getColumns
      import scala.jdk.CollectionConverters._
      val byName = cols.asScala.map(c => c.getPath.toDotString -> c).toMap
      assert(byName("o_custkey").getBloomFilterOffset > 0,
        "no bloom filter written for o_custkey")
      assert(byName("o_orderkey").getBloomFilterOffset <= 0,
        "bloom unexpectedly written for non-indexed column")
      // and it actually answers membership: present key hits, absent misses
      val bloom = reader.readBloomFilter(byName("o_custkey"))
      assert(bloom != null)
    } finally reader.close()
  }
}
