package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SQL `CREATE TABLE … AS SELECT` / `REPLACE TABLE … AS SELECT`
  * through [[graft.sources.v2.GraftCatalog]]: the V2 CTAS path calls
  * `createTable` then routes the seed write through the connector's
  * commit-protocol insert — no extra code, pinned here so a regression
  * in either half is loud. */
class CtasProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("CTAS creates, seeds and declares; RTAS replaces") {
    val base = java.nio.file.Files.createTempDirectory("graft_ctas").toString
    spark.conf.set("spark.sql.catalog.gwh_ctas", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwh_ctas.base", base)
    spark.range(10).toDF("id").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE gwh_ctas.t1 USING graft" +
      " TBLPROPERTIES('mergeKey'='id')" +
      " AS SELECT id, id * 2 AS v FROM ctas_src")
    val got = spark.sql("SELECT * FROM gwh_ctas.t1")
    assert(got.columns.toSeq === Seq("id", "v"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === (0L until 10L).map(i => (i, i * 2)))
    // the declared property survives the CTAS round-trip
    assert(graft.sources.v2.GraftCatalog.readProps(spark, s"$base/t1")
      .get("mergeKey") === Some("id"))
    // upsert ON the CTAS table works (the declared key resolves)
    spark.sql("INSERT INTO gwh_ctas.t1 VALUES (1, 100), (42, 84)")
    val after = spark.sql("SELECT * FROM gwh_ctas.t1")
    assert(after.count() === 11)
    assert(after.filter("id = 1").head().getLong(1) === 100L)
    // REPLACE TABLE AS SELECT swaps the content wholesale
    spark.sql("REPLACE TABLE gwh_ctas.t1 USING graft" +
      " AS SELECT id FROM ctas_src WHERE id < 3")
    assert(spark.sql("SELECT * FROM gwh_ctas.t1").count() === 3)
  }
}
