package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Table loading: driver-side footer inference must agree with
  * Spark's own inference, and non-single-file layouts (partitioned
  * directories) must fall back to it. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("footer-inferred schema equals Spark's inference, zero jobs after memo") {
    for (name <- Seq("documents", "lineitem", "embeddings")) {
      val viaMemo = Tables.load(spark, sfDir, name).schema
      val viaSpark = spark.read.parquet(s"$sfDir/$name.parquet").schema
      assert(viaMemo === viaSpark, name)
    }
  }

  test("events loads with nanos-as-long conversion intact") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    assert(ev.limit(1).count() === 1)
  }

  test("events NTZ/timestamp cast refuses a non-UTC session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tz").toString
    spark.sql("SELECT 1L AS event_id, timestamp'2024-01-02 03:04:05' AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val offZone = spark.newSession()
    offZone.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalStateException] { Tables.events(offZone, dir) }
    assert(e.getMessage.contains("timeZone"))
    // the same table through a UTC session is fine
    assert(Tables.events(spark, dir).count() === 1)
  }

  test("a directory 'table' falls back to distributed inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl").toString
    val df = spark.range(10).selectExpr("id", "id * 2 AS v")
    df.write.mode("overwrite").parquet(s"$dir/dirtable.parquet")
    val back = Tables.load(spark, dir, "dirtable")
    // parquet read-back marks columns nullable; names/types must match
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() === 10)
  }
}
