package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Zone-map contract: pruning skips files on a clustered layout,
  * pruned results equal the full-scan filter, staleness and coverage
  * violations are loud, and null stats drop soundly. */
class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def stagedTable(): (String, org.apache.spark.sql.types.StructType) = {
    import spark.implicits._
    val path = Files.createTempDirectory("zonemap").toString
    val df = (0L until 1000L).map(i => (i, i % 100, s"t${i % 3}"))
      .toDF("id", "k", "tag")
    df.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(path)
    (path, df.schema)
  }

  test("pruning skips most files on a range layout; pruned == full filter") {
    val (path, schema) = stagedTable()
    ZoneMap.build(spark, path, schema, Seq("k"))
    val files = ZoneMap.selectFiles(spark, path, "k", lit(10L), lit(19L))
    assert(files.nonEmpty && files.size < 8,
      s"a 10% slab on a range layout must skip files, read ${files.size}/8")
    val pruned = ZoneMap.prunedRead(spark, path, schema, "k", lit(10L), lit(19L))
      .collect().map(_.getLong(0)).sorted
    val full = spark.read.schema(schema).parquet(path)
      .filter(col("k").between(10L, 19L)).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === full.toSeq)
  }

  test("an out-of-domain range selects nothing and returns an empty, schema'd frame") {
    val (path, schema) = stagedTable()
    ZoneMap.build(spark, path, schema, Seq("k"))
    val r = ZoneMap.prunedRead(spark, path, schema, "k", lit(5000L), lit(6000L))
    assert(r.count() === 0L)
    assert(r.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
  }

  test("a stale index (file appended after build) refuses to serve") {
    import spark.implicits._
    val (path, schema) = stagedTable()
    ZoneMap.build(spark, path, schema, Seq("k"))
    // append a new data file the index has never seen
    Seq((9999L, 15L, "t0")).toDF("id", "k", "tag")
      .coalesce(1).write.mode("append").parquet(path)
    val err = intercept[IllegalArgumentException] {
      ZoneMap.selectFiles(spark, path, "k", lit(0L), lit(1L))
    }
    assert(err.getMessage.contains("stale zone map"))
    // rebuild heals it, and the appended row is found
    ZoneMap.build(spark, path, schema, Seq("k"))
    val got = ZoneMap.prunedRead(spark, path, schema, "k", lit(15L), lit(15L))
      .collect().map(_.getLong(0))
    assert(got.contains(9999L))
  }

  test("missing index and uncovered column are loud") {
    val (path, schema) = stagedTable()
    val e1 = intercept[IllegalArgumentException] {
      ZoneMap.selectFiles(spark, path, "k", lit(0L), lit(1L))
    }
    assert(e1.getMessage.contains("no zone map"))
    ZoneMap.build(spark, path, schema, Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      ZoneMap.selectFiles(spark, path, "id", lit(0L), lit(1L))
    }
    assert(e2.getMessage.contains("does not cover"))
  }

  test("refresh summarizes only the new files and keeps pruning exact") {
    import spark.implicits._
    val (path, schema) = stagedTable()
    ZoneMap.build(spark, path, schema, Seq("k"))
    assert(ZoneMap.refresh(spark, path, schema, Seq("k")) === 0,
      "a current index refreshes as a no-op")
    Seq((9999L, 15L, "t0")).toDF("id", "k", "tag")
      .coalesce(1).write.mode("append").parquet(path)
    assert(ZoneMap.refresh(spark, path, schema, Seq("k")) === 1,
      "exactly the one appended file is summarized")
    val got = ZoneMap.prunedRead(spark, path, schema, "k", lit(15L), lit(15L))
      .collect().map(_.getLong(0))
    assert(got.contains(9999L), "the refreshed index serves the appended row")
    val err = intercept[IllegalArgumentException] {
      ZoneMap.refresh(spark, path, schema, Seq("id"))
    }
    assert(err.getMessage.contains("do not match"))
  }

  test("bloom index: point probes prune to ~1 file and never miss the owner") {
    import spark.implicits._
    val path = Files.createTempDirectory("bloomidx").toString
    val df = (0L until 2000L).map(i => (i, s"p$i")).toDF("id", "payload")
    // hash layout: every file spans the whole id range — min/max
    // cannot discriminate, the bloom must
    df.repartition(8, col("id")).write.mode("overwrite").parquet(path)
    ZoneMap.buildBloom(spark, path, df.schema, "id")
    // no false negatives, exact results, real pruning, across many keys
    var filesOpened = 0
    for (key <- 0L until 200L by 13L) {
      val files = ZoneMap.selectFilesByKey(spark, path, "id", key)
      filesOpened += files.size
      val got = ZoneMap.pointRead(spark, path, df.schema, "id", key)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((key, s"p$key")), s"key $key must round-trip")
    }
    val probes = (0L until 200L by 13L).size
    assert(filesOpened < probes * 3,
      s"bloom should pin probes to ~1 of 8 files, opened $filesOpened/$probes probes")
    // absent key: usually zero files, never a wrong row
    assert(ZoneMap.pointRead(spark, path, df.schema, "id", 999999L).count() === 0L)
    // wrong column is loud
    val err = intercept[IllegalArgumentException] {
      ZoneMap.selectFilesByKey(spark, path, "payload", 1L)
    }
    assert(err.getMessage.contains("covers"))
  }

  test("bloom index: staleness (file appended after build) refuses to serve") {
    import spark.implicits._
    val path = Files.createTempDirectory("bloomidx_stale").toString
    val df = (0L until 100L).map(i => (i, s"p$i")).toDF("id", "payload")
    df.repartition(2, col("id")).write.mode("overwrite").parquet(path)
    ZoneMap.buildBloom(spark, path, df.schema, "id")
    Seq((5000L, "new")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(path)
    val err = intercept[IllegalArgumentException] {
      ZoneMap.selectFilesByKey(spark, path, "id", 5000L)
    }
    assert(err.getMessage.contains("stale bloom index"))
  }

  test("all-null stats files are dropped — sound for range predicates") {
    import spark.implicits._
    val path = Files.createTempDirectory("zonemap_null").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    Seq((1L, Some(5L)), (2L, Some(6L))).toDF("id", "k")
      .coalesce(1).write.mode("append").parquet(path)
    Seq((3L, None: Option[Long]), (4L, None: Option[Long])).toDF("id", "k")
      .coalesce(1).write.mode("append").parquet(path)
    ZoneMap.build(spark, path, schema, Seq("k"))
    val got = ZoneMap.prunedRead(spark, path, schema, "k", lit(0L), lit(10L))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L), "null-k rows never match a range")
  }
}
