package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables

/** Z-order clustering: the Morton expression against a driver
  * reference, content preservation through the rewrite, and the
  * property the layout exists for — per-file min/max stats tight on
  * BOTH dimensions, so a selective predicate on either column rules
  * out most files (what Spark's row-group pruning and a lakehouse's
  * file skipping both consume). */
class ZorderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("morton expression matches the driver reference, including edges") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (32768L, 1L), (12345L, 54321L), (65535L, 0L), (0L, 65535L)) ++
      (0 until 50).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
    val got = pairs.toDF("x", "y")
      .select(Zorder.morton(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pairs.map { case (x, y) => Zorder.mortonRef(x, y) })
    // interleave never collides distinct (x, y) pairs
    assert(got.distinct.size === pairs.distinct.size)
  }

  test("clustered rewrite preserves content exactly") {
    val dir = "/root/testdata/sf0.001"
    val src = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.core.RunTemp.dir("graft_zorder_content_")
    Zorder.cluster(src, "user_id", "ts", nFiles = 8)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.schema(src.schema).parquet(out)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
  }

  test("z-order makes a narrow user_id predicate skip most files; a time sort skips none") {
    val dir = "/root/testdata/sf0.01" // 10k events, 150 users
    val src = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // 64 files gives the curve 6 leading bits — 3 per dimension — so
    // each file spans ~1/8 of the user key space; at 16 files (2 bits
    // per dim) a file spans a user QUARTER and a 20% slab can't skip
    // much (measured 12/16 — file-count resolution, not a curve flaw)
    val nFiles = 64
    val tsSorted = graft.core.RunTemp.dir("graft_zorder_naive_")
    src.repartitionByRange(nFiles, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(tsSorted)
    val zOrdered = graft.core.RunTemp.dir("graft_zorder_z_")
    Zorder.cluster(src, "user_id", "ts", nFiles)
      .write.mode("overwrite").parquet(zOrdered)
    // per-file stats — exactly what parquet footers carry and what
    // file-skipping consults
    def overlapping(path: String, lo: Long, hi: Long): Long =
      spark.read.schema(src.schema).parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("lo"), max("user_id").as("hi"))
        .filter(col("lo") <= hi && col("hi") >= lo)
        .count()
    val (lo, hi) = (70L, 84L) // 10% of the user key space
    val naive = overlapping(tsSorted, lo, hi)
    val z = overlapping(zOrdered, lo, hi)
    // time-sorted files each span ~the full user range: nothing skips
    assert(naive >= nFiles - 4, s"ts-sorted layout should not skip (overlap=$naive)")
    // the z-curve localizes the user dimension too: most files skip
    assert(z <= nFiles / 2, s"z-ordered overlap=$z of $nFiles — expected <= ${nFiles / 2}")
    assert(z * 2 < naive, s"z=$z vs naive=$naive — expected >= 2x fewer candidates")
  }
}
