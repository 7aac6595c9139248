package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B micro-benchmarks for session-level knobs (shuffle
  * codec/compression, AQE, partition counts) on the calibration-row
  * workloads — used to attribute machine-level cost dimensions before
  * touching operator code. Usage:
  * `sbt "runMain graft.MicroBench [conf=k:v,...]"` */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = args.headOption.map(_.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2); (k, v)
    }.toSeq).getOrElse(Seq.empty)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val par = cpus.toInt
    def time(name: String)(f: => Unit): Unit = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name%-24s min=${samples.min}%6.3f  all=${samples.map(s => f"$s%.2f").mkString(",")}")
    }
    // warm
    spark.range(0L, 1000000L, 1L, par).select(sum(col("id"))).collect()
    time("cpu_400M_xxhash") {
      spark.range(0L, 400000000L, 1L, par)
        .select(sum(pmod(xxhash64(col("id")), lit(1000000L)))).collect(); ()
    }
    time("shuffle_30M_1Mgrp") {
      spark.range(0L, 30000000L, 1L, par)
        .select(pmod(xxhash64(col("id")), lit(1000000L)).as("k"))
        .groupBy("k").count().select(sum("count")).collect(); ()
    }
    time("join_4Mx4M") {
      val a = spark.range(0L, 4000000L, 1L, par)
        .select(pmod(xxhash64(col("id")), lit(4000000L)).as("k"))
      val b2 = spark.range(0L, 4000000L, 1L, par)
        .select(pmod(xxhash64(col("id") + 7L), lit(4000000L)).as("k"))
      a.join(b2, "k").select(sum(col("k"))).collect(); ()
    }
    spark.stop()
  }
}
