package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salting: result-equivalence with the unsalted operators plus a
  * measured reduction in per-partition concentration for a hot key. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of fact rows carry key 0 — one reducer would take ~all rows.
  // Every 7th v is null so count(v) and count(*) genuinely differ.
  private lazy val fact = spark.range(0, 20000)
    .select((when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 50)).as("k"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id")).as("v"))
  private lazy val dim = spark.range(0, 50)
    .select(col("id").as("k"), concat(lit("dim-"), col("id")).as("label"))

  test("salted join equals plain join") {
    val plain = fact.join(dim, Seq("k")).groupBy("k", "label")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedEquiJoin(fact, dim, "k", saltFactor = 8)
      .groupBy("k", "label")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }

  test("salting spreads the hot key across partitions") {
    def maxPartitionShare(df: org.apache.spark.sql.DataFrame): Double = {
      val sizes = df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
      sizes.max.toDouble / math.max(sizes.sum, 1)
    }
    val byKey = fact.repartition(8, col("k"))
    val byKeySalt = fact.withColumn("__salt", (rand(42) * 8).cast("int"))
      .repartition(8, col("k"), col("__salt"))
    val hot = maxPartitionShare(byKey)
    val spread = maxPartitionShare(byKeySalt)
    assert(hot > 0.85, f"unsalted hot partition holds $hot%.2f of rows")
    assert(spread < 0.35, f"salted max partition share $spread%.2f")
  }

  test("salted aggregate equals plain aggregate (count skips nulls)") {
    val plain = fact.groupBy("k")
      .agg(sum("v").as("sv"), count(col("v")).as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedAggregate(fact, Seq("k"),
      Map("sv" -> ("sum", "v"), "n" -> ("count", "v"),
        "mn" -> ("min", "v"), "mx" -> ("max", "v")), saltFactor = 8)
      .select("k", "sv", "n", "mn", "mx")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }
}
