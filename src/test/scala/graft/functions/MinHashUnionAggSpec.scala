package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The per-group MinHash union aggregate: correctness against a
  * driver-side reference fold, mergeability across partitions, the
  * SQL registration, and the partial-aggregation plan shape that
  * makes it a 100 TB-viable sketch. */
class MinHashUnionAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val numHashes = 16

  private def referenceSignature(texts: Seq[String]): Array[Long] = {
    // brute force: shingle-hash each text through the engine's own
    // expression, then fold mins in plain Scala
    val hashes = texts.toDF("text")
      .select(SketchExpressions.portableShingleHashes(col("text"), 3).as("sh"))
      .as[Seq[Long]].collect().flatten
    val seeds = MinHashUnionAgg.seeds(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    for (x <- hashes; s <- 0 until numHashes) {
      val z = mixRef(x ^ seeds(s))
      if (z < mins(s)) mins(s) = z
    }
    mins
  }

  // independent spelling of portableMix64 (the constants are the
  // public contract the oracle SQL also encodes)
  private def mixRef(x: Long): Long = {
    var z = x ^ (x >>> 33)
    z *= 4283543511L
    z ^= (z >>> 29)
    z *= 3301882366L
    z ^ (z >>> 32)
  }

  private val groupA = Seq("the quick brown fox jumps", "a quick brown dog sits")
  private val groupB = Seq("completely different content here now")

  private def fixture =
    (groupA.map(("a", _)) ++ groupB.map(("b", _))).toDF("grp", "text")

  private def signatures(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.select(col("grp"),
        SketchExpressions.portableShingleHashes(col("text"), 3).as("sh"))
      .groupBy("grp")
      .agg(SketchExpressions.minhashUnion(col("sh"), numHashes).as("sig"))
      .as[(String, Seq[Long])].collect().toMap

  test("group signature equals the driver-side reference fold") {
    val sigs = signatures(fixture)
    assert(sigs("a") == referenceSignature(groupA).toSeq)
    assert(sigs("b") == referenceSignature(groupB).toSeq)
  }

  test("partial/final merge across partitions changes nothing") {
    assert(signatures(fixture.repartition(7)) == signatures(fixture.coalesce(1)))
  }

  test("union sketch equals elementwise min of per-doc sketches") {
    val perDoc = groupA.map(t => referenceSignature(Seq(t)))
    val merged = perDoc.reduce((x, y) => x.zip(y).map { case (a, b) => math.min(a, b) })
    assert(signatures(fixture)("a") == merged.toSeq)
  }

  test("null and empty inputs: null arrays skipped, empty group identity") {
    val sigs = signatures(fixture.unionByName(
      Seq(("a", null: String)).toDF("grp", "text")))
    assert(sigs("a") == referenceSignature(groupA).toSeq)
  }

  test("SQL surface: graft_minhash_union over graft_shingle_hashes_portable") {
    GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      s"""SELECT grp, graft_minhash_union(graft_shingle_hashes_portable(text, 3), $numHashes) AS sig
         |FROM mh_docs GROUP BY grp""".stripMargin)
      .as[(String, Seq[Long])].collect().toMap
    assert(viaSql == signatures(fixture))
  }

  test("plan uses two-phase object hash aggregation (map-side partial)") {
    val plan = fixture
      .select(col("grp"), SketchExpressions.portableShingleHashes(col("text"), 3).as("sh"))
      .groupBy("grp")
      .agg(SketchExpressions.minhashUnion(col("sh"), numHashes).as("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_minhash_union"), plan)
  }
}
