package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The portable Bloom filter kernels: the distributed build (partial
  * buffers + word-OR merge across partitions) must equal a plain-Scala
  * bitset simulation bit-for-bit, the probe must run inside generated
  * code, and type misuse must fail at analysis, not at runtime. The
  * cross-engine certification lives in the q39 gate query. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val mBits = 1024
  private val k = 3

  private def referenceBitset(keys: Seq[Long]): Array[Byte] = {
    val ref = new Array[Byte](mBits >>> 3)
    for (key <- keys; j <- 0 until k) {
      val pos = BloomExpressions.bitPosition(key, j, mBits)
      ref(pos >>> 3) = (ref(pos >>> 3) | (1 << (pos & 7))).toByte
    }
    ref
  }

  test("distributed build equals the plain-Scala bitset (update + merge paths)") {
    import spark.implicits._
    val keys = (1L to 400L).map(_ * 7919L)
    // 8 partitions force per-task partial buffers and the word-OR
    // merge; a merge bug (wrong offset, missed word) flips bits
    val built = keys.toDF("key").repartition(8)
      .agg(BloomExpressions.bloomBuild(col("key"), mBits, k))
      .head.getAs[Array[Byte]](0)
    assert(built.toSeq === referenceBitset(keys).toSeq)
  }

  test("null keys contribute nothing") {
    import spark.implicits._
    val keys = Seq(Some(3L), None, Some(99L), None)
    val built = keys.toDF("key").repartition(2)
      .agg(BloomExpressions.bloomBuild(col("key"), mBits, k))
      .head.getAs[Array[Byte]](0)
    assert(built.toSeq === referenceBitset(Seq(3L, 99L)).toSeq)
  }

  test("probe: members always pass, flags equal the kernel, codegen engaged") {
    import spark.implicits._
    val members = (1L to 200L).map(_ * 104729L)
    val absent = (1L to 200L).map(_ * 104729L + 1L)
    val bloom = members.toDF("key").repartition(4)
      .agg(BloomExpressions.bloomBuild(col("key"), mBits, k).as("bloom"))
    val probeDf = (members ++ absent).toDF("key")
      .crossJoin(broadcast(bloom))
      .select(col("key"),
        BloomExpressions.bloomContains(col("bloom"), col("key"), mBits, k).as("pass"))
    val got = probeDf.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val ref = referenceBitset(members)
    (members ++ absent).foreach { key =>
      assert(got(key) === BloomExpressions.mightContain(ref, key, mBits, k), s"key $key")
    }
    members.foreach(key => assert(got(key), s"member $key must pass"))
    // the probe must ride whole-stage codegen via the static kernel
    // call, not fall out to interpreted eval
    val s = org.apache.spark.sql.execution.debug.codegenString(
      probeDf.queryExecution.executedPlan)
    assert(s.contains("BloomExpressions.mightContain"),
      "probe did not generate the static kernel call")
  }

  test("non-BIGINT key fails at analysis time, not execution") {
    import spark.implicits._
    val strings = Seq("a", "b").toDF("key")
    val buildErr = intercept[AnalysisException] {
      strings.agg(BloomExpressions.bloomBuild(col("key"), mBits, k)).collect()
    }
    assert(buildErr.getMessage.toLowerCase.contains("type"))
    val longs = Seq(1L).toDF("key")
    val bloom = longs.agg(BloomExpressions.bloomBuild(col("key"), mBits, k).as("bloom"))
    val probeErr = intercept[AnalysisException] {
      strings.crossJoin(broadcast(bloom))
        .select(BloomExpressions.bloomContains(col("bloom"), col("key"), mBits, k))
        .collect()
    }
    assert(probeErr.getMessage.toLowerCase.contains("type"))
  }
}
