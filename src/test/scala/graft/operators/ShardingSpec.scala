package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Training-shard writer: conservation (every input doc in exactly
  * one shard), determinism (re-writing yields a byte-identical
  * manifest), physical layout (one sorted file per shard), and
  * manifest-vs-input consistency. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus = graft.core.Tables.documents(spark, dir)
    .select("doc_id", "text")

  test("shards conserve the corpus: every tokenizable doc in exactly one shard") {
    val outDir = graft.core.RunTemp.dir("graft_shards_spec_")
    val shards = Sharding.writeShards(corpus, "doc_id", "text", 4, outDir)
    val expected = corpus
      .filter(col("text").isNotNull && graft.functions.TextFunctions.tokenCount(col("text")) > 0)
    assert(shards.count() === expected.count())
    assert(shards.select("doc_id").distinct().count() === expected.count())
    // shard really is fingerprint mod N
    val bad = shards.filter(
      pmod(col("fp"), lit(4L)) =!= col("shard").cast("long")).count()
    assert(bad === 0L)
  }

  test("re-writing the same corpus reproduces the manifest exactly") {
    val m1 = Sharding.manifest(
      Sharding.writeShards(corpus, "doc_id", "text", 4,
        graft.core.RunTemp.dir("graft_shards_spec_")), "doc_id")
      .orderBy("shard").collect().toSeq
    val m2 = Sharding.manifest(
      Sharding.writeShards(corpus, "doc_id", "text", 4,
        graft.core.RunTemp.dir("graft_shards_spec_")), "doc_id")
      .orderBy("shard").collect().toSeq
    assert(m1 === m2)
    assert(m1.nonEmpty)
  }

  test("each shard is one file, internally sorted by (fp, id)") {
    val outDir = graft.core.RunTemp.dir("graft_shards_spec_")
    Sharding.writeShards(corpus, "doc_id", "text", 4, outDir)
    val shardDirs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    for (d <- shardDirs) {
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} should hold exactly one file")
      val rows = spark.read.parquet(files.head.getPath)
        .select("fp", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows === rows.sorted, s"${d.getName} not sorted by (fp, doc_id)")
    }
  }

  test("append equals rebuild: manifests match, only touched shards gain a file") {
    import org.apache.spark.sql.functions.concat
    val increment = corpus.filter(col("doc_id") < 30 && col("text").isNotNull)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" appendmark")).as("text"))

    val incDir = graft.core.RunTemp.dir("graft_shards_spec_")
    Sharding.writeShards(corpus, "doc_id", "text", 4, incDir)
    def filesPerShard(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    val before = filesPerShard(incDir)
    val combined = Sharding.appendShards(increment, "doc_id", "text", 4, incDir)
    val after = filesPerShard(incDir)

    val rebuildDir = graft.core.RunTemp.dir("graft_shards_spec_")
    val rebuilt = Sharding.writeShards(corpus.unionByName(increment),
      "doc_id", "text", 4, rebuildDir)

    val mAppend = Sharding.manifest(combined, "doc_id")
      .orderBy("shard").collect().toSeq
    val mRebuild = Sharding.manifest(rebuilt, "doc_id")
      .orderBy("shard").collect().toSeq
    assert(mAppend === mRebuild, "append must lose nothing vs a full rebuild")

    // every appended doc landed; each touched shard gained exactly one
    // file, untouched shards kept theirs byte-for-byte
    val incCount = increment.count()
    assert(combined.count() === corpus.filter(col("text").isNotNull &&
      graft.functions.TextFunctions.tokenCount(col("text")) > 0).count() + incCount)
    after.foreach { case (sh, n) =>
      assert(n === before(sh) || n === before(sh) + 1, s"$sh went $n files")
    }
  }

  test("append refuses a mismatched shard count and a non-layout dir") {
    import org.apache.spark.sql.functions.concat
    val inc = corpus.filter(col("doc_id") < 5 && col("text").isNotNull)
      .select((col("doc_id") + 600000L).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))
    val dir8 = graft.core.RunTemp.dir("graft_shards_spec_")
    Sharding.writeShards(corpus, "doc_id", "text", 8, dir8)
    val wrongN = intercept[IllegalArgumentException] {
      Sharding.appendShards(inc, "doc_id", "text", 4, dir8)
    }
    assert(wrongN.getMessage.contains("nShards=8"))
    val notALayout = graft.core.RunTemp.dir("graft_shards_spec_")
    val noLayout = intercept[IllegalArgumentException] {
      Sharding.appendShards(inc, "doc_id", "text", 8, notALayout)
    }
    assert(noLayout.getMessage.contains("_graft_shard_layout"))
  }

  test("manifest totals equal the corpus totals") {
    val outDir = graft.core.RunTemp.dir("graft_shards_spec_")
    val shards = Sharding.writeShards(corpus, "doc_id", "text", 4, outDir)
    val m = Sharding.manifest(shards, "doc_id")
    val Array(docsTotal, toksTotal) =
      m.agg(sum("n_docs"), sum("n_tokens")).head()
        .toSeq.map(_.asInstanceOf[Long]).toArray
    val expected = corpus
      .filter(col("text").isNotNull && graft.functions.TextFunctions.tokenCount(col("text")) > 0)
      .agg(count(lit(1)), sum(graft.functions.TextFunctions.tokenCount(col("text"))))
      .head()
    assert(docsTotal === expected.getLong(0))
    assert(toksTotal === expected.getLong(1))
  }
}
