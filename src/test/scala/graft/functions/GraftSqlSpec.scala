package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The `graft_*` SQL function registry and the fluent syntax facade:
  * both surfaces must produce byte-identical results to the Column
  * API they delegate to. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def registered(): Unit = GraftFunctions.register(spark)

  test("graft_* SQL functions match the Column API") {
    registered()
    val texts = Seq("the quick brown fox", "el rio es muy largo", "", "  one  ")
    texts.toDF("text").createOrReplaceTempView("t_sql_spec")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(text) AS sim,
        |  graft_simhash64_portable(text) AS simp,
        |  graft_tokenize(text) AS toks,
        |  graft_shingle_hashes(text, 3) AS sh,
        |  graft_minhash(text, 16, 3) AS mh
        |FROM t_sql_spec""".stripMargin).collect()
    val viaCol = texts.toDF("text").select(
      SketchExpressions.simhash64(TextFunctions.tokens(col("text"))).as("sim"),
      SketchExpressions.simhash64(TextFunctions.tokens(col("text")), portable = true).as("simp"),
      TextFunctions.tokens(col("text")).as("toks"),
      SketchExpressions.shingleHashes(col("text"), 3).as("sh"),
      SketchExpressions.minhashFromHashes(
        SketchExpressions.shingleHashes(col("text"), 3), 16).as("mh")).collect()
    viaSql.zip(viaCol).foreach { case (a, b) => assert(a === b) }
  }

  test("text-analysis kernels are SQL-callable and match the Column API") {
    registered()
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "el rio es muy largo y la casa es grande", "", "  one  ")
    texts.toDF("text").createOrReplaceTempView("t_text_spec")
    val viaSql = spark.sql(
      """SELECT graft_token_count(text) AS n,
        |  graft_quality_score(text) AS q,
        |  graft_lang_id(text) AS lang,
        |  graft_fingerprint64_portable(text) AS fp
        |FROM t_text_spec""".stripMargin).collect()
    val viaCol = texts.toDF("text").select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.fingerprintPortable64(col("text")).as("fp")).collect()
    viaSql.zip(viaCol).foreach { case (a, b) => assert(a === b) }
  }

  test("graft_float_dot and graft_lsh_bucket are SQL-callable") {
    registered()
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("t_vec_spec")
    val r = spark.sql(
      """SELECT graft_float_dot(a, b) AS d, graft_lsh_bucket(a, 4, 0) AS bk
        |FROM t_vec_spec""".stripMargin).head
    assert(r.getDouble(0) === 32.0)
    assert(r.getLong(1) >= 0L && r.getLong(1) < 16L)
  }

  test("tuning arguments must be literals") {
    registered()
    Seq("x").toDF("text").createOrReplaceTempView("t_lit_spec")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(text, length(text)) FROM t_lit_spec").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("wrong arity fails analysis with the function name and usage, never silently") {
    registered()
    Seq("x").toDF("text").createOrReplaceTempView("t_arity_spec")
    // extra argument: must NOT be silently ignored
    val extra = intercept[Exception] {
      spark.sql("SELECT graft_token_count(text, 7) FROM t_arity_spec").collect()
    }
    assert(extra.getMessage.contains("graft_token_count") &&
      extra.getMessage.contains("exactly 1"), extra.getMessage)
    // zero arguments: a clear arity error, not a bare NoSuchElementException
    val zero = intercept[Exception] {
      spark.sql("SELECT graft_lang_id() FROM t_arity_spec").collect()
    }
    assert(zero.getMessage.contains("graft_lang_id") &&
      zero.getMessage.contains("exactly 1"), zero.getMessage)
  }

  test("GraftExtensions injects every registration without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext) // throws on malformed registration
  }

  test("syntax facade delegates to the operators") {
    import graft.syntax._
    val docs = Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "something else entirely here")).toDF("doc_id", "text")
    assert(docs.dedupExact("doc_id", "text").count() === 2)
    assert(docs.exactDedupGroups("doc_id", "text").count() === 2)
    val scored = docs.withQualityScore("text").withTokenCount("text")
    assert(scored.columns.contains("quality") && scored.columns.contains("n_tokens"))
    val emb = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0.01f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val knn = emb.knnTopK("vec_id", "embedding", 1)
    assert(knn.filter(col("query_id") === 0 && col("nbr_id") === 1).count() === 1)
    // graph + decontamination facades: two triangles and a bridge
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("u", "v")
    assert(edges.triangleCounts().count() === 6)
    assert(edges.labelPropagation(4)
      .select("label").distinct().count() === 2)
    assert(edges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
      .pageRank(2).count() === 6)
    val frac = docs.decontaminationFractions(n = 2, benchBelow = 1L)
    assert(frac.filter(col("doc_id") === 1L).head().getBoolean(4),
      "doc 1 duplicates the benchmark doc verbatim")
  }
}
