package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The imperative kernels in [[SketchExpressions]] replace HOF
  * expression chains on the hot path; these tests pin each kernel to
  * the HOF formulation it replaced (the DuckDB oracles were written
  * against the HOF semantics, so equivalence IS the correctness
  * contract). */
class KernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edgeTexts = Seq(
    "The data pipeline processes input files",
    "", "   ", "one", "  two  words ", "a\tb\nc", "AB\fC\rD",
    "MiXeD CaSe TeXt", "电影非常精彩 值得一看", "Árvíztűrő tükörfúrógép",
    "a b", "x", "!!! ??? ...", "word  word  word",
    null.asInstanceOf[String])

  test("Tokenize kernel == filter(split(lower(trim(text)))) HOF chain") {
    val df = edgeTexts.toDF("text").select(
      TextFunctions.tokens(col("text")).as("kernel"),
      filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("ShingleHashes: cardinality matches distinct word shingles; sorted distinct") {
    val df = edgeTexts.toDF("text").select(
      SketchExpressions.shingleHashes(col("text"), 3).as("hs"),
      size(TextFunctions.wordShingles(col("text"), 3)).as("n_str"))
    df.collect().foreach { r =>
      val hs = if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
      hs match {
        // null text: kernel → null; the HOF chain yields [null]
        // (array(array_join(null))). Both are "no shingles" — each
        // pairing path filters null shingles before use.
        case None => assert(r.isNullAt(1) || r.getInt(1) === 1)
        case Some(h) =>
          assert(h === h.sorted, "sorted")
          assert(h.distinct === h, "distinct")
          assert(h.size === r.getInt(1), "same cardinality as string shingles")
      }
    }
  }

  test("SortedLongJaccard == |A∩B|/|A∪B| on string shingle sets") {
    val pairs = Seq(
      ("the quick brown fox jumps", "the quick brown fox leaps"),
      ("a b c d e", "a b c d e"),
      ("one two three", "four five six"),
      ("", ""), ("a b", "a b c d"))
    val df = pairs.toDF("ta", "tb").select(
      SketchExpressions.sortedLongJaccard(
        SketchExpressions.shingleHashes(col("ta"), 3),
        SketchExpressions.shingleHashes(col("tb"), 3)).as("kernel"),
      graft.operators.Dedup.jaccard(
        TextFunctions.wordShingles(col("ta"), 3),
        TextFunctions.wordShingles(col("tb"), 3)).as("hof"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("BandHashes: equal band slices collide, different slices don't") {
    val sigs = Seq(
      (Seq.fill(64)(7L), Seq.fill(64)(7L), true),
      (Seq.fill(64)(7L), Seq.fill(63)(7L) :+ 8L, false))
    sigs.foreach { case (a, b, lastBandEqual) =>
      val Array(ha, hb) = Seq(a, b).toDF("sig")
        .select(SketchExpressions.bandHashes(col("sig"), 16).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      assert(ha.take(15) === hb.take(15), "unchanged bands collide")
      assert((ha(15) === hb(15)) === lastBandEqual)
    }
  }

  test("TopCells ranks cells by true squared euclidean distance") {
    val centroids = Array(
      Array(0f, 0f), Array(10f, 0f), Array(0f, 10f), Array(10f, 10f))
    val df = Seq(Seq(1f, 1f), Seq(9f, 8f), Seq(0f, 6f)).toDF("vec")
      .select(SketchExpressions.topCells(col("vec"), centroids, 2).as("cells"))
    val got = df.collect().map(_.getSeq[Int](0).toSeq)
    assert(got(0) === Seq(0, 1) || got(0) === Seq(0, 2)) // (1,1): cell 0 first, 1/2 tie by id
    assert(got(0).head === 0)
    assert(got(1) === Seq(3, 1)) // (9,8): nearest 3, then 1
    assert(got(2) === Seq(2, 0)) // (0,6): nearest 2, then 0
  }

  test("TopCells tie-break is by cell id") {
    val centroids = Array(Array(1f, 0f), Array(-1f, 0f)) // equidistant from origin
    val got = Seq(Seq(0f, 0f)).toDF("vec")
      .select(SketchExpressions.topCells(col("vec"), centroids, 2).as("c"))
      .head.getSeq[Int](0).toSeq
    assert(got === Seq(0, 1))
  }

  test("every kernel expression: codegen path == interpreted path") {
    // Round 14 gave every kernel a doGenCode (whole-stage codegen was
    // disabled for any stage containing a CodegenFallback kernel).
    // Both paths call the same JVM kernel; this pins them to identical
    // outputs on the edge-case corpus, including nulls.
    val centroids = Array(Array(0f, 0f, 0f, 0f), Array(5f, 1f, -2f, 3f),
      Array(-4f, 2f, 0f, 7f))
    val codebooks = Array(
      Array(Array(0f, 0f), Array(1f, -1f), Array(-2f, 2f)),
      Array(Array(0f, 1f), Array(2f, 0f), Array(-1f, -1f)))
    val vecs = Seq(Seq(1f, 2f, 3f, 4f), Seq(-1f, 0f, 5f, 2f),
      Seq(0f, 0f, 0f, 0f), Seq(4.5f, 1.2f, -1.9f, 3.3f))
    val rows = edgeTexts.zipWithIndex.map { case (t, i) =>
      (t, Option(edgeTexts((i + 1) % edgeTexts.size)).getOrElse("fallback pair"),
        vecs(i % vecs.size), i % centroids.length)
    }
    def frame() = rows.toDF("ta", "tb", "vec", "cell").select(
      TextFunctions.tokens(col("ta")).as("toks"),
      SketchExpressions.shingleHashes(col("ta"), 3).as("sh"),
      SketchExpressions.portableShingleHashes(col("ta"), 3).as("psh"),
      SketchExpressions.simhash64(TextFunctions.tokens(col("ta"))).as("sim"),
      SketchExpressions.simhash64(TextFunctions.tokens(col("ta")), portable = true).as("simp"),
      SketchExpressions.minhashSignature(TextFunctions.tokens(col("ta")), 16, 3).as("mh"),
      SketchExpressions.minhashFromHashes(
        SketchExpressions.shingleHashes(col("ta"), 3), 16).as("mhh"),
      SketchExpressions.bandHashes(
        SketchExpressions.minhashSignature(TextFunctions.tokens(col("ta")), 16, 3), 4).as("bh"),
      SketchExpressions.portableFingerprint64(TextFunctions.tokens(col("ta"))).as("fp"),
      SketchExpressions.sortedLongJaccard(
        SketchExpressions.shingleHashes(col("ta"), 3),
        SketchExpressions.shingleHashes(col("tb"), 3)).as("jac"),
      SketchExpressions.signLshBucket(col("vec"), 8, 1).as("lsh"),
      SketchExpressions.topCells(col("vec"), centroids, 2).as("cells"),
      SketchExpressions.pqEncode(col("vec"), col("cell"), centroids, codebooks).as("pq"),
      SketchExpressions.pqAdcDistance(col("vec"), col("cell"),
        SketchExpressions.pqEncode(col("vec"), col("cell"), centroids, codebooks),
        centroids, codebooks).as("adc"),
      SketchExpressions.floatDot(col("vec"), col("vec")).as("dot"))
    val codegen = frame().collect()
    val conf = spark.conf
    val saved = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    val interpreted =
      try {
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        frame().collect()
      } finally {
        conf.set("spark.sql.codegen.wholeStage", saved._1)
        conf.set("spark.sql.codegen.factoryMode", saved._2)
      }
    assert(codegen.length === interpreted.length)
    codegen.zip(interpreted).foreach { case (a, b) => assert(a === b) }
  }
}
