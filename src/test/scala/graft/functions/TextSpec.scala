package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables
import graft.operators.NorthStar

/** Text analysis: tokenization edge cases, language-ID accuracy on
  * the labeled fixture, fingerprint properties, multimodal plumbing. */
class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("tokens handle edges: empty, whitespace runs, leading/trailing") {
    val df = Seq("", "   ", "one", "  two  words ", "a\tb\nc").toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("gopher rules: every bit fires on its constructed violation") {
    // Each case is built so EXACTLY its target rule fires (the other
    // six verified clean by construction — e.g. mean word length kept
    // inside [3,10] wherever the violation is elsewhere).
    val clean = (1 to 50).map(i => s"the a of and words$i").mkString(" ")
    val longLine = "there with many fine words here again more text lines go now"
    val cases = Seq(
      (clean, 0L),                                                // keeps
      ("the a short doc", 1L),                                    // bit0: < 50 words
      ((1 to 60).map(_ => "supercalifragilistic").mkString(" ")
        + " the a", 2L),                                          // bit1: mean len > 10
      ((1 to 60).map(_ => "#there and with of").mkString(" "), 4L), // bit2: 60 '#' / 240 words
      (((1 to 12).map(_ => "- there with morewords")
        ++ (1 to 48).map(_ => "there with goodline words"))
        .mkString("\n"), 8L),                                     // bit3: 12/60 bullet lines
      (((1 to 7).map(_ => longLine + "...")
        ++ (1 to 13).map(_ => longLine)).mkString("\n"), 16L),    // bit4: 7/20 ellipsis ends
      ((1 to 60).map(_ => "12345678 87654321 there with").mkString(" "), 32L), // bit5
      ((1 to 60).map(i => s"word$i stuff$i").mkString(" "), 64L)) // bit6: no stopwords
    val df = cases.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = NorthStar.gopherRulesOn(df).orderBy("doc_id").collect()
      .map(r => r.getLong(2)).toSeq
    assert(got === cases.map(_._2),
      s"fail masks diverged; got $got for ${cases.map(_._2)}")
    // keep is exactly mask==0
    val keeps = NorthStar.gopherRulesOn(df).orderBy("doc_id").collect()
      .map(r => r.getBoolean(3)).toSeq
    assert(keeps === cases.map(_._2 == 0L))
  }

  test("word shingles: correct count and short-doc fallback") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(size(TextFunctions.wordShingles(col("text"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(2, 1))
  }

  test("language ID classifies real-language sentences correctly") {
    // The fixture's lang labels are synthetic (all texts are the same
    // English-ish word salad), so accuracy is asserted on genuine
    // sentences instead; the fixture query stays a rows-only output.
    val samples = Seq(
      ("en", "the quality of the data is important for the model and it depends on the pipeline"),
      ("en", "this is a test of the system that we built for processing large amounts of text"),
      ("es", "la calidad de los datos es importante para el modelo y depende de una buena tuberia"),
      ("es", "el sistema que construimos procesa una gran cantidad de texto por los servidores"),
      ("de", "die Qualität der Daten ist wichtig für das Modell und sie hängt von der Pipeline ab"),
      ("de", "das System das wir gebaut haben verarbeitet eine große Menge von Text mit den Servern"),
      ("fr", "la qualité des données est importante pour le modèle et elle dépend de la chaîne"),
      ("fr", "le système que nous avons construit traite une grande quantité de texte sur les serveurs"),
      ("zh", "数据质量对模型非常重要而且取决于数据处理管道的设计"),
      ("zh", "我们构建的系统每天处理大量的文本数据"))
    val preds = samples.toDF("lang", "text")
      .select(col("lang"), TextFunctions.langId(col("text")).as("pred")).collect()
    preds.foreach(r => assert(r.getString(0) === r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
    // fixture query still runs and emits predictions
    assert(NorthStar.langIdPredictions(spark, dir).count() === 500)
  }

  test("fingerprint: deterministic, order-sensitive, whitespace-insensitive") {
    val fp = (s: String) => Seq(s).toDF("text")
      .select(TextFunctions.fingerprint64(col("text"))).head.getLong(0)
    assert(fp("the quick fox") === fp("the  quick   fox"), "whitespace-normalized")
    assert(fp("the quick fox") !== fp("fox quick the"), "order-sensitive")
    assert(fp("the quick fox") !== fp("the quick foxes"), "edit-sensitive")
  }

  test("quality score is bounded and penalizes junk") {
    val df = Seq(
      ("good", "The data pipeline processes the input files and writes the results to the warehouse for the analysts of the team."),
      ("junk", "!!!! ???? ....,,,, ;;;"),
      ("short", "hi"))
      .toDF("kind", "text")
      .select(col("kind"), TextFunctions.qualityScore(col("text")).as("q"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m("good") > m("junk") && m("good") > m("short"))
  }

  test("multimodal features: real byte stats, stubbed decode, stable schema") {
    val feats = NorthStar.multimodalFeatures(spark, dir)
    assert(feats.count() === 500)
    val r = feats.filter(col("asset_id") === 0).head
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Double]("char_entropy") > 0.0)
    val again = NorthStar.multimodalFeatures(spark, dir).filter(col("asset_id") === 0).head
    assert(r === again, "decode stub must be deterministic")
  }

  test("frame sampling yields n frames of bounded size per asset") {
    val frames = NorthStar.frameSamples(spark, dir)
    assert(frames.count() === 500 * 4)
    assert(frames.agg(max("frame_size")).head.getLong(0) <= 32)
  }

  test("c4 rules: each planted stripe fires its rule on the fixture") {
    val out = NorthStar.c4Rules(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // lorem/brace trailers fire exactly on their doc_id stripes
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Boolean]("has_lorem") === (id % 23 == 0), s"lorem at $id")
      assert(r.getAs[Boolean]("has_brace") === (id % 29 == 0), s"brace at $id")
      if (id % 23 == 0 || id % 29 == 0)
        assert(!r.getAs[Boolean]("keep"), s"contaminated doc $id kept")
      // kept lines are a subset of all lines, sentences only on kept
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_lines"))
      assert(r.getAs[Long]("n_sentences") >= r.getAs[Long]("n_kept") - 1,
        "every kept line ends in exactly one terminal punct by construction")
    }
    // both verdicts occur — the rules discriminate, not rubber-stamp
    assert(out.count(_.getAs[Boolean]("keep")) > 50)
    assert(out.count(r => !r.getAs[Boolean]("keep")) > 50)
    assert(byId.nonEmpty)
  }

  test("c4 kernel: javascript lines and short lines never survive") {
    import spark.implicits._
    // doc 0: line stripe (0*7+g)%11==0 ⇒ g=0 gets the javascript
    // prefix; with 24 tokens ⇒ 3 lines, punct cycle (g+0)%4 ⇒ g=0
    // no punct anyway. Use doc_id 1: g=... (1*7+g)%11==0 ⇒ g=4 — only
    // 3 lines, so no javascript; all lines end punct for g+1 in
    // {1,2,3} mod 4 ⇒ g=3 would be '!'. 24 words ⇒ g∈{0,1,2}: '.','.','!'?
    // (g+1)%4: 1→'.', 2→'.', 3→'!'. All kept (8 words each).
    val df = Seq((1L, (1 to 24).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val r = NorthStar.c4RulesOn(df).head
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Long]("n_sentences") === 3L)
    assert(r.getAs[Boolean]("keep"))
    // doc 4: (4*7+g)%11==0 ⇒ g=5 javascript line dropped; 48 words ⇒
    // 6 lines g∈0..5; punct (g+4)%4=0 at g∈{0,4} unterminated ⇒ kept
    // = 6 - 2(unpunct) - 1(javascript, g=5 has punct '.') = 3
    val df4 = Seq((4L, (1 to 48).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val r4 = NorthStar.c4RulesOn(df4).head
    assert(r4.getAs[Long]("n_lines") === 6L)
    assert(r4.getAs[Long]("n_kept") === 3L)
    // short final line (< 5 words) dropped even when punctuated:
    // 10 words at doc 1 ⇒ lines of 8 and 2; second line has 2 words
    val dfs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rs = NorthStar.c4RulesOn(dfs).head
    assert(rs.getAs[Long]("n_lines") === 2L)
    assert(rs.getAs[Long]("n_kept") === 1L)
    assert(!rs.getAs[Boolean]("keep"), "single surviving sentence < 3")
  }

  test("semantic dedup: planted copies sharing a cell are dropped, originals kept") {
    val out = NorthStar.semanticDedup(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val planted = out.filter(_.getLong(0) >= 100000L)
    assert(planted.length === 40)
    var sameCellDups = 0
    planted.foreach { p =>
      val orig = byId(p.getLong(0) - 100000L)
      if (p.getLong(1) == orig.getLong(1)) { // same cell ⇒ cosine ~0.999 ⇒ dup
        assert(p.getAs[Boolean]("is_dup"), s"planted ${p.getLong(0)} in same cell not flagged")
        assert(!p.getAs[Boolean]("keep"))
        assert(orig.getAs[Boolean]("keep"), s"original ${orig.getLong(0)} dropped — min-id rule broken")
        sameCellDups += 1
      }
    }
    assert(sameCellDups >= 10, s"projection split nearly all planted pairs ($sameCellDups)")
    // non-planted corpus rows are pairwise non-similar ⇒ all kept
    val corpusDropped = out.filter(r => r.getLong(0) < 100000L && !r.getAs[Boolean]("keep"))
    assert(corpusDropped.isEmpty, s"false-positive dups: ${corpusDropped.map(_.getLong(0)).toSeq}")
  }
}
