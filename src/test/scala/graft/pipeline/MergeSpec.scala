package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestSession

/** Unit + property tests for the last-writer-wins keyed merge (O14):
  * insert/update split, idempotency, batch-commutativity up to LWW,
  * and row-count conservation (SURVEY.md §5 test plan #2).
  * Property cases are drawn with raw ScalaCheck Gens (scalatestplus
  * is not on the offline classpath). */
class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def df(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.toDF("k", "ord", "v")
      .select(col("k"), timestamp_seconds(col("ord")).as("processed_at"), col("v"))

  private def merge(t: DataFrame, u: DataFrame): DataFrame =
    Merge.upsert(t, u, "k", col("processed_at"), Seq(col("v")))

  private def asMap(d: DataFrame): Map[String, (Long, Double)] =
    d.select(col("k"), unix_timestamp(col("processed_at")), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("insert new keys, update existing, last writer wins") {
    val target = df(Seq(("a", 10, 1.0), ("b", 10, 2.0)))
    val updates = df(Seq(("b", 20, 9.0), ("c", 20, 3.0), ("c", 30, 4.0)))
    val out = asMap(merge(target, updates))
    assert(out === Map(
      "a" -> (10L, 1.0),   // untouched
      "b" -> (20L, 9.0),   // updated
      "c" -> (30L, 4.0)))  // within-batch LWW then insert
  }

  test("update columns differing only in case still carry their data") {
    // Spark resolution is case-insensitive by default; an exact-name
    // alignment would silently null-fill "V" and drop the batch's
    // values while every other resolution path in the query matched it
    val target = df(Seq(("a", 10, 1.0)))
    val updates = df(Seq(("b", 20, 9.0)))
      .withColumnRenamed("v", "V")
    val out = asMap(merge(target, updates))
    assert(out === Map("a" -> (10L, 1.0), "b" -> (20L, 9.0)),
      "case-insensitively matching update column must not be null-filled")
  }

  test("merge is idempotent: merge(merge(T,U),U) == merge(T,U)") {
    val target = df(Seq(("a", 10, 1.0), ("b", 10, 2.0)))
    val updates = df(Seq(("b", 20, 9.0), ("c", 20, 3.0)))
    val once = merge(target, updates)
    val twice = merge(once, updates)
    assert(asMap(once) === asMap(twice))
  }

  test("key uniqueness and count conservation hold for arbitrary batches") {
    val rowGen = for {
      k <- Gen.oneOf((1 to 8).map(i => s"k$i"))
      ord <- Gen.choose(1L, 100L)
      v <- Gen.choose(0, 1000).map(_.toDouble)
    } yield (k, ord, v)
    val listGen = Gen.listOf(rowGen)
    (1 to 20).foreach { i =>
      val tRows = listGen.apply(Gen.Parameters.default, Seed(i * 2L)).getOrElse(Nil)
      val uRows = listGen.apply(Gen.Parameters.default, Seed(i * 2L + 1)).getOrElse(Nil)
      val t0 = Merge.lastWriterWins(df(tRows), "k", col("processed_at"), Seq(col("v")))
      val merged = merge(t0, df(uRows))
      val keys = merged.select("k").collect().map(_.getString(0))
      assert(keys.length === keys.distinct.length, s"case $i: merge key must stay unique")
      val expected = (tRows.map(_._1) ++ uRows.map(_._1)).distinct.size
      assert(keys.length === expected, s"case $i: |T'| = |keys(T) ∪ keys(U)|")
    }
  }

  test("upsert follows reference semantics: the applied batch always overwrites") {
    // ON CONFLICT DO UPDATE ignores ord vs target — last APPLIED wins.
    val t = df(Seq(("a", 100, 1.0)))
    val stale = df(Seq(("a", 5, 9.0)))
    assert(asMap(merge(t, stale)) === Map("a" -> (5L, 9.0)))
  }

  test("mergeByOrd commutes across batches (late-data variant)") {
    def m(t: DataFrame, u: DataFrame) =
      Merge.mergeByOrd(t, u, "k", col("processed_at"), Seq(col("v")))
    val t = df(Seq(("a", 1, 1.0)))
    val u1 = df(Seq(("a", 10, 5.0), ("b", 11, 6.0)))
    val u2 = df(Seq(("a", 20, 7.0), ("c", 21, 8.0)))
    val ab = m(m(t, u1), u2)
    val ba = m(m(t, u2), u1)
    assert(asMap(ab) === asMap(ba))
    assert(asMap(ab)("a") === (20L, 7.0), "greatest ord wins regardless of batch order")
  }

  // --- conditional MERGE INTO ---

  private def simple(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("k", "v")

  private def asSimpleMap(d: DataFrame): Map[String, Long] =
    d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("mergeInto: clause precedence, conditions, and pass-through") {
    val target = simple(Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
    val source = simple(Seq(
      ("a", 100L), // matched, v>=50 → delete (even though update cond also true)
      ("b", 20L),  // matched, update cond v%2==0 → take source
      ("c", 21L),  // matched, neither cond → keep target
      ("x", 10L),  // unmatched, insert cond → insert
      ("y", 11L))) // unmatched, insert cond fails → dropped
    val out = Merge.mergeInto(target, source, Seq("k"),
      matchedDelete = Some(col("s.v") >= 50),
      matchedUpdate = Some(col("s.v") % 2 === 0),
      notMatchedInsert = Some(col("s.v") % 2 === 0))
    assert(asSimpleMap(out) ===
      Map("b" -> 20L, "c" -> 3L, "d" -> 4L, "x" -> 10L))
  }

  test("mergeInto: null conditions fire nothing; absent clauses are inert") {
    val target = Seq(("a", Some(1L)), ("b", Some(2L))).toDF("k", "v")
    val source = Seq(("a", Option.empty[Long]), ("z", Option.empty[Long])).toDF("k", "v")
    // conditions reference s.v (null) → never true → matched row kept,
    // unmatched row NOT inserted
    val out = Merge.mergeInto(target, source, Seq("k"),
      matchedDelete = Some(col("s.v") > 0),
      matchedUpdate = Some(col("s.v") > 0),
      notMatchedInsert = Some(col("s.v") > 0))
    assert(out.collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
    // no clauses at all (insert defaulted off) → merge is the identity
    val id = Merge.mergeInto(target, source, Seq("k"),
      notMatchedInsert = None)
    assert(id.collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
  }

  test("mergeInto: a key matched by two source rows fails loudly") {
    val target = simple(Seq(("a", 1L)))
    val source = simple(Seq(("a", 2L), ("a", 3L)))
    val e = intercept[Exception] {
      Merge.mergeInto(target, source, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate key rows")), e.getMessage)
  }
}
