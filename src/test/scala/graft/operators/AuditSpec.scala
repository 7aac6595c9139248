package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Constraint-audit semantics on deliberately dirty data: every check
  * kind counts exactly, SQL null rules hold (null predicate ≠
  * violation; null FK exempt), and one-scan row checks agree with
  * per-check recounts. */
class AuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("row checks: exact counts, nulls are not range violations") {
    val rows = Seq(
      (1L, Some(10.0)), (2L, Some(-5.0)), (3L, None),
      (4L, Some(0.0)), (5L, Some(-1.0))).toDF("id", "v")
    val got = counts(Audit.rowChecks(rows, Seq(
      Audit.RowCheck("v_nonneg", col("v") < 0),
      Audit.RowCheck("v_notnull", col("v").isNull),
      Audit.RowCheck("v_positive", !(col("v") > 0)))))
    assert(got === Map(
      "v_nonneg" -> 2L,     // -5, -1; the null row does NOT count
      "v_notnull" -> 1L,
      "v_positive" -> 3L))  // -5, 0, -1; null exempt again
  }

  test("empty table audits to zero, not null") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("id", "v")
    val got = counts(Audit.rowChecks(empty,
      Seq(Audit.RowCheck("v_nonneg", col("v") < 0))))
    assert(got === Map("v_nonneg" -> 0L))
  }

  test("unique key counts duplicate mass beyond the first") {
    val dup = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    assert(counts(Audit.uniqueKey(dup, Seq("k"), "k_unique")) ===
      Map("k_unique" -> 3L)) // two extra 1s + one extra 3
  }

  test("referential integrity: orphans counted, null FKs exempt") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq(Some(10L), Some(10L), Some(30L), Some(40L), None)
      .toDF("fk")
    assert(counts(Audit.refIntegrity(child, Seq("fk"), parent, Seq("pk"),
      "child_fk")) === Map("child_fk" -> 2L)) // 30, 40; null exempt
  }
}
