package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint auditing — the dbt-test /
  * Great-Expectations surface a production warehouse runs after every
  * load. The reference validates FILES (schema/header checks, O6);
  * this audits ROWS: null/range/predicate checks, key uniqueness,
  * and referential integrity, each reported as an exact violation
  * count (a report, not a filter — quarantining is [[graft.pipeline
  * .Ingest]]'s job; the audit's job is to tell you the damage).
  *
  * Scale shape: all row-level checks over one table fold into ONE
  * scan — a single aggregate of conditional counts (map-side
  * combined, one tiny shuffle); uniqueness is a key-grouped count
  * (the key exchange); referential integrity is one anti join
  * (broadcast when the parent key set fits, hash otherwise). Nothing
  * collects rows to the driver; violation EXAMPLES at 100 TB would
  * be a `limit` per check, not part of the count pass.
  *
  * Null semantics follow SQL: a NULL predicate result is NOT a
  * violation (a null quantity fails a not-null check, not a range
  * check), and a NULL foreign key is exempt from referential
  * integrity, per the standard's MATCH SIMPLE rule.
  */
object Audit {

  /** A row-level constraint: `bad` evaluates TRUE exactly on
    * violating rows (NULL counts as not violating — pair range
    * checks with an explicit not-null check). */
  case class RowCheck(name: String, bad: Column)

  /** All `checks` over `df` in ONE scan: conditional counts inside a
    * single aggregate, exploded to (constraint_name, n_violations)
    * rows. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    val agged = df.agg(
      sum(when(checks.head.bad, 1L).otherwise(0L)).as(checks.head.name),
      checks.tail.map(c => sum(when(c.bad, 1L).otherwise(0L)).as(c.name)): _*)
    agged.select(explode(array(checks.map(c =>
        struct(lit(c.name).as("constraint_name"),
          coalesce(col(s"`${c.name}`"), lit(0L)).as("n_violations"))): _*)).as("x"))
      .select(col("x.constraint_name"), col("x.n_violations"))
  }

  /** Duplicate-key mass: rows beyond the first per key value. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String], name: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
      .select(lit(name).as("constraint_name"), col("n_violations"))

  /** Orphaned foreign keys: child rows whose (non-null) FK tuple has
    * no parent. One anti join on the key. */
  def refIntegrity(child: DataFrame, fkCols: Seq[String],
      parent: DataFrame, pkCols: Seq[String], name: String): DataFrame = {
    val p = parent.select(
      pkCols.zip(fkCols).map { case (pk, fk) => col(pk).as(fk) }: _*).distinct()
    child.select(fkCols.map(col): _*)
      .filter(fkCols.map(col(_).isNotNull).reduce(_ && _))
      .join(p, fkCols, "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("constraint_name"), col("n_violations"))
  }
}
