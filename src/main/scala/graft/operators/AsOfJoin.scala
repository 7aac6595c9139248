package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, attach the single right row with
  * the greatest `rightTs <= leftTs` within the same key — the
  * point-in-time lookup (latest price before a trade, last state
  * before an event) that relational engines ship natively (DuckDB
  * `ASOF JOIN`; the oracle uses exactly that) but Spark does not.
  *
  * Implementation follows the preference order for operators Spark
  * lacks: COMPOSE BUILT-INS first — no custom strategy needed. Tag
  * and union both sides, sort within key by (ts, side) with the right
  * side first at equal timestamps (so an exactly-simultaneous right
  * row IS visible to the left row), and propagate the right payload
  * with `last(_, ignoreNulls = true)` over the running window.
  * One shuffle on the key; within-partition sort; no join explosion —
  * the classic distributed as-of shape. A left row with no prior
  * right row keeps nulls, i.e. LEFT as-of semantics.
  *
  * The payload travels as ONE struct column, not per-column fills:
  * per-column `last(ignoreNulls)` would stitch a null field of the
  * matched right row from an OLDER right row, diverging from native
  * ASOF semantics (attach one whole row, nulls included). The struct
  * is atomic — either the whole matched row or all nulls. Right rows
  * tied on (key, ts) are broken deterministically by ordering on the
  * payload struct itself (field-lexicographic), so reruns and
  * different partitionings pick the same winner.
  *
  * At 100 TB both sides shuffle once on the key and stream through
  * one sort — same cost class as a sort-merge join, with no
  * candidate-pair blowup for hot keys (the window is linear in
  * partition size).
  */
object AsOfJoin {

  /** @param left       probe side; all its columns are kept
    * @param right      reference side
    * @param key        equi-key column present on both sides
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param rightCols  payload columns of `right` to attach (renamed
    *                   as given in the map: rightCol -> outputCol) */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // toSet, not valuesIterator: an Iterator is exhausted by the first
    // exists() probe, which silently skipped collisions past it
    val outNames = rightCols.values.toSet
    require(!leftCols.exists(outNames.contains),
      "output right-column names must not collide with left columns")

    val payload = struct(
      rightCols.map { case (rc, out) => col(rc).as(out) }.toSeq: _*)
    val r0 = right
      .select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        payload.as("__payload"))
    // Align schemas: left gains a null payload struct, right gains
    // null left columns.
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(r0.schema("__payload").dataType))
    // one select, not a withColumn fold: stacked Project nodes cost
    // O(width²) analysis time on wide frames
    val r2 = r0.select(col("*") +: leftCols.filterNot(_ == key).map(c =>
      lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val shape = Seq(col(key), col("__ts"), col("__side")) ++
      leftCols.filterNot(_ == key).map(col) :+ col("__payload")
    val unioned = l2.select(shape: _*).unionByName(r2.select(shape: _*))

    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__payload",
      last(col("__payload"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.values.toSeq.map(out => col("__payload")(out).as(out))): _*)
  }
}
