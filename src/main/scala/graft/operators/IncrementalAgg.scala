package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped sum/count aggregate from a
  * CDC change feed — the materialized-view refresh primitive. The
  * reference's analytics recompute every aggregate from the whole
  * warehouse on every dashboard load (`README.md:146-151`, the
  * Metabase queries); at 100 TB a maintained aggregate must instead
  * absorb |Δ| change rows against an agg table that is group-count
  * sized, so refresh cost tracks the day's churn, not the corpus.
  *
  * Semantics: self-maintainable aggregates (SUM and COUNT — the
  * class that needs no re-scan of the base table, in the
  * Gupta/Mumick view-maintenance taxonomy). Each change row carries
  * pre/post images ([[graft.pipeline.Warehouse.diffImages]]);
  * every non-null image contributes `sign * measure` to ITS OWN
  * group — so an update that moves a row across groups retracts from
  * the old group and adds to the new one in one pass, with no
  * special casing. A group whose maintained count reaches zero
  * disappears from the view, exactly as it would under recompute.
  *
  * Scale shape: the change feed doubles to (sign, image)
  * contribution rows NARROWED to (group, measures) before the ONE
  * hash exchange on the group key (partial aggregation map-side
  * combines, so the exchange carries at most one row per group per
  * task); the merge with the prior agg table is a full-outer join on
  * the group key — group-cardinality sized on both sides, never
  * base-table sized. Nothing here scans the base table: that is the
  * point.
  *
  * Measures must be EXACT (integer-valued longs — cents, micros):
  * retraction by subtraction is only sound when addition is
  * associative-exact. A float measure would drift from the recompute
  * under reordering; callers quantize first (the q44/p03
  * discipline).
  */
object IncrementalAgg {

  /** Maintain `agg0` (columns: `groupCol`, each measure name, and
    * `countName`) through `changes` (a
    * [[graft.pipeline.Warehouse.diffImages]] frame: `old_image` /
    * `new_image` structs + `change_type`). Each measure maps an
    * image struct to its exact long contribution. Returns the
    * maintained view with the same columns as `agg0`.
    */
  def maintain(agg0: DataFrame, changes: DataFrame, groupCol: String,
      measures: Seq[(String, Column => Column)],
      countName: String): DataFrame = {
    val measureNames = measures.map(_._1)
    require((measureNames :+ countName :+ groupCol).forall(agg0.columns.contains),
      s"agg0 must carry [${(groupCol +: measureNames :+ countName).mkString(",")}]," +
        s" got [${agg0.columns.mkString(",")}]")

    // Retraction (-1, pre-image) and assertion (+1, post-image) from
    // one change row; inserts/deletes contribute one side, updates
    // both. Group + measures are extracted BEFORE the exchange so
    // only (group, sign, measures) shuffles, not the full image.
    val contrib = changes
      .select(explode(array(
        struct(lit(-1L).as("sign"), col("old_image").as("img")),
        struct(lit(1L).as("sign"), col("new_image").as("img")))).as("c"))
      .filter(col("c.img").isNotNull)
      .select(col("c.img").getField(groupCol).as(groupCol) +:
        col("c.sign").as("__sign") +:
        measures.map { case (n, f) =>
          (col("c.sign") * f(col("c.img"))).as(n)
        }: _*)

    val deltas = contrib.groupBy(col(groupCol))
      .agg(sum(col("__sign")).as(countName),
        measureNames.map(n => sum(col(n)).as(n)): _*)

    // Null-safe merge: the group key may legitimately be null (one
    // null group, like GROUP BY's). Aliased frames + <=> keep the
    // join group-cardinality sized; coalesce covers groups present
    // on only one side (untouched groups / brand-new groups).
    val a = agg0.alias("a")
    val d = deltas.alias("d")
    a.join(d, col(s"a.$groupCol") <=> col(s"d.$groupCol"), "full_outer")
      .select(coalesce(col(s"a.$groupCol"), col(s"d.$groupCol")).as(groupCol) +:
        (measureNames :+ countName).map { n =>
          (coalesce(col(s"a.$n"), lit(0L)) + coalesce(col(s"d.$n"), lit(0L))).as(n)
        }: _*)
      .filter(col(countName) > 0)
  }
}
