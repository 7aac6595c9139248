package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER clustering — the multi-column DATA-SKIPPING layout
  * (Morton, 1966; the Delta Lake `OPTIMIZE ZORDER BY` / Iceberg
  * sort-order idea re-expressed on plain parquet): interleave the
  * bits of two quantized sort keys so rows close in EITHER dimension
  * land close in the one-dimensional file order, making per-file
  * (and per-row-group) min/max footer stats tight on BOTH columns at
  * once. A single-column sort gives perfect skipping on that column
  * and none on any other; the Z-curve gives ~sqrt-of-selectivity
  * skipping on each — the right trade for a 100 TB events table
  * queried by user AND by time.
  *
  * Scale shape: one tiny min/max aggregate (bounds ride the plan as
  * literals — model-sized driver traffic), then a pure per-row code
  * expression, one range exchange on the code, and a within-partition
  * sort that fuses into the shuffle's sort. No window, no driver data
  * path, O(n log n) in the files like any clustering write.
  *
  * Quantization is uniform 16-bit over [lo, hi] — the layout is a
  * PHYSICAL optimization, so quantization error can only cost
  * skipping efficiency, never correctness (content preservation is
  * hash-certified by the p09 gate; under heavy value skew swap the
  * uniform buckets for approx-quantile cuts, same code path). Bucket
  * math runs in double: magnitudes up to 2^52 stay exact, and beyond
  * that the only casualty is again layout quality. */
object Zorder {

  /** 16-bit uniform bucket of `v` over [lo, hi]; nulls to bucket 0
    * (they sort first, the same contract as Spark's nulls-first). */
  private[operators] def bucket16(v: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, 1e-300)
    least(lit(65535L), greatest(lit(0L),
      floor((coalesce(v.cast("double"), lit(lo)) - lit(lo)) * (65536.0 / span))
        .cast("long")))
  }

  /** Bit-interleave two 16-bit codes: x on even bits, y on odd —
    * 32 codegen'd shift/mask terms, no UDF. */
  private[operators] def morton(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Driver-side reference of [[morton]] for specs. */
  private[operators] def mortonRef(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** Rewrite `df` Z-ordered by two numeric columns into `nFiles`
    * range-partitioned, internally sorted files. Row content is
    * untouched — this is purely a layout transform; callers commit
    * the result like any staged write (the warehouse compaction
    * pattern). */
  def cluster(df: DataFrame, colA: String, colB: String, nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    // bounds: one tiny agg, broadcast as plan literals
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"cannot Z-order an empty or all-null frame on ($colA, $colB)")
    val z = morton(
      bucket16(col(colA), r.getDouble(0), r.getDouble(1)),
      bucket16(col(colB), r.getDouble(2), r.getDouble(3)))
    df.withColumn("__zorder", z)
      .repartitionByRange(nFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }
}
