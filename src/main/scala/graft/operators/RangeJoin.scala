package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: all (left, right) pairs with
  * `right.ts ∈ [left.ts + lower, left.ts + upper]`, optionally under
  * equi-keys — the batch twin of the watermarked stream-stream
  * interval join (s06) and the second member of the temporal-join
  * family next to [[AsOfJoin]] (north-star mandate: "as-of join,
  * range join").
  *
  * Spark plans a bare range predicate as BroadcastNestedLoop or a
  * cartesian product — the full |L|·|R| pair space, the first thing
  * to die at scale. This operator BANDS time instead: with band width
  * = the window span, each left row's admissible interval covers at
  * most TWO bands, so the left side explodes into ≤2 rows tagged with
  * a band id, the right side gets its own band id for free, and the
  * join runs as a plain equi hash/sort-merge join on
  * (equiKeys..., band) followed by the exact range filter. Candidate
  * volume is O(rows-per-band · bands touched) — linear in the inputs
  * for event streams with bounded density, never |L|·|R|; the shuffle
  * key is (keys, band), so hot keys spread across bands and AQE's
  * skew split applies per band.
  *
  * Semantics are exactly the unbanded join (the bands only bound WHERE
  * candidates can live — the final filter is the original predicate):
  * inclusive on both ends, matching the streaming s06 query and the
  * DuckDB range-join oracle.
  */
object RangeJoin {

  /** @param left     probe side; all columns kept
    * @param right    match side; all columns kept (names must not
    *                 collide with left's — rename upstream)
    * @param leftTs   µs-epoch LONG column on `left`
    * @param rightTs  µs-epoch LONG column on `right`
    * @param lowerUs  window start offset: right.ts >= left.ts + lowerUs
    * @param upperUs  window end offset:   right.ts <= left.ts + upperUs
    * @param equiKeys equi-join columns present on BOTH sides
    * @param bandUs   band width override. Default (None) = AUTO: one
    *                 cheap ts-column-only aggregate over `right`
    *                 derives the band from the observed event density
    *                 so a band holds ≈[[targetRowsPerBand]] rows
    *                 ([[autoBand]]) — capped at the window span (the
    *                 sparse-events case, where span banding is already
    *                 right and probes cover ≤2 bands). Span banding is
    *                 never catastrophic — candidates stay ≤2× the true
    *                 match count — but over DENSE events it piles
    *                 span·density rows into each band: one build-side
    *                 bucket per (key, band), one giant task, the
    *                 parallelism/memory collapse that kills the join
    *                 at scale. The auto band trims the ≤2× candidate
    *                 slop AND restores bounded per-band occupancy
    *                 (both spec-measured). Result is identical for ANY
    *                 band width (the exact filter decides) — pass an
    *                 explicit width to skip the stats pass or pin a
    *                 tuning.
    *
    *                 The stats ride the PLAN: within one action the
    *                 aggregate materializes once (both consumers share
    *                 the broadcast — the second is a ReusedExchange,
    *                 spec-asserted), but every ACTION re-executes the
    *                 plan, stats included. A result consumed by many
    *                 actions, or the same `right` joined repeatedly,
    *                 should precompute once:
    *                 `bandUs = Some(RangeJoin.autoBand(right, rightTs,
    *                 lowerUs, upperUs))` — one eager driver-side
    *                 aggregate, then every join stays a pure literal
    *                 plan. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lowerUs: Long, upperUs: Long,
      equiKeys: Seq[String] = Seq.empty,
      bandUs: Option[Long] = None): DataFrame = {
    require(upperUs >= lowerUs, s"empty window: [$lowerUs, $upperUs]")
    require(bandUs.forall(_ > 0), s"band width must be positive: $bandUs")
    val rightOnly = right.columns.filterNot(equiKeys.contains).toSeq
    val leftOnly = left.columns.filterNot(equiKeys.contains).toSeq
    require(rightOnly.intersect(leftOnly).isEmpty,
      s"column collision: ${rightOnly.intersect(leftOnly).mkString(",")}")
    // working columns would silently overwrite same-named user
    // columns (withColumn replaces) — reject instead
    val reserved = Seq("__band", "__b_lo", "__b_hi", "__bandw")
    val clash = (left.columns ++ right.columns).toSeq.intersect(reserved)
    require(clash.isEmpty, s"reserved column names in input: ${clash.mkString(",")}")

    // The band width rides the PLAN, not the driver: auto mode derives
    // it from a 1-row broadcast stats aggregate cross-joined onto both
    // sides, so constructing the join stays lazy (no eager Spark job,
    // no double execution of an expensive `right` lineage) and the
    // stats evaluate exactly once, at execution, as part of the query.
    // An EXPLICIT band skips the stats entirely and stays a literal.
    val bandStats = bandUs match {
      case Some(_) => None
      case None =>
        val span = math.max(upperUs - lowerUs, 1L)
        Some(broadcast(right.agg(
            count(col(rightTs)).as("__n"),
            min(col(rightTs)).as("__lo"),
            max(col(rightTs)).as("__hi"))
          .select(
            when(col("__n") > 0,
              least(lit(span), greatest(lit(1L),
                ceil(lit(targetRowsPerBand.toDouble) *
                  (col("__hi") - col("__lo") + 1L) / col("__n")).cast("long"))))
              .otherwise(lit(span)).as("__bandw"))))
    }
    def attach(df: DataFrame): DataFrame =
      bandStats.map(df.crossJoin).getOrElse(df)
    val bw: Column = bandUs.map(b => lit(b)).getOrElse(col("__bandw"))
    // EXACT floorDiv, not floor(double-division): ts − pmod(ts, band)
    // is the greatest band multiple ≤ ts (pmod is non-negative, so
    // negative epochs floor correctly), and dividing an exact multiple
    // through decimal(38,0) stays precise over the whole long range —
    // floor(ts/band) in doubles silently stops equalling floorDiv past
    // 2^53 and band assignment would drift from right-side to
    // left-side rows. (Long underflow needs ts < MIN_LONG + band —
    // ~292,000 years before epoch at band = 1 day — out of domain.)
    def bandOf(ts: Column): Column =
      ((ts - pmod(ts, bw)).cast("decimal(38,0)") / bw).cast("long")

    val l = attach(left)
      .withColumn("__b_lo", bandOf(col(leftTs) + lit(lowerUs)))
      .withColumn("__b_hi", bandOf(col(leftTs) + lit(upperUs)))
      // sequence(lo, hi) is 1 or 2 elements by construction
      .withColumn("__band", explode(sequence(col("__b_lo"), col("__b_hi"))))
      .drop("__b_lo", "__b_hi", "__bandw")
    val r = attach(right)
      .withColumn("__band", bandOf(col(rightTs)))
      .drop("__bandw")

    l.join(r, equiKeys :+ "__band")
      .filter(col(rightTs) >= col(leftTs) + lit(lowerUs) &&
        col(rightTs) <= col(leftTs) + lit(upperUs))
      .drop("__band")
  }

  /** Auto-band target occupancy: tens of rows per band keeps per-band
    * candidate lists small while bounding the probe-side explosion
    * (span/band + 1 output rows per left row). */
  private val targetRowsPerBand = 32L

  /** Reference (driver-side) form of the auto band the in-plan
    * broadcast stats compute inside [[intervalJoin]] — for specs AND
    * for callers that consume one joined result through MULTIPLE
    * actions or join the same `right` repeatedly: compute the width
    * once here, pass `bandUs = Some(...)`, and the per-action in-plan
    * stats pass disappears. The two forms MUST agree (same operation
    * order: count/extent longs, one double multiply, one divide,
    * ceil).
    *
    * One aggregate (column-pruned to the ts column) measures row
    * count and ts extent, and the band is sized so density · band ≈
    * [[targetRowsPerBand]], clamped to [1, span]. Sparse events
    * (density · span below the target) clamp to the span — the
    * classic ≤2-bands-per-probe banding; dense events get
    * proportionally finer bands, keeping every (key, band) join
    * bucket near the target occupancy instead of letting one band
    * swallow the whole dense extent. The clamp also makes the empty/
    * single-timestamp cases well-defined. */
  def autoBand(right: DataFrame, rightTs: String,
      lowerUs: Long, upperUs: Long): Long = {
    val span = math.max(upperUs - lowerUs, 1L)
    val stats = right.agg(
      count(col(rightTs)).as("n"),
      min(col(rightTs)).as("lo"),
      max(col(rightTs)).as("hi")).head()
    if (stats.getLong(0) == 0L) return span
    val n = stats.getLong(0)
    val extent = stats.getLong(2) - stats.getLong(1) + 1L
    val byDensity = math.ceil(targetRowsPerBand.toDouble * extent / n).toLong
    math.min(span, math.max(1L, byDensity))
  }
}
