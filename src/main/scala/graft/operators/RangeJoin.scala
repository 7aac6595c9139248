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
    * @param bandUs   band width override. Default (None) = the window
    *                 span: each probe interval covers ≤2 bands — the
    *                 right choice when events are sparse relative to
    *                 the window. For a WIDE window over DENSE events,
    *                 a band holds window·density rows and candidate
    *                 volume approaches the theta product; a finer band
    *                 (e.g. span/16) multiplies probe-side rows by
    *                 span/band + 1 but divides per-band candidates by
    *                 the same factor — tune to density · band ≈ tens
    *                 of rows. Result is identical for ANY band width
    *                 (the exact filter decides); only candidate volume
    *                 moves. */
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
    val reserved = Seq("__band", "__b_lo", "__b_hi")
    val clash = (left.columns ++ right.columns).toSeq.intersect(reserved)
    require(clash.isEmpty, s"reserved column names in input: ${clash.mkString(",")}")

    // floorDiv semantics via floor(/) keep negative epochs correct;
    // with the default band = span a probe interval spans at most two
    // consecutive bands.
    val band = bandUs.getOrElse(math.max(upperUs - lowerUs, 1L))
    def bandOf(ts: Column): Column = floor(ts / lit(band)).cast("long")

    val l = left
      .withColumn("__b_lo", bandOf(col(leftTs) + lit(lowerUs)))
      .withColumn("__b_hi", bandOf(col(leftTs) + lit(upperUs)))
      // sequence(lo, hi) is 1 or 2 elements by construction
      .withColumn("__band", explode(sequence(col("__b_lo"), col("__b_hi"))))
      .drop("__b_lo", "__b_hi")
    val r = right.withColumn("__band", bandOf(col(rightTs)))

    l.join(r, equiKeys :+ "__band")
      .filter(col(rightTs) >= col(leftTs) + lit(lowerUs) &&
        col(rightTs) <= col(leftTs) + lit(upperUs))
      .drop("__band")
  }
}
