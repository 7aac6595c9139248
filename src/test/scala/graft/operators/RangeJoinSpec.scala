package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Banded interval join: exact equivalence with the unbanded theta
  * join (the bands must only bound candidate generation, never change
  * the result), boundary/band-edge semantics, and the plan-shape
  * guarantee the operator exists for — an EQUI join on (key, band),
  * never a nested-loop/cartesian theta product. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def leftDf = {
    import spark.implicits._
    Seq((1L, 10L, 0L), (2L, 10L, 999L), (3L, 11L, 5000L), (4L, 12L, -2500L))
      .toDF("l_id", "key", "l_ts")
  }
  private def rightDf = {
    import spark.implicits._
    Seq((101L, 10L, 0L), (102L, 10L, 1000L), (103L, 10L, 2000L),
      (104L, 11L, 5999L), (105L, 11L, 6001L), (106L, 12L, -1501L),
      (107L, 99L, 0L))
      .toDF("r_id", "key", "r_ts")
  }

  test("banded join equals the unbanded theta join, bounds inclusive") {
    val got = RangeJoin.intervalJoin(leftDf, rightDf, "l_ts", "r_ts",
      lowerUs = 0L, upperUs = 1000L, equiKeys = Seq("key"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = leftDf.join(rightDf, Seq("key"))
      .filter(col("r_ts") >= col("l_ts") && col("r_ts") <= col("l_ts") + 1000L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // spot-check semantics: both window ends inclusive; band edges
    // (l=999 with r=1000 and r=1999 in the next band) still match;
    // negative timestamps band correctly (floorDiv)
    assert(got.contains((1L, 101L)) && got.contains((1L, 102L)), "inclusive ends")
    assert(got.contains((2L, 102L)) && !got.contains((2L, 103L)), "cross-band candidate kept, 2000 > 1999 excluded")
    assert(got.contains((3L, 104L)) && !got.contains((3L, 105L)), "6000 in, 6001 out")
    assert(got.contains((4L, 106L)), "negative-epoch banding")
    assert(!got.exists(_._2 == 107L), "equi key respected")
  }

  test("negative lower bound (window straddling the probe time)") {
    val got = RangeJoin.intervalJoin(leftDf, rightDf, "l_ts", "r_ts",
      lowerUs = -1000L, upperUs = 1000L, equiKeys = Seq("key"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = leftDf.join(rightDf, Seq("key"))
      .filter(col("r_ts") >= col("l_ts") - 1000L && col("r_ts") <= col("l_ts") + 1000L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("randomized equivalence with the unbanded join, at every band width") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val l = (0 until 500).map(i => (i.toLong, (rng.nextInt(5)).toLong, rng.nextLong() % 100000L))
      .toDF("l_id", "key", "l_ts")
    val r = (0 until 500).map(i => (i.toLong, (rng.nextInt(5)).toLong, rng.nextLong() % 100000L))
      .toDF("r_id", "key", "r_ts")
    val want = l.join(r, Seq("key"))
      .filter(col("r_ts") >= col("l_ts") - 777L && col("r_ts") <= col("l_ts") + 3333L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // band width is a pure candidate-volume knob: default (= span),
    // finer, and coarser-than-span must all give the identical result
    for (band <- Seq(None, Some(257L), Some(100000L))) {
      val got = RangeJoin.intervalJoin(l, r, "l_ts", "r_ts", -777L, 3333L,
        Seq("key"), bandUs = band)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === want, s"band=$band diverged")
    }
  }

  test("auto band on dense events beats span banding by a measured candidate factor") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // DENSE fixture: 5000 events packed into a 10k-µs extent, probed
    // with a 100k-µs window — span banding piles everything into ~1
    // band and candidate volume approaches the theta product.
    val lSeq = (0 until 300).map(i => (i.toLong, 1L, rng.nextInt(10000).toLong))
    val rSeq = (0 until 5000).map(i => (i.toLong, 1L, rng.nextInt(10000).toLong))
    val l = lSeq.toDF("l_id", "key", "l_ts")
    val r = rSeq.toDF("r_id", "key", "r_ts")
    val span = 100000L
    val auto = RangeJoin.autoBand(r, "r_ts", 0L, span)
    assert(auto < span / 100,
      s"auto band $auto should be far finer than the $span span on dense events")
    // measured candidate volume at a band width: Σ over probe bands of
    // that band's right-side occupancy (the exact pair count the
    // banded equi join feeds its filter)
    val perBand = (band: Long) => {
      val rBands = rSeq.groupBy(t => Math.floorDiv(t._3, band))
        .view.mapValues(_.size.toLong).toMap
      lSeq.iterator.map { case (_, _, ts) =>
        (Math.floorDiv(ts, band) to Math.floorDiv(ts + span, band))
          .iterator.map(b => rBands.getOrElse(b, 0L)).sum
      }.sum
    }
    // Candidate volume: banding at span is bounded at 2× the true
    // match count (≤2 bands per probe, each ≈ span·density rows), so
    // the auto band's win here is trimming that ≤2× slop — assert it
    // lands near the theoretical cap…
    val (cAuto, cSpan) = (perBand(auto), perBand(span))
    assert(cAuto * 18 <= cSpan * 10,
      s"auto band candidates $cAuto not ≥1.8× below span banding's $cSpan")
    // …while the SCALE-critical effect is per-band occupancy: span
    // banding concentrates the whole dense extent into one band (one
    // build-side bucket, one giant task — the thing that dies at
    // 100 TB), auto banding caps it near the target occupancy.
    val maxOcc = (band: Long) =>
      rSeq.groupBy(t => Math.floorDiv(t._3, band)).values.map(_.size).max
    val (occAuto, occSpan) = (maxOcc(auto), maxOcc(span))
    assert(occAuto * 50 <= occSpan,
      s"max band occupancy $occAuto (auto) vs $occSpan (span): parallelism not restored")
    // band width is a pure candidate-volume knob: identical result
    val want = RangeJoin.intervalJoin(l, r, "l_ts", "r_ts", 0L, span,
      Seq("key"), bandUs = Some(span))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = RangeJoin.intervalJoin(l, r, "l_ts", "r_ts", 0L, span, Seq("key"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === want, "auto band changed the result")
  }

  test("sparse events clamp the auto band to the window span") {
    import spark.implicits._
    // 10 events across a huge extent: density · span ≪ target, so
    // finer-than-span banding would only inflate the probe explode
    val r = (0 until 10).map(i => (i.toLong, 1L, i * 10_000_000L))
      .toDF("r_id", "key", "r_ts")
    assert(RangeJoin.autoBand(r, "r_ts", 0L, 5000L) === 5000L)
  }

  test("band assignment stays exact beyond 2^53 (no double-precision drift)") {
    import spark.implicits._
    val base = 1L << 60 // ts magnitudes where floor(ts/band) in doubles drifts
    val l = (0 until 50).map(i => (i.toLong, 1L, base + i * 997L))
      .toDF("l_id", "key", "l_ts")
    val r = (0 until 200).map(i => (i.toLong, 1L, base + i * 251L))
      .toDF("r_id", "key", "r_ts")
    val want = l.join(r, Seq("key"))
      .filter(col("r_ts") >= col("l_ts") && col("r_ts") <= col("l_ts") + 1000L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(want.nonEmpty, "fixture must produce matches")
    // odd band widths are the precision-hostile case (quotients just
    // below an integer round UP in double math → off-by-one bands)
    for (band <- Seq(None, Some(7L), Some(997L), Some(1000L))) {
      val got = RangeJoin.intervalJoin(l, r, "l_ts", "r_ts", 0L, 1000L,
        Seq("key"), bandUs = band)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === want, s"band=$band diverged at |ts| > 2^53")
    }
  }

  test("plans as an equi join on (key, band) — no nested loop, no cartesian") {
    // explicit band: the whole plan must be pure equi-join machinery
    val explicit = RangeJoin.intervalJoin(leftDf, rightDf, "l_ts", "r_ts",
      0L, 1000L, Seq("key"), bandUs = Some(1000L))
    explicit.collect()
    val pe = explicit.queryExecution.executedPlan.toString
    assert(!pe.contains("BroadcastNestedLoopJoin") && !pe.contains("CartesianProduct"),
      s"range join fell back to a theta product:\n$pe")
    assert(pe.contains("Join"), "expected an equi join in the plan")

    // auto band: the PAIR join must still be the banded equi join;
    // the only nested-loop allowed is the 1-ROW broadcast stats
    // attach (how a scalar subplan rides the query) — never the
    // |L|x|R| pair space
    val auto = RangeJoin.intervalJoin(leftDf, rightDf, "l_ts", "r_ts",
      0L, 1000L, Seq("key"))
    auto.collect()
    val pa = auto.queryExecution.executedPlan.toString
    assert(!pa.contains("CartesianProduct"), s"cartesian pair space:\n$pa")
    assert(pa.contains("__band"), "expected the banded equi join key")
    val pairJoinIsEqui = pa.linesIterator
      .exists(l => l.contains("Join") && l.contains("__band"))
    assert(pairJoinIsEqui, s"pair join is not on (key, band):\n$pa")
  }

  // Descend AQE wrappers — plan.collect stops at query-stage bounds.
  private def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, Seq[T]]): Seq[T] =
    graft.PlanWalk.collectAll(p)(pf)

  test("auto-band stats materialize ONCE per action; both consumers reuse the broadcast") {
    val auto = RangeJoin.intervalJoin(leftDf, rightDf, "l_ts", "r_ts",
      0L, 1000L, Seq("key"))
    auto.collect()
    val plan = auto.queryExecution.executedPlan
    def isBandw(p: org.apache.spark.sql.execution.SparkPlan) =
      p.output.map(_.name) == Seq("__bandw")
    val built = collectAll(plan) {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if isBandw(e) => Seq(e)
    }
    val reused = collectAll(plan) {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec
          if isBandw(r) => Seq(r)
    }
    assert(built.size == 1,
      s"stats aggregate must materialize exactly once per action, got ${built.size}:\n$plan")
    assert(reused.nonEmpty,
      s"the second band consumer must be a ReusedExchange, not a recomputation:\n$plan")
    // the multi-action escape hatch: the public driver-side form must
    // agree with the in-plan computation (same width), so callers can
    // precompute bandUs once and drop the per-action stats pass
    val w = RangeJoin.autoBand(rightDf, "r_ts", 0L, 1000L)
    val pinned = RangeJoin.intervalJoin(leftDf, rightDf, "l_ts", "r_ts",
      0L, 1000L, Seq("key"), bandUs = Some(w))
    assert(pinned.collect().toSet === auto.collect().toSet)
    pinned.queryExecution.executedPlan.toString
      .ensuring(!_.contains("__bandw"), "explicit band must skip the stats pass")
  }

  test("q36 shape: view->purchase pairs within the hour on the fixture") {
    val out = NorthStar.rangeJoinViewPurchase(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "fixture should contain view->purchase pairs within 1h")
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 3600L * 1000 * 1000))
  }
}
