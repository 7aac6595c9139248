package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cross-query invariants the oracle can't see, plus approximate-
  * aggregate accuracy bounds. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("exact moments agree with the builtin float aggregates to 1e-9") {
    import org.apache.spark.sql.functions._
    val got = Relational.statsMoments(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    val ref = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).as("x"),
        floor(col("l_quantity") + lit(0.5)).as("y"))
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("x")).as("sd"), corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (flag, (sd, c)) =>
      assert(math.abs(sd - ref(flag)._1) / ref(flag)._1 < 1e-9,
        s"$flag stddev exact $sd vs builtin ${ref(flag)._1}")
      assert(math.abs(c - ref(flag)._2) < 1e-9,
        s"$flag corr exact $c vs builtin ${ref(flag)._2}")
    }
  }

  test("approx distinct counts within 5% of exact; percentiles ordered") {
    val exact = Relational.distinctCounts(spark, dir).head
    val approx = Relational.approxStatsRaw(spark, dir).head
    val (exParts, exSupps) = (exact.getLong(0), exact.getLong(1))
    assert(math.abs(approx.getLong(0) - exParts).toDouble / exParts < 0.05)
    assert(math.abs(approx.getLong(1) - exSupps).toDouble / exSupps < 0.05)
    assert(approx.getDouble(2) < approx.getDouble(3), "p50 < p99")
  }

  test("approxStats certificate row: exact counts + all-green bounds") {
    val exact = Relational.distinctCounts(spark, dir).head
    val cert = Relational.approxStats(spark, dir).head
    assert(cert.getLong(0) === exact.getLong(0), "exact_parts")
    assert(cert.getLong(1) === exact.getLong(1), "exact_supps")
    (2 to 5).foreach(i => assert(cert.getBoolean(i),
      s"certificate column $i (${cert.schema.fieldNames(i)}) is false"))
  }

  test("funnel depth equals a per-user greedy scan of the sorted stream") {
    import org.apache.spark.sql.functions._
    val got = Relational.funnelDepth(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val steps = Seq("view", "click", "purchase")
    val ref = events.groupBy(_._1).flatMap { case (user, evs) =>
      val sorted = evs.sortBy(_._3)
      var depth = 0
      var lastTs = Long.MinValue
      // greedy earliest-qualifying scan — strictly increasing ts
      steps.foreach { step =>
        if (depth == steps.indexOf(step)) {
          sorted.find(e => e._2 == step && e._3 > lastTs).foreach { e =>
            depth += 1; lastTs = e._3
          }
        }
      }
      if (depth >= 1) Some(user -> depth.toLong) else None
    }
    assert(got === ref)
    assert(got.nonEmpty && got.values.exists(_ == 3L),
      "fixture should contain at least one full-funnel user")
    spark.catalog.clearCache()
  }

  test("forward fill: real gaps exist and inherit the last observed value") {
    val rows = Relational.forwardFillDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val gaps = rows.filterNot(_._4)
    assert(gaps.nonEmpty, "fixture slice must contain real gaps or the fill is vacuous")
    // every filled day carries exactly the most recent observed value
    rows.groupBy(_._1).foreach { case (_, series) =>
      val sorted = series.sortBy(_._2.getTime)
      assert(sorted.head._4, "spine starts at the first OBSERVED day")
      var lastObserved = sorted.head._3
      sorted.foreach { case (_, _, v, observed) =>
        if (observed) lastObserved = v
        else assert(v === lastObserved, "gap day must inherit the last observed value")
      }
    }
    spark.catalog.clearCache()
  }

  test("table checksum: order-independent, sensitive to one mutated cent") {
    import org.apache.spark.sql.functions._
    val M = 281474976710656L
    def sum48(df: org.apache.spark.sql.DataFrame): Long = {
      val canon = concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long"), col("c_mktsegment"))
      df.agg(pmod(sum(conv(substring(md5(canon), 1, 12), 16, 10)
        .cast("long").cast("decimal(38,0)")), lit(M)).cast("long"))
        .head.getLong(0)
    }
    val cust = graft.core.Tables.customer(spark, dir)
    val base = sum48(cust)
    // row order and partitioning must not matter
    assert(sum48(cust.repartition(7).sortWithinPartitions(col("c_name").desc)) === base)
    // a single cent on a single row must flip the checksum
    val mutated = cust.withColumn("c_acctbal",
      when(col("c_custkey") === 1, col("c_acctbal") + 0.01).otherwise(col("c_acctbal")))
    assert(sum48(mutated) !== base, "one-cent mutation went undetected")
    spark.catalog.clearCache()
  }

  test("nation revenues aggregate to region revenues") {
    val byNation = Relational.revenueByNation(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("revenue")).head.getDouble(0)
    val byRegion = Relational.revenueByRegion(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("revenue")).head.getDouble(0)
    assert(math.abs(byNation - byRegion) < 1e-6)
  }

  test("pivot cells reconcile with the rollup grand total") {
    import org.apache.spark.sql.functions._
    val pivotTotal = Relational.pivotQuantities(spark, dir)
      .select((coalesce(col("A"), lit(0.0)) + coalesce(col("N"), lit(0.0)) +
        coalesce(col("R"), lit(0.0))).as("t"))
      .agg(sum("t")).head.getDouble(0)
    val rollupTotal = Relational.rollupQuantities(spark, dir)
      .filter(col("flag") === "ALL" && col("status") === "ALL")
      .head.getDouble(2)
    assert(math.abs(pivotTotal - rollupTotal) < 1e-6)
  }

  test("token frequencies: top tokens cover the fixture vocabulary head") {
    val top = Relational.tokenFrequencies(spark, dir).collect()
    // the sf0.001 fixture vocabulary is smaller than the LIMIT
    assert(top.length > 0 && top.length <= 50)
    assert(top.head.getLong(1) >= top.last.getLong(1), "sorted by count desc")
  }

  test("q46: stored-sketch rollup is consistent and within tolerance") {
    val rows = Relational.hllSketchRollup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: persisted-merge estimate " +
        "must equal the direct one-pass estimate")
      assert(r.getBoolean(3), s"${r.getString(0)}: estimate outside 5% of exact")
    }
  }

  test("q48: KMV quantile sketch is deterministic and exact when the sample covers") {
    import org.apache.spark.sql.functions._
    val r1 = Relational.quantileSketchRollup(spark, dir).collect()
    assert(r1.toSeq == Relational.quantileSketchRollup(spark, dir).collect().toSeq)
    // at sf0.001 each type has < 256 events, so the bottom-k sample IS
    // the population: estimates must equal exact discrete quantiles
    val byType = graft.core.Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).sorted }
    assert(r1.nonEmpty)
    r1.foreach { r =>
      val vs = byType(r.getString(0))
      val n = vs.length
      assert(n < 256, "fixture premise: the sample covers the population")
      assert(r.getLong(1) === n.toLong)
      def exact(num: Int, den: Int) = vs(((n.toLong * num + den - 1) / den).toInt - 1)
      assert(r.getLong(2) === exact(1, 2), "p50")
      assert(r.getLong(3) === exact(9, 10), "p90")
      assert(r.getLong(4) === exact(99, 100), "p99")
    }
  }

  test("q49: interpolated gaps lie between their brackets; observed rows match q43") {
    val locf = Relational.forwardFillDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.get(1).toString) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    val rows = Relational.interpolateDaily(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(!_.getBoolean(3)), "fixture must contain real gaps")
    // per-series scan: observed rows are exact cents*1000; gap rows sit
    // within [min, max] of the bracketing observations
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      val s = series.sortBy(_.get(1).toString)
      var prevObs = Option.empty[Long]
      s.zipWithIndex.foreach { case (r, i) =>
        val v = r.getLong(2)
        if (r.getBoolean(3)) {
          val (cents, obs) = locf((r.getString(0), r.get(1).toString))
          assert(obs && v === cents * 1000, "observed rows carry exact cents*1000")
          prevObs = Some(v)
        } else {
          val next = s.drop(i + 1).find(_.getBoolean(3)).map(_.getLong(2))
          (prevObs, next) match {
            case (Some(a), Some(b)) =>
              assert(v >= math.min(a, b) && v <= math.max(a, b),
                s"interpolant $v outside bracket [$a, $b]")
            case _ => fail("gap row without both brackets — spine contract broken")
          }
        }
      }
    }
  }
}
