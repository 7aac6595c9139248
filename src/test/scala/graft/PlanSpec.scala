package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that make these
  * queries survive a 100× scale-up are not row counts but plan
  * features — filters reaching the parquet scan, unused columns
  * pruned, small dimension sides broadcast instead of shuffled. These
  * lock those shapes in so a refactor that silently regresses one
  * (e.g. an expression rewrite that blocks pushdown) fails CI, not a
  * cluster run. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filters push into the parquet scan; unused columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull("), "scan lost its pushed filters")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("GreaterThan(l_discount"), // display string truncates the list
      "range predicates did not reach the scan")
    assert(!p.contains("l_comment"), "projection pruning lost: scan reads l_comment")
  }

  test("q04: dimension joins broadcast, no sort-merge on small sides") {
    val p = plan("q04_revenue_by_region")
    assert(p.contains("BroadcastHashJoin"), "dimension join should broadcast")
  }

  test("q08: anti join broadcasts the subquery side") {
    val p = plan("q08_customers_without_orders")
    assert(p.contains("LeftAnti"), "expected an anti join")
    assert(p.contains("Broadcast"), "anti join should broadcast, not shuffle")
  }

  test("q06: per-key top-1 is one window over one exchange, no join") {
    val p = plan("q06_best_order_per_customer")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "expected a window operator")
    assert(!p.contains("Join"), "top-1-per-key must not plan a self-join")
  }

  test("q01: aggregation is two-phase hash (map-side partial applies)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final hash aggregation")
    assert(!p.contains("SortAggregate"), "agg fell back to sort-based")
  }

  test("io03: partition-column filter prunes directories at the scan") {
    val df = SparkEntry.queries("io03_partitioned_prune")(spark, dir)
    df.collect() // materialize so the staged write exists and AQE finalizes
    // the scan hides inside AQE wrapper nodes (AdaptiveSparkPlanExec /
    // query stages) that plain collect() does not descend into
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a file scan over the partitioned stage")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "event_type predicate should be a partition filter, not a data filter")
    // pruning happened if the executed scan selected exactly ONE
    // partition directory (inputFiles would list the whole relation —
    // pruning applies at selection time, visible in the metric).
    // The metric key is version-dependent internal surface: guard the
    // lookup so a rename degrades this to the partitionFilters check
    // above instead of a cryptic NoSuchElementException.
    assert(scan.metadata.get("Location").exists(_.contains("events_by_type")),
      s"unexpected scan location metadata: ${scan.metadata.get("Location")}")
    scan.metrics.get("numPartitions") match {
      case Some(m) => assert(m.value == 1,
        s"expected 1 selected partition directory, got ${m.value}")
      case None => info("numPartitions metric absent in this Spark version; " +
        "partition-filter presence already asserted above")
    }
  }

  test("io04: key filter pushes into the CSV scan") {
    val df = SparkEntry.queries("io04_csv_roundtrip")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LessThanOrEqual(c_custkey,500)"),
      "c_custkey <= 500 did not reach the CSV scan")
  }

  test("d19: stratified sample prunes via TopKPerKey before any window sort") {
    val p = plan("d19_stratified_sample")
    assert(p.contains("TopKPerKey"),
      "stratified draw must route through the bounded-heap node")
    // The rank-within-survivors window (and its Sort) must consume the
    // PRUNED stream: in the plan string parents print before children,
    // so TopKPerKey must sit BELOW the Window — the only sorted rows
    // are the ≤ k-per-language survivors, never the dominant stratum.
    val wIdx = p.indexOf("Window")
    val tIdx = p.indexOf("TopKPerKey")
    assert(wIdx >= 0 && tIdx > wIdx,
      "window must rank the TopKPerKey survivors, not the full stratum")
  }

  test("q41: moments broadcast back onto the stream — one keyed shuffle only") {
    val p = plan("q41_value_outliers")
    assert(p.contains("BroadcastHashJoin"),
      "the 5-row moments frame must broadcast, not shuffle the stream again")
    val keyedExchanges = "hashpartitioning".r.findAllIn(p).size
    assert(keyedExchanges <= 1,
      s"expected at most one keyed exchange (the moments groupBy), found $keyedExchanges")
  }

  test("p09: the maintenance plan reads v0 + the stored feed, never snapshot v1") {
    // The whole point of incremental maintenance: v1's rows reach the
    // view only THROUGH the |Δ|-sized change feed. A v1 file scan in
    // this plan means someone reintroduced the full-recompute path.
    val df = SparkEntry.queries("p09_incremental_agg")(spark, dir)
    val scans = PlanWalk.collectAll(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }
    assert(scans.exists(_.contains("/v0")), s"expected a v0 scan in $scans")
    assert(scans.exists(_.contains("_changes")), s"expected a feed scan in $scans")
    assert(!scans.exists(p => p.contains("/v1") && !p.contains("_changes")),
      s"maintenance must never scan snapshot v1: $scans")
  }

  test("g02: triangle counting plans equi hash joins only — no cartesian") {
    val p = plan("g02_triangle_counts")
    assert(!p.contains("CartesianProduct"),
      "triangle counting must never plan a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "all joins must be equi-keyed (orientation makes the closing edge's key known)")
  }

  test("p11: MERGE INTO is one full-outer join, key-partitioned") {
    val p = plan("p11_merge_into")
    assert(p.contains("FullOuter"), "expected the one struct-packed full-outer join")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("r03: rank fusion plans no join — union, aggregate, bounded window") {
    // fusion itself is rank arithmetic; the only joins in the whole
    // query belong to the upstream BM25 scorer (term joins). The
    // fused candidate pool per query is bounded by construction, so
    // a per-query sort is over ≤ modalities × depth rows.
    val df = SparkEntry.queries("r03_hybrid_rrf")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Union"), "expected the modality union")
    assert(!p.contains("CartesianProduct") ||
      p.contains("nbr_vec"), // the vector brute-force certificate side is a documented cross join
      s"unexpected cartesian outside the vector scorer:\n$p")
  }

  test("d42: the DSIR model broadcasts back onto the pair stream — no sort-merge join") {
    val p = plan("d42_dsir_importance")
    assert(p.contains("BroadcastHashJoin"),
      "the ≤buckets-row model must broadcast onto the (doc, bucket) stream")
    assert(!p.contains("SortMergeJoin"),
      "nothing in the importance pipeline may shuffle-join the corpus")
  }

  test("q48: the sketch build prunes through the bounded-heap TopKPerKey node") {
    val p = plan("q48_quantile_rollup")
    assert(p.contains("TopKPerKey"),
      "the KMV bottom-k must route through the bounded-heap node, not a window sort")
  }

  test("g03: label propagation plans equi hash joins only — no cartesian") {
    val p = plan("g03_label_propagation")
    assert(!p.contains("CartesianProduct"),
      "LPA must never plan a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "every per-round join is equi-keyed on src")
    // argmax folds as an aggregate, never a per-node ranking window
    assert(!p.contains("Window"),
      "per-node argmax must be max(struct), not a window sort")
  }

  test("g05: peel rounds are semi joins; no per-node rank window for k") {
    val p = plan("g05_kcore")
    assert(p.contains("LeftSemi"), "survivor filtering must be semi joins")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "peel must stay equi-keyed")
    // The quantile threshold comes from the DEGREE HISTOGRAM — the
    // only window in the plan runs over O(distinct degrees) rows; a
    // window whose sort key is the per-node degree table would be the
    // full-sort scale trap the histogram form exists to avoid. The
    // one-partition window is detectable by its input: it must sit
    // over the (deg, c) aggregate, never over (node, deg).
    assert(!p.contains("row_number"),
      "no per-node ranking window may appear in the k computation")
  }

  test("s11/q49 prerequisites: the spine/daily fill join broadcasts") {
    val p = plan("q49_interpolate")
    // The ONLY join in q49 is spine ⋈ daily, so plan-wide negatives
    // pin that specific join (a disjunction like "no SMJ OR some BHJ
    // exists" would pass vacuously whenever any broadcast join
    // appears anywhere).
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the daily side is an aggregate of a filtered slice — it must broadcast")
    assert(p.contains("BroadcastHashJoin"), "expected the broadcast fill join")
    assert(!p.contains("CartesianProduct"), "no cartesian in the spine join")
  }

  test("sql26/sql38: EXISTS / NOT EXISTS plan as hash semi/anti joins") {
    val p4 = plan("sql26_tpch_q4")
    assert(p4.contains("Semi"), "Q4's EXISTS must plan as a semi join")
    assert(!p4.contains("CartesianProduct") && !p4.contains("BroadcastNestedLoopJoin"),
      "the lateness correlation rides the equi orderkey, never a nested loop")
    val p21 = plan("sql38_tpch_q21")
    assert(p21.contains("Semi") && p21.contains("Anti"),
      "Q21 needs BOTH the other-supplier semi join and the also-late anti join")
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoopJoin"),
      "non-equi lateness terms must ride the equi orderkey as residuals")
  }

  test("sql35/sql40: correlated aggregates decorrelate to aggregate joins") {
    for (name <- Seq("sql35_tpch_q17", "sql40_tpch_q2")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: the correlated subquery must decorrelate onto the partkey equi join")
      assert(p.contains("Aggregate") || p.contains("HashAggregate"),
        s"$name: expected the decorrelated aggregate")
    }
  }

  test("sql25: the OR-of-ANDs predicate never demotes the equi join") {
    val p = plan("sql25_tpch_q19")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the disjunction must evaluate as a residual on an equi join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "expected a hash-family join")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // AQE's toString hides the codegen wrapping; ask the codegen
    // debugger how many fused subtrees the executed plan holds.
    val df = SparkEntry.queries("q02_filter_project")(spark, dir)
    df.collect()
    val s = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(s.contains("WholeStageCodegen") && !s.contains("Found 0 WholeStageCodegen"),
      s"hot path dropped out of codegen:\n${s.linesIterator.take(3).mkString("\n")}")
  }
}
