package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The relational operator surface of the engine: aggregation, joins,
  * windows, set ops, top-k, time-bucketed rollups — the analytics layer
  * the reference delegates to Postgres/Metabase (SURVEY.md §2 O19,
  * `README.md:146-151` of the reference) plus the operator categories
  * §2.1 enumerates (filters, joins, windows, sorts, set ops, scalar
  * functions) that any user of the warehouse table needs.
  *
  * Scale notes (applies to every query here):
  *  - All scans go through [[graft.core.Tables]] → plain parquet scans;
  *    filters and projections below are Catalyst-pushable
  *    (`PushedFilters`/`ReadSchema` verified in PlansSpec).
  *  - Dimension tables (region/nation/customer/part/supplier) are
  *    explicitly `broadcast()` so fact-side data never shuffles for
  *    those joins at any scale.
  *  - Aggregations rely on Spark's partial (map-side) aggregation;
  *    nothing here materializes an unbounded driver-side collection.
  *  - Every query ends in a deterministic ORDER BY so oracle compares
  *    are stable; at production scale the final sort is a small
  *    result-set sort (TakeOrderedAndProject where LIMIT is present).
  */
object Relational {

  /** Cross-engine deterministic 2-dp rounding for per-row money math:
    * `floor(x*100 + 0.5)/100` runs the same IEEE double op sequence in
    * Spark and DuckDB, unlike `round()` (Spark: HALF_UP on the decimal
    * string; DuckDB: half-even nearbyint), which systematically
    * disagrees on the exact half-cent values 2-dp source data
    * produces. Aggregate results keep plain round(): their inputs are
    * not systematically half-way. */
  private def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100.0

  /** Bit-deterministic aggregation of decimal-quantized doubles: the
    * testdata's money columns are 2-dp (products of them 4-dp), so
    * `floor(x*scale+0.5)` is an exact integer per row, integer sums in
    * double are exact (< 2^53) and therefore order-independent, and
    * the final divide is the same IEEE op in Spark and DuckDB. Plain
    * `sum`/`avg` of raw doubles differs between engines in the last
    * ulps (different accumulation order), which can flip any
    * subsequent rounding at a boundary. */
  private def qsum(c: Column, scale: Int): Column =
    sum(floor(c * scale + lit(0.5))) / scale.toDouble
  private def qavg(c: Column, scale: Int): Column =
    avg(floor(c * scale + lit(0.5))) / scale.toDouble

  /** TPC-H Q1-style pricing summary: grouped full-scan aggregation with
    * partial aggregation map-side. Reference analog: the Metabase
    * SUM/GROUP BY dashboards (O19). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        qsum(col("l_extendedprice"), 100).as("sum_base_price"),
        qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        qavg(col("l_discount"), 100).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filter + projection + derived scalar column (reference O7: value
    * derivation is exactly this shape). Predicate and column pruning
    * must reach the parquet scan. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-09-01").cast("timestamp") &&
        col("l_discount") > lit(0.05))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Revenue by nation: fact table joined to two broadcast dims, then
    * grouped. The orders→customer join shuffles on custkey only if AQE
    * does not broadcast customer; nation is always broadcast. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(qsum(col("o_totalprice"), 100).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** Revenue by region: one more broadcast hop (nation→region),
    * snowflake-style. */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(qsum(col("o_totalprice"), 100).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name")
  }

  /** Top-k by value: ORDER BY + LIMIT, which Spark plans as
    * TakeOrderedAndProject — per-partition top-k then a k-row driver
    * merge; no full sort, no full shuffle, scale-safe. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Window function: best order per customer via row_number. One
    * shuffle on the partition key; within-partition sort only. */
  def bestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** Top-3 orders per customer through the engine's CUSTOM plan node
    * ([[graft.plans.TopKPerKey]]): same result as the `row_number <= 3`
    * window formulation (the oracle), but the physical operator keeps
    * a bounded 3-row heap per key instead of sorting each partition —
    * the custom logical-plan → strategy → SparkPlan stack end to end. */
  def nativeTopOrders(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.topKPerKey(
      Tables.orders(spark, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), "o_totalprice", 3, tieBreakers = Seq("o_orderkey"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** Distinct aggregation (expand + two-phase agg under the hood). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** Anti join: customers that never ordered (NOT EXISTS). Broadcast
    * the distinct key set when small; AQE handles it. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Semi join with a correlated predicate: customers having at least
    * one order above a threshold (EXISTS). */
  def bigSpenders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Set operation: INTERSECT of the customer sets with open and
    * finished orders (planned as an aggregate-style hash semi). */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    f.intersect(p).orderBy("o_custkey")
  }

  /** Set operation: UNION DISTINCT across two filtered branches. */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("c_custkey"))
    c.union(o).distinct().orderBy("c_custkey")
  }

  /** EXCEPT: building-segment customers that never placed an order. */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    c.except(o).orderBy("c_custkey")
  }

  /** Keyed last-writer-wins dedup — the exact semantics of the
    * reference's UPSERT (O14, `cocoa_processing_dag.py:223-237`)
    * expressed as a window: one shuffle on the key, then keep the
    * newest row per key. This is the query-shaped twin of
    * [[graft.pipeline.Merge]]. */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** Time-bucketed aggregation ("quality trends" analog, O19): tumbling
    * day buckets via date_trunc, grouped with the categorical column. */
  def dailyEventStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        qsum(col("value"), 100).as("total_value"),
        qavg(col("value"), 100).as("avg_value"))
      .orderBy("day", "event_type")

  /** Semi-structured JSON on the data plane: extract a field from the
    * events `props` JSON column and aggregate it — the engine-side
    * twin of a JSON-functions dashboard query (§2.1 notes the
    * reference keeps JSON control-plane-only; the engine supports it
    * on rows). `get_json_object` is codegen'd; the cast-to-long keeps
    * the aggregate exact. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  /** ROLLUP grouping sets over the two lineitem status dimensions. */
  def rollupQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))
      .orderBy("flag", "status")

  /** CUBE grouping sets: all four aggregation granularities over the
    * two status dimensions in one pass (rollup covers the
    * hierarchical subset; CUBE completes the §2.1 grouping-set
    * family). */
  def cubeQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))
      .orderBy("flag", "status")

  /** LEFT OUTER join with a real null branch: lineitems against the
    * large-size part subset — rows whose part is outside the subset
    * keep a null brand, aggregated under 'NONE'. The dim subset is
    * broadcast; the fact side never shuffles for the join. */
  def leftJoinBrands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val bigParts = Tables.part(spark, dir).filter(col("p_size") >= 40)
    li.join(broadcast(bigParts), li("l_partkey") === bigParts("p_partkey"), "left_outer")
      .groupBy(coalesce(col("p_brand"), lit("NONE")).as("brand"))
      .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
      .orderBy("brand")
  }

  /** FULL OUTER join — the O14 merge shape as a query: per-customer
    * 1995 vs 1996 order spending, customers present in either year,
    * nulls where a year is absent. One shuffle per aggregate on the
    * join key; the join reuses that partitioning. */
  def fullOuterYearSpend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def yearly(y: Int) = o
      .filter(year(col("o_orderdate")) === y)
      .groupBy(col("o_custkey"))
      .agg(qsum(col("o_totalprice"), 100).as(s"spend_$y"))
    yearly(1995).join(yearly(1996), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("spend_1995"), lit(0.0)).as("spend_1995"),
        coalesce(col("spend_1996"), lit(0.0)).as("spend_1996"))
      .orderBy("o_custkey")
  }

  /** AS-OF join over the event stream: each purchase is joined to the
    * same user's most recent prior-or-simultaneous click (see
    * [[AsOfJoin]] — union + keyed window, one shuffle, no native
    * operator needed). Timestamps surface as epoch millis for
    * cross-engine stability. */
  def asofClicks(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "ts",
      Map("ts" -> "click_ts", "value" -> "click_value"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        unix_millis(col("click_ts")).as("click_ts_ms"),
        col("click_value"))
      .orderBy("event_id")
  }

  /** Ordered-set aggregates: discrete percentiles per group.
    * `percentile_disc` picks an actual element (no interpolation
    * arithmetic), which is what makes the result bit-identical across
    * engines. */
  def percentileSpend(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** q37: second-moment statistics — stddev and correlation per group,
    * EXACT across engines. The builtin `stddev`/`corr` stream float
    * sums in execution order and can never hash-match another engine;
    * here every moment (Σx, Σy, Σx², Σxy, Σy²) is an exact integer
    * sum over cent/unit-quantized values (decimal accumulation —
    * order-independent), and only the final formulas touch doubles,
    * where every op (cast, -, *, /, sqrt) is correctly rounded on
    * identical inputs. Map-side partial aggregation applies to the
    * moment sums exactly as to any sum — the one extra cost over a
    * plain aggregate is the per-row products. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("decimal(20,0)").as("x"),
      floor(col("l_quantity") + lit(0.5)).cast("decimal(20,0)").as("y"))
    val a = q.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cxy = col("n") * col("sxy") - col("sx") * col("sy")
    a.select(col("l_returnflag"), col("n"),
      col("sx").cast("long").as("sum_price_cents"),
      ((col("sx").cast("double") / col("n").cast("double")) / lit(100.0)).as("avg_price"),
      sqrt(vx.cast("double") / (col("n") * (col("n") - 1)).cast("double")).as("std_price_cents"),
      (cxy.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Scalar-function surface: string, date and arithmetic functions in
    * one projection (reference O7/O8 and §2.1 scalar functions). */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderstatus"), 1, 1).as("status_1"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        round2(col("o_totalprice") * 0.1).as("tithe"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"))
      .orderBy("o_orderkey")

  /** HAVING: post-aggregation filter on group cardinality. */
  def frequentCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        qsum(col("o_totalprice"), 100).as("total_spent"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey")

  /** Fact-fact join with a broadcast dim: revenue by part brand.
    * lineitem⋈part is broadcast (part is the small side at every SF
    * ratio: |part| ≈ |lineitem|/30). */
  def revenueByBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** revenueByBrand executed through the salted join (Skew operator):
    * identical results — shares q18's oracle — but a hot part key
    * would spread over 8 reducers. On this unskewed fixture it simply
    * proves semantic equivalence; the skew behavior itself is measured
    * in SkewSpec. */
  def saltedRevenueByBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).withColumnRenamed("p_partkey", "l_partkey")
    Skew.saltedEquiJoin(li, p, "l_partkey", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Gap-based sessionization over the event stream: lag + conditional
    * flag + running sum — the classic two-window composition. One
    * shuffle on user_id, reused by both windows (same partitioning). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapMs = 30L * 60 * 1000
    Tables.events(spark, dir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"))
      .orderBy("user_id", "session_id")
  }

  /** Approximate aggregates — the sketch family Spark ships natively:
    * HyperLogLog++ distinct counts and quantile sketches. At 100 TB
    * these replace exact distinct/percentile (whose state is O(n))
    * with bounded-memory mergeable sketches.
    *
    * ORACLE SHAPE: the sketch VALUES can't be compared across engines
    * (DuckDB's sketches differ by construction), so the query emits
    * the EXACT side (integer distinct counts — engine-portable) plus
    * one boolean bounded-error certificate per sketch column
    * (`|approx − exact| ≤ bound`). Every output column is then
    * deterministic on both engines: DuckDB recomputes the exact
    * counts and emits literal TRUE for the certificates, so the
    * driver hash-compares the whole row. The sketches are still
    * computed Spark-side in the same aggregate — the certificate is
    * only green when the HLL++/KLL machinery actually lands inside
    * its published error bound (rsd 0.01 → 5% is generous; quantile
    * accuracy 10000 → 2% relative on the price distribution). */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99_approx"),
        expr("percentile(l_extendedprice, 0.5d)").as("p50_exact"),
        expr("percentile(l_extendedprice, 0.99d)").as("p99_exact"))
      .select(
        col("exact_parts"), col("exact_supps"),
        (abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * 0.05).as("parts_ok"),
        (abs(col("approx_supps") - col("exact_supps")) <= col("exact_supps") * 0.05).as("supps_ok"),
        (abs(col("p50_approx") - col("p50_exact")) <= abs(col("p50_exact")) * 0.02).as("p50_ok"),
        (abs(col("p99_approx") - col("p99_exact")) <= abs(col("p99_exact")) * 0.02).as("p99_ok"))

  /** The raw sketch values (HLL++ distinct estimates + KLL quantile
    * estimates) — the production surface a user calls; [[approxStats]]
    * wraps it with the exactness certificate the driver gate hashes.
    * Kept separate so the certificate never hides the actual API. */
  def approxStatsRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99_price"))

  /** q47: DATA-QUALITY CONSTRAINT AUDIT — the post-load dbt-test
    * report over the star schema: row predicates folded into one scan
    * per table, key uniqueness, referential integrity. The fixture's
    * negative account balances make a real non-zero row (a report of
    * all zeros would prove only that nothing was checked); the zero
    * rows pin that clean constraints stay clean. */
  def constraintAudit(spark: SparkSession, dir: String): DataFrame = {
    import Audit.RowCheck
    val li = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    Audit.rowChecks(li, Seq(
        RowCheck("lineitem_quantity_range",
          !(col("l_quantity") >= 1 && col("l_quantity") <= 50)),
        RowCheck("lineitem_price_positive", !(col("l_extendedprice") > 0)),
        RowCheck("lineitem_shipdate_notnull", col("l_shipdate").isNull)))
      .unionByName(Audit.rowChecks(Tables.customer(spark, dir), Seq(
        RowCheck("customer_acctbal_nonneg", col("c_acctbal") < 0))))
      .unionByName(Audit.rowChecks(Tables.documents(spark, dir), Seq(
        RowCheck("documents_text_present",
          col("text").isNull || length(trim(col("text"))) === 0))))
      .unionByName(Audit.uniqueKey(orders, Seq("o_orderkey"), "orders_pk_unique"))
      .unionByName(Audit.refIntegrity(li, Seq("l_orderkey"),
        orders, Seq("o_orderkey"), "lineitem_orders_fk"))
      .orderBy("constraint_name")
  }

  /** q46: PERSISTED SKETCH-TABLE ROLLUP — the 100 TB distinct-count
    * architecture: per-(event_type, day) HyperLogLog sketches are
    * materialized to a parquet sketch table (KB-scale binary rows),
    * and the per-type distinct-user rollup is computed by MERGING the
    * stored sketches — the raw events are never rescanned at query
    * time. This is what q22's in-flight sketches become when they
    * need to survive between runs: daily jobs append sketch rows;
    * any cube cell (type, month, all-time) is a union over stored
    * sketches, O(cells) not O(events).
    *
    * Certificate shape (the q22/v02 discipline): the oracle
    * recomputes the EXACT distinct counts; the Spark side emits them
    * plus two distributively-computed booleans — the stored-sketch
    * rollup estimate must agree with the direct one-pass estimate
    * (persistence + merge lose nothing), and the estimate must sit
    * within 5% of exact (lgK=12's 1.6% RSE, three-sigma margin).
    * DuckDB affirms literal TRUE. */
  def hllSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val path = graft.core.RunTemp.dir("graft_hll_daily_")
    ev.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
      .write.mode("overwrite").parquet(path)
    val rolled = spark.read.parquet(path)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_rollup"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
        countDistinct(col("user_id")).as("exact_users"))
    rolled.join(direct, "event_type")
      .select(col("event_type"), col("exact_users"),
        (col("est_rollup") === col("est_direct")).as("rollup_consistent"),
        (abs(col("est_rollup") - col("exact_users")) <=
          col("exact_users") * 0.05).as("est_ok"))
      .orderBy("event_type")
  }

  /** q48: persisted MERGEABLE QUANTILE sketch table — the quantile
    * twin of q46's HLL rollup. The sketch is a KMV/bottom-k uniform
    * row sample (the k smallest md5(event_id) keys per cell, carrying
    * their values): mergeable by "union the samples, keep the global
    * bottom-k" — a monotone selection, so merging per-day sketches
    * yields EXACTLY the sketch a direct one-pass build produces, and
    * the whole two-phase pipeline is hash-certifiable against a SQL
    * re-derivation (unlike interpolation-based sketches, whose merge
    * is lossy and engine-specific). Quantile estimates are the
    * sample's exact discrete quantiles at integer-arithmetic ranks
    * ceil(q·n) — no float positions anywhere. Sample error is the
    * standard uniform-sample bound (rank error O(1/√k)); the spec
    * asserts the estimates against the exact quantiles.
    *
    * Scale shape: per-day sketches build through the bounded-heap
    * TopKPerKey (no per-cell sort materializes); the stored sketch
    * table is O(cells · k) — the rollup never rescans events. */
  def quantileSketchRollup(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("event_type"),
      date_trunc("day", col("ts")).as("day"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("v_cents"),
      md5(col("event_id").cast("string")).as("skey"))
    val path = graft.core.RunTemp.dir("graft_kmv_daily_")
    graft.plans.TopK.bottomKPerKey(ev, Seq("event_type", "day"), "skey", k,
        tieBreakers = Seq("event_id"))
      .groupBy("event_type", "day")
      .agg(sort_array(collect_list(struct(col("skey"), col("v_cents")))).as("sample"))
      .write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
      .select(col("event_type"), explode(col("sample")).as("s"))
      .select(col("event_type"), col("s.skey").as("skey"), col("s.v_cents").as("v_cents"))
    val merged = graft.plans.TopK.bottomKPerKey(
      stored, Seq("event_type"), "skey", k, tieBreakers = Seq("v_cents"))
    def at(rankExpr: String) = expr(s"vs[CAST(($rankExpr) AS INT) - 1]")
    merged.groupBy("event_type")
      .agg(sort_array(collect_list(col("v_cents"))).as("vs"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n").as("n_sample"),
        at("(n + 1) div 2").as("p50_est"),
        at("(9 * n + 9) div 10").as("p90_est"),
        at("(99 * n + 99) div 100").as("p99_est"))
      .orderBy("event_type")
  }

  /** q51: HEAVY HITTERS per event type — the top users by activity,
    * answered from a [[graft.functions.MisraGriesAgg]] Misra–Gries
    * sketch (capacity 256) rather than a full (type, user) count
    * table. At 100 TB the difference is structural: the full count
    * table is O(types × users) and shuffles every event's key; the
    * sketch is ≤ capacity pairs per type, map-side combined, with a
    * deterministic n/(k+1) undercount bound. The gate runs in the
    * sketch's EXACT regime (fixture user count ≪ capacity, so the
    * counters are true counts and the DuckDB oracle recomputes them
    * as plain GROUP BY); the decrement/merge bound regime is pinned
    * by MisraGriesSpec. Final top-10 ranking windows over ≤ capacity
    * rows per type — post-sketch, never over raw events. */
  def heavyHitters(spark: SparkSession, dir: String,
      capacity: Int = 256, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sk = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(graft.functions.MisraGriesAgg.mgSketch(col("user_id"), capacity).as("sk"))
      .select(col("event_type"), explode(col("sk")).as("h"))
      .select(col("event_type"), col("h.item").as("user_id"),
        col("h.cnt_lb").as("cnt_lb"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("cnt_lb").desc, col("user_id").asc)
    sk.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .orderBy("event_type", "rank")
  }

  /** q52: audience SET OPERATIONS from persisted KMV sketches —
    * distinct-user union and intersection for every event-type PAIR,
    * answered entirely from per-type bottom-k sketches (k smallest
    * 48-bit md5 hashes of user_id), never by re-joining raw events.
    * This is the sketch-algebra the q46/q48 rollups stop short of:
    * KMV sketches compose under set ops (union = bottom-k of the
    * merged sample; intersection via the matched fraction of the
    * union sample — Beyer et al., SIGMOD'07), so N audiences yield
    * N·(N−1)/2 overlap cells from N KB-scale sketches.
    *
    * Exactness regime (the gate's): while a pair's true union fits in
    * k, the merged sketch IS the full hash set, both estimates are
    * exact, and the DuckDB oracle recomputes them as plain distinct
    * counts — the fixture's 150–1500 users sit far under k = 4096 at
    * every SF, bench included. Past k the estimator branch takes over
    * (integer floor arithmetic on the k-th smallest hash:
    * est = (k−1)·2^48 div h_k; intersection scaled by the matched
    * fraction) — pinned against exact truth within KMV's relative
    * error in the spec, not the gate (estimates depend on k alone, so
    * they stay deterministic, but writing a DuckDB twin of the whole
    * estimator would certify arithmetic, not the operator).
    *
    * Scale shape: the sketch build is the bounded-heap TopKPerKey (no
    * per-type sort); the pair stage crossJoins the O(types) one-row-
    * per-type sketch table — bounded by design, the whole point of
    * sketch algebra. */
  def kmvSetOps(spark: SparkSession, dir: String, k: Int = 4096): DataFrame = {
    val hashSpace = 1L << 48
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("skey"))
      .distinct()
    val path = graft.core.RunTemp.dir("graft_kmv_users_")
    graft.plans.TopK.bottomKPerKey(ev, Seq("event_type"), "skey", k)
      .write.mode("overwrite").parquet(path)
    val sk = spark.read.parquet(path)
      .groupBy("event_type")
      .agg(sort_array(collect_list(col("skey"))).as("hs"))
    val a = sk.select(col("event_type").as("type_a"), col("hs").as("ha"))
    val b = sk.select(col("event_type").as("type_b"), col("hs").as("hb"))
    val merged = a.crossJoin(b).filter(col("type_a") < col("type_b"))
      .withColumn("m_all", sort_array(array_union(col("ha"), col("hb"))))
      .withColumn("m", slice(col("m_all"), 1, k))
      .withColumn("common",
        size(array_intersect(array_intersect(col("m"), col("ha")), col("hb")))
          .cast("long"))
    merged.select(
      col("type_a"), col("type_b"),
      when(size(col("m_all")) < k, size(col("m_all")).cast("long"))
        .otherwise(expr(s"(${k - 1}L * ${hashSpace}L) div element_at(m, $k)"))
        .as("est_union"),
      when(size(col("m_all")) < k, col("common"))
        .otherwise(expr(s"(common * ((${k - 1}L * ${hashSpace}L) div element_at(m, $k))) div $k"))
        .as("est_inter"))
      .orderBy("type_a", "type_b")
  }

  /** q53: 2-D SKYLINE (Pareto frontier) — the orders no other order
    * beats on BOTH dimensions (price ≤, order date ≥, one strict):
    * "cheapest for its recency". The naive formulation is the O(n²)
    * dominance NOT EXISTS (that stays the oracle); the engine
    * computes it from PER-DATE AGGREGATES instead: an order is on the
    * frontier iff it carries its date's minimum price AND that price
    * is strictly below every STRICTLY-LATER date's minimum (same-date
    * cheaper rows dominate via strict price; later equal-price rows
    * dominate via strict date; equal (price, date) twins don't
    * dominate each other and all survive — exactly the NOT EXISTS
    * semantics, proven case by case in RelationalSpec).
    *
    * Scale shape: one map-side-combined (date → min price) aggregate
    * — O(distinct dates) rows, the calendar — one tiny suffix-min
    * window over those dates, and one broadcast join back to the
    * scan. Nothing pairwise ever materializes; the frontier of 100 TB
    * of orders costs one aggregate + one broadcast probe. */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderdate"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("price_cents"))
    val daily = o.groupBy("o_orderdate").agg(min("price_cents").as("dmin"))
    // strictly-later suffix min: window over O(distinct dates) rows
    val w = Window.orderBy(col("o_orderdate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = daily.withColumn("min_later", min(col("dmin")).over(w))
    o.join(broadcast(frontier), "o_orderdate")
      .filter(col("price_cents") === col("dmin") &&
        (col("min_later").isNull || col("price_cents") < col("min_later")))
      .select("o_orderkey", "o_orderdate", "price_cents")
      .orderBy("o_orderkey")
  }

  /** q54: DISTRIBUTION DRIFT between two time slices — per event
    * type, the total-variation distance (in integer basis points)
    * between the first and second half-month's distribution over
    * `props.k` deciles, plus both slice populations. This is the
    * data-quality monitor a recurring ingest needs (did this crawl's
    * feature distribution shift against the last one?), kept fully
    * integer — per-bucket shares floor to basis points, TV = Σ|Δ|/2 —
    * so the statistic is bit-identical in any engine (the float-PSI
    * ln() this replaces is not even order-independent).
    *
    * Scale shape: one map-side-combined (type, bucket) aggregate
    * carrying both halves as conditional sums (no second scan, no
    * join of two filtered passes), a per-type total, and a broadcast
    * join — O(types × buckets) rows after the first aggregate. */
  /** Shared first stage of q54/q55: per-(type, props.k-decile) counts
    * carrying BOTH half-month slices as conditional sums — one scan,
    * one map-side-combined aggregate. */
  private def halfSliceBuckets(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 10").as("bucket"),
      (col("ts") < to_timestamp(lit("2024-01-16 00:00:00"))).as("fh"))
    ev.groupBy("event_type", "bucket").agg(
      sum(when(col("fh"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("fh"), 1L).otherwise(0L)).as("cb"))
  }

  def distributionDrift(spark: SparkSession, dir: String): DataFrame = {
    val agg = halfSliceBuckets(spark, dir)
    val tot = agg.groupBy("event_type")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    agg.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("na"), col("nb"),
        abs(expr("ca * 10000 div na") - expr("cb * 10000 div nb")).as("d"))
      .groupBy("event_type", "na", "nb")
      .agg(expr("sum(d) div 2").as("tv_bp"))
      .select(col("event_type"), col("na").as("n_first"),
        col("nb").as("n_second"), col("tv_bp"))
      .orderBy("event_type")
  }

  /** q55: KOLMOGOROV–SMIRNOV drift in integer basis points — the
    * CUMULATIVE complement of q54's TV distance: the maximum gap
    * between the two slices' cumulative bucket distributions. KS and
    * TV answer different questions (TV sums all local disagreement;
    * KS finds the worst threshold — the value a drift MONITOR alarms
    * on and the statistic a location shift moves most), so both ship.
    * Same integer discipline: per-side cumulative shares floor to
    * basis points before the gap, so the statistic is bit-identical
    * in any engine. Scale shape: rides [[halfSliceBuckets]]'s one
    * aggregate; the cumulative window runs over O(types × buckets)
    * rows. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = halfSliceBuckets(spark, dir)
    val tot = agg.groupBy("event_type")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("na"), col("nb"),
        abs(expr("cuma * 10000 div na") - expr("cumb * 10000 div nb")).as("d"))
      .groupBy("event_type", "na", "nb")
      .agg(max(col("d")).as("ks_bp"))
      .select(col("event_type"), col("na").as("n_first"),
        col("nb").as("n_second"), col("ks_bp"))
      .orderBy("event_type")
  }

  /** Pivot: quantity totals per linestatus pivoted by returnflag —
    * oracle-expressed as CASE aggregation (identical output columns
    * A/N/R in both engines). */
  def pivotQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum("l_quantity"))
      .orderBy("l_linestatus")

  /** Generator/UDTF shape: explode the token stream and count global
    * token frequencies — one explode + hash aggregate, the canonical
    * flatMap-then-reduce. Top 50 for a bounded, deterministic result
    * (ties broken by token). */
  def tokenFrequencies(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)

  /** Date arithmetic: intervals, day differences, extraction. */
  def dateArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_eoy"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .orderBy("o_orderkey")

  /** String-function surface: pad, replace, locate, reverse, repeat. */
  def stringFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 200)
      .select(
        col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        repeat(substring(col("c_mktsegment"), 1, 1), 3).as("seg_x3"))
      .orderBy("c_custkey")

  /** Conditional buckets: CASE-based price tiering + counts. */
  def priceTiers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        when(col("o_totalprice") < 100000.0, "low")
          .when(col("o_totalprice") < 250000.0, "mid")
          .otherwise("high").as("tier"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"))
      .orderBy("tier")

  /** Null-semantics surface: nullif produces nulls, count/agg skip
    * them, coalesce restores defaults. */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(nullif(col("o_orderstatus"), lit("O"))).as("n_not_open"),
        sum(coalesce(nullif(col("o_orderstatus"), lit("O")), lit(null))
          .isNotNull.cast("long")).as("n_not_open2"))
      .orderBy("o_orderpriority")

  /** q38: EXACT GLOBAL RANK + ntile binning WITHOUT a global-ordering
    * window. `ntile(k) OVER (ORDER BY …)` moves the whole table into
    * ONE window partition — a sequential single-task sort at scale.
    * This is the distributed-exact formulation (the d22 prefix-sum
    * pattern applied to ranks):
    *
    *  1. range-partition the (key, tiebreak) projection and
    *     MATERIALIZE the partition id ([[graft.core.RunTemp]] staging:
    *     a re-evaluated range exchange may re-sample its bounds, and
    *     phase 2 must see the same pids phase 1 counted);
    *  2. per-pid row counts → each pid's global rank offset via a
    *     cumulative sum over the TINY (≤ shuffle-partitions rows)
    *     subtotal frame;
    *  3. partition-LOCAL row_number + broadcast offset = exact global
    *     rank; SQL-standard ntile is then pure arithmetic on
    *     (rank, N): the first N mod k buckets take ⌈N/k⌉ rows, the
    *     rest ⌊N/k⌋ — bit-identical to the engines' ntile given the
    *     same total order.
    *
    * Output is the per-decile profile (count / min / max / sum over
    * exact cents), which pins every bucket boundary — a single
    * misplaced rank shifts some bucket's lo/hi/sum. Parallelism is
    * O(partitions) regardless of value skew (the range partitioner
    * samples its bounds from the data). */
  def globalRankDeciles(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val t = Tables.orders(spark, dir).select(col("o_orderkey"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
    val parts = spark.sessionState.conf.numShufflePartitions
    val tmp = graft.core.RunTemp.dir("graft_rank_")
    t.repartitionByRange(parts, col("cents"), col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
      .write.mode("overwrite").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    val sub = staged.groupBy("pid").agg(count(lit(1)).as("cnt"))
    // subtotal frame ≤ `parts` rows — the only unpartitioned window
    // in the plan runs over it, never over the data
    val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val off = sub
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select("pid", "off")
    val total = sub.agg(sum(col("cnt")).cast("long").as("n_total"))
    val wLocal = Window.partitionBy("pid").orderBy("cents", "o_orderkey")
    val ranked = staged.join(broadcast(off), Seq("pid"))
      .withColumn("rank", col("off") + row_number().over(wLocal).cast("long"))
      .crossJoin(broadcast(total))
    // SQL ntile(k): q = N div k, rem = N mod k; bucket sizes q+1 for
    // the first rem buckets, q after. q = 0 (N < k) degenerates to
    // bucket = rank. Integer floorDiv via subtract-the-remainder —
    // dividing an exact multiple is safe where a bare double division
    // could round across the floor (see RangeJoin.bandOf).
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val q = idiv(col("n_total"), lit(k))
    val rem = col("n_total") % k
    val decile = when(lit(k) >= col("n_total"), col("rank"))
      .when(col("rank") <= rem * (q + 1), idiv(col("rank") - 1, q + 1) + 1)
      .otherwise(rem + idiv(col("rank") - rem * (q + 1) - 1, q) + 1)
    ranked.withColumn("decile", decile.cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
        max(col("cents")).as("hi"), sum(col("cents")).as("sum_cents"))
      .orderBy("decile")
  }

  /** q39: the portable Bloom pre-join filter, CERTIFIED bit-for-bit —
    * the explicit form of runtime bloom-filter join pruning (what
    * `spark.sql.optimizer.runtime.bloomFilter` injects): fold the
    * SMALL side's keys into one bitset
    * ([[graft.functions.BloomExpressions.BloomBuildAgg]] — map-side
    * partial bitsets, word-OR merge), broadcast the ~2 KB artifact,
    * and probe every fact key with a codegen'd per-row expression. At
    * 100 TB the value is rows dropped BEFORE the join's exchange:
    * pruned rows never serialize into a shuffle.
    *
    * The output emits each probe key's `bloom_pass` bit next to its
    * true membership — the hash gate then certifies the ENTIRE bit
    * chain (seed derivation, mix finalizer, masked positions, bitset
    * OR-fold, probe conjunction): DuckDB rebuilds the bit-position
    * set from the build keys and re-evaluates every probe, so one
    * flipped bit anywhere breaks the hash. False positives are
    * expected (and certified as such) — at the fixture's build-side
    * density the bitset is deliberately lossy. */
  def bloomPrefilterFlags(spark: SparkSession, dir: String,
      mBits: Int = 16384, k: Int = 3): DataFrame = {
    import graft.functions.BloomExpressions
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 480000)
      .select(col("o_orderkey").as("key"))
    val bloom = hot.agg(BloomExpressions.bloomBuild(col("key"), mBits, k).as("bloom"))
    val probes = Tables.lineitem(spark, dir).select("l_orderkey").distinct()
    probes.crossJoin(broadcast(bloom))
      .withColumn("bloom_pass",
        BloomExpressions.bloomContains(col("bloom"), col("l_orderkey"), mBits, k))
      .join(hot.select(col("key").as("l_orderkey"), lit(true).as("is_member")),
        Seq("l_orderkey"), "left")
      .select(col("l_orderkey"), col("bloom_pass"),
        coalesce(col("is_member"), lit(false)).as("is_member"))
      .orderBy("l_orderkey")
  }

  /** q40: FUNNEL analysis — per user, the deepest strictly-ordered
    * view → click → purchase sequence, computed by iterated
    * earliest-qualifying-step aggregation: t1 = first view,
    * t2 = first click after t1, t3 = first purchase after t2. The
    * product-analytics staple the warehouse's analytics surface
    * (SURVEY §2 O19 family) would serve from the events table.
    *
    * Scale shape: three user-keyed aggregations, each a map-side-
    * combined min over a type-filtered slice (filters reach the
    * scan), joined back on the SAME user_id key — no per-user event
    * sort, no window over the raw stream, state O(users). Timestamps
    * compare as µs epochs on both engines (the s06/q36 contract:
    * Spark's events ts is µs-truncated at read; DuckDB's epoch_us
    * truncates identically). */
  def funnelDepth(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1_us"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("us") > col("t1_us"))
      .groupBy("user_id").agg(min("us").as("t2_us"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("us") > col("t2_us"))
      .groupBy("user_id").agg(min("us").as("t3_us"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + when(col("t2_us").isNotNull, 1L).otherwise(0L)
          + when(col("t3_us").isNotNull, 1L).otherwise(0L)).as("depth"),
        col("t1_us"), col("t2_us"), col("t3_us"))
      .orderBy("user_id")
  }

  /** q56: TIME-CONSTRAINED funnel — q40's earliest-qualifying-step
    * chain with the product requirement real funnels carry: each next
    * step must land within `windowUs` of the PREVIOUS step (a click a
    * week after the view is not conversion). Same scale shape as q40
    * — per-step one conditional aggregate joined to the previous
    * step's per-user scalar (broadcast-sized at any realistic user
    * count), never a per-user event sort — the window bound is just
    * one more pushdown-friendly predicate on each step's filter.
    * CONTRACT: this is the GREEDY first-touch funnel (each step
    * anchors at its EARLIEST qualifying event) — the standard
    * product-analytics semantics, and deterministic — NOT a
    * depth-maximal search: under a window, anchoring later at step k
    * can occasionally rescue step k+1 (unbounded q40 has no such
    * case), and the oracle replays exactly the greedy rule. */
  def windowedFunnel(spark: SparkSession, dir: String,
      windowUs: Long = 3600000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1_us"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("us") > col("t1_us") && col("us") <= col("t1_us") + windowUs)
      .groupBy("user_id").agg(min("us").as("t2_us"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("us") > col("t2_us") && col("us") <= col("t2_us") + windowUs)
      .groupBy("user_id").agg(min("us").as("t3_us"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + when(col("t2_us").isNotNull, 1L).otherwise(0L)
          + when(col("t3_us").isNotNull, 1L).otherwise(0L)).as("depth"),
        col("t1_us"), col("t2_us"), col("t3_us"))
      .orderBy("user_id")
  }

  /** q41: 3σ OUTLIER detection per event_type, INTEGER-EXACT — the
    * data-quality monitor a pipeline runs over incoming metrics. The
    * test |x − μ| > 3σ is evaluated without ever computing μ or σ in
    * floats: with integer cent sums (n, sx, sxx), it is equivalent to
    *   (n−1)·(n·x − sx)² > 9·n·(n·sxx − sx²)
    * — both sides exact integers (DECIMAL(38,0) here, HUGEINT in the
    * oracle), so the flag is bit-portable where a float σ comparison
    * would flip on boundary values (the q37 exact-moments technique
    * applied to a predicate). Scale shape: one map-side-combined
    * moments aggregate (5 rows), broadcast back over the stream —
    * per-row codegen'd arithmetic, no second shuffle. */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame = {
    // cast BEFORE multiplying: every overflow-prone product — the
    // per-row square feeding sxx included — runs in DECIMAL(38,0)
    // to mirror the oracle's HUGEINT. A Long sxx would silently wrap
    // after ~9e6 rows per event_type at v_cents ~1e6 (non-ANSI mode),
    // flipping flags well below the 100 TB regime.
    def big(c: Column) = c.cast("decimal(38,0)")
    val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("v_cents"))
    val moments = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("v_cents").as("sx"),
      sum(big(col("v_cents")) * col("v_cents")).as("sxx"))
    val dev = big(col("n")) * big(col("v_cents")) - big(col("sx"))
    val lhs = (big(col("n")) - 1) * dev * dev
    val rhs = big(lit(9)) * big(col("n")) *
      (big(col("n")) * big(col("sxx")) - big(col("sx")) * big(col("sx")))
    ev.join(broadcast(moments), "event_type")
      .filter(col("n") > 1 && lhs > rhs)
      .select(col("event_id"), col("event_type"), col("v_cents"))
      .orderBy("event_id")
  }

  /** q42: COHORT RETENTION — users grouped by signup week, counted in
    * each subsequent week they produced any event: the
    * product-analytics retention matrix. Week buckets come from
    * date_trunc('week') (ISO Monday start on both engines, UTC
    * sessions), and the offset is exact integer arithmetic on µs
    * epochs of the truncated weeks — no calendar math in doubles.
    * Scale shape: one user-keyed min (signup), one distinct over
    * (user, week), one broadcast-joinable cohort map back onto the
    * activity stream, one (cohort, offset) count — state O(users +
    * user-weeks). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
      .select(col("user_id"), date_trunc("week", col("signup_ts")).as("cohort_week"))
    val activity = ev.select(col("user_id"),
      date_trunc("week", col("ts")).as("week")).distinct()
    val wk = 7L * 86400L * 1000000L
    activity.join(cohorts, "user_id")
      .filter(col("week") >= col("cohort_week"))
      .withColumn("week_offset",
        ((unix_micros(col("week")) - unix_micros(col("cohort_week"))) / wk).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q43: time-series GAP FILL — last-observation-carried-forward
    * over a per-type daily spine, the standard warehouse treatment of
    * sparse metrics before charting/joining. The series is a
    * deterministic sparse slice of events (event_id % 101 — the
    * planting philosophy: the raw fixture is gap-free, so the
    * operator must provably fill REAL gaps); per type the spine spans
    * [first, last] observed day, missing days inherit the last
    * observed daily total (exact cents — no floats to fill with) and
    * are flagged.
    *
    * Scale shape: the daily aggregate is map-side-combined; bounds
    * are one tiny per-type row; the spine explode is
    * O(types·days) — calendar-bounded, NOT data-bounded; the fill
    * window partitions by type over that calendar-sized frame, never
    * over raw events. */
  def forwardFillDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_id") % 101 === 0)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
    val spine = daily.groupBy("event_type")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        last(col("cents"), ignoreNulls = true).over(w).as("cents_filled"),
        col("cents").isNotNull.as("is_observed"))
      .orderBy("event_type", "day")
  }

  /** q50: MARKET-BASKET association — co-purchase support and LIFT
    * over the order/part bipartite relation (the "frequently bought
    * together" rule miner; one-pass pairwise A-Priori at itemset
    * size 2). lift(u,v) = P(u,v)/(P(u)·P(v)) is emitted in exact
    * integer micro-units via the non-negative product form
    * (N·c_uv·10^6) div (c_u·c_v) — no float, no engine divergence.
    *
    * Scale shape: the pair space materializes per order (order sizes
    * are bounded, so the self-join fan-out is a constant factor on
    * lineitem) into one map-side-combined (u, v) count; the per-item
    * counts are a dimension-sized table broadcast back; top-k by
    * support is a deterministic total order (n_both desc, u, v). */
  def basketLift(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val orders = li.agg(countDistinct("ok").as("n_orders"))
    val cu = li.groupBy("p").agg(count(lit(1)).as("n_item"))
    // EXPLICIT width on the pair-expansion join: the per-order pair
    // explode + counting aggregate is CPU-heavy over byte-small rows,
    // and AQE's byte-based coalescing collapsed it to 5 tasks at
    // sf0.1 (1.1 s — the row's dominant stage). The explicit count
    // opts out of coalescing; the other side shuffles to match, and
    // the counting aggregate is exact under any partitioning.
    val width = spark.sessionState.conf.numShufflePartitions
    val a = li.select(col("ok"), col("p").as("u")).repartition(width, col("ok"))
    val b = li.select(col("ok"), col("p").as("v"))
    a.join(b, "ok").filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n_both"))
      .join(broadcast(cu.select(col("p").as("u"), col("n_item").as("n_u"))), "u")
      .join(broadcast(cu.select(col("p").as("v"), col("n_item").as("n_v"))), "v")
      .crossJoin(broadcast(orders))
      .select(col("u"), col("v"), col("n_both"), col("n_u"), col("n_v"),
        // The numerator is N·c_uv·10^6: at corpus scale (N and c_uv
        // both ~10^8-10^9) a 64-bit product wraps SILENTLY under
        // Spark's non-ANSI long arithmetic while the DuckDB oracle
        // errors loudly — a silent cross-engine divergence. Route the
        // products through decimal(38,0) (exact integers to 10^38,
        // far past any corpus bound: 10^9·10^9·10^6 = 10^24); `div`
        // on decimals is still integral division and lands back on
        // BIGINT, so the result type and every in-range value are
        // unchanged.
        expr("(cast(n_orders as decimal(38,0)) * n_both * 1000000)" +
          " div (cast(n_u as decimal(38,0)) * n_v)").as("lift_micro"))
      .orderBy(col("n_both").desc, col("u"), col("v"))
      .limit(k)
  }

  /** q49: LINEAR-INTERPOLATION gap fill — q43's spine, but interior
    * gaps take the straight line between the bracketing observations
    * instead of holding the last value (the time-series resampling
    * default for continuous measures). INTEGER-EXACT: the interpolant
    * is the weighted average
    *   (v0·(d1−d) + v1·(d−d0)) div (d1−d0)
    * in milli-cents with day indices as epoch-day integers — every
    * term is non-negative (values are cents ≥ 0 and d0 ≤ d ≤ d1), so
    * truncating and flooring division agree and both engines produce
    * the identical integer; no float ever enters. Bracketing
    * observations ride two frame-bounded window folds (last/first
    * IGNORE NULLS), O(series) with no self-join; the spine runs
    * min..max observed day per series, so every interior day has both
    * brackets by construction. */
  def interpolateDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_id") % 101 === 0)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
    val spine = daily.groupBy("event_type")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
    val past = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dayIdx = expr("unix_micros(day) div 86400000000")
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("d", dayIdx)
      .withColumn("od", when(col("cents").isNotNull, col("d")))
      .withColumn("d0", last(col("od"), ignoreNulls = true).over(past))
      .withColumn("v0", last(col("cents"), ignoreNulls = true).over(past))
      .withColumn("d1", first(col("od"), ignoreNulls = true).over(future))
      .withColumn("v1", first(col("cents"), ignoreNulls = true).over(future))
      .select(col("event_type"), col("day"),
        when(col("cents").isNotNull, col("cents") * 1000)
          .otherwise(expr(
            "(v0 * 1000 * (d1 - d) + v1 * 1000 * (d - d0)) div (d1 - d0)"))
          .as("milli_cents"),
        col("cents").isNotNull.as("is_observed"))
      .orderBy("event_type", "day")
  }

  /** q44: TABLE CHECKSUMS — the anti-entropy / reconciliation
    * primitive: per table, the row count and an ORDER-INDEPENDENT
    * 48-bit content checksum (sum of per-row md5-prefix hashes mod
    * 2^48) over a canonical projection. Two replicas — or two
    * engines — agreeing on (n_rows, checksum48) agree on the row
    * multiset without shipping any data; the DuckDB oracle IS the
    * second engine, so the gate certifies the whole canonicalization
    * (separators, cent quantization, µs epochs, null skipping) is
    * engine-portable.
    *
    * Scale shape: embarrassingly parallel map + one 2-column
    * map-side-combined aggregate per table — the cheapest possible
    * full-table pass; the mod-2^48 sum rides DECIMAL(38,0) (a raw
    * long sum overflows at ~30k rows). Doubles never enter the
    * hash: money quantizes to cents, timestamps to µs epochs, so no
    * engine float-formatting ambiguity exists. */
  def tableChecksums(spark: SparkSession, dir: String): DataFrame = {
    val M = 281474976710656L // 2^48
    def cents(c: Column) = floor(c * 100 + lit(0.5)).cast("long")
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    def hash48(s: Column) = conv(substring(md5(s), 1, 12), 16, 10).cast("long")
    def check(name: String, df: DataFrame, canon: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        pmod(sum(hash48(canon).cast("decimal(38,0)")), lit(M))
          .cast("long").as("checksum48"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum48"))
    check("customer", Tables.customer(spark, dir),
      concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
        cents(col("c_acctbal")), col("c_mktsegment")))
      .unionByName(check("lineitem", Tables.lineitem(spark, dir),
        concat_ws("|", col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), cents(col("l_extendedprice")), col("l_returnflag"),
          us(col("l_shipdate")))))
      .unionByName(check("nation", Tables.nation(spark, dir),
        concat_ws("|", col("n_nationkey"), col("n_name"), col("n_regionkey"))))
      .unionByName(check("orders", Tables.orders(spark, dir),
        concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          cents(col("o_totalprice")), us(col("o_orderdate")))))
      .unionByName(check("region", Tables.region(spark, dir),
        concat_ws("|", col("r_regionkey"), col("r_name"))))
      .orderBy("table_name")
  }

  /** Correlated scalar-aggregate pattern: each order against its
    * customer's average order value (join back an aggregate). */
  def aboveAverageOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val avgPerCust = o.groupBy(col("o_custkey").as("k"))
      .agg(qavg(col("o_totalprice"), 100).as("cust_avg"))
    o.join(avgPerCust, o("o_custkey") === avgPerCust("k"))
      .filter(col("o_totalprice") > col("cust_avg") * 1.8)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("cust_avg"))
      .orderBy("o_orderkey")
  }
}
