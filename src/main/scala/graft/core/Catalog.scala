package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the testdata tables as temp views and run
  * `spark.sql` — the full Catalyst lifecycle (SparkSqlParser →
  * analyzer → optimizer → physical planning → whole-stage codegen),
  * the engine-side equivalent of the reference's Metabase→Postgres
  * read path (SURVEY.md §3 entry point 3). Queries written in the
  * common SQL dialect run verbatim on both this engine and the DuckDB
  * oracle, so the oracle string IS the executed query. */
object Catalog {

  def registerAll(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach { name =>
      // events goes through the loader for the TIMESTAMP(NANOS) fix
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, name)
      df.createOrReplaceTempView(name)
    }
    // the full graft_* SQL surface rides along with the views: scalar
    // kernels (GraftFunctions) and table-valued operators
    // (GraftTableFunctions) — so any dialect-common query can call
    // them without a separate registration step
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GraftTableFunctions.register(spark)
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }

  /** Dialect-common SQL (runs unchanged in Spark and DuckDB) — each is
    * both the engine query and its own oracle. */
  val commonSql: Map[String, String] = Map(
    // SQL-standard UNPIVOT (wide→long reshape, the inverse of q23's
    // PIVOT): metric columns fold into (metric, val) rows. Both
    // engines name the generated columns from the FOR/IN clause
    // identically; the source is a 3-row aggregate so the reshape
    // itself costs nothing beyond the upstream groupBy.
    "sql18_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
        |         CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, metric, val
        |FROM w UNPIVOT (val FOR metric IN (qty, n_rows, n_orders))
        |ORDER BY l_returnflag, metric""".stripMargin,
    "sql01_count_by_flag" ->
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "sql02_customers_per_nation" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "sql03_top_order_per_customer" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "sql04_orders_status_mix" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    // Correlated scalar subquery: Catalyst decorrelates it into a
    // left outer aggregate join — no per-row re-execution.
    "sql05_correlated_item_counts" ->
      """SELECT o_orderkey,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders
        |WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    // IN-subquery → left semi join (the planner's rewrite on both
    // engines); complements q08/q09's NOT EXISTS / EXISTS forms.
    "sql06_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    // Per-group DISTINCT aggregate (q07 is global-only): Spark expands
    // to a two-level aggregate on (group, distinct-col).
    "sql07_distinct_customers_by_status" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // Window FRAME specifications (ROWS BETWEEN): moving and running
    // sums of exact integer counts — order-independent-exact on both
    // engines; sums cast because DuckDB widens sum(BIGINT) to HUGEINT.
    "sql08_moving_daily_counts" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT day, n,
        |  CAST(sum(n) OVER (ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3d,
        |  CAST(sum(n) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum
        |FROM daily ORDER BY day""".stripMargin,
    // The classic TPC-H analytic shapes, adapted to the fixture
    // schema (priority stands in for shippriority; dates are
    // timestamps here) with revenue quantized to exact cents per row
    // BEFORE the sum — the q-series money discipline, so the 3-to-6-
    // table join plans are exercised with zero float-sum exposure.
    // Q3: shipping-priority revenue ranking.
    "sql20_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    // Q10: returned-item revenue by customer with the nation dim.
    "sql21_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // Q5: local-supplier volume — the 6-table join with the
    // customer-nation = supplier-nation equality that makes it the
    // classic join-order stress test.
    "sql22_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,
    // Q6: the forecasting-revenue-change scan — no join at all, the
    // pure predicate-pushdown + single-agg shape (at 100 TB this is
    // the query where scan pruning IS the runtime).
    "sql23_tpch_q6" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    // Q14: promo-revenue share. The ratio is emitted as integer basis
    // points via floor(double division) — both engines feed the same
    // exact integers to the same IEEE divide; the summands themselves
    // are per-row-quantized cents like every money column here.
    "sql24_tpch_q14" ->
      """WITH m AS (
        |  SELECT
        |    sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS promo_cents,
        |    sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS total_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-12-01 00:00:00')
        |SELECT CAST(promo_cents AS BIGINT) AS promo_cents,
        |  CAST(total_cents AS BIGINT) AS total_cents,
        |  CAST(floor(CAST(promo_cents AS DOUBLE) * 10000.0
        |    / CAST(total_cents AS DOUBLE)) AS BIGINT) AS promo_bp
        |FROM m""".stripMargin,
    // Q19: the discounted-revenue OR-of-ANDs join — the classic
    // disjunctive-predicate stress (each disjunct pairs a brand with
    // its own size and quantity bands; the optimizer must keep the
    // join an equi hash join and evaluate the disjunction as a
    // residual, not fall back to a nested loop).
    "sql25_tpch_q19" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE
        |  (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity >= 1 AND l_quantity <= 20)
        |  OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity >= 10 AND l_quantity <= 35)
        |  OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity >= 20 AND l_quantity <= 50)""".stripMargin,
    // Distribution + value window functions (sql09 covers the rank
    // family): percent_rank/cume_dist are double-valued — both
    // engines compute the same (rank-1)/(n-1)-style rationals through
    // the same IEEE ops, micro-quantized anyway for hash safety;
    // first/nth ride the default frame, last_value needs the
    // UNBOUNDED FOLLOWING frame explicitly (the default frame stops
    // at CURRENT ROW — identical trap in both engines, pinned here).
    // Named WINDOW clause exercised on both parsers.
    "sql19_distribution_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pct_rank_micro,
        |  CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cume_micro,
        |  first_value(o_orderkey) OVER w AS best_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst_key
        |FROM orders
        |WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // Ranking-function suite beyond row_number (q06/sql03): rank,
    // dense_rank, ntile, lag/lead — all int-typed in Spark vs BIGINT
    // in DuckDB, so every ranking is cast explicitly (the SAME string
    // runs on both engines, normalizing both sides).
    "sql09_rank_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS quartile,
        |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS prev_key,
        |  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS next_key
        |FROM orders
        |WHERE o_custkey <= 100
        |ORDER BY o_custkey, rnk""".stripMargin,
    // GROUPING SETS with an explicit grouping() marker — the
    // generalized form of q15's ROLLUP / q30's CUBE; grouping() is
    // tinyint in Spark vs BIGINT in DuckDB, normalized by the cast.
    "sql10_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        |ORDER BY flag, status, g_status""".stripMargin,
    // Multiplicity-preserving set op (q10-q12 are DISTINCT-semantics):
    // INTERSECT ALL keeps min(multiplicity) per value.
    "sql11_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    // Exercises the supplier table (the one fixture no other query
    // reads) through the standard dim-join aggregate shape. Money is
    // aggregated as integer cents (the sql14 pattern) so the hashed
    // output holds no floating-point value at all: floor(x*100+0.5)
    // is an exact int, per-row cast to BIGINT, summed in BIGINT on
    // both engines — no sum(DOUBLE) pathway left to diverge.
    "sql12_suppliers_by_nation" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    // RANGE frame over event time (sql08 is the ROWS twin): the frame
    // admits rows by VALUE distance, so calendar gaps shrink it —
    // different semantics, not just different syntax.
    "sql13_range_frame" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT day, n,
        |  CAST(sum(n) OVER (ORDER BY day
        |    RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3d
        |FROM daily ORDER BY day""".stripMargin,
    // Multiplicity-preserving EXCEPT (sql11's INTERSECT ALL twin):
    // keeps max(0, mult_left − mult_right) copies per value — the
    // bag-semantics set op q12's DISTINCT form cannot express.
    "sql15_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    // LATERAL derived table — the correlated-subquery form that can
    // return multiple columns per probe row (sql05's scalar subquery
    // cannot); both planners decorrelate it to an aggregate join.
    "sql16_lateral" ->
      """SELECT c_custkey, t.n_orders, t.max_price
        |FROM customer,
        |LATERAL (SELECT count(*) AS n_orders,
        |                max(o_totalprice) AS max_price
        |         FROM orders WHERE o_custkey = c_custkey) t
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin,
    // Recursive CTE (Spark 4 gained WITH RECURSIVE): a dense key
    // spine generated by recursion, LEFT JOINed to the real per-key
    // aggregate — the spine-fill pattern (missing groups surface as
    // zero instead of silently absent) that non-recursive SQL cannot
    // express without a VALUES list. Spine keys cast to BIGINT so the
    // hashed column has one integer width on both engines.
    "sql17_recursive_spine" ->
      """WITH RECURSIVE spine(k) AS (
        |  SELECT 0 UNION ALL SELECT k + 1 FROM spine WHERE k < 30
        |),
        |per_nation AS (
        |  SELECT c_nationkey AS k, count(*) AS n FROM customer GROUP BY 1
        |)
        |SELECT CAST(s.k AS BIGINT) AS nationkey,
        |  CAST(coalesce(p.n, 0) AS BIGINT) AS n_customers
        |FROM spine s LEFT JOIN per_nation p ON s.k = p.k
        |ORDER BY nationkey""".stripMargin,
    // Aggregate FILTER clauses — per-aggregate predicates without a
    // CASE rewrite. Integer-exact throughout: floor products are exact
    // ints, so the double->BIGINT casts are unambiguous on both
    // engines (Spark truncates, DuckDB rounds - identical on ints).
    "sql14_filtered_agg" ->
      """SELECT o_orderstatus,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    FILTER (WHERE year(o_orderdate) = 1995) AS BIGINT) AS cents_1995
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) ++ tpchRest

  /** The remaining TPC-H shapes (Q1/Q3/Q5/Q6/Q10/Q14/Q19 live above
    * and in the q-series), completing the 22-query suite. The fixture
    * schema is TPC-H-ish, not TPC-H: no partsupp, no l_commitdate /
    * l_receiptdate / l_shipmode, no comments/phones. Each query keeps
    * its original's OPTIMIZER STRESS (the join topology, subquery
    * shape, and aggregation structure the published query exists to
    * exercise) and adapts the predicates:
    *   - lateness (Q4/Q21): l_shipdate > o_orderdate + 60 days stands
    *     in for l_commitdate < l_receiptdate;
    *   - partsupp (Q2): derived as min(extendedprice-cents) per
    *     (partkey, suppkey) from lineitem;
    *   - supply cost (Q9): p_retailprice·quantity as the cost leg;
    *   - shipmode buckets (Q12): order-priority urgency classes;
    *   - country codes (Q22): c_nationkey, phone prefixes not existing.
    * Money follows the house discipline — per-row cent quantization
    * before any sum, ratios as floor(double-div) basis points, and
    * value-share thresholds in the SCALE-FREE "k x the per-group
    * average" form (an absolute fraction like Q11's 0.0001/SF goes
    * empty or degenerate as SF moves; x-times-average survives any
    * corpus size). Every aggregate/extract is cast so Spark and DuckDB
    * agree on column width (count/sum/year: BIGINT). */
  // A def, not a val: commonSql's initializer above runs first, and a
  // forward val reference would still be null at class-init time.
  private def tpchRest: Map[String, String] = Map(
    // Q4: order-priority checking — the EXISTS → left-semi-join probe
    // per order, with the lateness adaptation.
    "sql26_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // Q7: volume shipping between two nations — the double-role nation
    // dimension (joined once for the supplier side, once for the
    // customer side) with the symmetric pair predicate.
    "sql27_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(vol_cents) AS BIGINT) AS revenue_cents
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS vol_cents
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    // Q8: national market share — the 8-relation join (nation twice)
    // feeding a conditional-sum ratio per year; share as basis points
    // through one IEEE-identical floor-divide over exact cent sums.
    "sql28_tpch_q8" ->
      """SELECT o_year,
        |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(sum(vol) AS BIGINT) AS total_cents,
        |  CAST(floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
        |    * 10000.0 / CAST(sum(vol) AS DOUBLE)) AS BIGINT) AS share_bp
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS vol,
        |    n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |) all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    // Q9: product-type profit — LIKE-filtered part join with a
    // revenue-minus-cost measure (retailprice·qty as the cost leg),
    // grouped by supplier nation and order year. All-integer amounts,
    // so the profit sum is order-independent-exact.
    "sql29_tpch_q9" ->
      """SELECT nation, o_year, CAST(sum(amount) AS BIGINT) AS profit_cents
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
        |      - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT) AS amount
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    // Q11: important value concentration — group-by with a HAVING
    // threshold against a whole-relation scalar subquery. The
    // threshold is the scale-free "2x the average per-part value"
    // (value·n_parts > 2·total, all in decimal(38,0) so no engine
    // widens differently); Q11's absolute 0.0001/SF fraction thins to
    // empty as the part count grows.
    "sql30_tpch_q11" ->
      """WITH t AS (
        |  SELECT l_partkey, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS val
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'),
        |g AS (
        |  SELECT l_partkey AS ps_partkey, CAST(sum(val) AS BIGINT) AS value_cents
        |  FROM t GROUP BY l_partkey)
        |SELECT ps_partkey, value_cents FROM g
        |WHERE CAST(value_cents AS DECIMAL(38,0)) * (SELECT count(*) FROM g)
        |      > 2 * (SELECT CAST(sum(value_cents) AS DECIMAL(38,0)) FROM g)
        |ORDER BY value_cents DESC, ps_partkey""".stripMargin,
    // Q12: shipmode line counts — the order/lineitem join with
    // urgency-class CASE sums (order priority standing in for the
    // absent l_shipmode).
    "sql31_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    // Q13: customer order-count distribution — the left outer join
    // with an ON-clause (not WHERE) filter, aggregated twice: per
    // customer, then the histogram of counts. Customers with zero
    // qualifying orders MUST surface in the 0 bucket, which is the
    // whole point of the ON-side placement.
    "sql32_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q15: top supplier — a named revenue view consumed twice (join
    // source and argmax scalar subquery); ties all surface, which is
    // why the equality form beats LIMIT 1.
    "sql33_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_cents = (SELECT max(total_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    // Q16: supplier diversity per part attribute — NOT IN anti join
    // against a filtered supplier set under a per-group DISTINCT
    // count, with the IN-list size filter.
    "sql34_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Q17: small-quantity-order revenue — the per-part correlated
    // average, INTEGER-EXACT: qty·k·count < sum replaces
    // qty < k·avg (avg's double would put boundary rows at the mercy
    // of each engine's summation), one correlated COUNT and one
    // correlated SUM, both decorrelated to aggregate joins.
    "sql35_tpch_q17" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13' AND p_size <= 10
        |  AND CAST(floor(l_quantity) AS BIGINT) * 2
        |      * (SELECT CAST(count(*) AS BIGINT) FROM lineitem l2
        |         WHERE l2.l_partkey = p_partkey)
        |    < (SELECT CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
        |       FROM lineitem l3 WHERE l3.l_partkey = p_partkey)""".stripMargin,
    // Q18: large-volume customers — IN over a grouped HAVING subquery
    // on the fact table itself, then the 3-way join re-aggregates the
    // surviving orders.
    "sql36_tpch_q18" ->
      """SELECT c_custkey, o_orderkey, o_orderdate,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 250)
        |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY totalprice_cents DESC, o_orderkey""".stripMargin,
    // Q20: part promotion — the nested IN chain (supplier ← lineitem
    // ← part) with a grouped HAVING quantity floor.
    "sql37_tpch_q20" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 100)
        |ORDER BY s_suppkey""".stripMargin,
    // Q21: suppliers who kept orders waiting — EXISTS (another
    // supplier shipped the same order) AND NOT EXISTS (another
    // supplier was ALSO late): one semi and one anti join with a
    // non-equi correlated term riding the equi orderkey, under the
    // lateness adaptation.
    "sql38_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,
    // Q22: global sales opportunity — NOT EXISTS anti join (customers
    // with no urgent order; nobody is order-free in this fixture)
    // plus the above-average-balance scalar comparison in the
    // integer-exact bal·n > sum form; country code = nationkey.
    "sql39_tpch_q22" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM customer
        |WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        |    * (SELECT CAST(count(*) AS BIGINT) FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |    > (SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |       FROM customer c3 WHERE c3.c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin,
    // Q2: minimum-cost supplier — partsupp derived from lineitem as
    // min cents per (part, supplier); the correlated min subquery
    // re-walks the same 4-relation join per part, the classic
    // decorrelation stress. The CTE is consumed by both the outer
    // join tree and the subquery.
    "sql40_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS supplycost_cents
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
        |  s_name, n_name, p_partkey, supplycost_cents
        |FROM part
        |JOIN ps ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 10 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND supplycost_cents = (
        |    SELECT min(ps2.supplycost_cents) FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey""".stripMargin)
}
