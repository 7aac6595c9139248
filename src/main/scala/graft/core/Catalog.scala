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

  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      // events goes through the loader for the TIMESTAMP(NANOS) fix
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, name)
      df.createOrReplaceTempView(name)
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
        |ORDER BY o_orderstatus""".stripMargin)
}
