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
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
}
