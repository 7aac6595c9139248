package graft.pipeline

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JDBC warehouse sink/source — the reference's ACTUAL landing target
  * (Postgres `INSERT … ON CONFLICT (shipment_id) DO UPDATE`,
  * `cocoa_processing_dag.py:213-237`), distributed: every partition
  * opens its own connection and streams its rows through one prepared
  * upsert statement in transactional batches, so the write scales with
  * executor count instead of funnelling through the driver the way the
  * reference's single pandas `to_sql` does.
  *
  * Dialects: [[postgres]] carries the reference's exact conflict
  * clause for a real deployment; [[derby]] (MERGE INTO) runs against
  * the embedded Apache Derby database Spark ships, which is what lets
  * this sink be TESTED for real offline — same code path, same
  * batching, same transactional shape, different upsert SQL only.
  * All identifiers are quoted lowercase so read-back column names
  * match the DataFrame schema on every dialect.
  *
  * Scale notes: the per-partition batch size bounds memory and
  * round-trips; key-deduped input (run [[Merge.lastWriterWins]]
  * first) means concurrent partitions never upsert the same key, so
  * row-lock conflicts are limited to page-level false sharing —
  * retried on the standard serialization-failure SQLStates. Reads go
  * through Spark's JDBC source and accept partitioning options for
  * parallel scans.
  */
object JdbcWarehouse {

  /** SQL dialect: DDL type names + how to upsert. Dialects with a
    * native conflict clause (postgres) run ONE statement per row
    * batch; dialects without one usable under batched parameters
    * (derby: MERGE exists but rejects a VALUES source) fall back to
    * the portable two-statement plan — a batched UPDATE whose
    * per-row update counts select the rows for a batched INSERT.
    * Key-deduped input keeps the two-step race-free across
    * partitions (no other writer can insert the same key between
    * the two statements). */
  final case class Dialect(
      name: String,
      sqlType: DataType => String,
      singleStatement: Option[(String, StructType, String) => String])

  /** Quote an identifier (column OR table): embedded quotes double,
    * so a hostile/odd name can never break out of the identifier
    * position in the DDL/DML strings built below. */
  private def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Every entry point funnels through this: the key must exist and
    * at least one non-key column must too — a key-only schema would
    * generate an empty SET list (invalid SQL on every dialect); fail
    * with a clear message instead of a driver syntax error. */
  private def validate(schema: StructType, key: String): Unit = {
    require(schema.fieldNames.contains(key),
      s"upsert key '$key' not in schema ${schema.fieldNames.mkString(", ")}")
    require(schema.fields.exists(_.name != key),
      s"schema has no non-key columns — a key-only table cannot drive " +
        s"the upsert's SET list; add a payload column")
  }

  private def commonType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(512)"
    case TimestampType => "TIMESTAMP"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case other => throw new IllegalArgumentException(
      s"no JDBC warehouse mapping for $other — flatten complex columns upstream")
  }

  /** Derby (the embedded offline test target): two-statement upsert —
    * Derby's MERGE requires a base-table source, so a parameterized
    * VALUES row can't drive it. */
  val derby: Dialect = Dialect("derby", commonType, None)

  /** Postgres: the reference's own conflict clause, verbatim shape
    * (`INSERT … ON CONFLICT (key) DO UPDATE SET c = EXCLUDED.c`).
    * `DOUBLE` spells `DOUBLE PRECISION` there. Not executable in this
    * offline environment (no server) — the derby dialect certifies
    * the shared machinery; this carries the production SQL. */
  val postgres: Dialect = Dialect("postgres",
    dt => if (dt == DoubleType) "DOUBLE PRECISION" else commonType(dt),
    Some((table, schema, key) => {
      val cols = schema.fields.map(f => q(f.name))
      val set = schema.fields.filterNot(_.name == key)
        .map(f => s"${q(f.name)} = EXCLUDED.${q(f.name)}").mkString(", ")
      s"""INSERT INTO ${q(table)} (${cols.mkString(", ")})
         |VALUES (${schema.fields.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${q(key)}) DO UPDATE SET $set""".stripMargin
    }))

  /** The portable two-step plan's statements: a keyed UPDATE over the
    * non-key columns, and a full-row INSERT. */
  private[pipeline] def updateSql(table: String, schema: StructType, key: String): String = {
    val set = schema.fields.filterNot(_.name == key)
      .map(f => s"${q(f.name)} = ?").mkString(", ")
    s"UPDATE ${q(table)} SET $set WHERE ${q(key)} = ?"
  }

  private[pipeline] def insertSql(table: String, schema: StructType): String =
    s"INSERT INTO ${q(table)} (${schema.fields.map(f => q(f.name)).mkString(", ")}) " +
      s"VALUES (${schema.fields.map(_ => "?").mkString(", ")})"

  /** Idempotent CREATE TABLE with a primary key on `key` (the upsert
    * conflict target). Existing tables are left untouched (Derby
    * SQLState X0Y32 / Postgres 42P07).
    *
    * MIGRATION NOTE: identifiers are quoted everywhere (DDL, DML and
    * the read path), so `table` is case-SENSITIVE to the engine. A
    * database whose tables were created UNQUOTED by other tooling
    * stores them case-folded (Derby/Postgres fold opposite ways!);
    * targeting such a table from here requires passing the folded
    * spelling (e.g. "WH" for a Derby table created as `wh`) —
    * otherwise ensureTable sees no conflict and creates a second,
    * empty table beside the old one. */
  def ensureTable(url: String, table: String, schema: StructType, key: String,
      dialect: Dialect = derby): Unit = {
    validate(schema, key)
    val cols = schema.fields.map { f =>
      val pk = if (f.name == key) " NOT NULL PRIMARY KEY" else ""
      s"${q(f.name)} ${dialect.sqlType(f.dataType)}$pk"
    }.mkString(", ")
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE ${q(table)} ($cols)")
      catch {
        case e: SQLException
            if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" => () // exists
      } finally st.close()
    } finally conn.close()
  }

  /** Distributed upsert: one connection + prepared statement per
    * partition, `batchSize`-row transactional batches, serialization
    * failures retried. `df` should be key-unique (run
    * [[Merge.lastWriterWins]] first) — that is what makes concurrent
    * partitions conflict-free and the statement-level LWW semantics
    * (`ON CONFLICT DO UPDATE` / `WHEN MATCHED UPDATE`) equal to the
    * reference's per-batch behavior. */
  def upsert(df: DataFrame, url: String, table: String, key: String,
      dialect: Dialect = derby, batchSize: Int = 500): Unit = {
    val schema = df.schema
    validate(schema, key)
    // build every statement on the driver: the closure ships strings
    // + the schema, never the dialect's functions
    val single = dialect.singleStatement.map(f => f(table, schema, key))
    val upSql = updateSql(table, schema, key)
    val inSql = insertSql(table, schema)
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val keyIdx = schema.fieldIndex(key)
          val nonKey = schema.fields.zipWithIndex.filterNot(_._1.name == key)

          def withRetry(body: => Unit): Unit = {
            var attempt = 0
            var done = false
            while (!done) {
              try { body; conn.commit(); done = true }
              catch {
                // 40001 serialization failure / 40XL1 derby lock
                // timeout: page-level false sharing between
                // key-disjoint partitions — rollback + retry.
                // 23505 duplicate key: "key-disjoint partitions" is
                // broken by SPECULATIVE EXECUTION — two copies of the
                // same partition can interleave UPDATE(count 0)/INSERT
                // on one key; on retry the twin's committed row makes
                // the idempotent UPDATE match and the INSERT is skipped,
                // so the retry converges instead of failing the task.
                case e: SQLException
                    if Set("40001", "40XL1", "23505").contains(e.getSQLState) && attempt < 3 =>
                  conn.rollback(); attempt += 1
                  Thread.sleep(50L * attempt)
                // anything else: roll the open transaction back BEFORE
                // rethrowing — an active transaction would make
                // conn.close() throw (Derby 25001) from the finally and
                // MASK this root cause
                case e: Throwable =>
                  try conn.rollback() catch { case _: SQLException => () }
                  throw e
              }
            }
          }

          def flushSingle(ps: PreparedStatement, pending: Seq[org.apache.spark.sql.Row]): Unit =
            withRetry {
              pending.foreach { r => bind(ps, schema, r); ps.addBatch() }
              ps.executeBatch()
            }

          // Two-step: batched UPDATE; its per-row counts select the
          // not-yet-present rows for the batched INSERT. Key-disjoint
          // partitions make the gap race-free (no other writer can
          // insert the same key in between).
          def flushTwoStep(psU: PreparedStatement, psI: PreparedStatement,
              pending: Seq[org.apache.spark.sql.Row]): Unit =
            withRetry {
              pending.foreach { r =>
                var p = 1
                nonKey.foreach { case (f, i) => bindOne(psU, p, f.dataType, r, i); p += 1 }
                bindOne(psU, p, schema.fields(keyIdx).dataType, r, keyIdx)
                psU.addBatch()
              }
              val counts = psU.executeBatch()
              // JDBC lets a driver return SUCCESS_NO_INFO (-2) instead
              // of per-row counts; treating those as "updated" would
              // silently drop never-inserted rows. Re-probe such rows
              // one by one — executeUpdate always returns a real count
              // and re-running the idempotent UPDATE is harmless.
              val fresh = pending.zip(counts).collect {
                case (r, 0) => r
                case (r, java.sql.Statement.SUCCESS_NO_INFO)
                    if { var p = 1
                      nonKey.foreach { case (f, i) => bindOne(psU, p, f.dataType, r, i); p += 1 }
                      bindOne(psU, p, schema.fields(keyIdx).dataType, r, keyIdx)
                      psU.executeUpdate() == 0 } => r
              }
              if (fresh.nonEmpty) {
                fresh.foreach { r => bind(psI, schema, r); psI.addBatch() }
                psI.executeBatch()
              }
            }

          single match {
            case Some(sql) =>
              val ps = conn.prepareStatement(sql)
              try rows.grouped(batchSize).foreach(g => flushSingle(ps, g))
              finally ps.close()
            case None =>
              val psU = conn.prepareStatement(upSql)
              val psI = conn.prepareStatement(inSql)
              try rows.grouped(batchSize).foreach(g => flushTwoStep(psU, psI, g))
              finally { psU.close(); psI.close() }
          }
        } finally {
          // close must never MASK an in-flight exception with its own
          try conn.close() catch { case _: SQLException => () }
        }
      }
    }
  }

  private def bindOne(ps: PreparedStatement, pos: Int, dt: DataType,
      row: org.apache.spark.sql.Row, i: Int): Unit =
    if (row.isNullAt(i)) ps.setNull(pos, jdbcCode(dt))
    else dt match {
      case StringType => ps.setString(pos, row.getString(i))
      case TimestampType => ps.setTimestamp(pos, row.getTimestamp(i))
      case DoubleType => ps.setDouble(pos, row.getDouble(i))
      case FloatType => ps.setFloat(pos, row.getFloat(i))
      case LongType => ps.setLong(pos, row.getLong(i))
      case IntegerType => ps.setInt(pos, row.getInt(i))
      case ShortType => ps.setShort(pos, row.getShort(i))
      case BooleanType => ps.setBoolean(pos, row.getBoolean(i))
      case DateType => ps.setDate(pos, row.getDate(i))
      case other => throw new IllegalArgumentException(s"unbindable type $other")
    }

  private def bind(ps: PreparedStatement, schema: StructType,
      row: org.apache.spark.sql.Row): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      bindOne(ps, i + 1, f.dataType, row, i)
    }

  private def jdbcCode(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case TimestampType => java.sql.Types.TIMESTAMP
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case BooleanType => java.sql.Types.BOOLEAN
    case DateType => java.sql.Types.DATE
    case _ => java.sql.Types.OTHER
  }

  /** Read the table back through Spark's JDBC source. Pass
    * `partitioning` (partitionColumn/lowerBound/upperBound/
    * numPartitions) for a parallel scan of a big table; default is a
    * single-partition read, right for maintenance-batch verification. */
  def read(spark: SparkSession, url: String, table: String,
      partitioning: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      // quoted to match the quoted-lowercase DDL above — an unquoted
      // name would case-fold (Derby: uppercase) and miss the table
      .option("dbtable", q(table))
    partitioning.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}
