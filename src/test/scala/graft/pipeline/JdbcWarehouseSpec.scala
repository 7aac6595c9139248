package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** JDBC warehouse sink against embedded Derby: the distributed upsert
  * must land exactly the warehouse the parquet path produces (same
  * LWW semantics), replays must be idempotent, nulls must round-trip,
  * and read-back column names/types must match the DataFrame schema. */
class JdbcWarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshUrl(): String =
    s"jdbc:derby:${Files.createTempDirectory("jdbc_wh")}/db;create=true"

  private def batch(seed: Int, n: Int, ts: Long, idOffset: Int = 0) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
      new Timestamp(ts))

  private def dedup(df: org.apache.spark.sql.DataFrame) =
    Merge.lastWriterWins(df, CocoaSchema.mergeKey,
      col("processed_at"), Seq(col("timestamp")))

  test("jdbc upsert path produces exactly the parquet merge path's warehouse") {
    val url = freshUrl()
    JdbcWarehouse.ensureTable(url, "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    // overlapping batches: keys 0..59 then 30..89 (overlap 30..59)
    val b1 = batch(1, 60, 1000000L)
    val b2 = batch(2, 60, 2000000L, idOffset = 30)
    JdbcWarehouse.upsert(dedup(b1), url, "wh", CocoaSchema.mergeKey)
    JdbcWarehouse.upsert(dedup(b2), url, "wh", CocoaSchema.mergeKey)
    val viaJdbc = JdbcWarehouse.read(spark, url, "wh")

    assert(viaJdbc.columns.toSeq === CocoaSchema.warehouse.fieldNames.toSeq,
      "read-back column names must match the schema (quoted lowercase)")

    // the parquet path over the same batches
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CocoaSchema.warehouse)
    val expect = Merge.upsertShipments(
      Merge.upsertShipments(empty, b1), b2)

    assert(viaJdbc.count() === 90)
    assert(viaJdbc.collect().toSet === expect.collect().toSet,
      "JDBC warehouse diverged from the parquet merge path")
  }

  test("replaying the same batch is idempotent") {
    val url = freshUrl()
    JdbcWarehouse.ensureTable(url, "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    val b = dedup(batch(5, 40, 1000000L))
    JdbcWarehouse.upsert(b, url, "wh", CocoaSchema.mergeKey)
    val first = JdbcWarehouse.read(spark, url, "wh").collect().toSet
    JdbcWarehouse.upsert(b, url, "wh", CocoaSchema.mergeKey) // replay
    val second = JdbcWarehouse.read(spark, url, "wh").collect().toSet
    assert(second === first, "replay changed the warehouse")
  }

  test("ensureTable is idempotent and nulls round-trip") {
    val url = freshUrl()
    JdbcWarehouse.ensureTable(url, "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    JdbcWarehouse.ensureTable(url, "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    val withNulls = dedup(batch(7, 10, 1000000L))
      .withColumn("farm_id", lit(null).cast("string"))
      .withColumn("quality_score", lit(null).cast("double"))
    JdbcWarehouse.upsert(withNulls, url, "wh", CocoaSchema.mergeKey)
    val back = JdbcWarehouse.read(spark, url, "wh")
    assert(back.count() === 10)
    assert(back.filter(col("farm_id").isNull).count() === 10)
    assert(back.filter(col("quality_score").isNull).count() === 10)
  }

  test("a constraint violation surfaces as the ROOT cause, not a close-time error") {
    val url = freshUrl()
    JdbcWarehouse.ensureTable(url, "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    // region longer than VARCHAR(512): the batch must fail with the
    // Derby truncation error itself — not the 'cannot close a
    // connection while a transaction is active' (25001) that an
    // un-rolled-back transaction produces from conn.close()
    val bad = dedup(batch(9, 5, 1000000L))
      .withColumn("region", lit("x" * 600))
    val err = intercept[org.apache.spark.SparkException] {
      JdbcWarehouse.upsert(bad, url, "wh", CocoaSchema.mergeKey)
    }
    val chain = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("truncation") || chain.contains("22001"),
      s"expected the truncation root cause, got: $chain")
    assert(!chain.contains("active transaction"),
      s"close-time error masked the root cause: $chain")
    // the connection was released cleanly: the table is still usable
    JdbcWarehouse.upsert(dedup(batch(9, 5, 1000000L)), url, "wh", CocoaSchema.mergeKey)
    assert(JdbcWarehouse.read(spark, url, "wh").count() === 5)
  }

  test("postgres dialect emits the reference's conflict clause") {
    val sql = JdbcWarehouse.postgres.singleStatement.get(
      "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    assert(sql.contains("ON CONFLICT (\"shipment_id\") DO UPDATE SET"))
    assert(sql.contains("\"processed_at\" = EXCLUDED.\"processed_at\""))
    assert(!sql.toLowerCase.contains("merge"), "postgres path must not use MERGE")
    // the derby fallback's two-step statements, shape-checked
    val up = JdbcWarehouse.updateSql("wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    assert(up.startsWith("UPDATE \"wh\" SET") && up.endsWith("WHERE \"shipment_id\" = ?"))
    assert(!up.contains("\"shipment_id\" = ?,"), "key must not be in the SET list")
  }

  test("golden SQL: the postgres upsert string, pinned whole") {
    // The reference's landing statement (cocoa_processing_dag.py:
    // 223-237) is INSERT … ON CONFLICT (key) DO UPDATE SET
    // col = EXCLUDED.col per non-key column. Pin the ENTIRE generated
    // string on a small schema so any drift in clause order, quoting,
    // or placeholder count is a test diff, not a production surprise.
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("qty", IntegerType),
      StructField("note", StringType)))
    val sql = JdbcWarehouse.postgres.singleStatement.get("t", schema, "id")
    assert(sql ===
      """INSERT INTO "t" ("id", "qty", "note")
        |VALUES (?, ?, ?)
        |ON CONFLICT ("id") DO UPDATE SET "qty" = EXCLUDED."qty", "note" = EXCLUDED."note"""".stripMargin)
  }

  test("flushSingle: a single-statement dialect drives batched writes for real") {
    // No offline dialect has a native conflict clause, so the
    // single-statement path was dead code under every runnable
    // dialect. A plain-INSERT dialect is Derby-legal and exercises the
    // same prepare/bind/addBatch/executeBatch/commit machinery the
    // postgres ON CONFLICT statement would use.
    val insertOnly = JdbcWarehouse.Dialect("insert-only",
      JdbcWarehouse.derby.sqlType,
      Some((t, s, _) => JdbcWarehouse.insertSql(t, s)))
    val url = freshUrl()
    JdbcWarehouse.ensureTable(url, "wh", CocoaSchema.warehouse, CocoaSchema.mergeKey)
    val b = dedup(batch(11, 40, 1000000L)).repartition(4)
    // batchSize 7 forces multiple executeBatch flushes per partition
    JdbcWarehouse.upsert(b, url, "wh", CocoaSchema.mergeKey,
      dialect = insertOnly, batchSize = 7)
    val back = JdbcWarehouse.read(spark, url, "wh")
    assert(back.count() === 40)
    assert(back.collect().toSet === b.collect().toSet,
      "single-statement path lost or mangled rows")
    // replay: plain INSERT is NOT idempotent — the duplicate-key
    // SQLState is in the retry set (speculative-twin degradation), so
    // the retry loop must terminate and surface 23505 as the root
    // cause rather than hang or mask it
    val err = intercept[org.apache.spark.SparkException] {
      JdbcWarehouse.upsert(b, url, "wh", CocoaSchema.mergeKey,
        dialect = insertOnly, batchSize = 7)
    }
    val states = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .collect { case e: java.sql.SQLException => e.getSQLState }.toList
    assert(states.contains("23505"), s"expected duplicate-key root cause, got $states")
    assert(JdbcWarehouse.read(spark, url, "wh").count() === 40,
      "failed replay must not leave partial duplicate state")
  }

  test("key-only schemas and missing keys fail loudly, not with syntax errors") {
    import org.apache.spark.sql.types._
    val keyOnly = StructType(Seq(StructField("id", LongType)))
    val e1 = intercept[IllegalArgumentException] {
      JdbcWarehouse.ensureTable(freshUrl(), "t", keyOnly, "id")
    }
    assert(e1.getMessage.contains("non-key"))
    val e2 = intercept[IllegalArgumentException] {
      JdbcWarehouse.ensureTable(freshUrl(), "t", CocoaSchema.warehouse, "nope")
    }
    assert(e2.getMessage.contains("not in schema"))
  }
}
