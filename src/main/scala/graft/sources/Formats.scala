package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Source/sink format coverage beyond the parquet the fixtures arrive
  * in: ORC, JSON-lines and CSV round-trips, and a partitioned-parquet
  * write whose read path partition-prunes. The reference's format
  * surface is CSV landing + parquet staging (SURVEY.md §2.1
  * "Scans/sources/sinks", O5/O10/O11); these ops extend it to every
  * columnar/text format the Spark distribution ships offline (no
  * spark-avro connector in /opt/spark/jars, so Avro is out of scope).
  *
  * Each op is a WRITE-then-READ-BACK through the format — the read
  * result, not the original frame, feeds the returned query, so the
  * oracle hash-match certifies round-trip fidelity (types, encoding,
  * quoting) and not just the final aggregation.
  *
  * Scale notes: writes are plain distributed `df.write` (one task per
  * partition, no driver collection); reads are the built-in vectorized
  * scanners. Filters land in the scan (`PushedFilters` — asserted in
  * PlansSpec for the CSV and partitioned cases); the partitioned read
  * prunes directories before any I/O, the on-disk analogue of the IVF
  * index's cell pruning.
  */
object Formats {

  /** Round-trip staging dirs: one UNIQUE directory per invocation
    * (not a fixed shared path) — the returned frame reads lazily, so
    * a second invocation must not overwrite the store a still-held
    * frame points at, and concurrent drivers must not collide. The
    * dir survives the call so the lazy frame stays readable; all dirs
    * are swept by [[graft.core.RunTemp]]'s JVM shutdown hook so
    * repeated runs don't accumulate staged copies in /tmp. */
  private def stage(name: String): String =
    graft.core.RunTemp.dir(s"graft_io_${name}_")

  /** ORC round-trip: stage `lineitem` as ORC, read it back, aggregate.
    * The Q1-style result must hash-match the parquet-derived oracle —
    * doubles and strings survive ORC exactly (both are lossless
    * binary encodings). */
  def orcRoundtripAgg(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("lineitem_orc")
    val src = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    src.write.mode("overwrite").orc(path)
    spark.read.schema(src.schema).orc(path)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / 100.0).as("sum_base_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** JSON-lines round-trip: orders → json text → read back with the
    * writer's schema (schema-on-read, no inference job). Timestamps
    * in the fixture are date-granular, so the default ISO-8601 text
    * form is lossless; doubles round-trip via shortest-repr
    * serialization. Row-level output (not an aggregate) so every
    * serialized value is hash-checked. */
  def jsonRoundtripOrders(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("orders_json")
    val src = Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 5000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    src.write.mode("overwrite").json(path)
    spark.read.schema(src.schema).json(path)
      .orderBy("o_orderkey")
  }

  /** CSV round-trip: customer → quoted CSV with header → read back
    * with the writer's schema. Names carry commas/# — the quoting
    * path is exercised, and the key filter is applied on the
    * READ-BACK side so it pushes into the CSV scan. */
  def csvRoundtripCustomer(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("customer_csv")
    val src = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    src.write.mode("overwrite").option("header", "true").csv(path)
    spark.read.schema(src.schema).option("header", "true").csv(path)
      .filter(col("c_custkey") <= 500)
      .orderBy("c_custkey")
  }

  /** Partitioned-parquet write + pruned read: events written
    * `partitionBy(event_type)`, read back with an equality filter on
    * the partition column — the scan lists only the matching
    * directory (partition pruning; asserted in PlansSpec). This is
    * the layout/query pattern that carries 100 TB tables: partition
    * on the coarse predicate column, prune before any byte is read. */
  /** Z-ORDER clustered rewrite + read-back: events rewritten in
    * Morton order over (user_id, ts) — the multi-column data-skipping
    * layout ([[graft.operators.Zorder]]) — then read back and
    * returned row-level, so the oracle hash-match certifies the
    * rewrite is content-preserving (the p08 compaction discipline:
    * physical layout changed, rows untouched). The skipping property
    * itself — per-file min/max stats tight on BOTH dimensions, a
    * fraction of the files candidate for a 2-dim box predicate vs a
    * single-column sort — is measured in ZorderSpec, where layouts
    * can be compared side by side. */
  def zorderClusterEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("events_zorder")
    val src = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    graft.operators.Zorder.cluster(src, "user_id", "ts", nFiles = 16)
      .write.mode("overwrite").parquet(path)
    spark.read.schema(src.schema).parquet(path)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** io07: ZONE-MAP FILE SKIPPING — events range-partitioned and
    * sorted on user_id into 16 files (the clustered layout a real
    * table maintains), a [[ZoneMap]] built over (user_id), then a
    * selective range scan THROUGH the index: only files whose
    * [min, max] intersects [3, 7] are ever opened. The oracle is the
    * plain full-scan filter — the hash match certifies the pruned
    * path returns exactly the unpruned answer (zone map as superset
    * filter + residual predicate), while ZoneMapSpec asserts the
    * files-skipped property itself. */
  def zoneMapPrunedEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("events_zonemap")
    val src = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    src.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(path)
    ZoneMap.build(spark, path, src.schema, Seq("user_id"))
    ZoneMap.prunedRead(spark, path, src.schema, "user_id", lit(3L), lit(7L))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** io08: BLOOM-INDEX POINT LOOKUP — events hash-distributed into 16
    * files (the layout where min/max zone maps prune NOTHING: every
    * file spans the full key range), a per-file bloom sidecar built
    * on event_id, then five point probes served THROUGH the index:
    * only bloom-admitted files are opened (≈ 1 per key + the fp
    * rate), the exact equality re-applied as the residual. Oracle is
    * the plain IN-list filter; ZoneMapSpec asserts the pruning and
    * the no-false-negative guarantee. */
  def bloomPointEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("events_bloomidx")
    val src = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    src.repartition(16, col("event_id"))
      .write.mode("overwrite").parquet(path)
    ZoneMap.buildBloom(spark, path, src.schema, "event_id")
    val keys = Seq(7L, 107L, 207L, 307L, 407L)
    keys.map(k => ZoneMap.pointRead(spark, path, src.schema, "event_id", k))
      .reduce(_ unionByName _)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** io09: NATIVE parquet bloom filters — the FORMAT-INTERNAL twin of
    * io08's sidecar index: `parquet.bloom.filter.enabled#<col>` makes
    * the writer embed a split-block bloom filter per row group
    * (PARQUET-41), and the reader consults it during row-group
    * pruning when an equality predicate reaches the scan. On a
    * hash-distributed layout min/max statistics span everything and
    * prune NOTHING — the bloom is the only thing standing between a
    * point lookup and a full scan, exactly the io08 argument but with
    * zero sidecar machinery: the index travels inside the file, any
    * parquet reader honors it, and staleness is impossible by
    * construction. At 100 TB this is the default answer for
    * key-lookup tables; the sidecar variant remains for formats/
    * layouts the writer can't re-emit. `expected.ndv` sizes the
    * filter (~1% fpp); the write-side option is per-column, so wide
    * tables pay only for indexed keys. FormatsSpec asserts the
    * footer actually carries bloom offsets AND that the predicate
    * reaches the scan as a pushed filter — the two halves of the
    * pruning claim the oracle's value check can't see. */
  def parquetBloomPointOrders(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("orders_pqbloom")
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.repartition(8, col("o_orderkey"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#o_custkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
      // parquet-mr SKIPS the bloom for fully dictionary-encoded
      // chunks (the dictionary already answers membership exactly) —
      // sound for parquet-aware readers, but the point of this
      // operator is the bloom path, and at 100 TB a key column blows
      // past the 1 MB dictionary cap and falls to plain encoding
      // anyway; forcing plain here makes the small-SF fixture take
      // the same code path the large corpus would.
      .option("parquet.enable.dictionary#o_custkey", "false")
      // several row groups per file so in-file pruning has units to skip
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(path)
    spark.read.schema(src.schema).parquet(path)
      .filter(col("o_custkey") === 101L)
      .orderBy("o_orderkey")
  }

  /** io06: ADDITIVE SCHEMA EVOLUTION on read — generation 1 files
    * carry (o_orderkey, o_custkey); generation 2 adds o_totalprice.
    * `mergeSchema` reconciles by NAME and old files surface the new
    * column as null — the lakehouse evolution contract: adding a
    * column never rewrites a byte of existing data (at 100 TB a
    * rewrite-on-evolve would be the single most expensive operation
    * in the system; readers filling nulls is what makes evolution
    * metadata-only). Footer merging is Spark's distributed respect
    * job over file footers, not row data. The oracle reproduces the
    * union-by-name semantics from the source table: a dropped row,
    * a misaligned column, or a non-null backfill breaks the hash. */
  def schemaEvolutionOrders(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("orders_evolve")
    val src = Tables.orders(spark, dir).filter(col("o_orderkey") <= 20000)
    src.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$path/gen=1")
    src.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$path/gen=2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$path/gen=1", s"$path/gen=2")
      .orderBy("o_orderkey")
  }

  def partitionedEventsPrune(spark: SparkSession, dir: String): DataFrame = {
    val path = stage("events_by_type")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    spark.read.parquet(path)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5))) / 100.0).as("total_value"))
      .orderBy("day")
  }
}
