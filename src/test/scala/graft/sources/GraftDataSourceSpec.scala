package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.{CocoaGen, CocoaSchema, Enrich, Warehouse}

/** DSv2 connector (`format("graft")` + [[graft.sources.v2.GraftCatalog]]):
  * version-pinned snapshot reads through Spark's own vectorized parquet
  * scan, commit-protocol writes, native SQL time travel, and
  * batch/streaming change-feed reads. */
class GraftDataSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshRoot(): String = Files.createTempDirectory("graft_dsv2").toString

  private def batch(seed: Int, n: Int = 20, idOffset: Int = 0) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
      new Timestamp(1700000000000L + seed * 1000L))

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.orderBy("shipment_id").collect().toSeq

  // ---------------------------------------------------------------- format read

  test("format(graft) reads the current snapshot == Warehouse.read") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(1))
    Warehouse.commit(spark, root, batch(2, idOffset = 20))
    val got = spark.read.format("graft").load(root)
    assert(got.schema.fieldNames.toSeq === CocoaSchema.warehouse.fieldNames.toSeq)
    assert(sortedRows(got.select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*))
      === sortedRows(Warehouse.read(spark, root)))
  }

  test("versionAsOf pins an old snapshot; missing version is loud") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(1))
    Warehouse.commit(spark, root, batch(2))
    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(root)
    assert(sortedRows(v0) === sortedRows(
      spark.read.schema(CocoaSchema.warehouse)
        .parquet(Warehouse.versionPath(root, 0L))))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "9").load(root)
    }
    assert(e.getMessage.contains("missing or incomplete"))
  }

  test("a snapshot carrying deletion vectors reads merge-on-read, like Delta") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(3, n = 40).repartition(4))
    val before = Warehouse.read(spark, root).count()
    Warehouse.deleteWhere(spark, root, col("quality_score") < lit(8.0))
    // a second cumulative delete: positions from BOTH vectors apply
    Warehouse.deleteWhere(spark, root, col("region") === lit("Volta"))
    val expect = Warehouse.readWithDv(spark, root)
    assert(expect.count() < before, "fixture must actually delete rows")
    val got = spark.read.format("graft").load(root)
    assert(sortedRows(got.select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*))
      === sortedRows(expect))
    // predicates evaluate ABOVE the DV scan (no pushdown claimed) and
    // column pruning holds
    val filtered = got.filter(col("bean_type") === "Criollo")
      .select("shipment_id", "bean_type")
    assert(sortedRows(filtered) === sortedRows(
      expect.filter(col("bean_type") === "Criollo")
        .select("shipment_id", "bean_type")))
    // count must be the LIVE count, not the file count
    assert(got.count() === expect.count())
  }

  test("DML on a DV-bearing snapshot derives from LIVE rows, never resurrects") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(9, n = 30))
    Warehouse.deleteWhere(spark, root, col("quality_score") < lit(8.0))
    val live = sortedRows(Warehouse.readWithDv(spark, root))
    val deletedIds = sortedRows(Warehouse.read(spark, root))
      .map(_.getAs[String]("shipment_id"))
      .diff(live.map(_.getAs[String]("shipment_id")))
    assert(deletedIds.nonEmpty)
    // INSERT (keyed upsert) on top: next version = live rows + batch,
    // DV-deleted ids must stay gone
    val extra = batch(10, n = 5, idOffset = 1000)
    extra.write.format("graft").mode("append").save(root)
    val after = spark.read.format("graft").load(root)
    assert(after.count() === live.size + 5)
    assert(after.filter(col("shipment_id").isin(deletedIds: _*)).count() === 0,
      "DV-deleted rows must not be resurrected by a write")
  }

  test("deletion vectors on a hive-partitioned snapshot read merge-on-read too") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(11, n = 40), Seq("region"))
    Warehouse.deleteWhere(spark, root, col("quality_score") < lit(8.0))
    val names = CocoaSchema.warehouse.fieldNames.map(col).toSeq
    val expect = Warehouse.readWithDv(spark, root).select(names: _*)
    val got = spark.read.format("graft").load(root).select(names: _*)
    assert(expect.count() < 40, "fixture must actually delete rows")
    assert(sortedRows(got) === sortedRows(expect),
      "partition values must be re-derived per file, deletions applied")
    // a filter on the partition column still selects correctly
    assert(sortedRows(got.filter(col("region") === "Volta")) ===
      sortedRows(expect.filter(col("region") === "Volta")))
  }

  test("renamed hive-partitioned snapshot reads logically, partition filter included") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(13, n = 40), Seq("region"))
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val got = spark.read.format("graft").load(root)
    assert(got.columns.contains("zone") && !got.columns.contains("region"))
    val names = CocoaSchema.warehouse.fieldNames
      .map(n => if (n == "region") col("zone") else col(n)).toSeq
    val expectNames = CocoaSchema.warehouse.fieldNames
      .map(n => if (n == "region") col("region").as("zone") else col(n)).toSeq
    assert(sortedRows(got.select(names: _*)) ===
      sortedRows(Warehouse.read(spark, root).select(expectNames: _*)))
    // filtering on the LOGICAL partition name prunes and selects right
    assert(sortedRows(got.filter(col("zone") === "Volta").select(names: _*)) ===
      sortedRows(Warehouse.read(spark, root).filter(col("region") === "Volta")
        .select(expectNames: _*)))
  }

  test("a version carrying BOTH a rename map and deletion vectors reads live and logical") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(14, n = 30))
    Warehouse.renameColumns(spark, root, Map("quality_score" -> "grade")) // v1: mapped
    // DVs attach to the MAPPED version in place (Scala API addresses
    // physical names); the connector read must compose both layers
    Warehouse.deleteWhere(spark, root, col("quality_score") < lit(8.0))
    val got = spark.read.format("graft").load(root)
    assert(got.columns.contains("grade") && !got.columns.contains("quality_score"))
    val expect = Warehouse.readVersionLive(spark, root, 1L)
    assert(expect.count() < 30, "fixture must actually delete rows")
    assert(got.count() === expect.count())
    assert(sortedRows(got.select(col("shipment_id"), col("grade"))) ===
      sortedRows(expect.select(col("shipment_id"), col("grade"))))
  }

  test("a declared merge key that names no column is loud, never a silent plain append") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(7))
    // explicit writer option: typo'd key must throw, not degrade to
    // append (duplicate keys would accumulate silently otherwise)
    val e = intercept[IllegalArgumentException] {
      batch(7).write.format("graft").option("mergeKey", "shipmnt_id")
        .mode("append").save(root)
    }
    assert(e.getMessage.contains("shipmnt_id") &&
      e.getMessage.contains("not a column"), e.getMessage)
    assert(Warehouse.read(spark, root).count() === 20, "no partial write")
    // declared TBLPROPERTIES key with the same mismatch: same refusal
    val root2 = freshRoot()
    Warehouse.commit(spark, root2, batch(8))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root2), root2,
      Map("mergeKey" -> "no_such_col"))
    val e2 = intercept[IllegalArgumentException] {
      batch(8).write.format("graft").mode("append").save(root2)
    }
    assert(e2.getMessage.contains("no_such_col") &&
      e2.getMessage.contains("TBLPROPERTIES"), e2.getMessage)
    // the IMPLICIT shipment_id default is still silently dropped for
    // schemas that lack it — plain append, no error
    val root3 = freshRoot()
    spark.range(5).toDF("n").write.format("graft").mode("append").save(root3)
    spark.range(5).toDF("n").write.format("graft").mode("append").save(root3)
    assert(spark.read.format("graft").load(root3).count() === 10)
  }

  test("filters and pruning reach the delegated parquet scan") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(4, n = 50))
    val q = spark.read.format("graft").load(root)
      .filter(col("quality_score") > 8.5)
      .select("shipment_id", "quality_score")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(quality_score)"),
      s"expected pushed filters in:\n$plan")
    assert(plan.contains("ReadSchema: struct<shipment_id:string,quality_score:double>"),
      s"expected pruned read schema in:\n$plan")
    // and the values are right
    val expect = Warehouse.read(spark, root).filter(col("quality_score") > 8.5)
      .select("shipment_id", "quality_score")
    assert(sortedRows(q) === sortedRows(expect))
  }

  test("MIN/MAX/COUNT push to parquet footer stats through the connector") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(6, n = 50).repartition(3))
    val key = "spark.sql.parquet.aggregatePushdown"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val agg = spark.read.format("graft").load(root).agg(
        count(lit(1)).as("n"), min(col("quality_score")).as("lo"),
        max(col("quality_score")).as("hi"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"),
        s"expected scan-level aggregation in:\n$plan")
      val Row(n: Long, lo: Double, hi: Double) = agg.head()
      val truth = Warehouse.read(spark, root)
        .agg(count(lit(1)), min(col("quality_score")), max(col("quality_score")))
        .head()
      assert((n, lo, hi) === ((truth.getLong(0), truth.getDouble(1),
        truth.getDouble(2))))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("hive-partitioned snapshots read correctly with partition pruning") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(5, n = 60), Seq("region"))
    val q = spark.read.format("graft").load(root).filter(col("region") === "Volta")
    val expect = Warehouse.read(spark, root).filter(col("region") === "Volta")
    assert(sortedRows(q.select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*))
      === sortedRows(expect))
    assert(q.queryExecution.executedPlan.toString.contains("PartitionFilters:"),
      "delegated scan should expose partition filters")
  }

  test("a renamed snapshot reads LOGICAL names over untouched bytes; eras keep theirs") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(30))
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val got = spark.read.format("graft").load(root)
    assert(got.columns.contains("zone") && !got.columns.contains("region"))
    // values identical to the physical bytes, names only
    assert(sortedRows(got.select(col("shipment_id"), col("zone"))) ===
      sortedRows(Warehouse.read(spark, root)
        .select(col("shipment_id"), col("region").as("zone"))))
    // pushed filter on the renamed column still selects correctly
    // (physical-name translation at the scan boundary)
    val volta = got.filter(col("zone") === "Volta").select("shipment_id", "zone")
    assert(sortedRows(volta) === sortedRows(Warehouse.read(spark, root)
      .filter(col("region") === "Volta")
      .select(col("shipment_id"), col("region").as("zone"))))
    // plan pin: the predicate reaches the parquet reader under its
    // PHYSICAL name (row-group skipping engages; display is truthful)
    val voltaPlan = volta.queryExecution.executedPlan.toString
    assert(voltaPlan.contains("PushedFilters: [IsNotNull(region)"),
      s"expected the physical-name pushed filter in:\n$voltaPlan")
    // vectorized path intact: the scan is the builtin parquet batch
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft-mapped"), s"expected the mapped scan in:\n$plan")
    // time travel to the pre-rename era keeps the old names
    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(root)
    assert(v0.columns.contains("region") && !v0.columns.contains("zone"))
    assert(v0.count() === 20)
  }

  test("SQL ALTER TABLE RENAME COLUMN: zero-copy, upsert after, travel across") {
    val root = s"$catalogBase/rensql"
    Warehouse.commit(spark, root, batch(33, n = 20))
    spark.sql("ALTER TABLE gwh_test.rensql RENAME COLUMN quality_score TO grade")
    // the rename is a metadata-only version: v1 exists, zero data files
    assert(Warehouse.currentVersion(spark, root) === Some(1L))
    val renamed = spark.sql("SELECT * FROM gwh_test.rensql")
    assert(renamed.columns.contains("grade") &&
      !renamed.columns.contains("quality_score"))
    // upsert AFTER the rename, addressing the logical name
    val upd = batch(33, n = 5).withColumnRenamed("quality_score", "grade")
      .withColumn("grade", lit(1.23))
    upd.write.format("graft").mode("append").save(root)
    val after = spark.sql("SELECT * FROM gwh_test.rensql")
    assert(after.count() === 20)
    assert(after.filter(col("grade") === 1.23).count() === 5)
    // time travel: pre-rename era answers to the OLD name
    assert(spark.sql(
      "SELECT quality_score FROM gwh_test.rensql VERSION AS OF 0").count() === 20)
    // DROP COLUMN stays loudly refused (orphaning)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gwh_test.rensql DROP COLUMN farm_id")
    }
    assert(e.getMessage.contains("DROP COLUMN"), e.getMessage)
  }

  test("aggregate pushdown reaches the delegated scan") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(31, n = 30))
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val q = spark.read.format("graft").load(root)
        .agg(min("quality_score").as("lo"), max("quality_score").as("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(quality_score)"),
        s"expected pushed aggregation in:\n$plan")
      val Row(lo: Double, hi: Double) = q.head()
      val expect = Warehouse.read(spark, root)
        .agg(min("quality_score"), max("quality_score")).head()
      assert(lo === expect.getDouble(0) && hi === expect.getDouble(1))
    } finally spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
  }

  test("aggregate pushdown survives a RENAME COLUMN (footer stats under the physical name)") {
    val root = s"$catalogBase/renagg"
    Warehouse.commit(spark, root, batch(45, n = 30))
    spark.sql("ALTER TABLE gwh_test.renagg RENAME COLUMN quality_score TO grade")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val q = spark.read.format("graft").load(root)
        .agg(min("grade").as("lo"), max("grade").as("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(quality_score)"),
        s"a renamed table must keep footer-stats answering (physical name):\n$plan")
      val Row(lo: Double, hi: Double) = q.head()
      val expect = spark.read.parquet(Warehouse.dataPath(spark, root, 0L))
        .agg(min("quality_score"), max("quality_score")).head()
      assert(lo === expect.getDouble(0) && hi === expect.getDouble(1))
    } finally spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
  }

  test("DV scan derives timestamp partition values in the SESSION zone") {
    // the builtin (DV-free) scan parses hive partition fragments in the
    // session timezone; the DV path must match or the same table reads
    // different instants before and after a delete
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
      val root = freshRoot()
      val data = Enrich.enrich(CocoaGen.shipments(s2, 40, seed = 61),
        new Timestamp(1700000000000L))
      Warehouse.commitPartitioned(s2, root, data, Seq("processed_at"))
      Warehouse.deleteWhere(s2, root, col("quality_score") < lit(8.0))
      val expect = Warehouse.readWithDv(s2, root)
      val got = s2.read.format("graft").load(root)
      assert(got.count() === expect.count() && expect.count() > 0)
      val eTs = expect.select("processed_at").distinct().collect()
        .map(_.getTimestamp(0)).toSet
      val gTs = got.select("processed_at").distinct().collect()
        .map(_.getTimestamp(0)).toSet
      assert(gTs === eTs,
        "timestamp partition values must parse in the session zone, not UTC")
    } finally prev match {
      case Some(p) => org.apache.spark.sql.SparkSession.setActiveSession(p)
      case None => org.apache.spark.sql.SparkSession.clearActiveSession()
    }
  }

  test("zone-map sidecar skips files at scan planning; stale sidecar disables soundly") {
    import graft.sources.v2.ZoneMapFileIndex
    val root = freshRoot()
    // clustered layout: 8 files, each covering a narrow quality band
    val data = batch(32, n = 400)
      .repartitionByRange(8, col("quality_score"))
      .sortWithinPartitions("quality_score")
    Warehouse.commit(spark, root, data)
    val dataDir = Warehouse.versionPath(root, 0L)
    graft.sources.ZoneMap.build(spark, dataDir,
      spark.read.parquet(dataDir).schema, Seq("quality_score"))
    val pred = col("quality_score") >= 9.7
    val expect = sortedRows(Warehouse.read(spark, root).filter(pred)
      .select("shipment_id", "quality_score"))
    val k0 = ZoneMapFileIndex.filesKept.sum(); val p0 = ZoneMapFileIndex.filesPruned.sum()
    val got = spark.read.format("graft").load(root).filter(pred)
      .select("shipment_id", "quality_score")
    assert(sortedRows(got) === expect)
    assert(ZoneMapFileIndex.filesPruned.sum() > p0,
      "the banded layout + selective range must prune at least one file")
    assert(ZoneMapFileIndex.filesKept.sum() > k0)
    // commit v1 WITHOUT refreshing the index: v1 has no sidecar, so no
    // pruning and no failure; the v0 sidecar stays version-scoped
    Warehouse.commit(spark, root, batch(33, n = 50))
    assert(spark.read.format("graft").load(root).count() === 50)
    // a sidecar not covering the files (simulate: build then add file)
    val dataDir1 = Warehouse.versionPath(root, 1L)
    graft.sources.ZoneMap.build(spark, dataDir1,
      spark.read.parquet(dataDir1).schema, Seq("quality_score"))
    batch(34, n = 5).coalesce(1).write.mode("append").parquet(dataDir1)
    val p1 = ZoneMapFileIndex.filesPruned.sum()
    // stale coverage: read must include the new file's rows (no pruning)
    assert(spark.read.format("graft").load(root).count() === 55)
    assert(ZoneMapFileIndex.filesPruned.sum() === p1, "stale index must not prune")
  }

  test("zone-map constraint evaluation: InSet internal values, strings, null-stat files") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, InSet, Literal}
    import org.apache.spark.sql.types.{DoubleType, StringType}
    import graft.sources.v2.ZoneMapFileIndex
    val q = AttributeReference("q", DoubleType)()
    val c = ZoneMapFileIndex.constraint(InSet(q, Set(5.0, 9.0))).get
    assert(c.canMatch(Map("q" -> (Some(4.0), Some(6.0)))))  // 5 inside
    assert(!c.canMatch(Map("q" -> (Some(6.5), Some(8.0))))) // neither inside
    assert(!c.canMatch(Map("q" -> (None, None))))           // all-null file: = never matches
    assert(c.canMatch(Map("other" -> (Some(1.0), Some(2.0))))) // unindexed col: keep
    val r = AttributeReference("r", StringType)()
    val cs = ZoneMapFileIndex.constraint(EqualTo(r,
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString("Volta"),
        StringType))).get
    assert(cs.canMatch(Map("r" -> (Some("Ashanti"), Some("Western")))))
    assert(!cs.canMatch(Map("r" -> (Some("Ashanti"), Some("Central")))))
  }

  // ---------------------------------------------------------------- format write

  test("mode(append) is a keyed upsert through the commit protocol") {
    val root = freshRoot()
    val b1 = batch(6, n = 20)
    b1.write.format("graft").mode("append").save(root) // bootstrap commit
    assert(Warehouse.currentVersion(spark, root) === Some(0L))
    // overlap ids 10..19, new ids 20..29; incoming rows must win
    val b2 = batch(7, n = 20, idOffset = 10)
    b2.write.format("graft").mode("append").save(root)
    assert(Warehouse.currentVersion(spark, root) === Some(1L))
    val expect = b1.join(b2.select("shipment_id"), Seq("shipment_id"), "left_anti")
      .unionByName(b2)
    assert(sortedRows(spark.read.format("graft").load(root)) === sortedRows(expect))
  }

  test("append with duplicate keys in one batch is loud (ON CONFLICT parity)") {
    val root = freshRoot()
    batch(8).write.format("graft").mode("append").save(root)
    val dup = batch(9, n = 5).unionByName(batch(9, n = 5))
    val e = intercept[Exception] {
      dup.write.format("graft").mode("append").save(root)
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("mode(overwrite) replaces the snapshot, history stays readable") {
    val root = freshRoot()
    batch(10, n = 15).write.format("graft").mode("append").save(root)
    val b2 = batch(11, n = 7)
    b2.write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).count() === 7)
    assert(spark.read.format("graft").option("versionAsOf", "0").load(root)
      .count() === 15)
  }

  // ---------------------------------------------------------------- catalog

  private lazy val catalogBase: String = {
    val base = Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.gwh_test", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwh_test.base", base)
    base
  }

  test("catalog: SELECT, VERSION AS OF, TIMESTAMP AS OF") {
    val root = s"$catalogBase/cocoa"
    Warehouse.commit(spark, root, batch(12, n = 10))
    Thread.sleep(20) // distinct _SUCCESS mtimes for the timestamp resolution
    Warehouse.commit(spark, root, batch(13, n = 25))
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.cocoa").head().getLong(0) === 25)
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.cocoa VERSION AS OF 0")
      .head().getLong(0) === 10)
    // timestamp resolution: the instant v0 published resolves to v0
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val v0Ms = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      Warehouse.versionPath(root, 0L), "_SUCCESS")).getModificationTime
    val cat = spark.sessionState.catalogManager.catalog("gwh_test")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "cocoa")
    assert(cat.loadTable(ident, v0Ms * 1000L).name().endsWith("@t0"))
    // an instant before all history is loud
    val e = intercept[IllegalArgumentException] { cat.loadTable(ident, 1000L) }
    assert(e.getMessage.contains("no snapshot"))
  }

  test("catalog: CREATE TABLE + INSERT INTO upserts + INSERT OVERWRITE") {
    catalogBase // force catalog registration
    spark.sql("CREATE TABLE gwh_test.ins (id STRING, v DOUBLE) USING graft" +
      " TBLPROPERTIES ('mergeKey'='id')")
    Seq(("a", 1.0), ("b", 2.0)).toDF("id", "v").createOrReplaceTempView("ins_b1")
    Seq(("b", 9.0), ("c", 3.0)).toDF("id", "v").createOrReplaceTempView("ins_b2")
    spark.sql("INSERT INTO gwh_test.ins SELECT * FROM ins_b1")
    spark.sql("INSERT INTO gwh_test.ins SELECT * FROM ins_b2")
    assert(spark.sql("SELECT * FROM gwh_test.ins ORDER BY id").collect().toSeq ===
      Seq(Row("a", 1.0), Row("b", 9.0), Row("c", 3.0)))
    // v0 (first insert) stays readable
    assert(spark.sql("SELECT * FROM gwh_test.ins VERSION AS OF 0 ORDER BY id")
      .collect().toSeq === Seq(Row("a", 1.0), Row("b", 2.0)))
    spark.sql("INSERT OVERWRITE gwh_test.ins SELECT 'z', 0.5")
    assert(spark.sql("SELECT * FROM gwh_test.ins").collect().toSeq ===
      Seq(Row("z", 0.5)))
    assert(spark.sql("SHOW TABLES IN gwh_test").collect()
      .map(_.getString(1)).contains("ins"))
  }

  test("SQL DELETE FROM is a copy-on-write commit; TRUNCATE empties; history intact") {
    val root = s"$catalogBase/del"
    Warehouse.commit(spark, root, batch(40, n = 30))
    val total = 30L
    val matching = Warehouse.read(spark, root)
      .filter(col("quality_score") < 8.0).count()
    assert(matching > 0 && matching < total, "fixture must split on the predicate")
    spark.sql("DELETE FROM gwh_test.del WHERE quality_score < 8.0")
    assert(spark.sql("SELECT count(*) FROM gwh_test.del").head().getLong(0)
      === total - matching)
    // null predicates keep their rows (SQL 3VL): ~10% temps are null
    val nulls = Warehouse.read(spark, root)
      .filter(col("temperature_celsius").isNull).count()
    spark.sql("DELETE FROM gwh_test.del WHERE temperature_celsius > 1000.0")
    assert(spark.sql("SELECT count(*) FROM gwh_test.del").head().getLong(0)
      === total - matching, s"no row matches, nulls ($nulls) must survive")
    // pre-delete history stays readable
    assert(spark.sql("SELECT count(*) FROM gwh_test.del VERSION AS OF 0")
      .head().getLong(0) === total)
    spark.sql("TRUNCATE TABLE gwh_test.del")
    assert(spark.sql("SELECT count(*) FROM gwh_test.del").head().getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM gwh_test.del VERSION AS OF 1")
      .head().getLong(0) === total - matching)
  }

  test("SQL UPDATE rewrites matching rows, keeps 3VL nulls, loses nothing") {
    val root = s"$catalogBase/upd"
    // multi-file snapshot: if the row-level scan let the UPDATE
    // condition push down, pruned files' rows would VANISH from the
    // copy-on-write replacement — the count assert below is the trap
    Warehouse.commit(spark, root, batch(50, n = 40).repartition(8))
    val before = Warehouse.read(spark, root).cache()
    val total = before.count()
    val hot = before.filter(col("temperature_celsius") > 21.0).count()
    val nulls = before.filter(col("temperature_celsius").isNull).count()
    assert(hot > 0 && nulls > 0 && hot + nulls < total,
      "fixture must have matching, null, and non-matching rows")
    spark.sql("UPDATE gwh_test.upd SET quality_score = quality_score + 1.0," +
      " region = 'REWRITTEN' WHERE temperature_celsius > 21.0")
    val after = spark.sql("SELECT * FROM gwh_test.upd").cache()
    assert(after.count() === total, "UPDATE must not lose rows")
    assert(after.filter(col("region") === "REWRITTEN").count() === hot)
    // NULL condition rows untouched (SQL 3VL)
    assert(sortedRows(after.filter(col("temperature_celsius").isNull))
      === sortedRows(before.filter(col("temperature_celsius").isNull)))
    // history: v0 still pre-update
    assert(spark.sql("SELECT count(*) FROM gwh_test.upd VERSION AS OF 0" +
      " WHERE region = 'REWRITTEN'").head().getLong(0) === 0L)
    before.unpersist(); after.unpersist()
  }

  test("SQL UPDATE and DELETE over a DV-bearing snapshot act on LIVE rows") {
    val root = s"$catalogBase/dvdml"
    Warehouse.commit(spark, root, batch(31, n = 30))
    Warehouse.deleteWhere(spark, root, col("quality_score") < lit(8.0))
    val live = Warehouse.readWithDv(spark, root)
    val liveN = live.count()
    val deletedN = 30 - liveN
    assert(deletedN > 0, "fixture must delete something")
    // SELECT through the catalog sees live rows
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.dvdml").head().getLong(0)
      === liveN)
    // UPDATE rewrites live rows only; the replacement snapshot is
    // DV-free and the dead rows stay dead
    spark.sql("UPDATE gwh_test.dvdml SET region = 'X'" +
      " WHERE bean_type = 'Criollo'")
    val after = spark.sql("SELECT * FROM gwh_test.dvdml")
    assert(after.count() === liveN, "UPDATE must neither lose nor resurrect")
    assert(after.filter(col("region") === "X").count() ===
      live.filter(col("bean_type") === "Criollo").count())
    // metadata DELETE on the new clean snapshot still works
    spark.sql("DELETE FROM gwh_test.dvdml WHERE bean_type = 'Criollo'")
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.dvdml").head().getLong(0)
      === liveN - live.filter(col("bean_type") === "Criollo").count())
  }

  test("opt-in merge-on-read SQL DELETE: DVs attach, no version bump, reads stay live") {
    val root = s"$catalogBase/mordel"
    Warehouse.commit(spark, root, batch(35, n = 30))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root), root,
      Map("deleteMode" -> "merge-on-read"))
    val before = spark.sql("SELECT count(*) AS n FROM gwh_test.mordel")
      .head().getLong(0)
    spark.sql("DELETE FROM gwh_test.mordel WHERE quality_score < 8.0")
    // O(matched): no new version, a DV part instead
    assert(Warehouse.currentVersion(spark, root) === Some(0L),
      "merge-on-read delete must not publish a version")
    assert(graft.sources.v2.GraftTables.fs(spark, root).exists(
      new org.apache.hadoop.fs.Path(Warehouse.dvPath(root, 0L))))
    val live = spark.sql("SELECT * FROM gwh_test.mordel")
    assert(live.count() < before)
    assert(sortedRows(live.select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*))
      === sortedRows(Warehouse.readWithDv(spark, root)
        .select(CocoaSchema.warehouse.fieldNames.map(col).toSeq: _*)))
    // cumulative second delete composes
    spark.sql("DELETE FROM gwh_test.mordel WHERE region = 'Volta'")
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.mordel")
      .head().getLong(0) ===
      Warehouse.readWithDv(spark, root).count())
    assert(Warehouse.currentVersion(spark, root) === Some(0L))
    // a changeFeed table refuses the mode (in-place deletes are
    // invisible to CDC consumers)
    val root2 = s"$catalogBase/mordelcf"
    Warehouse.commit(spark, root2, batch(36, n = 10))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root2), root2,
      Map("deleteMode" -> "merge-on-read", "changeFeed" -> "true",
        "mergeKey" -> "shipment_id"))
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gwh_test.mordelcf WHERE quality_score < 8.0")
    }
    assert(e.getMessage.contains("changeFeed"), e.getMessage)
  }

  test("CDC crosses a RENAME: empty feed for the rename version, era-true images after") {
    val root = s"$catalogBase/rencdc"
    Warehouse.commit(spark, root, batch(50, n = 10))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root), root,
      Map("mergeKey" -> "shipment_id", "changeFeed" -> "true"))
    // v1: connector append (auto-CDF publishes feed v1)
    batch(51, n = 5, idOffset = 700).write.format("graft").mode("append").save(root)
    // v2: the rename — metadata-only, must auto-publish an EMPTY feed
    // (a gap would stall CDC streams at this version forever)
    spark.sql("ALTER TABLE gwh_test.rencdc RENAME COLUMN quality_score TO grade")
    assert(Warehouse.currentVersion(spark, root) === Some(2L))
    assert(Warehouse.readChangeFeed(spark, root, 2L).count() === 0,
      "rename version changed no rows; its feed is empty, not missing")
    // v3: an UPDATE of an existing key after the rename — the feed's
    // old_image must carry the REAL pre-update grade read from the
    // MAPPED (physical-named) predecessor, not a silent null-fill
    val upd = batch(50, n = 1)
      .withColumnRenamed("quality_score", "grade")
      .withColumn("grade", lit(1.5))
    upd.write.format("graft").mode("append").save(root)
    val feed3 = Warehouse.readChangeFeed(spark, root, 3L)
    assert(feed3.count() === 1)
    val row = feed3.head()
    assert(row.getAs[String]("change_type") === "update")
    val oldImage = row.getAs[org.apache.spark.sql.Row]("old_image")
    assert(!oldImage.isNullAt(oldImage.fieldIndex("grade")),
      "old_image.grade must come from the mapped predecessor, never null-fill")
    assert(oldImage.getAs[Double]("grade") !== 1.5)
    // a maintained CDC stream drains across the rename without stalling
    val ckpt = Files.createTempDirectory("graft_rencdc_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft").option("readChangeFeed", "true")
      .load(root)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("_commit_version").collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(got.toSet === Set(1L, 3L), s"v2 is empty, v1/v3 flow: $got")
  }

  test("batch CDC spanning a rename decodes both eras' images positionally") {
    val root = s"$catalogBase/rencdc2"
    Warehouse.commit(spark, root, batch(52, n = 10))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root), root,
      Map("mergeKey" -> "shipment_id", "changeFeed" -> "true"))
    // v1 feed: 5 inserts, published under the PRE-rename era names
    batch(53, n = 5, idOffset = 800).write.format("graft").mode("append").save(root)
    spark.sql("ALTER TABLE gwh_test.rencdc2 RENAME COLUMN quality_score TO grade")
    // v3 feed: one update, published under the POST-rename era names
    val upd = batch(52, n = 1).withColumnRenamed("quality_score", "grade")
      .withColumn("grade", lit(2.5))
    upd.write.format("graft").mode("append").save(root)
    val cdc = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
    // the scan surfaces the CURRENT era's names (Delta's table_changes shape)
    val imgFields = cdc.schema("new_image").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(imgFields.contains("grade") && !imgFields.contains("quality_score"),
      s"CDC schema must carry current-era names, got: $imgFields")
    // pre-rename feed rows decode POSITIONALLY under the current name —
    // a single-schema decode would null-fill every one of them
    val v1 = cdc.filter(col("_commit_version") === 1)
    assert(v1.count() === 5)
    assert(v1.filter(col("new_image.grade").isNull).count() === 0,
      "pre-rename feed rows must carry their values under the current name")
    val v3 = cdc.filter(col("_commit_version") === 3 &&
      col("change_type") === "update").head()
    assert(v3.getAs[Row]("new_image").getAs[Double]("grade") === 2.5)
  }

  test("sidecar-widened column survives a later RENAME COLUMN") {
    val root = s"$catalogBase/widerename"
    Warehouse.commit(spark, root, batch(46, n = 12))
    spark.sql("ALTER TABLE gwh_test.widerename ADD COLUMNS (note STRING)")
    assert(spark.sql("SELECT note FROM gwh_test.widerename").count() === 12)
    spark.sql("ALTER TABLE gwh_test.widerename RENAME COLUMN quality_score TO grade")
    // pre-fix, the sidecar coverage check compared LOGICAL sidecar names
    // against PHYSICAL footer names, silently dropping the widened
    // column from the table after any rename
    assert(spark.table("gwh_test.widerename").columns.contains("note"),
      "the declared widened column must survive the rename")
    val df = spark.sql("SELECT note, grade FROM gwh_test.widerename")
    assert(df.count() === 12)
    assert(df.filter(col("grade").isNull).count() === 0,
      "the renamed column must keep its values with a declared sidecar present")
  }

  test("manifest mode through the connector: O(Δ) INSERT upsert, file-granular DELETE, time travel") {
    val root = s"$catalogBase/manif"
    Warehouse.commit(spark, root,
      batch(60, n = 40).repartitionByRange(4, col("shipment_id")))
    graft.sources.v2.GraftCatalog.writeProps(
      graft.sources.v2.GraftTables.fs(spark, root), root,
      Map("mergeKey" -> "shipment_id", "commitMode" -> "manifest"))
    val fs = graft.sources.v2.GraftTables.fs(spark, root)
    // INSERT INTO (append mode) → file-granular upsert, zero-copy
    // conversion: v1 is a manifest carrying all four v0 files
    batch(61, n = 5, idOffset = 900).write.format("graft")
      .mode("append").save(root)
    val m1 = Warehouse.manifestOf(fs, root, 1L).getOrElse(
      fail("commitMode=manifest INSERT must publish a manifest version"))
    assert(m1.count(_.startsWith("v0/")) === 4,
      s"new keys only — every v0 file rides by reference: $m1")
    assert(spark.read.format("graft").load(root).count() === 45)
    assert(sortedRows(spark.read.format("graft").load(root)) ===
      sortedRows(Warehouse.read(spark, root)))
    // updating ONE existing key rewrites only the file holding it
    val someId = Warehouse.read(spark, root)
      .orderBy("shipment_id").head().getString(0)
    batch(60, n = 40).filter(col("shipment_id") === lit(someId))
      .withColumn("quality_score", lit(9.97))
      .write.format("graft").mode("append").save(root)
    val m2 = Warehouse.manifestOf(fs, root, 2L).get
    assert(m2.toSet.intersect(m1.toSet).size >= 4,
      s"an upsert of one key must carry the untouched files: $m1 -> $m2")
    assert(spark.read.format("graft").load(root)
      .filter(col("shipment_id") === lit(someId))
      .head().getAs[Double]("quality_score") === 9.97)
    // SQL DELETE routes file-granular on a manifest table
    val before = spark.sql("SELECT count(*) AS n FROM gwh_test.manif")
      .head().getLong(0)
    spark.sql("DELETE FROM gwh_test.manif WHERE quality_score < 8.0")
    val m3 = Warehouse.manifestOf(fs, root, 3L).get
    assert(m3.toSet.intersect(m2.toSet).nonEmpty,
      "a selective delete must carry untouched files by reference")
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.manif")
      .head().getLong(0) < before)
    assert(spark.sql(
      "SELECT count(*) AS n FROM gwh_test.manif WHERE quality_score < 8.0")
      .head().getLong(0) === 0)
    // time travel across manifest versions stays exact
    assert(spark.sql("SELECT count(*) AS n FROM gwh_test.manif VERSION AS OF 1")
      .head().getLong(0) === 45)
    assert(spark.read.format("graft").option("versionAsOf", "0").load(root)
      .count() === 40)
    // filters still reach the vectorized parquet scan under a manifest
    val q = spark.read.format("graft").load(root)
      .filter(col("region") === lit("Ashanti")).select("shipment_id")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(region), EqualTo(region,Ashanti)")
      || plan.contains("PushedFilters: [EqualTo(region,Ashanti)"),
      s"manifest reads must keep parquet filter pushdown:\n$plan")
    // ...and the scan plans over the MANIFEST-BACKED file index (zero
    // listing / per-file stats — the manifest IS the listing)
    val scans = graft.PlanWalk.collectAll(q.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        Seq(b.scan)
    }
    val usesManifestIndex = scans.exists {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.isInstanceOf[graft.sources.v2.ManifestFileIndex]
      case _ => false
    }
    assert(usesManifestIndex,
      s"manifest scans must use ManifestFileIndex, got: ${scans.map(_.getClass)}")
  }

  test("SQL MERGE INTO: matched-delete, matched-update, not-matched-insert") {
    val root = s"$catalogBase/mrg"
    Warehouse.commit(spark, root, batch(60, n = 20))
    val tgt = Warehouse.read(spark, root).cache()
    // localCheckpoint: the generator plan is rand()-seeded, and the
    // merge rewrite embeds the source in a group-filter subquery that
    // CheckAnalysis requires to be DETERMINISTIC — materialize first
    val src = batch(61, n = 20, idOffset = 10).localCheckpoint(true)
    src.createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO gwh_test.mrg t USING mrg_src s
      ON t.shipment_id = s.shipment_id
      WHEN MATCHED AND s.quality_score < 7.0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    // mirror of MERGE semantics in DataFrame ops
    val matched = src.join(tgt.select("shipment_id"), Seq("shipment_id"), "semi")
    val expected = tgt.join(src.select("shipment_id"), Seq("shipment_id"), "left_anti")
      .unionByName(matched.filter(not(coalesce(col("quality_score") < 7.0, lit(false)))))
      .unionByName(src.join(tgt.select("shipment_id"), Seq("shipment_id"), "left_anti"))
      .select(tgt.columns.map(col).toIndexedSeq: _*)
    assert(sortedRows(spark.sql("SELECT * FROM gwh_test.mrg")
      .select(tgt.columns.map(col).toIndexedSeq: _*)) === sortedRows(expected))
    // a second merge of the SAME source is idempotent for the
    // update/insert clauses and deletes nothing new
    spark.sql("""MERGE INTO gwh_test.mrg t USING mrg_src s
      ON t.shipment_id = s.shipment_id
      WHEN MATCHED AND s.quality_score < 7.0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(sortedRows(spark.sql("SELECT * FROM gwh_test.mrg")
      .select(tgt.columns.map(col).toIndexedSeq: _*)) === sortedRows(expected))
    tgt.unpersist()
  }

  test("ALTER TABLE ADD COLUMNS is metadata-only; every snapshot reads widened") {
    catalogBase // force catalog registration
    spark.sql("CREATE TABLE gwh_test.evo (id STRING, v DOUBLE) USING graft" +
      " TBLPROPERTIES ('mergeKey'='id')")
    spark.sql("INSERT INTO gwh_test.evo VALUES ('a', 1.0), ('b', 2.0)")
    spark.sql("ALTER TABLE gwh_test.evo ADD COLUMNS (note STRING)")
    // old snapshot rows surface the new column as NULL
    val afterAlter = spark.sql("SELECT id, v, note FROM gwh_test.evo ORDER BY id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.isNullAt(2)))
    assert(afterAlter.toSeq === Seq(("a", 1.0, true), ("b", 2.0, true)))
    // new writes carry it; the upsert key still works across the widening
    spark.sql("INSERT INTO gwh_test.evo VALUES ('b', 20.0, 'hot'), ('c', 3.0, 'new')")
    val rows = spark.sql("SELECT id, v, note FROM gwh_test.evo ORDER BY id")
      .collect().map(r => (r.getString(0), r.getDouble(1), Option(r.getString(2))))
    assert(rows.toSeq === Seq(("a", 1.0, None), ("b", 20.0, Some("hot")),
      ("c", 3.0, Some("new"))))
    // time travel BEFORE the widening also reads under the declared
    // (current) schema — evolution is well-defined in both directions
    assert(spark.sql("SELECT note FROM gwh_test.evo VERSION AS OF 0")
      .collect().forall(_.isNullAt(0)))
    // properties are alterable; destructive changes stay loud
    spark.sql("ALTER TABLE gwh_test.evo SET TBLPROPERTIES ('team'='graft')")
    assert(graft.sources.v2.GraftCatalog.readProps(spark,
      s"$catalogBase/evo").get("team") === Some("graft"))
    // renames are zero-copy metadata commits now; rename and rename
    // back (the second compose flattens to an identity map)
    spark.sql("ALTER TABLE gwh_test.evo RENAME COLUMN v TO value")
    assert(spark.sql("SELECT value FROM gwh_test.evo").count() === 3)
    spark.sql("ALTER TABLE gwh_test.evo RENAME COLUMN value TO v")
    assert(spark.sql("SELECT v FROM gwh_test.evo").count() === 3)
    // genuinely destructive changes stay loud
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gwh_test.evo ALTER COLUMN v TYPE STRING")
    }
    assert(e.getMessage.contains("rewrite") ||
      e.getMessage.toLowerCase.contains("type"), e.getMessage)
    // declared properties are introspectable through standard SQL
    val shown = spark.sql("SHOW TBLPROPERTIES gwh_test.evo")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("mergeKey") === Some("id") && shown.get("team") === Some("graft"))
  }

  test("dynamic partition pruning reaches partitioned connector reads") {
    import graft.sources.v2.GraftRuntimeScan
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(81, n = 120), Seq("region"))
    val fact = spark.read.format("graft").load(root)
    val regions = fact.select("region").distinct().collect().map(_.getString(0))
    assert(regions.length >= 3, "fixture must span several partitions")
    // a selective broadcast dim: only ONE region survives its filter.
    // Must be FILE-backed — a local collection constant-folds to a
    // LocalRelation, the Filter node disappears, and PartitionPruning
    // has no selective predicate to key on (same with V1 scans).
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    spark.createDataFrame(
      regions.toSeq.map(r => (r, if (r == regions.head) 1 else 0)))
      .toDF("region", "keep").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(broadcast(dim.filter(col("keep") === 1)), Seq("region"))
    val before = GraftRuntimeScan.runtimeFiltersApplied.get()
    val got = joined.collect()
    assert(GraftRuntimeScan.runtimeFiltersApplied.get() > before,
      "the DPP subquery must reach the connector scan as a runtime filter\n" +
        joined.queryExecution.executedPlan.toString)
    val expect = Warehouse.read(spark, root)
      .filter(col("region") === regions.head).count()
    assert(got.length === expect.toInt, "pruning must not change results")
  }

  test("dynamic partition pruning reaches PARTITIONED MANIFEST reads too") {
    import graft.sources.v2.GraftRuntimeScan
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(84, n = 120), Seq("region"))
    Warehouse.appendFiles(spark, root, batch(85, n = 20, idOffset = 900))
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(Warehouse.manifestOf(hfs, root,
      Warehouse.currentVersion(spark, root).get).isDefined)
    val fact = spark.read.format("graft").load(root)
    val regions = fact.select("region").distinct().collect().map(_.getString(0))
    assert(regions.length >= 3)
    val dimPath = Files.createTempDirectory("graft_dpp_mdim").toString
    spark.createDataFrame(
      regions.toSeq.map(r => (r, if (r == regions.head) 1 else 0)))
      .toDF("region", "keep").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(broadcast(dim.filter(col("keep") === 1)), Seq("region"))
    val before = GraftRuntimeScan.runtimeFiltersApplied.get()
    val got = joined.collect()
    assert(GraftRuntimeScan.runtimeFiltersApplied.get() > before,
      "the DPP subquery must reach the MANIFEST scan as a runtime filter\n" +
        joined.queryExecution.executedPlan.toString)
    val expect = Warehouse.read(spark, root)
      .filter(col("region") === regions.head).count()
    assert(got.length === expect.toInt, "pruning must not change results")
  }

  test("runtime-filterable scans keep structural equality (exchange/scan reuse)") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.v2.{GraftRuntimeScan, GraftTables}
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(83, n = 30), Seq("region"))
    def scan() = GraftTables
      .snapshotTable(spark, root, None, None, "t")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    val (a, b) = (scan(), scan())
    assert(a.isInstanceOf[GraftRuntimeScan], "partitioned snapshots wrap")
    // two independent resolutions of the same snapshot must compare
    // equal, or self-joins silently lose exchange/scan reuse
    assert(a === b && a.hashCode === b.hashCode)
  }

  test("row-level ops on PARTITIONED snapshots never runtime-prune (no lost rows)") {
    import graft.sources.v2.GraftRuntimeScan
    val root = s"$catalogBase/updpart"
    Warehouse.commitPartitioned(spark, root, batch(82, n = 60), Seq("region"))
    val total = Warehouse.read(spark, root).count()
    val before = GraftRuntimeScan.runtimeFiltersApplied.get()
    spark.sql("UPDATE gwh_test.updpart SET quality_score = 0.0" +
      " WHERE region = 'Volta'")
    assert(GraftRuntimeScan.runtimeFiltersApplied.get() === before,
      "a row-level rewrite must never receive runtime group filters")
    assert(spark.sql("SELECT count(*) FROM gwh_test.updpart").head().getLong(0)
      === total, "selective UPDATE on a partitioned snapshot must keep every row")
  }

  test("row-level scan refuses filter pushdown (replacement granularity = snapshot)") {
    val root = s"$catalogBase/pushpin"
    Warehouse.commit(spark, root, batch(80, n = 30))
    // the UPDATE condition is pushed into the operation's scan for
    // GROUP pruning; with snapshot-granular replacement any pruned row
    // would vanish from the rewrite — the scan must report an empty
    // pushdown, and the whole table must survive a selective UPDATE
    val plan = spark.sql("EXPLAIN FORMATTED UPDATE gwh_test.pushpin" +
      " SET quality_score = 0.0 WHERE quality_score > 9.5")
      .head().getString(0)
    assert(plan.contains("ReplaceData") && plan.contains("BatchScan"),
      s"expected the row-level rewrite plan, got:\n$plan")
    // the scan section omits PushedFilters entirely when nothing is
    // pushed; any non-empty list here is the data-loss bug
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1).trim).toSeq
    assert(pushed.forall(_.isEmpty),
      s"row-level scan must push NO filters, got $pushed in:\n$plan")
  }

  test("SQL DELETE with a subquery predicate takes the row-level rewrite path") {
    val root = s"$catalogBase/delsub"
    Warehouse.commit(spark, root, batch(70, n = 30))
    val before = Warehouse.read(spark, root)
    val mean = before.agg(avg("quality_score")).head().getDouble(0)
    val below = before.filter(col("quality_score") < mean).count()
    assert(below > 0 && below < 30)
    // not expressible as source filters -> canDeleteWhere=false ->
    // Spark falls back to the group-based ReplaceData rewrite
    spark.sql("DELETE FROM gwh_test.delsub WHERE quality_score <" +
      " (SELECT avg(quality_score) FROM gwh_test.delsub VERSION AS OF 0)")
    assert(spark.sql("SELECT count(*) FROM gwh_test.delsub").head().getLong(0)
      === 30L - below)
  }

  test("changeFeed=true: every connector write publishes its stored feed") {
    catalogBase // force catalog registration
    spark.sql("CREATE TABLE gwh_test.cdf (id STRING, v DOUBLE) USING graft" +
      " TBLPROPERTIES ('mergeKey'='id', 'changeFeed'='true')")
    spark.sql("INSERT INTO gwh_test.cdf VALUES ('a', 1.0), ('b', 2.0)") // v0: no predecessor
    spark.sql("INSERT INTO gwh_test.cdf VALUES ('b', 20.0), ('c', 3.0)") // v1
    spark.sql("DELETE FROM gwh_test.cdf WHERE id = 'a'") // v2
    spark.sql("UPDATE gwh_test.cdf SET v = 100.0 WHERE id = 'c'") // v3
    val feed = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "1").load(s"$catalogBase/cdf")
      .select("id", "change_type", "_commit_version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(feed === Set(("b", "update", 1L), ("c", "insert", 1L),
      ("a", "delete", 2L), ("c", "update", 3L)))
    // keyless + changeFeed is loud at publish time, never silently wrong
    spark.sql("CREATE TABLE gwh_test.cdf_bad (x STRING) USING graft" +
      " TBLPROPERTIES ('changeFeed'='true')")
    spark.sql("INSERT INTO gwh_test.cdf_bad VALUES ('p')") // v0: no feed due
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gwh_test.cdf_bad VALUES ('q')")
    }
    assert(e.getMessage.contains("changeFeed=true"))
  }

  // ---------------------------------------------------------------- CDC

  private def cdcRoot(): String = {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(20, n = 10))
    Warehouse.commit(spark, root,
      batch(21, n = 10, idOffset = 5)
        .unionByName(batch(20, n = 5))) // keep ids 0..4 identical
    Warehouse.publishChangeFeed(spark, root, 1L)
    root
  }

  test("batch change-feed read == stored feed, stamped with _commit_version") {
    val root = cdcRoot()
    val got = spark.read.format("graft")
      .option("readChangeFeed", "true").load(root)
    assert(got.schema.fieldNames.last === "_commit_version")
    assert(got.select("_commit_version").distinct().collect().toSeq === Seq(Row(1L)))
    val stored = Warehouse.readChangeFeed(spark, root, 1L)
    assert(got.count() === stored.count() && got.count() > 0)
    assert(sortedRows(got.drop("_commit_version")) === sortedRows(stored))
  }

  test("change-feed read without a published feed is loud") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(22, n = 5))
    Warehouse.commit(spark, root, batch(23, n = 5))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true").load(root)
    }
    assert(e.getMessage.contains("publish"), e.getMessage)
  }

  test("plain snapshot table streams as append-only; rewrites refuse loudly") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(40, n = 10))
    val ckpt = Files.createTempDirectory("graft_snap_stream_ckpt").toString
    def drain(): Either[Throwable, Seq[Row]] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(60000); Right(got.toSeq) }
      catch { case t: org.apache.spark.sql.streaming.StreamingQueryException =>
        Left(t) }
    }
    // first drain: the whole table as of start
    val first = drain().toOption.get
    assert(first.map(_.getAs[String]("shipment_id")).sorted ===
      sortedRows(Warehouse.read(spark, root)).map(_.getAs[String]("shipment_id")))
    // append-only commit (connector upsert with strictly new ids)
    batch(41, n = 5, idOffset = 500).write.format("graft").mode("append").save(root)
    val second = drain().toOption.get
    assert(second.size === 5, s"expected exactly the appended rows, got $second")
    assert(second.forall(_.getAs[String]("shipment_id").nonEmpty))
    // an in-place rewrite (DELETE) is unrepresentable — loud
    spark.read.format("graft").load(root) // sanity: table still readable
    Warehouse.commit(spark, root,
      Warehouse.read(spark, root).filter(col("quality_score") >= lit(8.0)))
    drain() match {
      case Left(t) =>
        val msg = Option(t.getCause).map(_.getMessage).getOrElse(t.getMessage)
        assert(msg.contains("cannot represent"), msg)
      case Right(rows) => fail(s"rewrite must refuse, got rows: $rows")
    }
  }

  test("manifest-append spans stream O(DELTA): the batch plans ONLY the span's new files") {
    import graft.sources.v2.GraftSnapshotSource
    val root = freshRoot()
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Warehouse.commit(spark, root, batch(60, n = 20))
    val ckpt = Files.createTempDirectory("graft_snap_mdelta_ckpt").toString
    def drain(): Either[Throwable, Seq[Row]] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(60000); Right(got.toSeq) }
      catch { case t: org.apache.spark.sql.streaming.StreamingQueryException =>
        Left(t) }
    }
    assert(drain().toOption.get.size === 20) // v0: the full table
    // conversion span (plain -> manifest): honest dual-diff fallback
    Warehouse.appendFiles(spark, root, batch(61, n = 6, idOffset = 700))
    assert(drain().toOption.get.size === 6)
    // manifest -> manifest append: the O(DELTA) fast path MUST engage
    // and plan exactly the span's fresh files
    Warehouse.appendFiles(spark, root,
      batch(62, n = 4, idOffset = 800).repartition(2))
    val bBefore = GraftSnapshotSource.deltaBatches.sum()
    val fBefore = GraftSnapshotSource.deltaFilesRead.sum()
    val got2 = drain().toOption.get
    assert(got2.size === 4)
    assert(got2.map(_.getAs[String]("shipment_id")).toSet ===
      batch(62, n = 4, idOffset = 800).select("shipment_id")
        .collect().map(_.getString(0)).toSet)
    assert(GraftSnapshotSource.deltaBatches.sum() > bBefore,
      "the manifest-append span must take the new-files-only path")
    val fresh = Warehouse.manifestOf(hfs, root, 2L).get.count(_.startsWith("v2/"))
    assert(GraftSnapshotSource.deltaFilesRead.sum() - fBefore === fresh.toLong,
      s"the delta batch must plan exactly the $fresh fresh files")
    // a manifest RENAME is metadata-only: zero-row batch, stream survives
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    assert(drain().toOption.get.isEmpty)
    // a file-granular rewrite in a manifest span still refuses loudly
    Warehouse.deleteWhereFiles(spark, root, col("quality_score") < lit(9.9))
    drain() match {
      case Left(t) =>
        val msg = Option(t.getCause).map(_.getMessage).getOrElse(t.getMessage)
        assert(msg.contains("cannot represent"), msg)
      case Right(rows) => fail(s"rewrite must refuse, got rows: $rows")
    }
  }

  test("snapshot stream startingVersion skips history; versionAsOf refuses") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(42, n = 10))
    Warehouse.commit(spark, root,
      Warehouse.read(spark, root).unionByName(batch(43, n = 5, idOffset = 600)))
    val ckpt = Files.createTempDirectory("graft_snap_sv_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = spark.readStream.format("graft").option("startingVersion", "1")
      .load(root)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect() }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(got.size === 5, s"expected only the post-v0 appends, got ${got.size}")
    // the refusal surfaces on the stream thread, not at start()
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("graft").option("versionAsOf", "0")
        .load(root)
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_snap_vaof_ckpt").toString)
        .start()
      q2.awaitTermination(30000)
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("versionAsOf"), msg)
  }

  test("snapshot stream crosses a rename: empty batch, era mismatch stays actionable") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(47, n = 10))
    val ckpt = Files.createTempDirectory("graft_snap_ren_ckpt").toString
    def drain(): Either[Throwable, Seq[Row]] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(60000); Right(got.toSeq) }
      catch { case t: org.apache.spark.sql.streaming.StreamingQueryException =>
        Left(t) }
    }
    assert(drain().toOption.get.size === 10)
    // a RENAME commit is metadata-only: the stream advances over it
    // with an EMPTY batch instead of dying at it forever
    Warehouse.renameColumns(spark, root, Map("quality_score" -> "grade"))
    assert(drain() === Right(Seq.empty),
      "a rename version appends nothing; the drain must succeed empty")
    // a post-rename data commit under the NEW names: the restarted
    // stream (schema re-resolved) delivers it under the new schema
    Warehouse.commit(spark, root, Warehouse.readVersionLive(spark, root, 1L)
      .unionByName(batch(48, n = 3, idOffset = 900)
        .withColumnRenamed("quality_score", "grade")))
    val third = drain().toOption.get
    assert(third.size === 3, s"expected the 3 appends, got ${third.size}")
    assert(third.forall(r => !r.isNullAt(r.fieldIndex("grade"))),
      "post-rename appends must carry real values under the new name")
  }

  test("streaming CDC: an in-flight feed publication delays the batch, never kills the query") {
    // The feed publishes AFTER the version pointer swaps — a live
    // stream triggering in that window must plan up to the published
    // frontier (delayed micro-batch), not die on the missing feed.
    val root = cdcRoot()
    val ckpt = Files.createTempDirectory("graft_cdc_race_ckpt").toString
    def drain(): Seq[Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.toSeq
    }
    // v2 committed, feed publication "in flight": no _SUCCESS yet
    Warehouse.commit(spark, root, batch(25, n = 8))
    Warehouse.publishChangeFeed(spark, root, 2L)
    val fs = graft.sources.v2.GraftTables.fs(spark, root)
    val success = new org.apache.hadoop.fs.Path(
      Warehouse.changePath(root, 2L), "_SUCCESS")
    assert(fs.delete(success, false))
    val first = drain() // must NOT throw; drains only v1
    assert(first.map(_.getAs[Long]("_commit_version")).distinct.toSeq === Seq(1L),
      "stream must stop at the contiguously published frontier")
    // publication completes → the next trigger delivers v2
    fs.create(success, true).close()
    val second = drain()
    assert(second.map(_.getAs[Long]("_commit_version")).distinct.toSeq === Seq(2L))
    assert(second.length === Warehouse.readChangeFeed(spark, root, 2L).count())
  }

  test("streaming CDC: offsets are versions; restart resumes from checkpoint") {
    val root = cdcRoot()
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    // foreachBatch sink: the memory sink refuses checkpoint recovery,
    // and the restart IS the thing under test
    def drain(): Seq[Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= batch.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.toSeq
    }
    val first = drain()
    assert(first.nonEmpty)
    assert(first.map(_.getAs[Long]("_commit_version")).distinct.toSeq === Seq(1L))
    // v2 arrives; a restarted query must deliver ONLY v2's feed
    Warehouse.commit(spark, root, batch(24, n = 12))
    Warehouse.publishChangeFeed(spark, root, 2L)
    val second = drain()
    assert(second.nonEmpty)
    assert(second.map(_.getAs[Long]("_commit_version")).distinct.toSeq === Seq(2L),
      "restart must resume past the checkpointed version")
    assert(second.length ===
      Warehouse.readChangeFeed(spark, root, 2L).count())
  }
}
