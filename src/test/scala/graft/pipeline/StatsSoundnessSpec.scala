package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Soundness edges of planning-time data skipping and the vacuum
  * sweep — each test pins a case where an unsound shortcut would
  * silently DROP rows (or a live commit):
  *  - NaN: Spark orders NaN above every numeric, so a file's stripped
  *    min/max understate it — NaN-bearing files must never be pruned;
  *  - all-null columns: persisted as explicit nulls, prunable under
  *    any comparison (never matches) — and distinguishable from the
  *    NaN case;
  *  - strings: persisted stats are in UTF8String (code-point) order,
  *    and pruning must compare in the SAME order — Java's UTF-16
  *    code-unit order disagrees beyond the BMP;
  *  - a `_zonemap` sidecar holds parquet files too — a recursive data
  *    listing that doesn't honor the hidden-path rule would serve the
  *    index as data;
  *  - vacuum's crashed-publisher sweep must not delete the staging
  *    dir of a commit whose holder still OWNS the live lease. */
class StatsSoundnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_sound").toString
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    graft.PlanWalk.collectAll(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.inputPartitions.collect {
        case fp: FilePartition => fp.files.length }
    }.sum
  }

  test("NaN-bearing files are never pruned by manifest stats (NaN sorts above every max)") {
    import spark.implicits._
    val root = freshRoot()
    // file of v0: ordinary values, max 5.0
    Warehouse.appendFiles(spark, root,
      Seq((1L, 1.0), (2L, 5.0)).toDF("id", "x").coalesce(1))
    // file of v1: small values PLUS NaN — its stripped max is 2.0,
    // but its NaN rows satisfy x > 100
    Warehouse.appendFiles(spark, root,
      Seq((3L, 2.0), (4L, Double.NaN)).toDF("id", "x").coalesce(1))
    val selective = spark.read.format("graft").load(root)
      .filter(col("x") > lit(100.0))
    val got = rows(selective)
    assert(got === rows(Warehouse.read(spark, root,
      org.apache.spark.sql.types.StructType(
        selective.schema.fields)).filter(col("x") > lit(100.0))))
    assert(got.size === 1 && got.head.contains("NaN"),
      s"the NaN row must survive planning-time skipping, got $got")
    // and the pruning machinery still works where it is sound: the
    // NaN-free file IS skipped (its true max 5.0 < 100)
    assert(plannedFiles(selective) === 1,
      "only the NaN-bearing file can match x > 100 — the clean file prunes")
  }

  test("all-null columns persist explicit nulls and prune under equality") {
    import spark.implicits._
    val root = freshRoot()
    // v0's file: y entirely null; v1's file: y populated
    Warehouse.appendFiles(spark, root,
      Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
        .toDF("id", "y").coalesce(1))
    Warehouse.appendFiles(spark, root,
      Seq((3L, Option("foo")), (4L, Option("bar"))).toDF("id", "y").coalesce(1))
    val q = spark.read.format("graft").load(root).filter(col("y") === lit("foo"))
    assert(rows(q).size === 1)
    assert(plannedFiles(q) === 1,
      "an all-null file can never match an equality — it must prune")
  }

  test("string stats prune in code-point order, not UTF-16 code-unit order") {
    import spark.implicits._
    val root = freshRoot()
    // U+1F600 encodes as a surrogate pair whose lead (U+D83D) sorts
    // BELOW U+FFFF in Java String order, while the code point 0x1F600
    // sorts ABOVE it — a Java-order comparison would prune this file
    // under s > '￿' and silently drop the matching row.
    val emoji = new String(Character.toChars(0x1F600))
    Warehouse.appendFiles(spark, root,
      Seq((1L, emoji)).toDF("id", "s").coalesce(1))
    Warehouse.appendFiles(spark, root,
      Seq((2L, "ascii")).toDF("id", "s").coalesce(1))
    val q = spark.read.format("graft").load(root)
      .filter(col("s") > lit("￿"))
    val got = rows(q)
    assert(got.size === 1 && got.head.contains(emoji),
      s"the supplementary-plane row must survive string-stat pruning, got $got")
    assert(plannedFiles(q) === 1, "the ascii file still prunes (sound skip)")
  }

  test("LEGACY float stats without the nan flag never prune (pre-flag manifests)") {
    import spark.implicits._
    val root = freshRoot()
    // a NaN-bearing file whose stats we then doctor into the LEGACY
    // shape (min/max present, nan: keys absent — what the pre-flag
    // writer persisted after silently stripping NaN)
    Warehouse.appendFiles(spark, root,
      Seq((1L, 2.0), (2L, Double.NaN)).toDF("id", "x").coalesce(1))
    val fs = hfs(root)
    val mPath = new Path(Warehouse.versionPath(root, 0L), "_MANIFEST")
    val in = fs.open(mPath)
    val txt = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    in.close()
    val doctored = txt.replaceAll(""","?"nan:[^"]+":(true|false)""", "")
      .replaceAll(""",\}""", "}")
    assert(doctored != txt, "fixture must actually strip the nan flags")
    val out = fs.create(mPath, true)
    out.write(doctored.getBytes("UTF-8")); out.close()
    // the legacy stats must NOT prune: x's max understates the NaN row
    val got = rows(spark.read.format("graft").load(root)
      .filter(col("x") > lit(100.0)))
    assert(got.size === 1 && got.head.contains("NaN"),
      s"legacy stats must never prune a NaN row, got $got")
  }

  test("a _zonemap sidecar never leaks into a DV merge-on-read scan as data") {
    val root = freshRoot()
    val batch = Enrich.enrich(CocoaGen.shipments(spark, 60, seed = 7),
      new Timestamp(1000000L))
    Warehouse.commit(spark, root, batch.repartition(3))
    // sidecar index INSIDE the snapshot data dir (its real location)
    val dataDir = Warehouse.versionPath(root, 0L)
    graft.sources.ZoneMap.build(spark, dataDir, CocoaSchema.warehouse,
      Seq("quality_score"))
    assert(hfs(root).exists(new Path(
      graft.sources.ZoneMap.indexPath(dataDir), "_SUCCESS")))
    val before = Warehouse.read(spark, root).count()
    // merge-on-read delete: the connector now reads v0 through the
    // DV scan, whose file listing is recursive — the sidecar's
    // parquet must be excluded by the hidden-path rule
    val nDeleted = Warehouse.deleteWhere(spark, root,
      col("quality_score") < lit(8.0))
    assert(nDeleted > 0, "fixture must actually delete something")
    val live = spark.read.format("graft").load(root)
    assert(live.count() === before - nDeleted,
      "a DV read must serve exactly the live rows — no index-file phantoms")
    assert(rows(live) === rows(Warehouse.readWithDv(spark, root)))
  }

  test("vacuum never deletes the staging dir of the LIVE lease holder") {
    val root = freshRoot()
    val batch = Enrich.enrich(CocoaGen.shipments(spark, 10, seed = 1),
      new Timestamp(1000000L))
    Warehouse.commit(spark, root, batch)
    Warehouse.commit(spark, root, batch)
    val fs = hfs(root)
    val old = System.currentTimeMillis() - 60 * 60 * 1000L
    // a slow-but-alive commit: its holder still owns the live lease,
    // its staging dir is older than the TTL (leases are not renewed
    // during a staged write)
    val aliveStage = new Path(root, ".v9_live-holder")
    fs.mkdirs(aliveStage)
    fs.setTimes(aliveStage, old, old)
    val lock = new Path(root, "_COMMIT_LOCK")
    val out = fs.create(lock, true)
    out.write(s"live-holder $old".getBytes("UTF-8")); out.close()
    // a genuinely crashed publisher: holder is NOT on the lock
    val deadStage = new Path(root, ".v8_dead-holder")
    fs.mkdirs(deadStage)
    fs.setTimes(deadStage, old, old)
    Warehouse.vacuum(spark, root, keepLast = 2, minAgeMs = 0L,
      lockTtlMs = 1000L)
    assert(fs.exists(aliveStage),
      "the live lease holder's staged write survives the sweep")
    assert(!fs.exists(deadStage), "the crashed publisher's dir is collected")
    // once the lease is released, the leftover dir is ordinary garbage
    fs.delete(lock, false)
    Warehouse.vacuum(spark, root, keepLast = 2, minAgeMs = 0L,
      lockTtlMs = 1000L)
    assert(!fs.exists(aliveStage))
  }
}
