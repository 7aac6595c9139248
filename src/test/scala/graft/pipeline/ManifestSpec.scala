package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Manifest commits — the O(Δ) DML mode: appends write only the new
  * rows, delete/update/merge rewrite only the files containing touched
  * rows, everything else rides by reference. File-level granularity is
  * asserted on the MANIFESTS themselves (carried entries literally
  * identical), reads/feeds/compaction/vacuum compose, and every
  * refused composition is loud with a named valve. */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_manifest").toString
  private def batch(seed: Int, n: Int = 30, idOffset: Int = 0) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
      new Timestamp(1000000L + seed * 1000L))
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("shipment_id").collect().map(_.getString(0)).toSet
  private def manifest(root: String, v: Long): Seq[String] =
    Warehouse.manifestOf(hfs(root), root, v).getOrElse(
      fail(s"v$v of $root is not a manifest version"))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("appendFiles is O(new rows): zero-copy conversion, carried files by reference") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(1, n = 40).repartition(4)) // plain v0
    val v0Files = Warehouse.dataFilesOf(spark, root, 0L).toSet
    assert(v0Files.size === 4)
    val v1 = Warehouse.appendFiles(spark, root, batch(2, n = 10, idOffset = 100))
    assert(v1 === 1L)
    val m1 = manifest(root, 1L)
    // every v0 file carried BY REFERENCE (the zero-copy conversion);
    // only the appended rows' files are new
    assert(m1.count(_.startsWith("v0/")) === 4)
    assert(m1.filterNot(_.startsWith("v0/")).forall(_.startsWith("v1/")))
    assert(Warehouse.dataFilesOf(spark, root, 0L).toSet === v0Files,
      "the plain version's own files are untouched")
    // reads: current == union; time travel to v0 unchanged
    assert(Warehouse.read(spark, root).count() === 50)
    assert(ids(Warehouse.read(spark, root)) ===
      ids(Warehouse.readVersion(spark, root, 0L)) ++
        ids(batch(2, n = 10, idOffset = 100)))
    assert(Warehouse.readVersion(spark, root, 0L).count() === 40)
    // a second append carries BOTH prior eras by reference
    val v2 = Warehouse.appendFiles(spark, root, batch(3, n = 5, idOffset = 200))
    val m2 = manifest(root, v2)
    assert(m1.toSet.subsetOf(m2.toSet), "append never rewrites carried files")
    assert(Warehouse.read(spark, root).count() === 55)
    // schema drift is loud, never a silent null-fill (extra columns
    // are the additive-widening exception, a DROPPED one never is)
    val e = intercept[IllegalArgumentException] {
      Warehouse.appendFiles(spark, root,
        batch(4, n = 1).withColumnRenamed("region", "zone"))
    }
    assert(e.getMessage.contains("drops or retypes"))
  }

  test("deleteWhereFiles rewrites ONLY touched files; null predicate keeps; no-match is a no-op") {
    val root = freshRoot()
    // 4 files clustered by quality so the predicate touches a subset
    Warehouse.commit(spark, root,
      batch(5, n = 200).repartitionByRange(4, col("quality_score")))
    Warehouse.appendFiles(spark, root, batch(6, n = 10, idOffset = 300)) // v1: manifest
    val before = Warehouse.read(spark, root)
    val doomed = ids(before.filter(col("quality_score") < lit(7.8)))
    assert(doomed.nonEmpty && doomed.size < 100, "fixture must split files")
    val m1 = manifest(root, 1L)
    val v2 = Warehouse.deleteWhereFiles(spark, root,
      col("quality_score") < lit(7.8)).get
    val m2 = manifest(root, v2)
    val carried = m2.toSet.intersect(m1.toSet)
    assert(carried.nonEmpty,
      s"a range-clustered layout must leave untouched files carried: $m2")
    assert(m2.toSet.size === m2.size, "no duplicate manifest entries")
    val live = Warehouse.read(spark, root)
    assert(ids(live).intersect(doomed).isEmpty)
    assert(live.count() === before.count() - doomed.size)
    // time travel: the pre-delete manifest version still reads whole
    assert(Warehouse.readVersion(spark, root, 1L).count() === before.count())
    // NULL predicate rows are KEPT (SQL three-valued logic):
    // temperature is null ~10% of the fixture, [18, 25] otherwise
    val nullTemp = live.filter(col("temperature_celsius").isNull).count()
    val coldTemp = live.filter(col("temperature_celsius") < lit(20.0)).count()
    assert(nullTemp > 0 && coldTemp > 0, "fixture must split true/false/null")
    Warehouse.deleteWhereFiles(spark, root, col("temperature_celsius") < lit(20.0))
    val after = Warehouse.read(spark, root)
    assert(after.filter(col("temperature_celsius").isNull).count() === nullTemp,
      "NULL-predicate rows survive a delete (three-valued logic)")
    assert(after.count() === live.count() - coldTemp)
    // no-match delete publishes NO version
    val cur = Warehouse.currentVersion(spark, root).get
    assert(Warehouse.deleteWhereFiles(spark, root,
      col("quality_score") > lit(99.0)).isEmpty)
    assert(Warehouse.currentVersion(spark, root).get === cur)
  }

  test("updateWhereFiles: assignment only where matched, type pinned, files carried") {
    val root = freshRoot()
    Warehouse.commit(spark, root,
      batch(7, n = 120).repartitionByRange(4, col("quality_score")))
    Warehouse.appendFiles(spark, root,
      batch(8, n = 1, idOffset = 400).limit(0)) // v1: empty append = pure conversion
    val m1 = manifest(root, 1L)
    val before = Warehouse.read(spark, root)
    val hit = ids(before.filter(col("quality_score") < lit(7.8)))
    assert(hit.nonEmpty)
    val v2 = Warehouse.updateWhereFiles(spark, root,
      col("quality_score") < lit(7.8),
      Map("region" -> lit("Reprocessed"))).get
    val m2 = manifest(root, v2)
    assert(m2.toSet.intersect(m1.toSet).nonEmpty, "untouched files carried")
    val after = Warehouse.read(spark, root)
    assert(ids(after.filter(col("region") === "Reprocessed")) === hit)
    assert(after.count() === before.count(), "update never changes cardinality")
    assert(after.schema("region").dataType === before.schema("region").dataType)
    // unknown SET column is loud
    val e = intercept[IllegalArgumentException] {
      Warehouse.updateWhereFiles(spark, root, lit(true), Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("mergeFiles: source-wins keyed upsert, untouched files carried; dup source keys loud") {
    val root = freshRoot()
    val seed = batch(9, n = 60).repartitionByRange(4, col("shipment_id"))
    Warehouse.commit(spark, root, seed)
    Warehouse.appendFiles(spark, root, batch(10, n = 1).limit(0)) // → manifest mode
    val m1 = manifest(root, 1L)
    // source: 5 updates of existing keys + 5 brand-new keys
    val updates = Warehouse.read(spark, root).orderBy("shipment_id").limit(5)
      .withColumn("quality_score", lit(9.99))
    val inserts = batch(11, n = 5, idOffset = 500)
    val source = updates.unionByName(inserts).localCheckpoint(true)
    // mergeFiles is source-wins (the ON CONFLICT DO UPDATE shape)
    val expect = Warehouse.read(spark, root)
      .join(source.select("shipment_id"), Seq("shipment_id"), "left_anti")
      .unionByName(source)
    val v2 = Warehouse.mergeFiles(spark, root, source)
    val m2 = manifest(root, v2)
    assert(m2.toSet.intersect(m1.toSet).nonEmpty,
      "files without a source key must ride by reference")
    assert(rows(Warehouse.read(spark, root)) === rows(expect))
    // duplicate keys in one source batch: loud, never a nondeterministic winner
    val dup = inserts.unionByName(inserts)
    val e = intercept[IllegalArgumentException] {
      Warehouse.mergeFiles(spark, root, dup.localCheckpoint(true))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("feeds and diff read manifest versions; compact folds the chain back to plain") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(12, n = 30))
    Warehouse.appendFiles(spark, root, batch(13, n = 6, idOffset = 600)) // v1
    Warehouse.publishChangeFeed(spark, root, 1L)
    val feed = Warehouse.readChangeFeed(spark, root, 1L)
    assert(feed.count() === 6)
    assert(feed.filter(col("change_type") =!= "insert").count() === 0)
    val d = Warehouse.diff(spark, root, 0L, 1L)
    assert(d.count() === 6)
    // compact: manifest chain → ONE plain snapshot, manifest dropped
    val v2 = Warehouse.compact(spark, root).get
    assert(Warehouse.manifestOf(hfs(root), root, v2).isEmpty)
    assert(hfs(root).exists(new Path(Warehouse.versionPath(root, v2), "_SUCCESS")))
    assert(Warehouse.readVersion(spark, root, v2).count() === 36)
    assert(ids(Warehouse.readVersion(spark, root, v2)) ===
      ids(Warehouse.readVersion(spark, root, 1L)))
  }

  test("manifest-append feeds take the O(Δ) path and equal the full two-snapshot diff") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(36, n = 30))
    // append: 5 fresh keys + ONE re-appearing key with a changed score
    // (surfaces as an update against its old image on BOTH paths)
    val rejoin = Warehouse.read(spark, root).orderBy("shipment_id").limit(1)
      .withColumn("quality_score", lit(9.91))
    Warehouse.appendFiles(spark, root,
      batch(37, n = 5, idOffset = 880).unionByName(rejoin)
        .localCheckpoint(true))
    Warehouse.publishChangeFeed(spark, root, 1L)
    val got = rows(Warehouse.readChangeFeed(spark, root, 1L))
    // independent truth: the full two-snapshot keyed diff
    val expect = rows(Warehouse.diffImages(
      Warehouse.readVersion(spark, root, 0L),
      Warehouse.readVersion(spark, root, 1L), Seq("shipment_id")))
    assert(got === expect,
      "the O(Δ) append feed must equal the full diff exactly")
    val types = Warehouse.readChangeFeed(spark, root, 1L)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("insert" -> 5L, "update" -> 1L), s"got $types")
  }

  test("vacuum pins version dirs still referenced by retained manifests") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(14, n = 40)) // v0: plain, referenced forever
    Warehouse.appendFiles(spark, root, batch(15, n = 5, idOffset = 700)) // v1
    Warehouse.appendFiles(spark, root, batch(16, n = 5, idOffset = 710)) // v2
    Warehouse.appendFiles(spark, root, batch(17, n = 5, idOffset = 720)) // v3
    val total = Warehouse.read(spark, root).count()
    Warehouse.vacuum(spark, root, keepLast = 2)
    val fs = hfs(root)
    // v0's files are referenced by v2 and v3 (retained) — PINNED
    assert(fs.exists(new Path(Warehouse.versionPath(root, 0L))),
      "a dir referenced by a retained manifest must survive the floor")
    assert(Warehouse.read(spark, root).count() === total,
      "vacuum must never break the current read")
    assert(Warehouse.readVersion(spark, root, 2L).count() === total - 5)
    // compaction breaks the references; the next vacuum reclaims all
    Warehouse.compact(spark, root)
    Warehouse.vacuum(spark, root, keepLast = 1)
    assert(!fs.exists(new Path(Warehouse.versionPath(root, 0L))),
      "once no retained manifest references it, the dir is reclaimed")
    assert(Warehouse.read(spark, root).count() === total)
  }

  test("refusal matrix: every unsupported composition is loud and names its valve") {
    // DV-bearing current refuses manifest commits
    val dvRoot = freshRoot()
    Warehouse.commit(spark, dvRoot, batch(18, n = 20))
    Warehouse.deleteWhere(spark, dvRoot, col("quality_score") < lit(8.0))
    val e1 = intercept[IllegalArgumentException] {
      Warehouse.appendFiles(spark, dvRoot, batch(19, n = 1, idOffset = 800))
    }
    assert(e1.getMessage.contains("applyDv"))
    // renamed current refuses manifest commits
    val renRoot = freshRoot()
    Warehouse.commit(spark, renRoot, batch(20, n = 20))
    Warehouse.renameColumns(spark, renRoot, Map("region" -> "zone"))
    val e2 = intercept[IllegalArgumentException] {
      Warehouse.appendFiles(spark, renRoot, batch(21, n = 1, idOffset = 810))
    }
    assert(e2.getMessage.contains("compact"))
    // partitioned current COMPOSES since round 13 (PartitionedManifestSpec
    // owns the behavior pins; here just the matrix entry flip)
    val partRoot = freshRoot()
    Warehouse.commitPartitioned(spark, partRoot, batch(22, n = 20), Seq("region"))
    Warehouse.appendFiles(spark, partRoot, batch(23, n = 1, idOffset = 820))
    assert(Warehouse.read(spark, partRoot).count() === 21)
    // ...and the reverse compositions refuse on a manifest current
    val mRoot = freshRoot()
    Warehouse.commit(spark, mRoot, batch(24, n = 20))
    Warehouse.appendFiles(spark, mRoot, batch(25, n = 2, idOffset = 830))
    val e6 = intercept[IllegalArgumentException] {
      Warehouse.cloneShallow(spark, mRoot, freshRoot() + "_c")
    }
    assert(e6.getMessage.contains("compact"))
    // merge-on-read deleteWhere COMPOSES since round 13
    // (ManifestDvSpec owns the behavior pins); the matrix entry flips:
    val nDv = Warehouse.deleteWhere(spark, mRoot,
      col("quality_score") < lit(8.0))
    assert(nDv > 0 && Warehouse.readWithDv(spark, mRoot)
      .filter(col("quality_score") < lit(8.0)).count() === 0)
    // …and a manifest COMMIT atop the fresh DVs still refuses
    val e4 = intercept[IllegalArgumentException] {
      Warehouse.appendFiles(spark, mRoot, batch(26, n = 1, idOffset = 840))
    }
    assert(e4.getMessage.contains("applyDv"))
    // applyDv folds to plain; the next append re-enters manifest mode
    Warehouse.applyDv(spark, mRoot)
    Warehouse.appendFiles(spark, mRoot, batch(27, n = 1, idOffset = 850))
    // RENAME COLUMN composes since round 13 (metadata-only map commit
    // — ManifestRenameSpec owns the behavior pins)
    Warehouse.renameColumns(spark, mRoot, Map("region" -> "zone"))
    assert(Warehouse.readMapped(spark, mRoot).columns.contains("zone"))
    // compact still folds the chain (now also materializing the map)
    Warehouse.compact(spark, mRoot)
    assert(Warehouse.manifestOf(hfs(mRoot), mRoot,
      Warehouse.currentVersion(spark, mRoot).get).isEmpty)
    assert(Warehouse.read(spark, mRoot,
      org.apache.spark.sql.types.StructType(
        CocoaSchema.warehouse.fields.map(f =>
          if (f.name == "region") f.copy(name = "zone") else f)))
      .columns.contains("zone"))
  }

  test("the O(Δ) claim in bytes: manifest deletes write a small fraction of CoW's") {
    // machine-independent version of the w01/w02 bench pair: the same
    // three surgical deletes through both paths; the manifest arm's
    // published bytes must be a small fraction of the CoW arm's
    // (wall-clock on a fast local disk understates the asymptote;
    // bytes written do not).
    def versionBytes(root: String, from: Long): Long = {
      val fs = hfs(root)
      (from to Warehouse.currentVersion(spark, root).get).map { v =>
        fs.getContentSummary(new Path(Warehouse.versionPath(root, v))).getLength
      }.sum
    }
    val data = batch(30, n = 400).repartitionByRange(8, col("quality_score"))
    val preds = Seq(col("quality_score") < lit(7.7),
      col("quality_score") > lit(9.6),
      col("quality_score").between(8.0, 8.05))
    val cowRoot = freshRoot()
    Warehouse.commit(spark, cowRoot, data)
    preds.foreach { p =>
      val kept = Warehouse.read(spark, cowRoot)
        .filter(!coalesce(p, lit(false)))
      Warehouse.commit(spark, cowRoot, kept.repartitionByRange(8, col("quality_score")),
        expectedCurrent = Some(Warehouse.currentVersion(spark, cowRoot)))
    }
    val mRoot = freshRoot()
    Warehouse.commit(spark, mRoot, data)
    preds.foreach(p => Warehouse.deleteWhereFiles(spark, mRoot, p))
    assert(rows(Warehouse.read(spark, mRoot)) === rows(Warehouse.read(spark, cowRoot)),
      "both arms must publish the same surviving rows")
    val cowBytes = versionBytes(cowRoot, 1L)
    val mBytes = versionBytes(mRoot, 1L)
    assert(mBytes * 2 < cowBytes,
      s"manifest deletes must write a small fraction of CoW's bytes —" +
        s" got manifest=$mBytes vs cow=$cowBytes")
  }

  test("the effective schema PERSISTS: widened chains read deterministically, emptied ones keep it") {
    // mixed footers after an additive widening: parquet inference
    // samples ONE footer (nondeterministic) — the schema written at
    // commit time is authoritative instead
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(33, n = 20))
    Warehouse.appendFiles(spark, root,
      batch(34, n = 5, idOffset = 860).withColumn("note", lit("fresh")))
    val live = Warehouse.readVersionLive(spark, root, 1L)
    assert(live.columns.contains("note"),
      "the widened column must be visible whichever footer inference would sample")
    assert(live.filter(col("note").isNull).count() === 20,
      "pre-widening rows null-fill the new column")
    assert(live.filter(col("note") === "fresh").count() === 5)
    // connector read sees the same deterministic schema — and the
    // widened column's nullability is RELAXED there too, or the
    // analyzer constant-folds `note IS NULL` to false (silently
    // wrong: lit()-widened columns persist nullable=false)
    val conn = spark.read.format("graft").load(root)
    assert(conn.columns.contains("note") && conn.count() === 25)
    assert(conn.filter(col("note").isNull).count() === 20,
      "the connector must null-fill pre-widening rows, never fold the filter")
    // narrowing is still loud (a widened table must never lose 'note')
    val e = intercept[IllegalArgumentException] {
      Warehouse.appendFiles(spark, root, batch(35, n = 1, idOffset = 870))
    }
    assert(e.getMessage.contains("note"))
    // delete-EVERYTHING: zero files, schema survives via the sidecar
    Warehouse.deleteWhereFiles(spark, root, lit(true))
    val empty = Warehouse.readVersionLive(spark, root,
      Warehouse.currentVersion(spark, root).get)
    assert(empty.count() === 0 && empty.columns.contains("note"),
      "an emptied manifest keeps its persisted schema")
    assert(spark.read.format("graft").load(root).count() === 0)
  }

  test("restore to a manifest version carries the referenced rows; readMapped too") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(38, n = 40))                 // v0
    Warehouse.appendFiles(spark, root, batch(39, n = 10, idOffset = 890)) // v1 manifest
    Warehouse.commit(spark, root, Warehouse.read(spark, root).limit(5))   // v2
    // a raw dir read of v1 would see only the 10 appended rows —
    // restore must re-commit all 50
    val v3 = Warehouse.restore(spark, root, 1L)
    assert(Warehouse.readVersion(spark, root, v3).count() === 50,
      "restore of a manifest version must carry the referenced rows")
    // and readMapped (the logical-name read) on a manifest current
    Warehouse.appendFiles(spark, root, batch(40, n = 2, idOffset = 895))
    assert(Warehouse.readMapped(spark, root).count() === 52)
  }

  test("SET assignments evaluate against the OLD row (SQL UPDATE semantics)") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(41, n = 20))
    // swap two columns for matched rows — sequential application
    // would make both equal one of them
    val before = Warehouse.read(spark, root)
      .select("shipment_id", "region", "bean_type").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    Warehouse.updateWhereFiles(spark, root, lit(true),
      Map("region" -> col("bean_type"), "bean_type" -> col("region")))
    val after = Warehouse.read(spark, root)
      .select("shipment_id", "region", "bean_type").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(after === before.map { case (k, (r, b)) => k -> (b, r) },
      "each RHS must see the OLD row, never an already-updated value")
  }

  test("diff and feeds survive an ADDITIVE widening boundary (null-fill, never loud)") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(42, n = 20))                 // v0: no 'note'
    Warehouse.commit(spark, root,
      Warehouse.read(spark, root).withColumn("note", lit("w")))     // v1: widened
    val widened = StructType(CocoaSchema.warehouse.fields :+
      StructField("note", StringType, nullable = true))
    // pre-fix the era guard threw "has no column(s) note" here
    val d = Warehouse.diff(spark, root, 0L, 1L, schema = widened)
    assert(d.count() === 20, "every row gained a note value: all updates")
    assert(d.filter(col("note") =!= "w").count() === 0)
    Warehouse.publishChangeFeed(spark, root, 1L, schema = widened)
    assert(Warehouse.readChangeFeed(spark, root, 1L).count() === 20)
  }

  test("manifest stats skip files at planning (stats-in-the-log); carries preserve them") {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      graft.PlanWalk.collectAll(df.queryExecution.executedPlan) {
        case b: BatchScanExec => b.inputPartitions.collect {
          case fp: FilePartition => fp.files.length }
      }.sum
    }
    val root = freshRoot()
    // first commit AS a manifest: 8 quality-clustered files, each line
    // carrying its min/max stats from the commit-time O(Δ) pass
    Warehouse.appendFiles(spark, root,
      batch(50, n = 400).repartitionByRange(8, col("quality_score")))
    assert(Warehouse.dataFilesOf(spark, root, 0L).size === 8)
    val selective = spark.read.format("graft").load(root)
      .filter(col("quality_score") > lit(9.6))
    val planned = plannedFiles(selective)
    assert(planned < 8 && planned >= 1,
      s"a selective range predicate must skip clustered files at planning, read $planned/8")
    // pruned ≠ wrong: equals the unpruned truth
    assert(rows(selective) ===
      rows(Warehouse.read(spark, root).filter(col("quality_score") > lit(9.6))))
    // stats SURVIVE a granular delete's carry: untouched files still prune
    Warehouse.deleteWhereFiles(spark, root, col("quality_score") < lit(7.7))
    val after = spark.read.format("graft").load(root)
      .filter(col("quality_score") > lit(9.6))
    val planned2 = plannedFiles(after)
    assert(planned2 < Warehouse.dataFilesOf(spark, root,
      Warehouse.currentVersion(spark, root).get).size,
      "carried lines keep their stats — pruning must survive the delete")
    assert(rows(after) ===
      rows(Warehouse.read(spark, root).filter(col("quality_score") > lit(9.6))))
    // a column with no stats (non-atomic or legacy line) never prunes:
    // the string column DOES have stats — an equality outside its
    // range prunes everything except nothing-matching files... assert
    // simply that an always-true predicate reads every file
    assert(plannedFiles(spark.read.format("graft").load(root)
      .filter(col("quality_score").isNotNull)) ===
      Warehouse.dataFilesOf(spark, root,
        Warehouse.currentVersion(spark, root).get).size)
  }

  test("optimizeFiles bin-packs small files, stays in manifest mode, bounds metadata") {
    val root = freshRoot()
    // a churny append stream: 8 tiny single-file commits + 1 big file
    Warehouse.appendFiles(spark, root, batch(60, n = 200).coalesce(1))
    (0 until 8).foreach(i => Warehouse.appendFiles(spark, root,
      batch(61 + i, n = 3, idOffset = 300 + i * 10).coalesce(1)))
    val cur0 = Warehouse.currentVersion(spark, root).get
    val before = manifest(root, cur0)
    assert(before.size === 9)
    val truth = rows(Warehouse.read(spark, root))
    // pack everything under 1 MB except the big seed file
    val bigBytes = Warehouse.dataFileEntries(spark, root, cur0)
      .map(_._2).max
    val v = Warehouse.optimizeFiles(spark, root,
      targetFileBytes = 64L * 1024 * 1024,
      smallFileBytes = bigBytes).getOrElse(fail("must pack the small files"))
    val after = manifest(root, v)
    assert(after.size < before.size,
      s"optimize must FOLD the manifest (${before.size} -> ${after.size})")
    assert(Warehouse.manifestOf(hfs(root), root, v).isDefined,
      "the table STAYS in manifest mode (unlike compact)")
    // the big file rode by reference, VERBATIM (stats intact)
    val bigLine = before.maxBy(l => l.split("\t")(1).toLong)
    assert(after.contains(bigLine),
      "the already-right-sized file must ride by reference")
    // content identical
    assert(rows(Warehouse.read(spark, root)) === truth)
    // nothing left to pack: a second optimize is a no-op
    assert(Warehouse.optimizeFiles(spark, root,
      smallFileBytes = 1L).isEmpty)
  }

  test("optimizeFiles carries the rename map and the partition layout") {
    val root = freshRoot()
    Warehouse.commitPartitioned(spark, root, batch(70, n = 60), Seq("bean_type"))
    (0 until 4).foreach(i => Warehouse.appendFiles(spark, root,
      batch(71 + i, n = 5, idOffset = 400 + i * 10)))
    Warehouse.renameColumns(spark, root, Map("region" -> "zone"))
    val truth = rows(Warehouse.readMapped(spark, root))
    val before = Warehouse.dataFilesOf(spark, root,
      Warehouse.currentVersion(spark, root).get).size
    val v = Warehouse.optimizeFiles(spark, root).getOrElse(
      fail("small partitioned files must pack"))
    assert(Warehouse.dataFilesOf(spark, root, v).size < before)
    assert(Warehouse.manifestParts(hfs(root), root, v) === Seq("bean_type"),
      "partition layout carries")
    val live = Warehouse.readMapped(spark, root)
    assert(live.columns.contains("zone"), "the rename map carries")
    assert(rows(live) === truth)
    // packed files keep the hive layout
    assert(manifest(root, v).filter(_.startsWith(s"v$v/"))
      .forall(_.startsWith(s"v$v/bean_type=")))
  }

  test("optimizeFiles on a PARTITIONED table packs per partition, never multiplies files") {
    val root = freshRoot()
    // 3 single-file appends per partitioned layout: small files per dir
    Warehouse.commitPartitioned(spark, root, batch(90, n = 40), Seq("bean_type"))
    (0 until 3).foreach(i => Warehouse.appendFiles(spark, root,
      batch(91 + i, n = 10, idOffset = 600 + i * 20)))
    val cur = Warehouse.currentVersion(spark, root).get
    val before = Warehouse.dataFilesOf(spark, root, cur).size
    val truth = rows(Warehouse.read(spark, root))
    val v = Warehouse.optimizeFiles(spark, root).getOrElse(fail("must pack"))
    val after = Warehouse.dataFilesOf(spark, root, v)
    assert(after.size < before,
      s"optimize must SHRINK the file count ($before -> ${after.size})")
    // ~one packed file per partition value (3 bean types): a
    // round-robin shuffle before the dynamic write would spray every
    // partition across all tasks and GROW the count instead
    val packed = after.filter(_.contains(s"/v$v/"))
    assert(packed.size <= 3,
      s"expected at most one packed file per partition, got $packed")
    assert(rows(Warehouse.read(spark, root)) === truth)
  }

  test("many-file manifests: 300 tiny files fold to a handful, metadata bounded") {
    val root = freshRoot()
    // ONE commit, 300 tiny files — the shape a churny append stream
    // converges to (without needing 300 commits in a spec)
    Warehouse.appendFiles(spark, root,
      batch(80, n = 300).repartition(300, col("shipment_id")))
    val cur = Warehouse.currentVersion(spark, root).get
    val before = manifest(root, cur)
    // 300-way hash partitioning of 300 rows leaves some partitions
    // empty (no file) — well over 100 tiny files either way
    assert(before.size > 100)
    val truth = rows(Warehouse.read(spark, root))
    val v = Warehouse.optimizeFiles(spark, root).getOrElse(
      fail("300 tiny files must pack"))
    val after = manifest(root, v)
    assert(after.size <= 4,
      s"optimize must fold 300 lines to O(tableBytes/target), got ${after.size}")
    assert(rows(Warehouse.read(spark, root)) === truth)
    // the fold is what bounds the per-resolution manifest parse: the
    // on-disk _MANIFEST text shrinks with the line count
    val fs = hfs(root)
    def mBytes(x: Long) = fs.getFileStatus(new Path(
      Warehouse.versionPath(root, x), "_MANIFEST")).getLen
    assert(mBytes(v) < mBytes(cur) / 10,
      s"manifest text must shrink ~line-proportionally, ${mBytes(cur)} -> ${mBytes(v)}")
  }

  test("racing appendFiles never lose an update: serialized cleanly or fenced loudly") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(43, n = 20))
    val b1 = batch(44, n = 5, idOffset = 900).localCheckpoint(true)
    val b2 = batch(45, n = 5, idOffset = 910).localCheckpoint(true)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(df: org.apache.spark.sql.DataFrame) = new Thread(() => {
      gate.await()
      try Warehouse.appendFiles(spark, root, df)
      catch { case t: Throwable => errors.add(t) }
    })
    val ts = Seq(racer(b1), racer(b2))
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join(300000))
    // a loser fails LOUDLY, either flavor: lease contention (the lock
    // is held — fail-fast, never queue a write) or the read-modify-
    // write fence (pointer moved past the derived version)
    errors.forEach { t =>
      assert(t.getMessage.contains("retry") ||
        t.getMessage.contains("_COMMIT_LOCK"),
        s"unexpected failure: $t")
    }
    assert(errors.size <= 1, s"at most one loser in a two-racer setup: $errors")
    // exactly-once: retry whichever batch didn't land; the final state
    // holds BOTH appends once each — no lost update, no duplicate
    Seq(b1, b2).foreach { b =>
      val have = ids(Warehouse.read(spark, root))
      if (!ids(b).subsetOf(have)) Warehouse.appendFiles(spark, root, b)
    }
    assert(Warehouse.read(spark, root).count() === 30)
  }

  test("manifest commits are lost-update fenced like every other commit") {
    val root = freshRoot()
    Warehouse.commit(spark, root, batch(26, n = 20))
    Warehouse.appendFiles(spark, root, batch(27, n = 2, idOffset = 840))
    // derive a source, then let another commit interleave
    val src = batch(28, n = 2, idOffset = 850).localCheckpoint(true)
    val cur = Warehouse.currentVersion(spark, root)
    Warehouse.commit(spark, root, Warehouse.read(spark, root)) // interloper
    // the manifest commit pinned `expectedCurrent` to the stale version
    // inside publishVersion — but appendFiles re-reads current at call
    // time, so simulate by racing deleteWhereFiles' window instead:
    // simplest deterministic check — expectedCurrent fencing itself is
    // already pinned by WarehouseCommitSpec; here assert appendFiles
    // SUCCEEDS after the interloper (it derives from the new current)
    val v = Warehouse.appendFiles(spark, root, src)
    assert(Warehouse.currentVersion(spark, root).contains(v))
    assert(cur.get < v)
  }
}
