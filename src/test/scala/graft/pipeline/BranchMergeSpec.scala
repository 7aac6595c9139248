package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Three-way branch merge: disjoint edits fold cleanly (including
  * branch-side deletes), identical edits on both sides converge, real
  * divergence aborts loudly before anything publishes, and the fork
  * contract (branch v0 = the clone) is honored through the pointer. */
class BranchMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_branch").toString
  private def batch(seed: Int, n: Int = 80, idOffset: Long = 0L) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
      new Timestamp(1000000L))
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq
  private def fork(): (String, String) = {
    val main = freshRoot(); val br = freshRoot()
    Warehouse.commit(spark, main, batch(41))
    Warehouse.cloneShallow(spark, main, br)
    (main, br)
  }

  test("disjoint edits merge cleanly; branch deletes propagate") {
    val (main, br) = fork()
    // main updates keys 0-9 (new processed_at stamp)
    Warehouse.commit(spark, main, Merge.upsertShipments(
      Warehouse.read(spark, main),
      Enrich.enrich(CocoaGen.shipments(spark, 10, seed = 42),
        new Timestamp(2000000L))))
    // branch DELETES keys 70-79 (content commit without them) and
    // inserts keys 100-104
    val pruned = Warehouse.read(spark, br)
      .filter(expr("CAST(substring(shipment_id, 6) AS BIGINT)") < 70)
    Warehouse.commit(spark, br, pruned.unionByName(
      Enrich.enrich(CocoaGen.shipments(spark, 5, seed = 43, idOffset = 100),
        new Timestamp(3000000L))))
    val v = Warehouse.mergeBranch(spark, main, br)
    val merged = Warehouse.read(spark, main)
    assert(Warehouse.currentVersion(spark, main) === Some(v))
    assert(merged.count() === 80 - 10 + 5, "deletes and inserts must both apply")
    // main's own edits survived
    val stamps = merged.filter(expr("CAST(substring(shipment_id, 6) AS BIGINT)") < 10)
      .select("processed_at").distinct().collect().map(_.getTimestamp(0).getTime)
    assert(stamps.toSeq === Seq(2000000L), "main-side updates must survive the merge")
    // deleted keys are gone
    assert(merged.filter(
      expr("CAST(substring(shipment_id, 6) AS BIGINT) >= 70 AND " +
        "CAST(substring(shipment_id, 6) AS BIGINT) < 80")).count() === 0)
  }

  test("a branch-side merge-on-read DV delete propagates through the merge") {
    val (main, br) = fork()
    // branch deletes via DELETION VECTORS (no rewrite, in place) — the
    // merge must see the branch's LIVE rows, never the raw files
    val doomed = Warehouse.read(spark, br)
      .filter(col("quality_score") < lit(8.0))
      .select("shipment_id").collect().map(_.getString(0)).toSet
    assert(doomed.nonEmpty)
    Warehouse.deleteWhere(spark, br, col("quality_score") < lit(8.0))
    Warehouse.mergeBranch(spark, main, br)
    val after = Warehouse.read(spark, main)
      .select("shipment_id").collect().map(_.getString(0)).toSet
    assert(after.intersect(doomed).isEmpty,
      "DV-deleted branch rows must not survive the merge")
    assert(after.size === 80 - doomed.size)
  }

  test("identical edits on both sides converge; true divergence is loud and publishes nothing") {
    val (main, br) = fork()
    val sameEdit = Enrich.enrich(CocoaGen.shipments(spark, 5, seed = 44),
      new Timestamp(2000000L))
    Warehouse.commit(spark, main, Merge.upsertShipments(
      Warehouse.read(spark, main), sameEdit))
    Warehouse.commit(spark, br, Merge.upsertShipments(
      Warehouse.read(spark, br), sameEdit))
    // identical images ⇒ clean merge
    Warehouse.mergeBranch(spark, main, br)
    val converged = rows(Warehouse.read(spark, main))

    // now a REAL divergence on key 0: different quality on each side
    val (main2, br2) = fork()
    def edit(q: Double, ts: Long) = Enrich.enrich(
      CocoaGen.shipments(spark, 1, seed = 45), new Timestamp(ts))
      .withColumn("quality_score", lit(q))
    Warehouse.commit(spark, main2, Merge.upsertShipments(
      Warehouse.read(spark, main2), edit(1.0, 2000000L)))
    Warehouse.commit(spark, br2, Merge.upsertShipments(
      Warehouse.read(spark, br2), edit(9.0, 3000000L)))
    val before = Warehouse.currentVersion(spark, main2)
    val e = intercept[IllegalStateException] {
      Warehouse.mergeBranch(spark, main2, br2)
    }
    assert(e.getMessage.contains("BOTH sides"), e.getMessage)
    assert(Warehouse.currentVersion(spark, main2) === before,
      "a conflicted merge must publish nothing")
    assert(converged.nonEmpty)
  }

  test("fork AFTER a rename merges under the renamed schema; one-sided renames are loud") {
    import org.apache.spark.sql.types.StructType
    val renamed = StructType(CocoaSchema.warehouse.fields.map(f =>
      if (f.name == "region") f.copy(name = "zone") else f))
    // shared-era case: rename BEFORE forking — both sides live in the
    // 'zone' era (the clone carries the map), edits merge era-correct
    val main = freshRoot(); val br = freshRoot()
    Warehouse.commit(spark, main, batch(46))
    Warehouse.renameColumns(spark, main, Map("region" -> "zone"))
    Warehouse.cloneShallow(spark, main, br)
    val branchEdit = Warehouse.readVersionLive(spark, br, 0L)
      .orderBy("shipment_id").limit(3)
      .withColumn("zone", lit("Branchland"))
    Warehouse.commit(spark, br,
      Warehouse.readVersionLive(spark, br, 0L)
        .join(branchEdit.select("shipment_id"), Seq("shipment_id"), "left_anti")
        .unionByName(branchEdit))
    Warehouse.mergeBranch(spark, main, br, schema = renamed)
    val merged = Warehouse.readVersionLive(spark, main,
      Warehouse.currentVersion(spark, main).get)
    assert(merged.filter(col("zone") === "Branchland").count() === 3,
      "the branch edit must fold in under the renamed column")
    // one-sided case: the branch renames after the fork; merging under
    // the new names cannot resolve MAIN's era — loud, never null-fill
    val (m2, b2) = fork()
    Warehouse.renameColumns(spark, b2, Map("region" -> "zone"))
    Warehouse.commit(spark, b2, Warehouse.readVersionLive(spark, b2,
      Warehouse.currentVersion(spark, b2).get).limit(79))
    val e = intercept[IllegalStateException] {
      Warehouse.mergeBranch(spark, m2, b2, schema = renamed)
    }
    assert(e.getMessage.contains("era") || e.getMessage.contains("zone"),
      s"a one-sided rename must refuse the merge loudly: ${e.getMessage}")
  }

  test("RE-MERGE: fork past v0, diverge, merge, diverge again, merge again") {
    // main accrues history BEFORE the fork (fork at v3, not v0)
    val main = freshRoot(); val br = freshRoot()
    Warehouse.commit(spark, main, batch(51))
    Warehouse.commit(spark, main, Merge.upsertShipments(
      Warehouse.read(spark, main),
      Enrich.enrich(CocoaGen.shipments(spark, 5, seed = 52),
        new Timestamp(1500000L))))
    Warehouse.commit(spark, main, Merge.upsertShipments(
      Warehouse.read(spark, main),
      Enrich.enrich(CocoaGen.shipments(spark, 5, seed = 53, idOffset = 10),
        new Timestamp(1600000L))))
    assert(Warehouse.currentVersion(spark, main) === Some(2L))
    Warehouse.cloneShallow(spark, main, br)

    def upsert(root: String, seed: Int, idOffset: Long, ts: Long, n: Int = 10): Unit =
      Warehouse.commit(spark, root, Merge.upsertShipments(
        Warehouse.read(spark, root),
        Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed, idOffset = idOffset),
          new Timestamp(ts))))

    // ROUND 1: disjoint edits (main keys 20-29, branch keys 100-109)
    upsert(main, 54, 20, 2000000L)
    upsert(br, 55, 100, 2100000L)
    Warehouse.mergeBranch(spark, main, br)
    val afterFirst = Warehouse.read(spark, main)
    assert(afterFirst.filter(
      expr("CAST(substring(shipment_id, 6) AS BIGINT) >= 100")).count() === 10)

    // ROUND 2: both sides diverge AGAIN (main keys 30-39, branch keys
    // 110-119) — the advanced base means round-1 keys never re-enter
    // the diff, so this merge is clean and folds only the new edits
    upsert(main, 56, 30, 3000000L)
    upsert(br, 57, 110, 3100000L)
    Warehouse.mergeBranch(spark, main, br)
    val afterSecond = Warehouse.read(spark, main)
    assert(afterSecond.filter(
      expr("CAST(substring(shipment_id, 6) AS BIGINT) >= 110")).count() === 10,
      "second round of branch edits must fold in on re-merge")
    assert(afterSecond.filter(
      expr("CAST(substring(shipment_id, 6) AS BIGINT) >= 100 AND " +
        "CAST(substring(shipment_id, 6) AS BIGINT) < 110")).count() === 10,
      "first round's merged keys must survive the second merge")
    // main's own round-2 edits survived the second merge
    val mainStamps = afterSecond.filter(
      expr("CAST(substring(shipment_id, 6) AS BIGINT) >= 30 AND " +
        "CAST(substring(shipment_id, 6) AS BIGINT) < 40"))
      .select("processed_at").distinct().collect().map(_.getTimestamp(0).getTime)
    assert(mainStamps.toSeq === Seq(3000000L))

    // ROUND 3: conflict detection still loud AFTER base advance —
    // both sides now edit key 50 differently
    def edit(root: String, q: Double, ts: Long): Unit =
      Warehouse.commit(spark, root, Merge.upsertShipments(
        Warehouse.read(spark, root),
        Enrich.enrich(CocoaGen.shipments(spark, 1, seed = 58, idOffset = 50),
          new Timestamp(ts)).withColumn("quality_score", lit(q))))
    edit(main, 2.0, 4000000L)
    edit(br, 8.0, 4100000L)
    val before = Warehouse.currentVersion(spark, main)
    val e = intercept[IllegalStateException] {
      Warehouse.mergeBranch(spark, main, br)
    }
    assert(e.getMessage.contains("BOTH sides"), e.getMessage)
    assert(Warehouse.currentVersion(spark, main) === before,
      "a conflicted re-merge must publish nothing")

    // a branch tracks ONE upstream: re-merging into a DIFFERENT main
    // whose history happens to reach the recorded version must be
    // loud, never a silent diff against the unrelated snapshot
    val other = freshRoot()
    (0 to 3).foreach { i =>
      Warehouse.commit(spark, other, Merge.upsertShipments(
        batch(60 + i), batch(60 + i)))
    }
    val beforeOther = Warehouse.currentVersion(spark, other)
    val wrong = intercept[IllegalStateException] {
      Warehouse.mergeBranch(spark, other, br)
    }
    assert(wrong.getMessage.contains("ONE upstream"), wrong.getMessage)
    assert(Warehouse.currentVersion(spark, other) === beforeOther,
      "a wrong-upstream merge must publish nothing")
  }
}
