package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The table-valued SQL surface: every `graft_*` TVF must produce
  * byte-identical results to the table operator it fronts, compose
  * with plain SQL around the call, and reject bad arguments loudly. */
class GraftTvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def registered(): Unit = {
    graft.core.Catalog.registerAll(spark, dir)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("graft_exact_dedup TVF equals Dedup.exactDedup") {
    registered()
    val viaSql = spark.sql(
      "SELECT * FROM graft_exact_dedup('documents', 'doc_id', 'text')")
    val viaScala = graft.operators.Dedup.exactDedup(
      graft.core.Tables.documents(spark, dir), "doc_id", "text")
    assert(viaSql.columns.toSeq === viaScala.columns.toSeq)
    assert(canon(viaSql) === canon(viaScala))
  }

  test("graft_knn TVF equals bruteForceTopK and composes with WHERE/ORDER BY") {
    registered()
    val viaSql = spark.sql(
      """SELECT query_id, nbr_id, cosine, rank
        |FROM graft_knn('embeddings', 'vec_id', 'embedding', 3)
        |WHERE query_id < 10 ORDER BY query_id, rank""".stripMargin)
    val emb = graft.core.Tables.embeddings(spark, dir)
    val viaScala = graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .filter(col("query_id") < 10).orderBy("query_id", "rank")
    assert(viaSql.collect().toSeq === viaScala.collect().toSeq)
  }

  test("graft_minhash_pairs TVF with an inline subquery argument") {
    registered()
    // plant one near-dup pair via the subquery-relation form
    val viaSql = spark.sql(
      """SELECT id_a, id_b, jaccard FROM graft_minhash_pairs(
        |  "(SELECT doc_id, text FROM documents WHERE doc_id < 30
        |    UNION ALL
        |    SELECT doc_id + 100000, text || ' graftmark' FROM documents WHERE doc_id < 5)",
        |  'doc_id', 'text', 128, 32, 3, 0.5)
        |ORDER BY id_a, id_b""".stripMargin)
    val base = graft.core.Tables.documents(spark, dir)
    val planted = base.filter(col("doc_id") < 30)
      .select(col("doc_id"), col("text"))
      .unionByName(base.filter(col("doc_id") < 5)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graftmark")).as("text")))
    val viaScala = graft.operators.Dedup.minhashPairs(planted, "doc_id", "text",
      numHashes = 128, bands = 32, shingleK = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")
    val got = viaSql.collect().toSeq
    assert(got.nonEmpty, "planted near-dups must surface pairs")
    assert(got === viaScala.collect().toSeq)
    spark.catalog.clearCache()
  }

  test("graft_upsert TVF equals Merge.upsert (updates overwrite, inserts append)") {
    registered()
    val viaSql = spark.sql(
      """SELECT * FROM graft_upsert(
        |  '(SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey <= 200)',
        |  "(SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 300)",
        |  'o_orderkey', 'o_orderkey')""".stripMargin)
    val orders = graft.core.Tables.load(spark, dir, "orders")
    val target = orders.filter(col("o_orderkey") <= 200)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val updates = orders
      .filter(col("o_orderkey") > 100 && col("o_orderkey") <= 300)
      .select(col("o_orderkey"), col("o_custkey"), lit("U").as("o_orderstatus"))
    val viaScala = graft.pipeline.Merge.upsert(target, updates,
      "o_orderkey", col("o_orderkey"))
    assert(canon(viaSql) === canon(viaScala))
    // semantic spot-checks: overwritten, untouched, inserted
    val byKey = viaSql.collect()
      .map(r => r.getLong(r.fieldIndex("o_orderkey")) ->
        r.getString(r.fieldIndex("o_orderstatus"))).toMap
    assert(byKey.keySet.exists(_ > 200), "unmatched update keys must insert")
    assert(byKey.filter(_._1 > 100).values.forall(_ == "U"))
  }

  test("graft_ivf_topk TVF runs the IVF index path and stays plausible") {
    registered()
    val got = spark.sql(
      """SELECT query_id, nbr_id, rank
        |FROM graft_ivf_topk('embeddings', 'vec_id', 'embedding', 3, 4, 4)
        |ORDER BY query_id, rank""".stripMargin).collect()
    assert(got.nonEmpty)
    // nProbe = nCells probes every cell => exact: equals brute force
    val exact = graft.operators.Similarity.bruteForceTopK(
      graft.core.Tables.embeddings(spark, dir), "vec_id", "embedding", k = 3)
      .select("query_id", "nbr_id", "rank")
      .orderBy("query_id", "rank").collect()
    assert(got.map(_.toString).toSeq === exact.map(_.toString).toSeq)
    spark.catalog.clearCache()
  }

  test("graft_asof_join / graft_interval_join TVFs equal their Scala operators") {
    registered()
    val e = graft.core.Tables.events(spark, dir)
    val viaSqlAsof = spark.sql(
      """SELECT event_id, user_id, unix_millis(ts) AS ts_ms,
        |  unix_millis(click_ts) AS click_ts_ms, click_value
        |FROM graft_asof_join(
        |  "(SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')",
        |  "(SELECT user_id, ts, value FROM events WHERE event_type = 'click')",
        |  'user_id', 'ts', 'ts', 'ts', 'click_ts', 'value', 'click_value')
        |ORDER BY event_id""".stripMargin)
    val viaScalaAsof = graft.operators.AsOfJoin.asOf(
      e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value"),
      e.filter(col("event_type") === "click").select("user_id", "ts", "value"),
      "user_id", "ts", "ts",
      Map("ts" -> "click_ts", "value" -> "click_value"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        unix_millis(col("click_ts")).as("click_ts_ms"), col("click_value"))
      .orderBy("event_id")
    assert(viaSqlAsof.collect().toSeq === viaScalaAsof.collect().toSeq)

    val viaSqlRange = spark.sql(
      """SELECT user_id, view_id, purchase_id, purchase_us - view_us AS gap_us
        |FROM graft_interval_join(
        |  "(SELECT event_id AS view_id, user_id, unix_micros(ts) AS view_us
        |    FROM events WHERE event_type = 'view')",
        |  "(SELECT event_id AS purchase_id, user_id, unix_micros(ts) AS purchase_us
        |    FROM events WHERE event_type = 'purchase')",
        |  'view_us', 'purchase_us', 0, 3600000000, 'user_id')""".stripMargin)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("view_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    val viaScalaRange = graft.operators.RangeJoin.intervalJoin(
      views, purchases, "view_us", "purchase_us",
      lowerUs = 0L, upperUs = 3600L * 1000 * 1000, equiKeys = Seq("user_id"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("purchase_us") - col("view_us")).as("gap_us"))
    assert(viaSqlRange.collect().toSet === viaScalaRange.collect().toSet)
  }

  test("key-only filters push THROUGH the top-k node (and keep cascading)") {
    registered()
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // cached pair frames from sibling tests would swap InMemoryRelation
    // leaves into these plans and hide the top-k node — clear first so
    // the assertions can never pass vacuously
    spark.catalog.clearCache()
    val df = spark.sql(
      """SELECT query_id, nbr_id, cosine, rank
        |FROM graft_knn('embeddings', 'vec_id', 'embedding', 3)
        |WHERE query_id < 10""".stripMargin)
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case t: graft.plans.TopKPerKey => t }.nonEmpty,
      s"expected a TopKPerKey node:\n$plan")
    // pushdown happened iff NO Filter survives above the top-k node —
    // the moved predicate keeps cascading (through the candidate join,
    // toward the query-side scan), so it must not re-appear there
    val filtersAboveTopK = plan.collect {
      case f: Filter if f.find(_.isInstanceOf[graft.plans.TopKPerKey]).isDefined => f
    }
    assert(filtersAboveTopK.isEmpty,
      s"filter stuck above TopKPerKey:\n$plan")
    // and the result is still exactly the post-filtered full answer
    val viaScala = graft.operators.Similarity.bruteForceTopK(
      graft.core.Tables.embeddings(spark, dir), "vec_id", "embedding", k = 3)
      .filter(col("query_id") < 10)
    assert(df.collect().toSet === viaScala.collect().toSet)
    // a MIXED conjunction splits: the key conjunct moves below the
    // node (and keeps cascading), the rest stays above
    spark.catalog.clearCache()
    val mixed = spark.sql(
      """SELECT * FROM graft_knn('embeddings', 'vec_id', 'embedding', 3)
        |WHERE query_id < 10 AND cosine > 0.5""".stripMargin)
    val mixedPlan = mixed.queryExecution.optimizedPlan
    val mixedTopks = mixedPlan.collect { case t: graft.plans.TopKPerKey => t }
    assert(mixedTopks.nonEmpty)
    val aboveRefs = mixedPlan.collect {
      case f: Filter if f.find(_.isInstanceOf[graft.plans.TopKPerKey]).isDefined =>
        f.condition.references.map(_.name).toSet
    }.flatten.toSet
    assert(!aboveRefs.contains("query_id"),
      s"key conjunct of a mixed predicate stuck above TopKPerKey:\n$mixedPlan")
    assert(aboveRefs.contains("cosine"),
      s"non-key conjunct incorrectly pushed below TopKPerKey:\n$mixedPlan")
    // and values equal the post-filtered full answer
    val mixedScala = graft.operators.Similarity.bruteForceTopK(
      graft.core.Tables.embeddings(spark, dir), "vec_id", "embedding", k = 3)
      .filter(col("query_id") < 10 && col("cosine") > 0.5)
    assert(mixed.collect().toSet === mixedScala.collect().toSet)

    // a NON-key predicate must NOT move below the node (it selects
    // individual rows, not whole groups)
    spark.catalog.clearCache()
    val stay = spark.sql(
      """SELECT * FROM graft_knn('embeddings', 'vec_id', 'embedding', 3)
        |WHERE nbr_id < 10""".stripMargin)
    val stayPlan = stay.queryExecution.optimizedPlan
    assert(stayPlan.collect { case t: graft.plans.TopKPerKey => t }.nonEmpty,
      s"expected a TopKPerKey node:\n$stayPlan")
    val stuck = stayPlan.collect {
      case f: Filter if f.find(_.isInstanceOf[graft.plans.TopKPerKey]).isDefined => f
    }
    assert(stuck.nonEmpty, "non-key filter was incorrectly pushed through top-k")
    spark.catalog.clearCache()
  }

  test("TVFs compose: CTE + join over two TVF calls; named arguments resolve") {
    registered()
    // a CTE over one TVF joined to another TVF call — the front door
    // must behave like any other relation in a larger query
    val composed = spark.sql(
      """WITH kept AS (
        |  SELECT doc_id, n_chars FROM graft_exact_dedup('documents', 'doc_id', 'text'))
        |SELECT k.doc_id, k.n_chars, n.query_id
        |FROM kept k
        |JOIN graft_knn('embeddings', 'vec_id', 'embedding', 3) n
        |  ON k.doc_id = n.query_id AND n.rank = 1
        |WHERE k.doc_id < 20
        |ORDER BY k.doc_id""".stripMargin)
    assert(composed.count() > 0)
    // named arguments, mixed with positional, any order within the tail
    val named = spark.sql(
      """SELECT query_id, nbr_id, rank
        |FROM graft_knn('embeddings', vec => 'embedding', id => 'vec_id', k => 3)
        |WHERE query_id < 5 ORDER BY query_id, rank""".stripMargin)
    val positional = spark.sql(
      """SELECT query_id, nbr_id, rank
        |FROM graft_knn('embeddings', 'vec_id', 'embedding', 3)
        |WHERE query_id < 5 ORDER BY query_id, rank""".stripMargin)
    assert(named.collect().toSeq === positional.collect().toSeq)
    // unknown / gap-leaving named args fail loudly with the parameter list
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_knn('embeddings', k => 3)").collect()
    }
    assert(e.getMessage.contains("parameters"))
    spark.catalog.clearCache()
  }

  test("maintenance TVFs: history lists versions, compact/vacuum act and return content") {
    registered()
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("tvf_maint").toString
    def batch(seed: Int, n: Int) = graft.pipeline.Enrich.enrich(
      graft.pipeline.CocoaGen.shipments(spark, n, seed = seed),
      new Timestamp(1700000000000L + seed))
    graft.pipeline.Warehouse.commit(spark, root, batch(1, 10))
    graft.pipeline.Warehouse.commit(spark, root, batch(2, 25).repartition(6))
    // history: one row per version, counts right
    assert(spark.sql(s"SELECT * FROM graft_history('$root') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((0L, 10L), (1L, 25L)))
    // compact: publishes v2, content unchanged, fewer files
    val compacted = spark.sql(
      s"SELECT * FROM graft_compact('$root') ORDER BY shipment_id")
    assert(compacted.count() === 25)
    assert(graft.pipeline.Warehouse.currentVersion(spark, root) === Some(2L))
    assert(spark.sql(s"SELECT * FROM graft_history('$root')").count() === 3)
    // vacuum keepLast=1: v0/v1 pruned, current survives, old reads loud
    assert(spark.sql(s"SELECT * FROM graft_vacuum('$root', 1)").count() === 25)
    assert(graft.pipeline.Warehouse.versions(spark, root) === Seq(2L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_time_travel('$root', 0)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("path does not exist") ||
      e.getMessage.contains("missing"), e.getMessage)
    // clone: zero-copy publish on a fresh destination, content equal
    val dst = java.nio.file.Files.createTempDirectory("tvf_clone").toString
    assert(spark.sql(s"SELECT * FROM graft_clone('$root', '$dst')").count() === 25)
    assert(graft.pipeline.Warehouse.versions(spark, dst) === Seq(0L))
    // restore: rollback commits the old content forward
    val r2 = java.nio.file.Files.createTempDirectory("tvf_restore").toString
    graft.pipeline.Warehouse.commit(spark, r2, batch(5, 10))
    graft.pipeline.Warehouse.commit(spark, r2, batch(6, 30))
    assert(spark.sql(s"SELECT * FROM graft_restore('$r2', 0)").count() === 10)
    assert(graft.pipeline.Warehouse.versions(spark, r2) === Seq(0L, 1L, 2L))
  }

  test("graft_time_travel serves LIVE rows: deletion vectors applied, rename map applied") {
    import java.sql.Timestamp
    registered()
    val w = graft.pipeline.Warehouse
    def batch(seed: Int, n: Int) = graft.pipeline.Enrich.enrich(
      graft.pipeline.CocoaGen.shipments(spark, n, seed = seed),
      new Timestamp(1700000000000L + seed))

    // (a) DV-bearing version: deleteWhere's merge-on-read path attaches
    // vectors to v0 IN PLACE — a raw parquet scan of v0 would resurrect
    // the deleted rows; the TVF must not.
    val root = java.nio.file.Files.createTempDirectory("tvf_tt_dv").toString
    w.commit(spark, root, batch(1, 20))
    w.deleteWhere(spark, root, col("quality_score") < lit(8.0))
    val live = spark.sql(s"SELECT * FROM graft_time_travel('$root', 0)")
    assert(canon(live) === canon(w.readWithDv(spark, root)),
      "TVF time travel must equal the DV-aware read, not the raw scan")
    assert(live.count() < 20, "fixture must actually delete something")

    // (b) renamed version: the rename map is metadata-only; the TVF
    // must surface LOGICAL (post-rename) names on that version and
    // the physical names on the pre-rename version.
    val root2 = java.nio.file.Files.createTempDirectory("tvf_tt_ren").toString
    w.commit(spark, root2, batch(2, 10))
    w.renameColumns(spark, root2, Map("quality_score" -> "grade"))
    val renamed = spark.sql(s"SELECT * FROM graft_time_travel('$root2', 1)")
    assert(renamed.columns.contains("grade") &&
      !renamed.columns.contains("quality_score"))
    assert(canon(renamed.select(col("shipment_id"), col("grade"))) ===
      canon(w.read(spark, root2).select(col("shipment_id"),
        col("quality_score").as("grade"))))
    val preRename = spark.sql(s"SELECT * FROM graft_time_travel('$root2', 0)")
    assert(preRename.columns.contains("quality_score"),
      "pre-rename version keeps its era's names")
  }

  test("introspection TVFs are manifest-aware: history counts listed files, time travel whole") {
    registered()
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("tvf_manifest").toString
    val b1 = graft.pipeline.Enrich.enrich(
      graft.pipeline.CocoaGen.shipments(spark, 20, seed = 71),
      new Timestamp(1000000L))
    val b2 = graft.pipeline.Enrich.enrich(
      graft.pipeline.CocoaGen.shipments(spark, 5, seed = 72, idOffset = 950),
      new Timestamp(2000000L))
    graft.pipeline.Warehouse.commit(spark, root, b1)       // v0 plain
    graft.pipeline.Warehouse.appendFiles(spark, root, b2)  // v1 manifest
    // a raw dir read of v1 would count ONLY the 5 appended rows
    val hist = spark.sql(s"SELECT * FROM graft_history('$root') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist === Seq((0L, 20L), (1L, 25L)),
      s"history must count a manifest version's LISTED files: $hist")
    assert(spark.sql(s"SELECT * FROM graft_time_travel('$root', 1)").count() === 25)
    assert(spark.sql(s"SELECT * FROM graft_live('$root')").count() === 25)
  }

  test("TVF arity and argument errors are loud and named") {
    registered()
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_knn('embeddings', 'vec_id')").collect()
    }
    assert(e1.getMessage.contains("graft_knn"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_knn('embeddings', 'vec_id', 'embedding', 'five')").collect()
    }
    assert(e2.getMessage.contains("integer"))
  }
}
