package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only MEASUREMENT pair for manifest DML (the z-row pattern:
  * the scale claim is timed, not asserted). Both rows seed an
  * identical 32-file lineitem warehouse clustered by `l_orderkey`,
  * then run TEN sequential narrow-range deletes (the surgical-delete
  * shape GDPR/compliance traffic has):
  *
  *  - `w01_delete_cow`: each delete re-commits the whole surviving
  *    snapshot — the plain copy-on-write mode, O(table) per delete;
  *  - `w02_delete_manifest`: each delete goes through
  *    [[Warehouse.deleteWhereFiles]] — O(touched files) per delete,
  *    every untouched file carried by manifest reference.
  *
  * Each row returns the surviving count + key checksum as its
  * one-row result — identical across the pair by construction
  * (`ManifestSpec` pins deleteWhereFiles ≡ the filtered truth, and
  * the CoW arm IS that filter), so the pair times two proven-equal
  * plans. The seed commit is paid identically by both rows; the
  * measured difference is pure delete-path cost. */
object WarehouseBench {

  /** Machine-independent evidence for the O(Δ) claim, emitted into
    * the bench ARTIFACT alongside the seconds (wall-clock is
    * machine/filesystem-dependent; bytes published are not): per arm,
    * the total on-disk bytes the ten deletes wrote — every version
    * dir the deletes published, the seed excluded. CoW re-publishes
    * the surviving snapshot per delete (~10× table); manifest deletes
    * publish only the touched files' rewrites. */
  val bytesPublished = new scala.collection.concurrent.TrieMap[String, Long]

  /** On-disk bytes of version dirs `1..n` under `root` — what the
    * delete sequence itself published. */
  private def publishedBytes(spark: SparkSession, root: String, n: Int): Long = {
    val fs = graft.pipeline.Ingest.fs(spark, root)
    (1 to n).map { v =>
      val p = new org.apache.hadoop.fs.Path(Warehouse.versionPath(root, v.toLong))
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum
  }

  /** Ten disjoint narrow cuts over lineitem's orderkey space — each
    * hits ~1/128 of the keys, landing in one or two of the 32
    * range-clustered files. */
  private def cuts(maxKey: Long): Seq[(Long, Long)] = {
    val band = math.max(1L, maxKey / 32)
    (0 until 10).map(i => (i * band, i * band + band / 4))
  }

  /** Seed = lineitem INFLATED 4x under disjoint key shifts — at the
    * driver's bench SF the per-commit fixed cost (lease, staging
    * rename, pointer swap: scale-independent filesystem ops) would
    * otherwise floor both arms and hide the O(table)-vs-O(touched)
    * difference the pair exists to measure. Each arm seeds in ITS OWN
    * production state: the CoW arm a plain snapshot, the manifest arm
    * a manifest version (round 13) — whose lines carry per-file
    * min/max stats, so its deletes plan STATS-SKIPPED (the touched-
    * file search reads only candidate files, the state every manifest
    * table written through appendFiles is actually in). */
  private def seed(spark: SparkSession, dir: String, tag: String,
      manifest: Boolean = false): (String, Long) = {
    val root = graft.core.RunTemp.dir(s"graft_wbench_${tag}_", keep = 8)
    val li0 = graft.core.Tables.lineitem(spark, dir)
    val span = li0.agg(max("l_orderkey")).head().getLong(0) + 1
    // 4× inflation via an in-task explode, not a 4-branch union: the
    // union form scanned lineitem once PER BRANCH per pass — and the
    // range shuffle below samples its child with a separate job, so
    // the seed paid ~8 parquet scans where one suffices (guide §2.4:
    // remove passes the plan doesn't need). Row multiset is identical
    // (each input row yields the same 4 shifted copies), so both
    // arms' seed, cuts and checksums are unchanged.
    val li = li0
      .select(col("*"), explode(sequence(lit(0L), lit(3L))).as("__shift"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__shift") * lit(span))
      .drop("__shift")
    val clustered = li.repartitionByRange(32, col("l_orderkey"))
    if (manifest) Warehouse.appendFiles(spark, root, clustered)
    else Warehouse.commit(spark, root, clustered)
    (root, 4 * span)
  }

  private def summary(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    Warehouse.read(spark, root, schema)
      .agg(count(lit(1)).as("survivors"),
        sum(col("l_orderkey")).as("key_checksum"))

  /** w01: ten whole-snapshot copy-on-write deletes. */
  def deleteCow(spark: SparkSession, dir: String): DataFrame = {
    val (root, maxKey) = seed(spark, dir, "cow")
    val schema = spark.read.parquet(Warehouse.dataPath(spark, root, 0L)).schema
    cuts(maxKey).foreach { case (lo, hi) =>
      val pred = col("l_orderkey") >= lit(lo) && col("l_orderkey") < lit(hi)
      val kept = Warehouse.read(spark, root, schema)
        .filter(!coalesce(pred, lit(false)))
      Warehouse.commit(spark, root, kept,
        expectedCurrent = Some(Warehouse.currentVersion(spark, root)))
    }
    bytesPublished("w01_delete_cow") = publishedBytes(spark, root, 10)
    summary(spark, root, schema)
  }

  /** w02: ten file-granular manifest deletes of the SAME ranges. */
  def deleteManifest(spark: SparkSession, dir: String): DataFrame = {
    val (root, maxKey) = seed(spark, dir, "manifest", manifest = true)
    val schema = spark.read.parquet(Warehouse.dataPath(spark, root, 0L)).schema
    cuts(maxKey).foreach { case (lo, hi) =>
      val pred = col("l_orderkey") >= lit(lo) && col("l_orderkey") < lit(hi)
      Warehouse.deleteWhereFiles(spark, root, pred)
    }
    bytesPublished("w02_delete_manifest") = publishedBytes(spark, root, 10)
    summary(spark, root, schema)
  }
}
