package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet warehouse with a versioned-directory commit protocol.
  *
  * The reference's warehouse is a Postgres table whose UPSERT rides a
  * transaction (`conn.commit()`, `cocoa_processing_dag.py:221,237`).
  * Offline we have no Delta/transaction log, so atomicity comes from
  * a write-then-swap pointer:
  *
  * {{{
  * warehouse/
  *   _VERSION        # tiny file holding the committed version number
  *   v0/ v1/ ...     # immutable parquet snapshots
  * }}}
  *
  * A new snapshot is fully written to `v{n+1}/` first; only then is
  * `_VERSION` replaced via create-temp + atomic rename. Readers that
  * resolve `_VERSION` before the swap keep reading the old snapshot —
  * crash-consistent per batch, same guarantee the reference gets from
  * Postgres. Old versions remain for time-travel/debug;
  * [[vacuum]] prunes them.
  */
object Warehouse {

  private val versionFile = "_VERSION"
  private val lockFile = "_COMMIT_LOCK"

  /** The committed version: the `_VERSION` pointer when present, else
    * recovered as the greatest fully-written snapshot (one whose
    * `_SUCCESS` marker exists) — a crash between writing a snapshot
    * and publishing the pointer must not make the warehouse read as
    * empty or let the next commit reuse a version number. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = Ingest.fs(spark, root)
    val vf = new Path(root, versionFile)
    if (fs.exists(vf)) {
      val in = fs.open(vf)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    } else completeSnapshots(spark, root).maxOption
  }

  private def completeSnapshots(spark: SparkSession, root: String): Seq[Long] = {
    val fs = Ingest.fs(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(1).toLong)
  }

  def versionPath(root: String, v: Long): String = s"$root/v$v"

  /** Read the committed snapshot; empty (schema'd) DataFrame if the
    * warehouse has never been committed. The warehouse schema is the
    * declared contract ([[CocoaSchema.warehouse]]), so it is passed
    * explicitly — skipping parquet schema inference (a one-task
    * footer-read job per read). */
  def read(spark: SparkSession, root: String): DataFrame =
    currentVersion(spark, root) match {
      case Some(v) =>
        spark.read.schema(CocoaSchema.warehouse).parquet(versionPath(root, v))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CocoaSchema.warehouse)
    }

  /** Write `df` as the next snapshot and atomically publish it.
    * Returns the committed version.
    *
    * Safety properties (the reference gets these from one Postgres
    * transaction, `cocoa_processing_dag.py:221,237`):
    *  - writer-writer: a best-effort lock file taken with
    *    create(overwrite=false) serializes concurrent commits (a
    *    crashed holder leaves a stale lock — operator removes it;
    *    documented tradeoff of having no coordination service);
    *  - version monotonicity: `next` is 1 + the max over BOTH the
    *    pointer and all complete snapshot dirs, so a crash after
    *    snapshot-write but before publish can never cause a version
    *    number to be reused/overwritten;
    *  - pointer swap: FileContext.rename(OVERWRITE) replaces
    *    `_VERSION` atomically — no delete-then-rename window in which
    *    readers see no pointer. */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long = {
    val fs = Ingest.fs(spark, root)
    fs.mkdirs(new Path(root))
    val lock = new Path(root, lockFile)
    val lockStream =
      try fs.create(lock, false)
      catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"another commit holds $lock (stale? remove it manually)", e)
      }
    lockStream.close()
    try {
      val next = (currentVersion(spark, root).toSeq ++
        completeSnapshots(spark, root)).maxOption.map(_ + 1).getOrElse(0L)
      df.write.mode("overwrite").parquet(versionPath(root, next))
      val tmp = new Path(root, s".$versionFile.tmp")
      val out = fs.create(tmp, true)
      try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        new Path(root).toUri, fs.getConf)
      fc.rename(tmp, new Path(root, versionFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      next
    } finally fs.delete(lock, false)
  }

  /** Bucketed variant: commit the snapshot as a catalog table bucketed
    * + sorted on the merge key. A bucketed target joins updates
    * without re-shuffling the big side — Spark shuffles only the
    * (small) update batch into the target's bucketing, which is the
    * difference between moving a daily batch and moving 100 TB every
    * merge. Catalog metadata is session-scoped with the in-memory
    * catalog (no Hive offline); a cluster deployment points
    * `spark.sql.warehouse.dir` + a metastore at durable storage. */
  def commitBucketed(spark: SparkSession, table: String, df: DataFrame,
      nBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, CocoaSchema.mergeKey)
      .sortBy(CocoaSchema.mergeKey)
      .format("parquet")
      .saveAsTable(table)

  /** Drop all snapshots older than the committed one. */
  def vacuum(spark: SparkSession, root: String): Unit =
    currentVersion(spark, root).foreach { cur =>
      val fs = Ingest.fs(spark, root)
      fs.listStatus(new Path(root)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+") &&
          s.getPath.getName.drop(1).toLong < cur)
        .foreach(s => fs.delete(s.getPath, true))
    }
}
