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

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = Ingest.fs(spark, root)
    val vf = new Path(root, versionFile)
    if (!fs.exists(vf)) None
    else {
      val in = fs.open(vf)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  def versionPath(root: String, v: Long): String = s"$root/v$v"

  /** Read the committed snapshot; empty (schema'd) DataFrame if the
    * warehouse has never been committed. */
  def read(spark: SparkSession, root: String): DataFrame =
    currentVersion(spark, root) match {
      case Some(v) => spark.read.parquet(versionPath(root, v))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CocoaSchema.warehouse)
    }

  /** Write `df` as the next snapshot and atomically publish it.
    * Returns the committed version. */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long = {
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(versionPath(root, next))
    val fs = Ingest.fs(spark, root)
    val tmp = new Path(root, s".$versionFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(root, versionFile)
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(s"failed to publish $target")
    next
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
