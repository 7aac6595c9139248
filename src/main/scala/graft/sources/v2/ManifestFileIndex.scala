package graft.sources.v2

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{PartitioningAwareFileIndex, PartitionSpec}

/** Scan file index backed ENTIRELY by a manifest version's persisted
  * entries (absolute path, size, mtime): planning a read performs
  * ZERO filesystem listing and ZERO per-file stat calls — the
  * manifest IS the listing, the property that makes Delta/Iceberg
  * metadata scale to million-file tables (a directory listing is
  * O(files) round-trips on an object store; this is one small file
  * already read at table resolution).
  *
  * Manifest snapshots are flat by contract (hive partitioning refuses
  * the manifest commit), so the partition spec is empty.
  * `sizeInBytes` feeds the optimizer's stats from the same persisted
  * numbers. */
private[graft] class ManifestFileIndex(spark: SparkSession, root: String,
    entries: Seq[(String, Long, Long)],
    stats: Map[String, Map[String, (Option[Any], Option[Any])]] = Map.empty)
    extends PartitioningAwareFileIndex(
      GraftTables.classic(spark), Map.empty[String, String], None) {

  private val statuses: Seq[FileStatus] = entries.map { case (abs, size, mtime) =>
    new FileStatus(size, false, 1, 128L * 1024 * 1024, mtime, new Path(abs))
  }

  /** DATA SKIPPING from the manifest's persisted per-file min/max
    * (the Delta stats-in-the-log shape): pushed conjuncts become the
    * zone-map constraints and files whose ranges cannot match are
    * dropped at PLANNING — no footer opened, no task launched. Files
    * or columns without stats are never dropped. */
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
    import org.apache.spark.sql.execution.datasources.PartitionDirectory
    import org.apache.spark.sql.catalyst.InternalRow
    val constraints = dataFilters.flatMap(ZoneMapFileIndex.constraint)
    val kept =
      if (constraints.isEmpty || stats.isEmpty) statuses
      else statuses.filter { f =>
        stats.get(f.getPath.toString) match {
          case None => true // no stats for this file: never drop
          case Some(ranges) => constraints.forall(_.canMatch(ranges))
        }
      }
    if (kept.size < statuses.size) {
      ZoneMapFileIndex.filesPruned.add(statuses.size - kept.size)
      ZoneMapFileIndex.filesKept.add(kept.size)
      logInfo(s"manifest stats pruned ${statuses.size - kept.size}/" +
        s"${statuses.size} files of $root")
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m += (s.getPath -> s))
    m
  }

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent)
      .map { case (dir, fls) => dir -> fls.toArray }

  // the base implementation resolves allFiles() by looking up the
  // ROOT paths' children — manifest files live across VERSION subdirs,
  // so answer directly from the persisted entries
  override def allFiles(): Seq[FileStatus] = statuses

  override def rootPaths: Seq[Path] =
    statuses.map(_.getPath.getParent).distinct

  override def refresh(): Unit = ()
}
