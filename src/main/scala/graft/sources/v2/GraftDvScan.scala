package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.pipeline.Warehouse

/** MERGE-ON-READ deletion-vector scan: `format("graft")` (and every
  * SQL read through [[GraftCatalog]]) of a snapshot that carries DVs
  * ([[Warehouse.deleteWhere]]'s in-place delete, the Delta/Iceberg DV
  * shape) serves the LIVE rows instead of refusing — the deleted
  * (file, pos) pairs are skipped at read time, exactly like Delta's
  * DV-aware reader.
  *
  * Design, and why it is shaped like Delta's:
  *  - The DV set is loaded ON THE DRIVER at planning time and each
  *    file's sorted positions ride its [[InputPartition]] — the same
  *    plan Delta uses (per-file bitmap shipped with the scan task).
  *    Our vectors are plain (file, pos) parquet rows rather than
  *    roaring bitmaps, so the load is bounded LOUDLY: past
  *    [[GraftDvScan.MaxDvBytes]] on disk the scan refuses and names
  *    [[Warehouse.applyDv]] — the maintenance op that folds overgrown
  *    vectors back into a clean snapshot (the Scala-side
  *    [[Warehouse.readWithDv]] anti-join has the same valve at its
  *    broadcast bound).
  *  - One input partition per data FILE, whole file, no splits:
  *    a DV position is the row's ordinal within its file, so the
  *    reader must consume the file's row groups in order from row 0.
  *    The row-position skip is a two-pointer walk (positions sorted,
  *    rows arrive in file order) — O(1) per row, zero allocation.
  *  - `filters = Nil` to the parquet reader closure, deliberately:
  *    pushed filters skip ROW GROUPS, which would desynchronize the
  *    ordinal count. Spark evaluates the query's predicates above the
  *    scan instead (this scan claims no pushdown). Column PRUNING is
  *    safe (rows still arrive in order) and supported.
  *  - Row-by-row output (`OPTION_RETURNING_BATCH=false`), matching
  *    [[GraftCdcReaderFactory]]: the position skip is per-row anyway.
  *
  * The DV-bearing state is TRANSITIONAL by contract (deleteWhere's
  * merge-on-read defers the rewrite; applyDv/compaction restores the
  * vectorized fast path), so trading the vectorized batch read for
  * correctness here costs only the window between a delete and its
  * next maintenance cycle. Partitioned snapshots with DVs are refused
  * (partition values would have to be re-derived from paths; the
  * Scala API [[Warehouse.readWithDv]] covers them).
  */
object GraftDvScan {
  /** Driver-side load cap for the DV set (on-disk bytes). */
  val MaxDvBytes: Long = 64L * 1024 * 1024
}

case class GraftDvInputPartition(filePath: String, length: Long,
    modificationTime: Long, deletedPositions: Array[Long]) extends InputPartition

class GraftDvScanBuilder(spark: SparkSession, root: String, version: Long,
    dataDir: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftDvScanImpl(spark, root, version, dataDir, tableSchema, required)
}

class GraftDvScanImpl(spark: SparkSession, root: String, version: Long,
    dataDir: String, tableSchema: StructType, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-dv root=$root v$version (merge-on-read deletion vectors)"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = GraftTables.fs(spark, root)
    val dvBytes = Warehouse.dvOnDiskBytes(spark, root, version)
    require(dvBytes <= GraftDvScan.MaxDvBytes,
      s"graft: snapshot v$version of $root carries $dvBytes bytes of deletion" +
        s" vectors, past the ${GraftDvScan.MaxDvBytes}-byte scan-planning bound —" +
        " fold them into a clean snapshot with Warehouse.applyDv (or read via" +
        " Warehouse.readWithDv) first")
    // Deleted ordinals per data-file NAME (unique within a flat
    // snapshot — the key deleteWhere records), sorted for the
    // two-pointer skip.
    val deleted: Map[String, Array[Long]] =
      Warehouse.dvRows(spark, root, version) match {
        case None => Map.empty
        case Some(dv) => dv.collect()
          .groupBy(_.getString(0))
          .map { case (f, rows) => f -> rows.map(_.getLong(1)).sorted }
      }
    fs.listStatus(new Path(dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        GraftDvInputPartition(s.getPath.toString, s.getLen,
          s.getModificationTime,
          deleted.getOrElse(s.getPath.getName, Array.empty[Long]))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      GraftTables.classic(spark),
      dataSchema = tableSchema,
      partitionSchema = StructType(Nil),
      requiredSchema = required,
      filters = Nil, // MUST stay Nil: row-group skipping would break ordinals
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = GraftTables.classic(spark).sessionState.newHadoopConf())
    new GraftDvReaderFactory(readFunc)
  }
}

/** Per-file reader: Spark's own parquet reader closure, with the
  * file's deleted ordinals skipped by a two-pointer walk over the
  * in-order row stream. */
class GraftDvReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftDvInputPartition]
    val pf = PartitionedFile(
      partitionValues = new GenericInternalRow(Array.empty[Any]),
      filePath = SparkPath.fromPathString(p.filePath),
      start = 0L, length = p.length, locations = Array.empty,
      modificationTime = p.modificationTime, fileSize = p.length,
      otherConstantMetadataColumnValues = Map.empty)
    // the closure may yield ColumnarBatches disguised as rows when the
    // vectorized reader engages — flatten, order is preserved
    val rows: Iterator[InternalRow] = readFunc(pf).flatMap { r =>
      (r: Any) match {
        case b: ColumnarBatch =>
          import scala.jdk.CollectionConverters._
          b.rowIterator().asScala
        case row: InternalRow => Iterator.single(row)
      }
    }
    val deleted = p.deletedPositions
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      private var pos = -1L
      private var di = 0
      override def next(): Boolean = {
        while (rows.hasNext) {
          current = rows.next()
          pos += 1
          if (di < deleted.length && deleted(di) == pos) di += 1
          else return true
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = () // file handles close with the task
    }
  }
}
