package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.pipeline.Warehouse

/** Change-data-feed reads through the connector: the STORED per-version
  * feeds ([[Warehouse.publishChangeFeed]], Delta's `table_changes`
  * analogue) exposed as one DSv2 table, batch AND streaming.
  *
  *  - batch: `spark.read.format("graft").option("readChangeFeed", true)
  *    .option("startingVersion", 1).load(root)` — every feed row of
  *    versions `startingVersion..endingVersion` (default: current),
  *    stamped with `_commit_version`;
  *  - streaming: the same options on `spark.readStream` — a
  *    [[MicroBatchStream]] whose OFFSETS ARE WAREHOUSE VERSIONS. Each
  *    micro-batch covers the feeds of `(startOffset, endOffset]`; a
  *    restart resumes from the checkpointed version, so a maintained
  *    downstream (e.g. [[graft.operators.IncrementalAgg]]) pays |Δ|
  *    per trigger, never a snapshot rescan — the 100 TB shape.
  *
  * Scale/design notes. Offsets are VERSION-granular because the feed
  * artifact is: a warehouse commit is the atomic unit of change, so a
  * finer offset (per file) would only split one transaction's rows
  * across micro-batches — exactly what an incremental consumer must
  * never see. Each feed file becomes one input partition; the rows are
  * decoded by Spark's own parquet reader closure
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]]) with
  * `_commit_version` supplied as a constant partition column per file
  * — zero extra I/O for the stamp. Correct-or-loud: a version in the
  * requested range whose feed was never published (or was vacuumed,
  * [[Warehouse.vacuum]]) raises instead of reading as "no changes".
  */
object GraftCdc {

  val CommitVersionCol = "_commit_version"

  def table(spark: SparkSession, root: String,
      options: CaseInsensitiveStringMap): Table = {
    val starting = Option(options.get(GraftTables.StartingVersion))
      .map(GraftTables.parseVersion).getOrElse(1L)
    require(starting >= 1, s"graft: startingVersion must be >= 1 (v0 has no" +
      s" predecessor to diff against), got $starting")
    val ending = Option(options.get(GraftTables.EndingVersion))
      .map(GraftTables.parseVersion)
    ending.foreach(e => require(e >= starting,
      s"graft: endingVersion $e < startingVersion $starting"))
    new GraftCdcTable(spark, root, starting, ending)
  }

  /** Feed dir for `v`, required COMPLETE — loud otherwise. */
  private def completeFeedDir(spark: SparkSession, root: String, v: Long): Path = {
    val p = new Path(Warehouse.changePath(root, v))
    require(GraftTables.fs(spark, root).exists(new Path(p, "_SUCCESS")),
      s"graft: no complete change feed for v$v under $root/_changes —" +
        " publishChangeFeed every commit (or lower startingVersion past the" +
        " vacuum retention floor)")
    p
  }

  /** The stored feed's schema, inferred from the LATEST published feed
    * at/after `starting` — the CURRENT era's names (Delta's
    * `table_changes` surfaces the current table schema the same way).
    * Feeds published under an OLDER era's names (pre-rename) are
    * decoded positionally per version ([[readerFactory]]). */
  private[v2] def feedSchema(spark: SparkSession, root: String, starting: Long): StructType = {
    val fs = GraftTables.fs(spark, root)
    val changes = new Path(s"$root/_changes")
    val published =
      if (!fs.exists(changes)) Seq.empty
      else fs.listStatus(changes).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+") &&
          fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.getName.drop(1).toLong)
        .filter(_ >= starting).sorted
    require(published.nonEmpty,
      s"graft: no published change feed at/after v$starting under $root/_changes —" +
        " Warehouse.publishChangeFeed first")
    // walk back from the newest: a metadata-only version's feed is
    // EMPTY (zero part files) and carries no readable footer
    published.reverseIterator.map { v =>
      try Some(spark.read.parquet(Warehouse.changePath(root, v)).schema)
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }.collectFirst { case Some(s) => s }.getOrElse(
      spark.read.parquet(Warehouse.changePath(root, published.head)).schema)
  }

  /** One input partition per feed parquet file of versions
    * `(fromExclusive, toInclusive]`. */
  private[v2] def partitionsFor(spark: SparkSession, root: String,
      fromExclusive: Long, toInclusive: Long): Array[InputPartition] = {
    val fs = GraftTables.fs(spark, root)
    (fromExclusive + 1 to toInclusive).flatMap { v =>
      val dir = completeFeedDir(spark, root, v)
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => GraftCdcInputPartition(s.getPath.toString, s.getLen,
          s.getModificationTime, v))
    }.toArray
  }

  /** Serializable per-file reader: Spark's own parquet reader closure,
    * with `_commit_version` delivered as a constant partition column
    * (appended after the data columns, matching the table schema).
    *
    * ERA-AWARE decode: feeds published before a `RENAME COLUMN` carry
    * the OLD names (top-level key columns and the fields inside
    * `old_image`/`new_image` alike) — decoding every feed with one
    * name set silently NULL-FILLS the renamed column out of the other
    * era's rows (parquet resolves columns by NAME). Renames preserve
    * field POSITION and `ADD COLUMNS` only appends, so each planned
    * feed version gets a required schema positionally re-named to its
    * own footer ([[eraRequiredSchema]]; one driver footer read per
    * version, the same order of metadata work as the `_SUCCESS`
    * listing the planner already does). The resulting [[InternalRow]]s
    * are positionally identical across eras, so they all satisfy the
    * scan's one visible schema. */
  private[v2] def readerFactory(spark: SparkSession, dataSchema: StructType,
      root: String, partitions: Array[InputPartition]): PartitionReaderFactory = {
    def build(required: StructType): PartitionedFile => Iterator[InternalRow] =
      new ParquetFileFormat().buildReaderWithPartitionValues(
        GraftTables.classic(spark),
        dataSchema = required,
        partitionSchema = StructType(Seq(
          StructField(CommitVersionCol, LongType, nullable = false))),
        requiredSchema = required,
        filters = Nil,
        // row output, never ColumnarBatch: the feed schema carries
        // structs (old/new images), which the vectorized path cannot
        // return batched anyway — and the closure requires the choice
        // to be explicit.
        options = Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        hadoopConf = GraftTables.classic(spark).sessionState.newHadoopConf())
    val versions = partitions
      .map(_.asInstanceOf[GraftCdcInputPartition].version).distinct.toSeq
    val schemaByVersion: Map[Long, StructType] = versions.map { v =>
      v -> eraRequiredSchema(dataSchema,
        spark.read.parquet(Warehouse.changePath(root, v)).schema)
    }.toMap
    val funcBySchema = (schemaByVersion.values.toSet + dataSchema)
      .map(s => s -> build(s)).toMap
    new GraftCdcReaderFactory(v =>
      funcBySchema(schemaByVersion.getOrElse(v, dataSchema)))
  }

  /** The scan's target schema positionally re-named to one feed era's
    * footer: a field adopts the footer name at its position when the
    * SHAPES agree (names excluded — that is the translation), recursing
    * into the image structs; a field past the footer's width (a column
    * added after that era) or of a different shape keeps the target
    * name and null-fills, exactly the additive-evolution contract. */
  private[v2] def eraRequiredSchema(target: StructType,
      footer: StructType): StructType =
    StructType(target.fields.zipWithIndex.map { case (f, i) =>
      if (i < footer.length && shapeCompatible(f.dataType, footer(i).dataType)) {
        val ff = footer(i)
        (f.dataType, ff.dataType) match {
          case (t: org.apache.spark.sql.types.StructType,
                s: org.apache.spark.sql.types.StructType) =>
            f.copy(name = ff.name, dataType = eraRequiredSchema(t, s))
          case _ => f.copy(name = ff.name)
        }
      } else f
    })

  private def shapeCompatible(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = (a, b) match {
    case (_: StructType, _: StructType) => true // aligned prefix-wise above
    case (x: org.apache.spark.sql.types.ArrayType,
          y: org.apache.spark.sql.types.ArrayType) =>
      shapeCompatible(x.elementType, y.elementType)
    case (x: org.apache.spark.sql.types.MapType,
          y: org.apache.spark.sql.types.MapType) =>
      shapeCompatible(x.keyType, y.keyType) &&
        shapeCompatible(x.valueType, y.valueType)
    case _ => a == b // atomic types; containers matched above
  }
}

case class GraftCdcInputPartition(filePath: String, length: Long,
    modificationTime: Long, version: Long) extends InputPartition

/** Wraps the serializable `PartitionedFile => Iterator[InternalRow]`
  * closure. The closure may yield [[ColumnarBatch]]es disguised as
  * rows when the vectorized reader engages (atomic-only schemas);
  * both shapes are flattened to rows here. */
class GraftCdcReaderFactory(
    readFuncFor: Long => (PartitionedFile => Iterator[InternalRow]))
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdcInputPartition]
    val readFunc = readFuncFor(p.version)
    val pf = PartitionedFile(
      partitionValues = new GenericInternalRow(Array[Any](p.version)),
      filePath = SparkPath.fromPathString(p.filePath),
      start = 0L, length = p.length, locations = Array.empty,
      modificationTime = p.modificationTime, fileSize = p.length,
      otherConstantMetadataColumnValues = Map.empty)
    val rows: Iterator[InternalRow] = readFunc(pf).flatMap { r =>
      (r: Any) match {
        case b: ColumnarBatch =>
          import scala.jdk.CollectionConverters._
          b.rowIterator().asScala
        case row: InternalRow => Iterator.single(row)
      }
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = () // file handles close with the task
    }
  }
}

class GraftCdcTable(spark: SparkSession, root: String, starting: Long,
    ending: Option[Long]) extends Table with SupportsRead {

  private val dataSchema = GraftCdc.feedSchema(spark, root, starting)

  override def name(): String = s"graft-cdc:$root"

  override def schema(): StructType = StructType(dataSchema.fields :+
    StructField(GraftCdc.CommitVersionCol, LongType, nullable = false))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCdcScan(spark, root, starting, ending, dataSchema, schema())
}

class GraftCdcScan(spark: SparkSession, root: String, starting: Long,
    ending: Option[Long], dataSchema: StructType, fullSchema: StructType)
    extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = fullSchema
  override def description(): String =
    s"graft-cdc root=$root starting=v$starting" +
      ending.map(e => s" ending=v$e").getOrElse("")

  // ---- batch: every feed in [starting, ending|current] ----
  override def toBatch: Batch = this

  // remembered for createReaderFactory: the per-era decode schemas are
  // derived from exactly the versions this scan planned (the engine
  // always plans before it asks for the factory)
  @volatile private var planned: Array[InputPartition] = Array.empty

  override def planInputPartitions(): Array[InputPartition] = {
    val end = ending.orElse(Warehouse.currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"graft: $root has no committed version"))
    require(end >= starting - 1,
      s"graft: endingVersion $end precedes startingVersion $starting")
    planned = GraftCdc.partitionsFor(spark, root, starting - 1, end)
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdc.readerFactory(spark, dataSchema, root, planned)

  // ---- streaming: offsets are warehouse versions ----
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCdcStream(spark, root, starting, dataSchema)
}

case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** Micro-batch CDC stream; see [[GraftCdc]] for the offset design.
  * `Trigger.AvailableNow` pins the drain target at start
  * ([[SupportsTriggerAvailableNow]]), so a bounded run consumes
  * exactly the versions committed before it began. */
class GraftCdcStream(spark: SparkSession, root: String, starting: Long,
    dataSchema: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Long] = None

  private def current: Long =
    Warehouse.currentVersion(spark, root).getOrElse(starting - 1)

  /** Newest version, counting up from `from`, whose change feed is
    * CONTIGUOUSLY published (`_changes/v<k>/_SUCCESS` for every k in
    * `(from, result]`, pointer-capped). The feed publishes AFTER the
    * version pointer swaps ([[GraftTables.maybePublishFeed]] runs
    * post-commit), so the raw pointer can briefly name a version with
    * no complete feed; capping here turns that producer/consumer race
    * into a DELAYED micro-batch instead of a dead streaming query
    * ([[GraftCdc.completeFeedDir]]'s require would otherwise kill it).
    * A version whose feed is PERMANENTLY missing (publishChangeFeed
    * never ran) stalls the stream at the gap rather than skipping it —
    * skipping would silently lose that transaction's changes. */
  private def contiguousPublished(from: Long): Long = {
    val ptr = current
    val fs = GraftTables.fs(spark, root)
    var v = from max (starting - 1)
    while (v < ptr && fs.exists(
        new Path(new Path(Warehouse.changePath(root, v + 1)), "_SUCCESS")))
      v += 1
    v
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(current)

  override def initialOffset(): Offset = GraftVersionOffset(starting - 1)

  override def latestOffset(): Offset =
    GraftVersionOffset(availableNowTarget.getOrElse(current) max (starting - 1))

  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no
  // rate limiting — a warehouse version is the atomic unit of change,
  // so every trigger drains all published versions up to the target
  // (capped at the contiguously PUBLISHED frontier, see above; under
  // AvailableNow the pinned target additionally bounds the drain).
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftVersionOffset].version
    val cap = contiguousPublished(from)
    GraftVersionOffset(
      availableNowTarget.fold(cap)(_ min cap) max (starting - 1))
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  // remembered for createReaderFactory (MicroBatchScanExec plans each
  // batch's partitions before it builds the factory); the factory maps
  // any UNplanned version to the default-era schema, so the benign
  // stale read here can never throw
  @volatile private var planned: Array[InputPartition] = Array.empty

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    planned = GraftCdc.partitionsFor(spark, root,
      start.asInstanceOf[GraftVersionOffset].version,
      end.asInstanceOf[GraftVersionOffset].version)
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdc.readerFactory(spark, dataSchema, root, planned)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
