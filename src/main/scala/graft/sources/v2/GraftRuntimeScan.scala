package graft.sources.v2

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Adds DYNAMIC PARTITION PRUNING to the connector's delegated parquet
  * scans.
  *
  * Spark's builtin V2 `FileScan`/`ParquetScan` does not implement
  * `SupportsRuntimeFiltering`, so a `format("graft")` read of a
  * hive-partitioned snapshot joined against a selective dimension
  * scans EVERY partition — while the equivalent V1 `spark.read.parquet`
  * gets runtime pruning from `PartitionPruning`. At 100 TB this is the
  * difference between touching one `region=` directory and all of
  * them. [[GraftRuntimeScan]] closes the gap: it advertises the
  * snapshot's partition columns as filterable, and at execution folds
  * the runtime predicates (the DPP subquery's `IN` over the joined
  * dim keys) into the scan's `partitionFilters` — directory-level
  * pruning through the SAME `PartitioningAwareFileIndex` path static
  * partition filters use, so it can only skip whole partitions, never
  * rows.
  *
  * Deliberately NOT applied to row-level-operation scans:
  * [[GraftReplaceScanBuilder]] unwraps it, because a runtime
  * group-filter under a snapshot-granular replace would silently drop
  * the pruned rows (`RowLevelOperationRuntimeGroupFiltering` only
  * engages for filterable scans — unwrapping keeps it off). */
class GraftRuntimeScan(val innerScan: ParquetScan)
    extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics {

  // swapped by filter(); toBatch is re-invoked by BatchScanExec AFTER
  // runtime filters are pushed, so the pruned file listing wins
  @volatile private var current: ParquetScan = innerScan

  override def readSchema(): StructType = current.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch = current.toBatch
  override def description(): String = current.description()
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    current.estimateStatistics()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    current.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    current.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    current.columnarSupportMode()

  // Structural equality on the WRAPPED scan: ParquetScan is a case
  // class, and exchange/scan reuse (self-joins, shared subplans)
  // compares Scan instances through BatchScanExec equality — an
  // identity-equality wrapper would silently disable that reuse.
  // Runtime-filter state is NOT part of equality deliberately:
  // BatchScanExec's own case-class params include `runtimeFilters`,
  // so two scans that prune differently already compare unequal at
  // the plan level.
  override def equals(other: Any): Boolean = other match {
    case g: GraftRuntimeScan => innerScan == g.innerScan
    case _ => false
  }
  override def hashCode(): Int = innerScan.hashCode()

  override def filterAttributes(): Array[NamedReference] =
    innerScan.readPartitionSchema.fieldNames.map(Expressions.column)

  /** V1 source filter → INTERPRETABLE catalyst expression over the
    * partition schema. Must produce only resolved, evaluable nodes —
    * `prunePartitions` evaluates these with an interpreted predicate,
    * so anything unresolved (e.g. the `'in` function `Column.isin`
    * lowers to) dies at eval time. `None` for untranslatable shapes:
    * runtime filters are an optimization, the join above still
    * applies the exact condition. */
  private def toCatalyst(f: org.apache.spark.sql.sources.Filter): Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.{sources => s}
    val pschema = innerScan.readPartitionSchema
    def attr(name: String): Option[AttributeReference] =
      // prunePartitions binds partition attrs BY NAME; fresh exprId ok
      pschema.fields.find(_.name == name)
        .map(fl => AttributeReference(fl.name, fl.dataType, fl.nullable)())
    def lit(a: AttributeReference, v: Any): Expression = Literal.create(v, a.dataType)
    f match {
      case s.In(a, vs) => attr(a).map(ar => In(ar, vs.toSeq.map(lit(ar, _))))
      case s.EqualTo(a, v) => attr(a).map(ar => EqualTo(ar, lit(ar, v)))
      case s.EqualNullSafe(a, v) => attr(a).map(ar => EqualNullSafe(ar, lit(ar, v)))
      case s.GreaterThan(a, v) => attr(a).map(ar => GreaterThan(ar, lit(ar, v)))
      case s.GreaterThanOrEqual(a, v) => attr(a).map(ar => GreaterThanOrEqual(ar, lit(ar, v)))
      case s.LessThan(a, v) => attr(a).map(ar => LessThan(ar, lit(ar, v)))
      case s.LessThanOrEqual(a, v) => attr(a).map(ar => LessThanOrEqual(ar, lit(ar, v)))
      case s.IsNull(a) => attr(a).map(IsNull)
      case s.IsNotNull(a) => attr(a).map(IsNotNull)
      case s.And(l, r) => for { lc <- toCatalyst(l); rc <- toCatalyst(r) } yield And(lc, rc)
      case s.Or(l, r) => for { lc <- toCatalyst(l); rc <- toCatalyst(r) } yield Or(lc, rc)
      case s.Not(inner) => toCatalyst(inner).map(Not)
      case s.AlwaysTrue() => Some(Literal.TrueLiteral)
      case s.AlwaysFalse() => Some(Literal.FalseLiteral)
      case _ => None
    }
  }

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val pschema = innerScan.readPartitionSchema
    val exprs: Seq[Expression] = filters.toSeq.flatMap { f =>
      // only whole-partition predicates are sound here
      if (!f.references.forall(pschema.fieldNames.contains)) None
      else toCatalyst(f)
    }
    if (exprs.nonEmpty) {
      current = innerScan.copy(
        partitionFilters = innerScan.partitionFilters ++ exprs)
      GraftRuntimeScan.runtimeFiltersApplied.incrementAndGet()
    }
  }
}

object GraftRuntimeScan {
  /** Observability hook for specs/ops: counts scans that actually
    * received a runtime partition filter. */
  val runtimeFiltersApplied = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** [[ParquetScanBuilder]] pass-through that wraps the built scan in
  * [[GraftRuntimeScan]] when the snapshot is partitioned. Every
  * pushdown interface the builtin builder implements is delegated, so
  * static filter/column/aggregate pushdown is byte-identical to the
  * unwrapped path. */
private[v2] class GraftRuntimeScanBuilder(inner: ParquetScanBuilder)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)
  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)
  override def pushAggregation(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    inner.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(extractions: Array[org.apache.spark.sql.connector.read.VariantExtraction]): Array[Boolean] =
    inner.pushVariantExtractions(extractions)

  override def build(): Scan = inner.build() match {
    case p: ParquetScan if p.readPartitionSchema.nonEmpty => new GraftRuntimeScan(p)
    case s => s
  }
}
