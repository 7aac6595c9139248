package graft.sources.v2

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Expression => VExpression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** COLUMN-MAPPING scan: `format("graft")` / catalog SQL reads of a
  * RENAMED version ([[graft.pipeline.Warehouse.renameColumns]] — the
  * Delta column-mapping shape: a metadata-only commit whose `_MAPPING`
  * sidecar renames physical parquet columns to logical names at read
  * time, zero bytes rewritten).
  *
  * A rename never moves, retypes, or reorders a column — only its
  * NAME differs between the files and the table schema — so the
  * builtin vectorized parquet scan still owns the read end-to-end and
  * this wrapper translates names at exactly the three places they
  * cross the boundary:
  *
  *  - column pruning: the logical required schema is renamed
  *    physical-ward before reaching the builtin builder (positions
  *    and types untouched);
  *  - filter pushdown: pushed catalyst predicates have their
  *    attribute references renamed physical-ward so parquet
  *    row-group/page skipping still engages; ALL original (logical)
  *    filters are returned as post-scan residue — the builtin file
  *    scan treats data filters as post-scan anyway, so this costs
  *    nothing and guarantees no mistranslated predicate can drop rows;
  *  - aggregate pushdown: COUNT/MIN/MAX column references are renamed
  *    physical-ward, so footer-stats answering (io16) keeps engaging
  *    on a renamed table;
  *  - `readSchema()`: the built scan reports logical names over the
  *    physical row layout ([[InternalRow]]s carry no names — field
  *    count/types/order are identical, so rows pass through untouched,
  *    vectorized batches included).
  *
  * Scale shape: identical to the unmapped path — the wrapper is pure
  * planning-time metadata; no extra pass, no codegen break, columnar
  * reads preserved. Without it, handing the LOGICAL schema to the
  * builtin scan would engage schema-evolution-by-name and silently
  * null-fill every renamed column — the silent-wrong failure mode the
  * previous loud refusal existed to prevent. */
private[v2] class GraftMappedScanBuilder(inner: ParquetScanBuilder,
    mapping: Map[String, String]) // physical -> logical
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private val l2p: Map[String, String] = mapping.map(_.swap)

  private def toPhysical(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = l2p.getOrElse(f.name, f.name))))

  private[v2] def toLogical(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = mapping.getOrElse(f.name, f.name))))

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(toPhysical(requiredSchema))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    inner.pushFilters(filters.map(_.transform {
      case a: AttributeReference if l2p.contains(a.name) =>
        a.withName(l2p(a.name))
    }))
    // every logical filter stays post-scan (the builtin file scan
    // returns all data filters as residue too); the physical push
    // above only buys row-group/page skipping
    filters
  }

  // EXPLAIN shows the pushed predicates under their PHYSICAL names —
  // truthful: that is what the parquet reader skips on.
  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  // AGGREGATE pushdown (COUNT/MIN/MAX answered from parquet footer
  // stats — the io16 capability) must survive a rename: translate the
  // aggregate's column references physical-ward and delegate. The
  // group-by columns come back through `build()`'s readSchema under
  // physical names, which `toLogical` re-surfaces (aggregate output
  // names like "min(x)" match no mapping entry and pass through).
  private def tCol(e: VExpression): VExpression = e match {
    case r: NamedReference if r.fieldNames.length == 1 &&
        l2p.contains(r.fieldNames.head) =>
      Expressions.column(l2p(r.fieldNames.head))
    case other => other
  }
  private def tFunc(f: AggregateFunc): AggregateFunc = f match {
    case m: Min => new Min(tCol(m.column))
    case m: Max => new Max(tCol(m.column))
    case c: Count => new Count(tCol(c.column), c.isDistinct)
    case c: CountStar => c
    case other => other // shapes the parquet builder rejects anyway
  }
  private def translate(agg: Aggregation): Aggregation =
    new Aggregation(agg.aggregateExpressions.map(tFunc),
      agg.groupByExpressions.map(tCol))

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    inner.supportCompletePushDown(translate(agg))
  override def pushAggregation(agg: Aggregation): Boolean =
    inner.pushAggregation(translate(agg))

  override def build(): Scan = new GraftMappedScan(inner.build(), this)
}

private[v2] class GraftMappedScan(inner: Scan,
    builder: GraftMappedScanBuilder) extends Scan {
  override def readSchema(): StructType = builder.toLogical(inner.readSchema())
  override def toBatch: Batch = inner.toBatch
  override def description(): String = s"graft-mapped ${inner.description()}"
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()

  // Structural equality on the WRAPPED scan (the GraftRuntimeScan
  // precedent): exchange/scan reuse compares Scan instances through
  // BatchScanExec equality — identity equality here would silently
  // disable reuse on self-joins of a renamed table.
  override def equals(other: Any): Boolean = other match {
    case m: GraftMappedScan =>
      inner == m.innerScan && readSchema() == m.readSchema()
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode()
  private[v2] def innerScan: Scan = inner
}
