package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch composition of the whole reference DAG (entry point 1,
  * SURVEY.md §3): discover → validate → scan → enrich → stage →
  * merge → commit → archive. One Spark job graph replaces the
  * scheduler/manifest/XCom machinery (O1-O4): file parallelism is
  * task scheduling, batching is input-split planning, and the
  * empty-landing branch (O2) is a plain early return.
  */
object CocoaPipeline {

  final case class BatchResult(
      version: Option[Long],
      filesProcessed: Seq[String],
      filesQuarantined: Seq[String],
      rowsMerged: Long,
      warehouseRows: Long)

  final case class Dirs(landing: String, staging: String, warehouse: String, archive: String)

  /** Run one processing batch. `processedAt` defaults to now; tests
    * pass a fixed instant for determinism (the reference stamps one
    * utcnow() per chunk, O8). `computeCounts = false` skips the two
    * audit `count()` jobs (each a full snapshot/staging scan) for
    * callers that only consume the committed warehouse — the counts
    * are reporting, not pipeline semantics. */
  def runBatch(spark: SparkSession, dirs: Dirs,
      processedAt: Timestamp = new Timestamp(System.currentTimeMillis()),
      computeCounts: Boolean = true): BatchResult = {

    val (maybeDf, disc) = Ingest.ingest(spark, dirs.landing)
    if (maybeDf.isEmpty)
      return BatchResult(Warehouse.currentVersion(spark, dirs.warehouse),
        Seq.empty, disc.quarantined, 0L, -1L)

    val enriched = Enrich.enrich(maybeDf.get, processedAt)

    // Stage as parquet and re-read: the staged artifact is the load
    // source of truth, exactly as the reference re-reads its staging
    // parquet before the DB load (O10/O11,
    // cocoa_processing_dag.py:201-211).
    enriched.write.mode("overwrite").parquet(dirs.staging)
    // Re-read with the writer's schema: the staged artifact is still
    // the load source of truth (every byte read comes from staging),
    // but the schema is already known — no footer-inference job.
    val staged = spark.read.schema(enriched.schema).parquet(dirs.staging)

    val target = Warehouse.read(spark, dirs.warehouse)
    val merged = Merge.upsertShipments(target, staged)
    val version = Warehouse.commit(spark, dirs.warehouse, merged)

    val warehouseRows =
      if (computeCounts) Warehouse.read(spark, dirs.warehouse).count() else -1L
    val rowsMerged = if (computeCounts) staged.count() else -1L

    Archive.archiveFiles(spark, disc.valid, dirs.archive)
    Archive.deleteDir(spark, dirs.staging)

    BatchResult(Some(version), disc.valid, disc.quarantined, rowsMerged, warehouseRows)
  }
}
