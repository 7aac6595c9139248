package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded, fully-distributed synthetic shipment generator reproducing
  * the reference's distributions (O17/O18, `scripts/generate_data.py:
  * 13-47`): uuid-like ids, timestamps uniform in [base−2y, base],
  * FARM-{100..200}, 16 Ghana regions, 3 bean types, quality
  * U(7.5,9.8) 2dp, weight randint(500,5000), temperature U(18,25) 1dp
  * with ~10% nulls.
  *
  * Everything is `spark.range` + seeded `rand()` column expressions —
  * no driver-side row building, so generating 10^9 rows is the same
  * code as 10^3 (the reference builds rows in a Python loop,
  * `generate_data.py:29-45`; that shape caps out on one core).
  */
object CocoaGen {

  val regions: Seq[String] = Seq(
    "Ashanti", "Brong-Ahafo", "Central", "Eastern", "Greater Accra",
    "Northern", "Upper East", "Upper West", "Volta", "Western",
    "Western North", "Ahafo", "Bono East", "Oti", "Savannah", "North East")

  val beanTypes: Seq[String] = Seq("Forastero", "Criollo", "Trinitario")

  /** Generate `n` shipments. `keySpace` bounds the distinct
    * shipment_id universe so overlapping batches (UPSERT fixtures)
    * can be produced: ids are `SHIP-%010d` of `idOffset + (row %
    * keySpace)`. With the default `keySpace = n`, ids are unique
    * within the batch (matching the reference's uuid4 per row). */
  def shipments(
      spark: SparkSession,
      n: Long,
      seed: Long,
      baseEpochSec: Long = 1735689600L, // 2025-01-01T00:00:00Z
      idOffset: Long = 0L,
      keySpace: Long = -1L): DataFrame = {
    val ks = if (keySpace > 0) keySpace else n
    val twoYearsSec = 2L * 365 * 24 * 3600
    // Fixed partition count: seeded rand() streams are a function of
    // (seed, partition, position), so pinning partitions makes the
    // generated data identical regardless of the session's core count.
    spark.range(0, n, 1, numPartitions = 8).select(
      format_string("SHIP-%010d", col("id") % ks + idOffset).as("shipment_id"),
      timestamp_seconds(lit(baseEpochSec) -
        floor(rand(seed + 1) * twoYearsSec).cast("long")).as("timestamp"),
      concat(lit("FARM-"), (lit(100) + floor(rand(seed + 2) * 101)).cast("int")).as("farm_id"),
      element_at(typedlit(regions), (floor(rand(seed + 3) * regions.size) + 1).cast("int")).as("region"),
      element_at(typedlit(beanTypes), (floor(rand(seed + 4) * beanTypes.size) + 1).cast("int")).as("bean_type"),
      round(lit(7.5) + rand(seed + 5) * 2.3, 2).as("quality_score"),
      (lit(500) + floor(rand(seed + 6) * 4501)).cast("long").as("shipment_weight_kg"),
      when(rand(seed + 7) < 0.10, lit(null).cast("double"))
        .otherwise(round(lit(18.0) + rand(seed + 8) * 7.0, 1)).as("temperature_celsius"))
  }

  /** Write `numFiles` landing CSVs of ~`rowsPerFile` rows each —
    * the reference's multi-file upload (O18, `generate_data.py:50-72`).
    * One task per file, written with headers so the ingest-side
    * header validation has something real to check. `coalesce` (a
    * narrow, shuffle-free merge of the generator's pinned partitions,
    * preserving their indices and therefore the seeded rand streams)
    * when the file count allows it; `repartition` only when fanning
    * OUT past the generator's partition count. */
  def writeLandingFiles(
      spark: SparkSession,
      landingDir: String,
      numFiles: Int,
      rowsPerFile: Long,
      seed: Long,
      idOffset: Long = 0L,
      keySpace: Long = -1L): Unit = {
    val gen = shipments(spark, numFiles * rowsPerFile, seed,
      idOffset = idOffset, keySpace = keySpace)
    val sized = if (numFiles <= 8) gen.coalesce(numFiles) else gen.repartition(numFiles)
    sized
      .write.mode("append").option("header", "true")
      // Whole-second ISO-8601 without zone suffix (values are whole
      // seconds by construction): both the engine's own ingest cast
      // and any external SQL engine parse this identically, which is
      // what lets the pipeline be oracle-checked from its landing
      // files.
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
      .csv(landingDir)
  }
}
