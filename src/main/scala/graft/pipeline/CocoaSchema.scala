package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical schemas for the cocoa-shipment data model (SURVEY.md §1,
  * FIXTURES.md §A). The input schema mirrors the reference's 8
  * required CSV columns (`cocoa_processing_dag.py:26-35`); the
  * warehouse schema adds the 2 derived columns
  * (`cocoa_processing_dag.py:167-168,193-194`). */
object CocoaSchema {

  /** Landing CSV schema — 8 required columns. `shipment_weight_kg` is
    * integral at generation (`generate_data.py:39`) but typed double
    * here for arithmetic parity with the reference's pandas floats. */
  val input: StructType = StructType(Seq(
    StructField("shipment_id", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("farm_id", StringType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("bean_type", StringType, nullable = true),
    StructField("quality_score", DoubleType, nullable = true),
    StructField("shipment_weight_kg", LongType, nullable = true),
    StructField("temperature_celsius", DoubleType, nullable = true)))

  /** The required-column set checked per file before reading rows
    * (reference skips the whole file, not rows —
    * `cocoa_processing_dag.py:187-190`). */
  val requiredColumns: Set[String] = input.fieldNames.toSet

  /** Warehouse table: input + derived value + audit timestamp, keyed
    * (unique) on shipment_id (`cocoa_processing_dag.py:157-170`). */
  val warehouse: StructType = StructType(input.fields ++ Seq(
    StructField("shipment_value_usd", DoubleType, nullable = true),
    StructField("processed_at", TimestampType, nullable = false)))

  val mergeKey = "shipment_id"

  /** USD per kg used to derive shipment value
    * (`cocoa_processing_dag.py:24`). */
  val pricePerKgUsd = 2.50
}
