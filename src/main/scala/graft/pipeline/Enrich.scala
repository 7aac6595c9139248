package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived-column enrichment (reference O7/O8,
  * `cocoa_processing_dag.py:193-194`):
  *
  *  - `shipment_value_usd = round(weight * 2.50, 2)`
  *  - `processed_at`: ONE timestamp captured per processing batch —
  *    the reference stamps `datetime.utcnow()` once per chunk; a
  *    per-row `current_timestamp()` would diverge, so the caller
  *    passes the captured instant and we bake it in as a literal.
  *
  * Pure `DataFrame => DataFrame`, fully codegen'd; no UDFs.
  */
object Enrich {

  def enrich(df: DataFrame, processedAt: Timestamp): DataFrame =
    df.withColumn("shipment_value_usd",
        round(col("shipment_weight_kg") * lit(CocoaSchema.pricePerKgUsd), 2))
      .withColumn("processed_at", lit(processedAt))
}
