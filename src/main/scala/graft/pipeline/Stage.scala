package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staging sink/source over the formats Spark ships (SURVEY.md §2.1
  * scans/sources/sinks): columnar parquet (the reference's staging
  * format, O10/O11) and ORC, plus row-oriented JSON-lines and CSV for
  * interchange. One write/read pair per format, identical call shape,
  * so the pipeline's staging format is a config choice, not code.
  *
  * Parquet/ORC keep types natively; CSV/JSON read back through the
  * declared schema (CSV has no type system, JSON loses timestamp
  * precision) — the roundtrip spec pins that behavior. */
object Stage {

  val columnarFormats = Seq("parquet", "orc")
  val rowFormats = Seq("json", "csv")
  val formats: Seq[String] = columnarFormats ++ rowFormats

  def write(df: DataFrame, dir: String, format: String = "parquet"): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(dir)
  }

  def read(spark: SparkSession, dir: String, format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    (if (format == "csv") withSchema.option("header", "true") else withSchema).load(dir)
  }
}
