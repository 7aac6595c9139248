package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JSON manifest control plane — parity with the reference's
  * manifest-driven orchestration (O1/O3: `check_for_files` writes a
  * JSON array of discovered keys, `generate_batches` splits it into
  * per-batch manifests of `BATCH_SIZE=5`, mapped tasks read them back;
  * `cocoa_processing_dag.py:56-127`).
  *
  * In the Spark engine the streaming checkpoint log subsumes this for
  * exactly-once processing; the manifest path exists for operational
  * parity (external systems that hand work over as manifests) and is
  * deliberately driver-side: manifests are control-plane metadata
  * (thousands of strings), not data. */
object Manifest {

  /** JSON escape for path strings. */
  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def write(spark: SparkSession, manifestPath: String, files: Seq[String]): Unit = {
    val fs = Ingest.fs(spark, manifestPath)
    val out = fs.create(new Path(manifestPath), true)
    try out.write(files.map(q).mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, manifestPath: String): Seq[String] = {
    import org.apache.spark.sql.functions.{col, explode, from_json}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import spark.implicits._
    val txt = spark.read.textFile(manifestPath).collect().mkString
    if (txt.trim.isEmpty) return Seq.empty
    Seq(txt).toDF("j")
      .select(explode(from_json(col("j"), ArrayType(StringType))).as("f"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Split into batches of `size` (reference BATCH_SIZE=5). */
  def batches(files: Seq[String], size: Int): Seq[Seq[String]] =
    files.sorted.grouped(size).toSeq

  /** Manifest-driven variant of the batch pipeline: discover, persist
    * the manifest, then process exactly the manifested files. */
  def discoverAndWrite(spark: SparkSession, landingDir: String, manifestPath: String): Seq[String] = {
    val files = Ingest.discoverCsv(spark, landingDir)
    if (files.nonEmpty) write(spark, manifestPath, files)
    files
  }
}
