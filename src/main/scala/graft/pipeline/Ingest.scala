package graft.pipeline

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Landing-zone discovery, file-level schema validation and CSV scan
  * (reference O1/O5/O6/O15).
  *
  * The reference's validation is *file-level, not row-level*: a chunk
  * missing any required column is skipped whole with a warning
  * (`cocoa_processing_dag.py:187-190`); rows are never filtered. We
  * reproduce that by checking each file's header line before handing
  * the surviving set to one schema'd CSV scan.
  *
  * Scale: the header check reads one line per file. It runs
  * distributed (a Dataset of paths, opened executor-side), so a
  * million-file landing zone costs a map job, not a driver loop. The
  * subsequent scan is a single `spark.read.csv(valid: _*)` — Spark
  * parallelizes by file/split natively, replacing the reference's
  * manual 50k-row chunking and 5-file batching (O3).
  */
object Ingest {

  final case class Discovery(valid: Seq[String], quarantined: Seq[String])

  /** List `*.csv` under the landing dir (reference
    * `check_for_files`, `cocoa_processing_dag.py:56-86`). */
  def discoverCsv(spark: SparkSession, landingDir: String): Seq[String] = {
    val path = new Path(landingDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".csv"))
      .map(_.getPath.toString)
      .sorted
  }

  /** Partition discovered files into header-valid vs quarantined.
    * Headers are read executor-side: one line per file, no full scan.
    * Missing required columns ⇒ quarantine the whole file; extra
    * columns are tolerated (the reference only checks the missing
    * set, `cocoa_processing_dag.py:31-35,187-190`). */
  def validateHeaders(spark: SparkSession, files: Seq[String]): Discovery = {
    if (files.isEmpty) return Discovery(Seq.empty, Seq.empty)
    import spark.implicits._
    val required = CocoaSchema.requiredColumns
    val flagged = files.toDS().repartition(math.min(files.size, 64)).map { p =>
      val ok =
        try {
          val path = new Path(p)
          // Executor-side FS from default conf: resolves local and
          // default-scheme paths; cluster deployments carry fs conf in
          // core-site.xml on executors.
          val fs = path.getFileSystem(new Configuration())
          val in = new BufferedReader(
            new InputStreamReader(fs.open(path), StandardCharsets.UTF_8))
          try {
            val header = Option(in.readLine()).getOrElse("")
            val cols = header.split(",").map(_.trim).toSet
            (required -- cols).isEmpty
          } finally in.close()
        } catch { case _: Exception => false }
      (p, ok)
    }.collect()
    Discovery(
      valid = flagged.collect { case (p, true) => p }.toSeq.sorted,
      quarantined = flagged.collect { case (p, false) => p }.toSeq.sorted)
  }

  /** One schema'd scan over the surviving files. PERMISSIVE mode with
    * a corrupt-record column is the row-level safety net the reference
    * lacks; file-level skipping already happened above. */
  def readCsv(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "no valid files to read")
    spark.read
      .schema(CocoaSchema.input)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .csv(files: _*)
  }

  /** Discover + validate + read in one call; `Discovery` is returned
    * alongside so the caller can archive/quarantine (O15/O16). */
  def ingest(spark: SparkSession, landingDir: String): (Option[DataFrame], Discovery) = {
    val disc = validateHeaders(spark, discoverCsv(spark, landingDir))
    val df = if (disc.valid.nonEmpty) Some(readCsv(spark, disc.valid)) else None
    (df, disc)
  }

  private[pipeline] def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
}
