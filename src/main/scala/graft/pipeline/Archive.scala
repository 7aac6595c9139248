package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Processed-file archival (reference O16, `cocoa_processing_dag.py:
  * 248-268`): copy landing → archive, delete landing + staging. The
  * archive is the reference's "seen" marker preventing reprocessing
  * (`README.md:31`); the streaming pipeline variant replaces it with
  * the checkpointed file-source log and keeps archive purely as an
  * audit copy. */
object Archive {

  /** Move each file into `archiveDir` (rename when same-FS — atomic
    * and O(1) — else copy+delete). Returns archived destination
    * paths. */
  def archiveFiles(spark: SparkSession, files: Seq[String], archiveDir: String): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val fs = Ingest.fs(spark, archiveDir)
    val dir = new Path(archiveDir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    files.map { f =>
      val src = new Path(f)
      val dst = new Path(dir, src.getName)
      if (fs.exists(dst)) fs.delete(dst, false) // idempotent re-run
      if (!fs.rename(src, dst)) {
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, true, fs.getConf)
      }
      dst.toString
    }
  }

  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val fs = Ingest.fs(spark, dir)
    val p = new Path(dir)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
