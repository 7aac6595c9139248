package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Shallow clone: zero data bytes copied, reads resolve through the
  * pointer to byte-identical content, copy-on-write isolation in both
  * directions, chains flatten, and every correct-or-loud contract
  * (vacuumed source, DV-bearing source) actually throws. */
class CloneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(): String = Files.createTempDirectory("wh_clone").toString
  private def batch(seed: Int, n: Int = 40) =
    Enrich.enrich(CocoaGen.shipments(spark, n, seed = seed), new Timestamp(1000000L))
  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("clone copies no data files and reads byte-identically") {
    val src = freshRoot(); val dst = freshRoot()
    Warehouse.commit(spark, src, batch(1))
    val v = Warehouse.cloneShallow(spark, src, dst)
    assert(v === 0L)
    // the clone version dir holds ONLY the pointer + _SUCCESS
    val names = hfs(dst).listStatus(new Path(Warehouse.versionPath(dst, 0L)))
      .map(_.getPath.getName).sorted.toSeq
    assert(names === Seq("_CLONE", "_SUCCESS"), s"unexpected clone contents: $names")
    assert(rows(Warehouse.read(spark, dst)) === rows(Warehouse.read(spark, src)))
  }

  test("copy-on-write: commits and compaction on the clone never touch the source") {
    val src = freshRoot(); val dst = freshRoot()
    Warehouse.commit(spark, src, batch(1))
    Warehouse.cloneShallow(spark, src, dst)
    val srcSnapshot = rows(Warehouse.read(spark, src))
    // commit new content on the clone root: diverges, source untouched
    Warehouse.commit(spark, dst, batch(2))
    assert(rows(Warehouse.read(spark, src)) === srcSnapshot)
    assert(rows(Warehouse.read(spark, dst)) === rows(batch(2).toDF()))
    // time travel on the clone still resolves v0 through the pointer
    assert(rows(spark.read.schema(CocoaSchema.warehouse)
      .parquet(Warehouse.dataPath(spark, dst, 0L))) === srcSnapshot)
    // compacting a fresh clone MATERIALIZES it (real files, same rows)
    val dst2 = freshRoot()
    Warehouse.cloneShallow(spark, src, dst2)
    val cv = Warehouse.compact(spark, dst2).get
    val files = hfs(dst2).listStatus(new Path(Warehouse.versionPath(dst2, cv)))
      .map(_.getPath.getName)
    assert(files.exists(_.endsWith(".parquet")), "compaction did not materialize")
    assert(rows(Warehouse.read(spark, dst2)) === srcSnapshot)
    assert(rows(Warehouse.read(spark, src)) === srcSnapshot)
  }

  test("clone-of-clone flattens to the original data directory") {
    val src = freshRoot(); val mid = freshRoot(); val leaf = freshRoot()
    Warehouse.commit(spark, src, batch(1))
    Warehouse.cloneShallow(spark, src, mid)
    Warehouse.cloneShallow(spark, mid, leaf)
    assert(Warehouse.dataPath(spark, leaf, 0L) ===
      Warehouse.dataPath(spark, src, 0L),
      "chained clone must point at the ORIGINAL data, not the middle clone")
    assert(rows(Warehouse.read(spark, leaf)) === rows(Warehouse.read(spark, src)))
  }

  test("correct-or-loud: vacuumed source and DV-bearing source both throw") {
    val src = freshRoot(); val dst = freshRoot()
    Warehouse.commit(spark, src, batch(1))
    Warehouse.cloneShallow(spark, src, dst)
    // DV-bearing source refuses to clone
    Warehouse.deleteWhere(spark, src, col("shipment_weight_kg") > 100.0)
    val dvErr = intercept[IllegalStateException] {
      Warehouse.cloneShallow(spark, src, freshRoot())
    }
    assert(dvErr.getMessage.contains("deletion vectors"))
    // deleting the source snapshot breaks the clone LOUDLY, not empty
    hfs(src).delete(new Path(Warehouse.versionPath(src, 0L)), true)
    val readErr = intercept[IllegalStateException] {
      Warehouse.read(spark, dst).collect()
    }
    assert(readErr.getMessage.contains("shallow clone"))
  }
}
