package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** FILE-LEVEL zone-map index (min/max statistics per data file) — the
  * data-skipping layer Delta/Iceberg keep in their table metadata,
  * here as a small parquet sidecar on a plain-parquet table.
  *
  * Parquet footers already carry row-group min/max, but the reader
  * only consults them AFTER a task has been scheduled and the footer
  * opened — at 100 TB that is millions of task launches and footer
  * reads just to discover "nothing here". A zone map moves the same
  * statistics to one O(files) table consulted BEFORE planning: a
  * selective range query on a clustered layout (sorted or Z-ordered,
  * io05) schedules tasks only for the files that can match.
  *
  * Correct-or-loud staleness contract: the index records the file set
  * it summarized; [[prunedRead]] re-lists the table (one driver
  * metadata op) and REFUSES to serve if any current data file is
  * missing from the index — a stale zone map silently dropping a new
  * file's rows is the one failure mode this design must never have.
  * Rebuild after every batch append (one map-side-combined pass over
  * the new files' rows would suffice; build() rescans for simplicity
  * since the index build is itself a single aggregate scan). */
object ZoneMap {

  def indexPath(tablePath: String): String = s"$tablePath/_zonemap"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(spark: SparkSession, tablePath: String): Seq[String] =
    fs(spark, tablePath).listStatus(new Path(tablePath)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)

  /** One aggregate pass over the table → per-file (min, max, n_rows)
    * for each of `cols`, written under `_zonemap` (underscore-hidden
    * from parquet readers of the table itself). Nulls are ignored by
    * min/max per SQL semantics; an all-null file carries null stats
    * and is DROPPED by range pruning — sound, because a range
    * predicate never matches null. */
  def build(spark: SparkSession, tablePath: String, schema: StructType,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val missing = cols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"zone-map columns absent from schema: $missing")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.schema(schema).parquet(tablePath)
      .groupBy(substring_index(col("_metadata.file_path"), "/", -1).as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath(tablePath))
  }

  /** INCREMENTAL index maintenance: summarize ONLY the data files the
    * index has not seen and merge them into the sidecar — the
    * after-every-append refresh costs O(new files' rows), never a
    * table rescan (the [[build]] scaladoc's simplicity concession,
    * retired). Returns the number of newly summarized files (0 = the
    * index was already current). The index parquet itself is tiny
    * (O(files) rows), so rewriting it wholesale is the cheap part.
    * Loud on a missing index or on columns differing from the
    * indexed set — a refresh that silently summarized different
    * columns would poison every later prune. */
  def refresh(spark: SparkSession, tablePath: String, schema: StructType,
      cols: Seq[String]): Int = {
    val idxDir = indexPath(tablePath)
    require(fs(spark, tablePath).exists(new Path(idxDir, "_SUCCESS")),
      s"no zone map at $idxDir — ZoneMap.build first")
    val idx = spark.read.parquet(idxDir)
    val expected = ("file" +: cols.flatMap(c => Seq(s"min_$c", s"max_$c")) :+ "n_rows").sorted
    require(idx.columns.sorted.sameElements(expected),
      s"refresh cols $cols do not match the indexed set" +
        s" (index has: ${idx.columns.mkString(",")})")
    val indexed = idx.select("file").collect().map(_.getString(0)).toSet
    val fresh = dataFiles(spark, tablePath).filterNot(indexed.contains)
    if (fresh.isEmpty) return 0
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val freshStats = spark.read.schema(schema)
      .parquet(fresh.map(f => s"$tablePath/$f"): _*)
      .groupBy(substring_index(col("_metadata.file_path"), "/", -1).as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // stage-then-swap into a SEPARATE dir: overwriting the dir the
    // union lazily reads from would race the read (cache eviction →
    // recompute from a half-overwritten source). The rename window
    // leaves no index rather than a torn one — readers fail loud.
    val f = fs(spark, tablePath)
    val stage = new Path(tablePath, "._zonemap_stage")
    idx.unionByName(freshStats.select(idx.columns.map(col): _*))
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    f.delete(new Path(idxDir), true)
    if (!f.rename(stage, new Path(idxDir)))
      throw new IllegalStateException(s"zone-map refresh: could not publish $idxDir")
    fresh.size
  }

  /** The file names whose [min, max] interval on `colName` intersects
    * [lo, hi] — the candidate set a range scan must read. Loud on a
    * missing index, a column the index does not cover, and a STALE
    * index (any current data file unknown to it). */
  def selectFiles(spark: SparkSession, tablePath: String, colName: String,
      lo: Column, hi: Column): Seq[String] = {
    val idxDir = indexPath(tablePath)
    require(fs(spark, tablePath).exists(new Path(idxDir, "_SUCCESS")),
      s"no zone map at $idxDir — ZoneMap.build first")
    val idx = spark.read.parquet(idxDir)
    require(idx.columns.contains(s"min_$colName"),
      s"zone map at $idxDir does not cover column '$colName'" +
        s" (has: ${idx.columns.mkString(",")})")
    val indexed = idx.select("file").collect().map(_.getString(0)).toSet
    val current = dataFiles(spark, tablePath)
    val unknown = current.filterNot(indexed.contains)
    require(unknown.isEmpty,
      s"stale zone map at $idxDir: data files not summarized: " +
        s"${unknown.take(3).mkString(",")}… — rebuild before pruning")
    idx.filter(col(s"min_$colName") <= hi && col(s"max_$colName") >= lo)
      .select("file").collect().map(_.getString(0)).toSeq.sorted
  }

  // ---------------------------------------------------------- bloom

  def bloomIndexPath(tablePath: String): String = s"$tablePath/_bloomidx"

  /** Per-file BLOOM sidecar for a long key column — the point-lookup
    * complement of the min/max zone map: on a hash-distributed layout
    * every file spans the whole key range, so intervals prune
    * NOTHING, while a per-file bloom pins an equality probe to ~1
    * file (plus the filter's false-positive rate). This is Delta's
    * bloom-filter index on plain parquet, built with the same
    * portable kernel q39 certifies cross-engine
    * ([[graft.functions.BloomExpressions]]). One map-side-combined
    * aggregate pass; the sidecar stores (file, bloom bytes) plus the
    * geometry so readers never guess parameters. */
  def buildBloom(spark: SparkSession, tablePath: String, schema: StructType,
      colName: String, mBits: Int = 1 << 17, k: Int = 5): Unit = {
    require(schema.fieldNames.contains(colName),
      s"bloom-index column '$colName' absent from schema")
    spark.read.schema(schema).parquet(tablePath)
      .groupBy(substring_index(col("_metadata.file_path"), "/", -1).as("file"))
      .agg(graft.functions.BloomExpressions
        .bloomBuild(col(colName), mBits, k).as("bloom"),
        count(lit(1)).as("n_rows"))
      .withColumn("col_name", lit(colName))
      .withColumn("m_bits", lit(mBits))
      .withColumn("k_hashes", lit(k))
      .coalesce(1)
      .write.mode("overwrite").parquet(bloomIndexPath(tablePath))
  }

  /** Candidate files for `colName = key` — every file whose bloom
    * admits the key. No false negatives (the bloom guarantee: the
    * owning file is ALWAYS selected); false positives only cost an
    * extra file read, corrected by the residual filter. Same loud
    * staleness/coverage contract as [[selectFiles]]. */
  def selectFilesByKey(spark: SparkSession, tablePath: String,
      colName: String, key: Long): Seq[String] = {
    val idxDir = bloomIndexPath(tablePath)
    require(fs(spark, tablePath).exists(new Path(idxDir, "_SUCCESS")),
      s"no bloom index at $idxDir — ZoneMap.buildBloom first")
    val idx = spark.read.parquet(idxDir)
    val head = idx.select("col_name", "m_bits", "k_hashes").head()
    require(head.getString(0) == colName,
      s"bloom index at $idxDir covers '${head.getString(0)}', not '$colName'")
    val (mBits, k) = (head.getInt(1), head.getInt(2))
    val indexed = idx.select("file").collect().map(_.getString(0)).toSet
    val unknown = dataFiles(spark, tablePath).filterNot(indexed.contains)
    require(unknown.isEmpty,
      s"stale bloom index at $idxDir: data files not summarized: " +
        s"${unknown.take(3).mkString(",")}… — rebuild before pruning")
    idx.filter(graft.functions.BloomExpressions
        .bloomContains(col("bloom"), lit(key), mBits, k))
      .select("file").collect().map(_.getString(0)).toSeq.sorted
  }

  /** Equality probe THROUGH the bloom index: read only the admitted
    * files, re-apply the exact predicate. */
  def pointRead(spark: SparkSession, tablePath: String, schema: StructType,
      colName: String, key: Long): DataFrame = {
    val files = selectFilesByKey(spark, tablePath, colName, key)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .parquet(files.map(f => s"$tablePath/$f"): _*)
        .filter(col(colName) === key)
  }

  /** Range scan THROUGH the zone map: read only the candidate files,
    * then apply the exact predicate as the residual filter (the zone
    * map is a superset filter, never a truth source). Equivalent to
    * the full-scan filter by construction; the win is the files never
    * opened. */
  def prunedRead(spark: SparkSession, tablePath: String, schema: StructType,
      colName: String, lo: Column, hi: Column): DataFrame = {
    val files = selectFiles(spark, tablePath, colName, lo, hi)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .parquet(files.map(f => s"$tablePath/$f"): _*)
        .filter(col(colName) >= lo && col(colName) <= hi)
  }
}
