package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in bounded
  * batches (north-star mandate, SURVEY.md §1.4).
  *
  * The *decode* step is a clearly-marked deterministic STUB — this
  * container has no image/audio codecs — but everything Spark-side is
  * real and tested: the schema (binary + struct metadata), the
  * per-partition iteration (the Scala analogue of `mapInPandas`
  * batch processing: one JVM-side pass per partition, bounded memory,
  * no per-row task overhead), the partitioning story (payloads hash
  * to partitions by asset id; a real deployment would bucket by
  * content store block), and the feature schema handed downstream.
  */
object Multimodal {

  final case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      // md5 hex of the payload: portable content identity (any engine
      // can recompute it), replacing a JVM-specific array hash
      payload_md5: String,
      // STUB fields: a real decoder would emit true dims/durations.
      width: Int, height: Int, sample_rate: Int,
      // Shannon entropy over Unicode codepoints, quantized to 4dp —
      // codepoints (not raw bytes) so external SQL engines can derive
      // the identical value; scalar columns only, array columns break
      // flat oracle comparison
      char_entropy: Double,
      n_unique_chars: Long)

  /** Deterministic fake decode — STUB for the codec call a production
    * deployment would make (e.g. JNI to a codec, or `mapInPandas` +
    * PIL in PySpark). Derives plausible metadata from the payload
    * SIZE via portable integer arithmetic (a byte-array JVM hash
    * would not be reproducible by the SQL oracle) so tests are
    * stable. */
  private[multimodal] def decodeStub(mediaType: String, nBytes: Long): (Int, Int, Int) = {
    val h = (nBytes * 2654435761L) % 1000003L
    mediaType match {
      case "image" => ((64 + h % 1920).toInt, (64 + (h / 7) % 1080).toInt, 0)
      case "audio" => (0, 0, Seq(8000, 16000, 22050, 44100)((h % 4).toInt))
      case _ => (0, 0, 0)
    }
  }

  /** Demo asset source: wrap the documents table's text bytes as
    * binary payloads so the plumbing runs on real fixture data. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        (when(col("doc_id") % 2 === 0, "image").otherwise("audio")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** Per-partition feature extraction: byte histogram, entropy, stub
    * decode. `mapPartitions` (not `map`) so per-partition setup — a
    * real codec context — happens once per task, the same shape a
    * Pandas-UDF `mapInPandas` batch gives PySpark. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition "codec" setup happens once per task — exactly
      // the batch shape a Pandas-UDF `mapInPandas` kernel gives
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val bytes = a.payload
        md.reset()
        val md5Hex = md.digest(bytes).map("%02x".format(_)).mkString
        // codepoint frequencies (portable: SQL engines enumerate
        // codepoints; raw byte histograms they cannot)
        val str = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val counts = new java.util.HashMap[Int, Long]()
        var i = 0
        var total = 0L
        while (i < str.length) {
          val cp = str.codePointAt(i)
          counts.merge(cp, 1L, _ + _)
          total += 1
          i += Character.charCount(cp)
        }
        var entropy = 0.0
        if (total > 0) {
          val values = counts.values.iterator()
          while (values.hasNext) {
            val p = values.next().toDouble / total
            entropy -= p * math.log(p) / math.log(2.0)
          }
        }
        val (w, h, sr) = decodeStub(a.media_type, bytes.length.toLong)
        AssetFeatures(a.asset_id, a.media_type, bytes.length.toLong, md5Hex,
          w, h, sr,
          math.floor(entropy * 10000 + 0.5) / 10000, counts.size().toLong)
      }
    }
  }

  /** The `binaryFile` SOURCE path: one opaque file per asset on the
    * content store, ingested by Spark's built-in binary-file reader
    * (path, length, content) — the real shape of image/audio
    * ingestion, complementing [[assetsFromDocuments]]'s column-wrapped
    * demo. Asset files are materialized executor-side (one task per
    * partition writes its own files — no driver collection), then read
    * back through the source; identity features are oracle-checked
    * against the originating table, certifying the bytes survived the
    * store round-trip. */
  def binaryAssetSource(spark: SparkSession, dir: String, maxId: Long = 200L): DataFrame = {
    // Unique store per run (never a fixed shared path): a prior run's
    // lazily-read frame must not see its store deleted from under it,
    // and stale files from a previous corpus can't leak into the
    // read-back; RunTemp sweeps the stores at JVM exit. On a cluster
    // the store root would be a per-run prefix under s3a://... with a
    // lifecycle policy playing RunTemp's role.
    val store = graft.core.RunTemp.dir("graft_binary_assets_")
    // All store I/O goes through the Hadoop FileSystem API resolved
    // from the store URI — the same code writes a local dir here and a
    // shared store (s3a://, hdfs://) on a cluster, where executor-local
    // java.io would scatter files invisible to the driver's read.
    val rootPath = new org.apache.hadoop.fs.Path(store)
    val driverFs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(rootPath)
    // ship the session's Hadoop conf (store credentials/endpoints ride
    // spark.hadoop.*) to the writer tasks
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(serConf.value)
        rows.foreach { r =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(store, f"doc_${r.getLong(0)}%07d.bin"), true)
          try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    spark.read.format("binaryFile").load(store)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("asset_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("payload_md5"))
      .orderBy("asset_id")
  }

  /** "Frame sampling": cut `n` evenly-spaced fixed-size byte windows
    * from the payload — the partition/batch shape of video frame
    * extraction with the decoder stubbed to byte slicing. Pure
    * expressions (substr on binary). */
  def sampleFrames(assets: DataFrame, n: Int, frameBytes: Int): DataFrame =
    assets.select(col("asset_id"), col("media_type"),
      posexplode(transform(sequence(lit(0), lit(n - 1)), i => {
        val span = greatest(length(col("payload")) - frameBytes, lit(1))
        col("payload").substr(i * span / n + 1, lit(frameBytes))
      })))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_size", length(col("frame_bytes")).cast("long"))
}
