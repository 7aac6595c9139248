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
      payload_hash: Long,
      // STUB fields: a real decoder would emit true dims/durations.
      width: Int, height: Int, sample_rate: Int,
      byte_entropy: Double,
      // first 16 of the 256-bin byte histogram, comma-joined: scalar
      // columns only — array columns break flat oracle comparison
      histogram_head: String)

  /** Deterministic fake decode — STUB for the codec call a production
    * deployment would make (e.g. JNI to a codec, or `mapInPandas` +
    * PIL in PySpark). Derives plausible metadata purely from the
    * bytes so tests are stable. */
  private[multimodal] def decodeStub(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    mediaType match {
      case "image" => (64 + math.abs(h % 1920), 64 + math.abs((h / 7) % 1080), 0)
      case "audio" => (0, 0, Seq(8000, 16000, 22050, 44100)(math.abs(h % 4)))
      case _ => (0, 0, 0)
    }
  }

  /** Demo asset source: wrap the documents table's text bytes as
    * binary payloads so the plumbing runs on real fixture data. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
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
      // per-partition "codec" setup would go here (once per task)
      it.map { a =>
        val bytes = a.payload
        val hist = new Array[Long](256)
        var i = 0
        while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1; i += 1 }
        val n = math.max(bytes.length, 1)
        var entropy = 0.0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) { val p = hist(j).toDouble / n; entropy -= p * math.log(p) / math.log(2) }
          j += 1
        }
        val (w, h, sr) = decodeStub(a.media_type, bytes)
        AssetFeatures(a.asset_id, a.media_type, bytes.length.toLong,
          java.util.Arrays.hashCode(bytes).toLong, w, h, sr,
          math.rint(entropy * 10000) / 10000, hist.take(16).mkString(","))
      }
    }
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
