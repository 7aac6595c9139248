package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in bounded
  * batches (north-star mandate, SURVEY.md §1.4).
  *
  * The decode step is REAL byte parsing ([[MediaHeaders]]): PNG IHDR
  * (CRC-verified), JPEG SOFn marker walk, WAV RIFF chunk walk — the
  * same code decodes any real file of those formats. What this
  * container cannot supply is real MEDIA, so the asset source
  * synthesizes payloads as genuine format headers (valid signatures,
  * real CRC32) wrapping document text as the content section — a
  * deterministic fixture the SQL oracle can re-derive, feeding the
  * real parsers real bytes. The Spark side is production-shaped
  * throughout: binary + struct schema, one per-partition pass
  * (the JVM analogue of `mapInPandas` batching — codec setup once per
  * task, bounded memory), payloads hashed to partitions by asset id.
  */
object Multimodal {

  final case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      // md5 hex of the CONTENT section (payload past the container
      // header): portable content identity any engine can recompute
      content_md5: String,
      // decoded by actually parsing the payload's container header
      // (MediaHeaders.parse) — not synthesized from metadata
      width: Int, height: Int, sample_rate: Int,
      // Shannon entropy over Unicode codepoints of the content
      // section, quantized to 4dp — codepoints (not raw bytes) so
      // external SQL engines can derive the identical value
      char_entropy: Double,
      n_unique_chars: Long,
      // the parser validated the container (signature, layout, PNG
      // CRC): a torn payload surfaces here instead of as garbage dims
      header_ok: Boolean)

  /** The FIXTURE's deterministic choice of media dimensions when
    * synthesizing assets (what the "camera" recorded), keyed on the
    * content size via portable integer arithmetic so the SQL oracle
    * re-derives it. The decode path does NOT use this — it parses the
    * header bytes; specs + the oracle assert parse(encode(planned))
    * returns exactly these values. */
  private[multimodal] def plannedDims(mediaType: String, contentBytes: Long): (Int, Int, Int) = {
    val h = (contentBytes * 2654435761L) % 1000003L
    mediaType match {
      case "image" => ((64 + h % 1920).toInt, (64 + (h / 7) % 1080).toInt, 0)
      case "audio" => (0, 0, Seq(8000, 16000, 22050, 44100)((h % 4).toInt))
      case _ => (0, 0, 0)
    }
  }

  /** m06: PCM SAMPLE-LEVEL audio features — past the header into the
    * signal itself: synthesize real 16-bit little-endian mono WAVs
    * (samples a portable integer function of the doc's content hash,
    * so the oracle regenerates the exact waveform), then DECODE THE
    * BYTES BACK — RIFF chunk walk to the data offset, Int16 LE
    * sample reads — and reduce each asset to integer signal stats:
    * sample count, Σ|s|, Σs² (the integer RMS numerator), peak, and
    * zero crossings. The oracle recomputes every stat from the
    * generator formula alone; a one-byte slip in the header walk or
    * sample decode (endianness, off-by-one at the data offset, sign
    * extension) shifts every downstream value and breaks the hash.
    *
    * Scale shape: pure per-partition kernels — synth and decode are
    * one `mapPartitions` pass each, no shuffle until the final tiny
    * sort; exactly the batch shape a Pandas-UDF decode has in
    * PySpark, with the codec context per task. */
  def audioPcmStats(spark: SparkSession, dir: String, maxId: Long = 200L): DataFrame = {
    import spark.implicits._
    val assets = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 2 === 1 && col("doc_id") < maxId)
      .as[(Long, String)]
      .map { case (id, text) =>
        val nContent = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
        val h = nContent * 2654435761L % 1000003L
        val n = (64 + h % 192).toInt
        val sr = Seq(8000, 16000, 22050, 44100)((h % 4).toInt)
        val pcm = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          pcm.putShort(((h * (i + 1)) % 65536L - 32768L).toShort)
          i += 1
        }
        (id, MediaHeaders.wavHeader(sr, n * 2) ++ pcm.array())
      }
    assets.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val m = MediaHeaders.parseWav(bytes).getOrElse(
          sys.error(s"m06: asset $id failed the WAV parse"))
        val b = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = (bytes.length - m.headerLen) / 2
        var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val s = b.getShort(m.headerLen + i * 2).toLong
          val a = math.abs(s)
          sumAbs += a; sumSq += s * s; if (a > peak) peak = a
          val neg = s < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        (id, m.sampleRate.toLong, n.toLong, sumAbs, sumSq, peak, zc)
      }
    }.toDF("asset_id", "sample_rate", "n_samples", "sum_abs", "sum_sq",
        "peak", "zero_crossings")
      .orderBy("asset_id")
  }

  /** Demo asset source: wrap the documents table's text bytes in real
    * container headers — PNG for doc_id ≡ 0 (mod 4), JPEG for ≡ 2,
    * WAV for odd ids — so every parser in [[MediaHeaders]] is
    * exercised on the driver-gate path. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val content = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mediaType = if (id % 2 == 0) "image" else "audio"
        val (w, h, sr) = plannedDims(mediaType, content.length.toLong)
        val header =
          if (mediaType == "audio") MediaHeaders.wavHeader(sr, content.length)
          else if (id % 4 == 0) MediaHeaders.pngHeader(w, h)
          else MediaHeaders.jpegHeader(w, h)
        Asset(id, mediaType, header ++ content)
      }
  }

  /** Per-partition feature extraction: real header decode
    * ([[MediaHeaders.parse]]), content digest, codepoint entropy.
    * `mapPartitions` (not `map`) so per-partition setup — the codec
    * context — happens once per task, the same shape a Pandas-UDF
    * `mapInPandas` batch gives PySpark. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition "codec" setup happens once per task — exactly
      // the batch shape a Pandas-UDF `mapInPandas` kernel gives
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val bytes = a.payload
        // REAL decode: dims/rate read out of the container header
        // bytes; an unparseable payload degrades to zero-metadata
        // features with header_ok = false, never a task failure
        val parsed = MediaHeaders.parse(bytes)
        val (w, h, sr, contentOff) = parsed match {
          case Some(m) => (m.width, m.height, m.sampleRate, m.headerLen)
          case None => (0, 0, 0, 0)
        }
        val content = java.util.Arrays.copyOfRange(bytes, contentOff, bytes.length)
        md.reset()
        val md5Hex = md.digest(content).map("%02x".format(_)).mkString
        // codepoint frequencies (portable: SQL engines enumerate
        // codepoints; raw byte histograms they cannot)
        val str = new String(content, java.nio.charset.StandardCharsets.UTF_8)
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
        AssetFeatures(a.asset_id, a.media_type, bytes.length.toLong, md5Hex,
          w, h, sr,
          math.floor(entropy * 10000 + 0.5) / 10000, counts.size().toLong,
          parsed.isDefined)
      }
    }
  }

  /** m05 row: movie metadata recovered by PARSING the MP4 header
    * bytes ([[MediaHeaders.parseMp4]]) — never echoed from the
    * planning arithmetic, which only the oracle re-derives. */
  final case class VideoMeta(asset_id: Long, n_bytes: Long, timescale: Int,
      duration_ticks: Long, duration_ms: Long, codec: String,
      header_ok: Boolean)

  /** The fixture's deterministic video metadata (what the "camera"
    * recorded), content-keyed like [[plannedDims]] so the SQL oracle
    * re-derives it without parsing bytes. Codec fourcc drawn from the
    * same content hash as the timescale (independent residues). */
  private[multimodal] def plannedVideo(contentBytes: Long): (Int, Long, String) = {
    val h = (contentBytes * 2654435761L) % 1000003L
    val timescale = Seq(600, 1000, 24000, 90000)((h % 4).toInt)
    val codec = Seq("avc1", "hev1", "mp4a", "av01")(((h / 4) % 4).toInt)
    (timescale, contentBytes * 3 + 7, codec)
  }

  /** m05: VIDEO metadata extraction — document text wrapped in a real
    * ISO BMFF prefix (ftyp + moov{mvhd + trak{tkhd mdia{mdhd hdlr
    * minf{stbl{stsd}}}}}), then the per-partition decode walks the
    * box structure and reads timescale + duration out of mvhd and
    * the codec fourcc out of the trak's stsd sample entry — the
    * field a video-corpus pipeline filters on; duration_ms is exact
    * integer arithmetic on the parsed values. Same certification
    * shape as m01: the oracle re-derives the planned metadata from
    * content-length arithmetic, so parse(encode(planned)) ≠ planned
    * anywhere — including one wrong byte in the five-level box walk —
    * breaks the hash. */
  def videoMetadata(spark: SparkSession, dir: String, maxId: Long = 200L): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (ts, dur, codec) = plannedVideo(content.length.toLong)
        Asset(id, "video", MediaHeaders.mp4HeaderWithTrack(ts, dur, codec) ++ content)
      }
      .mapPartitions { it =>
        it.map { a =>
          MediaHeaders.parseMp4(a.payload) match {
            case Some(m) =>
              VideoMeta(a.asset_id, a.payload.length.toLong, m.timescale,
                m.durationTicks, m.durationTicks * 1000L / m.timescale,
                m.codec, header_ok = true)
            case None =>
              VideoMeta(a.asset_id, a.payload.length.toLong, 0, 0L, 0L, "",
                header_ok = false)
          }
        }
      }
      .toDF()
      .orderBy("asset_id")
  }

  final case class ExifMeta(asset_id: Long, make: String, orientation: Int,
      iso: Int, endian: String, header_ok: Boolean)

  /** The fixture's deterministic EXIF metadata, content-keyed like
    * [[plannedVideo]]; the byte order alternates so BOTH TIFF
    * endiannesses are exercised across the corpus. */
  private[multimodal] def plannedExif(contentBytes: Long): (String, Int, Int, Boolean) = {
    val h = (contentBytes * 2654435761L) % 1000003L
    val make = Seq("GraftCam", "Nikon", "Canon", "OnePlus")((h % 4).toInt)
    val orientation = ((h / 4) % 8).toInt + 1
    val iso = Seq(100, 200, 400, 800, 1600, 3200)(((h / 32) % 6).toInt)
    (make, orientation, iso, (h / 192) % 2 == 0)
  }

  /** m07: EXIF metadata extraction — document text behind a real JPEG
    * carrying a real EXIF APP1 (TIFF block in the planned byte order,
    * IFD0 Make/Orientation + the 0x8769 pointer into the Exif sub-IFD
    * for ISO), decoded by [[MediaHeaders.parseExif]]'s actual IFD
    * walk. Same certification shape as m05: the oracle re-derives the
    * planned fields from content-length arithmetic, so any slip in
    * the two-endian TIFF encode/decode round trip breaks the hash. */
  def exifMetadata(spark: SparkSession, dir: String, maxId: Long = 200L): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (make, orientation, iso, little) = plannedExif(content.length.toLong)
        Asset(id, "image",
          MediaHeaders.exifJpegHeader(640, 480, make, orientation, iso, little)
            ++ content)
      }
      .mapPartitions { it =>
        it.map { a =>
          MediaHeaders.parseExif(a.payload) match {
            case Some(e) => ExifMeta(a.asset_id, e.make, e.orientation,
              e.iso, e.endian, header_ok = true)
            case None => ExifMeta(a.asset_id, "", 0, 0, "", header_ok = false)
          }
        }
      }
      .toDF()
      .orderBy("asset_id")
  }

  final case class Mp3Meta(asset_id: Long, n_bytes: Long, bitrate_kbps: Int,
      sample_rate: Int, mode: String, title: String, artist: String,
      header_ok: Boolean)

  /** The fixture's deterministic MP3 tag + frame metadata,
    * content-keyed like [[plannedVideo]]; title carries a per-asset
    * numeric suffix so the text-frame decode is certified per row,
    * not just per vocabulary. */
  private[multimodal] def plannedMp3(contentBytes: Long): (Int, Int, String, String, String) = {
    val h = (contentBytes * 2654435761L) % 1000003L
    val bitrate = Seq(128, 192, 256, 320)((h % 4).toInt)
    val sampleRate = Seq(44100, 48000, 32000)(((h / 4) % 3).toInt)
    val mode = Seq("stereo", "joint", "mono")(((h / 12) % 3).toInt)
    val title = s"TRACK-${h % 997}"
    val artist = Seq("Alpha", "Beta", "Gamma", "Delta")(((h / 36) % 4).toInt)
    (bitrate, sampleRate, mode, title, artist)
  }

  /** m08: AUDIO TAG + FRAME metadata extraction — document text behind
    * a real ID3v2.3 tag (TIT2/TPE1 ISO-8859-1 text frames, syncsafe
    * tag size) and an MPEG-1 Layer III frame header, decoded by
    * [[MediaHeaders.parseMp3]]'s actual tag walk + header-bit decode
    * (public-spec bitrate/sample-rate tables). Same certification
    * shape as m05/m07: the oracle re-derives every planned field from
    * content-length arithmetic, so any slip in the syncsafe size, the
    * v2.3 frame sizes, or the header bit packing breaks the hash. */
  def audioTagMetadata(spark: SparkSession, dir: String, maxId: Long = 200L): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (br, sr, mode, title, artist) = plannedMp3(content.length.toLong)
        Asset(id, "audio",
          MediaHeaders.mp3Header(br, sr, mode, title, artist) ++ content)
      }
      .mapPartitions { it =>
        it.map { a =>
          MediaHeaders.parseMp3(a.payload) match {
            case Some(m) => Mp3Meta(a.asset_id, a.payload.length.toLong,
              m.bitrateKbps, m.sampleRate, m.mode, m.title, m.artist,
              header_ok = true)
            case None => Mp3Meta(a.asset_id, a.payload.length.toLong,
              0, 0, "", "", "", header_ok = false)
          }
        }
      }
      .toDF()
      .orderBy("asset_id")
  }

  final case class PngTextMeta(asset_id: Long, width: Int, height: Int,
      caption: String, origin: String, header_ok: Boolean)

  /** The fixture's deterministic PNG caption/provenance metadata,
    * content-keyed like [[plannedMp3]]. */
  private[multimodal] def plannedPngText(contentBytes: Long): (Int, Int, String, String) = {
    val h = (contentBytes * 2654435761L) % 1000003L
    val w = Seq(320, 640, 1024, 1920)((h % 4).toInt)
    val ht = Seq(240, 480, 768, 1080)(((h / 4) % 4).toInt)
    val caption = s"CAP-${h % 997}"
    val origin = Seq("crawl", "upload", "scan", "synthetic")(((h / 16) % 4).toInt)
    (w, ht, caption, origin)
  }

  /** m09: PNG tEXt METADATA extraction — the alt-text/caption channel
    * an image corpus carries: document text behind a real PNG header
    * plus two CRC32-verified tEXt chunks (Caption + Origin per the
    * spec's keyword NUL text layout), walked back out by
    * [[MediaHeaders.parsePngTexts]]. A torn tEXt chunk poisons the
    * parse (header_ok false) rather than reading as absent metadata.
    * Same certification shape as m05/m07/m08: every planned field is
    * re-derived by the oracle from content-length arithmetic. */
  def pngTextMetadata(spark: SparkSession, dir: String, maxId: Long = 200L): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (w, ht, caption, origin) = plannedPngText(content.length.toLong)
        Asset(id, "image", MediaHeaders.pngHeaderWithText(w, ht,
          Seq("Caption" -> caption, "Origin" -> origin)) ++ content)
      }
      .mapPartitions { it =>
        it.map { a =>
          (MediaHeaders.parsePng(a.payload), MediaHeaders.parsePngTexts(a.payload)) match {
            case (Some(m), Some(t)) if t.contains("Caption") && t.contains("Origin") =>
              PngTextMeta(a.asset_id, m.width, m.height,
                t("Caption"), t("Origin"), header_ok = true)
            case _ =>
              PngTextMeta(a.asset_id, 0, 0, "", "", header_ok = false)
          }
        }
      }
      .toDF()
      .orderBy("asset_id")
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
