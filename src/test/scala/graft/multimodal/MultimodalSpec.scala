package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Real media-header codecs: encode→parse roundtrips across the dims
  * domain, corruption detection (PNG CRC, truncation), marker-walk
  * robustness on non-canonical layouts, and the end-to-end feature
  * kernel recovering the planned dims from actual payload bytes. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("PNG header roundtrip + CRC validation") {
    for ((w, h) <- Seq((1, 1), (64, 64), (1983, 1143), (65535, 1))) {
      val bytes = MediaHeaders.pngHeader(w, h) ++ Array[Byte](1, 2, 3)
      val m = MediaHeaders.parsePng(bytes).get
      assert((m.width, m.height, m.headerLen) === ((w, h, 33)))
    }
    // corrupt ONE byte of the dims: the real CRC check must reject it
    val good = MediaHeaders.pngHeader(640, 480)
    val bad = good.clone(); bad(17) = (bad(17) ^ 0x01).toByte
    assert(MediaHeaders.parsePng(bad).isEmpty, "corrupted IHDR passed CRC")
    assert(MediaHeaders.parsePng(good.take(20)).isEmpty, "truncated header parsed")
  }

  test("full RGB truecolor PNG codec: round-trip, IHDR color type 2, ImageIO-decodable") {
    val rnd = new scala.util.Random(11)
    for ((w, h) <- Seq((1, 1), (4, 4), (16, 16), (13, 7))) {
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val png = MediaHeaders.pngEncodeRgb(w, h, px)
      // IHDR: bit depth 8 at offset 24, color type 2 at offset 25
      assert(png(24) === 8.toByte && png(25) === 2.toByte)
      val (dw, dh, dpx) = MediaHeaders.pngDecodeRgb(png).get
      assert((dw, dh) === ((w, h)))
      assert(java.util.Arrays.equals(dpx, px), s"pixel mismatch at ${w}x$h")
      // the claim "any PNG reader opens it", proven with a real reader
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth === w && img.getHeight === h)
      val r0 = px(0) & 0xff; val g0 = px(1) & 0xff; val b0 = px(2) & 0xff
      assert(img.getRGB(0, 0) === ((0xff << 24) | (r0 << 16) | (g0 << 8) | b0))
    }
    // cross-profile discipline: a gray PNG refuses the RGB decoder and
    // vice versa (silent misinterpretation would shear every row)
    val gray = MediaHeaders.pngEncodeGray(4, 4, Array.fill(16)(9.toByte))
    assert(MediaHeaders.pngDecodeRgb(gray).isEmpty)
    val rgb = MediaHeaders.pngEncodeRgb(4, 4, Array.fill(48)(9.toByte))
    assert(MediaHeaders.pngDecodeGray(rgb).isEmpty)
    // corruption still poisons decode
    val torn = rgb.clone(); torn(40) = (torn(40) ^ 0x10).toByte
    assert(MediaHeaders.pngDecodeRgb(torn).isEmpty, "torn IDAT must not decode")
  }

  test("full grayscale PNG codec: pixel round-trip, corruption poisons decode") {
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((1, 1), (4, 4), (16, 16), (13, 7))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val png = MediaHeaders.pngEncodeGray(w, h, px)
      // the artifact is a real PNG: header parser agrees on dims
      val m = MediaHeaders.parsePng(png).get
      assert((m.width, m.height) === ((w, h)))
      val (dw, dh, dpx) = MediaHeaders.pngDecodeGray(png).get
      assert((dw, dh) === ((w, h)))
      assert(dpx.toSeq === px.toSeq, s"pixels corrupted at ${w}x$h")
    }
    val good = MediaHeaders.pngEncodeGray(4, 4, Array.fill(16)(42.toByte))
    // corrupt one IDAT byte: chunk CRC must reject, never garbage pixels
    val badIdat = good.clone(); badIdat(good.length - 20) =
      (badIdat(good.length - 20) ^ 0x01).toByte
    assert(MediaHeaders.pngDecodeGray(badIdat).isEmpty,
      "corrupted IDAT decoded")
    // truncation fails loudly too
    assert(MediaHeaders.pngDecodeGray(good.dropRight(6)).isEmpty,
      "truncated PNG decoded")
    // the RGB header-only stand-in (color type 2) is out of profile
    assert(MediaHeaders.pngDecodeGray(
      MediaHeaders.pngHeader(4, 4) ++ Array[Byte](1, 2, 3)).isEmpty)

    // a crafted chunk length near Int.MaxValue must return None, not
    // wrap the bound check negative and crash the CRC update
    val hugeLen = good.clone()
    val lb = java.nio.ByteBuffer.wrap(hugeLen)
    lb.putInt(33, 0x7ffffff0) // first chunk after IHDR = IDAT's length
    assert(MediaHeaders.pngDecodeGray(hugeLen).isEmpty,
      "overflowing chunk length decoded or crashed")

    // a zlib stream demanding a preset dictionary (FDICT — PNG forbids
    // it) must return None, not spin the inflate loop forever
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(t.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(t.getBytes("US-ASCII")); crc.update(data)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    // CMF=0x78, FLG=0x20: FDICT bit set, (0x78*256+0x20) % 31 == 0
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0)
    val fdictPng = good.take(33) ++ chunk("IDAT", fdictIdat) ++
      chunk("IEND", Array.emptyByteArray)
    assert(MediaHeaders.pngDecodeGray(fdictPng).isEmpty,
      "FDICT stream decoded or hung")
  }

  test("JPEG SOF marker walk finds dims behind arbitrary APPn segments") {
    val m = MediaHeaders.parseJpeg(MediaHeaders.jpegHeader(800, 600)).get
    assert((m.width, m.height) === ((800, 600)))
    // real-world shape: extra APP1 (EXIF-like) + COM segments before
    // SOF — the walk must skip them by declared length
    val app1 = Array(0xff, 0xe1, 0x00, 0x0a).map(_.toByte) ++ Array.fill(8)(0x41.toByte)
    val com = Array(0xff, 0xfe, 0x00, 0x05).map(_.toByte) ++ "abc".getBytes
    val canonical = MediaHeaders.jpegHeader(123, 45)
    val withExtras = canonical.take(2) ++ app1 ++ com ++ canonical.drop(2)
    val m2 = MediaHeaders.parseJpeg(withExtras).get
    assert((m2.width, m2.height) === ((123, 45)))
    // SOS before any SOF (malformed for our purposes): no dims
    val sos = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(MediaHeaders.parseJpeg(sos).isEmpty)
  }

  test("WAV RIFF chunk walk reads the sample rate, canonical or not") {
    val m = MediaHeaders.parseWav(MediaHeaders.wavHeader(44100, 1000)).get
    assert((m.sampleRate, m.headerLen) === ((44100, 44)))
    // non-canonical: a LIST chunk between fmt and data
    val canonical = MediaHeaders.wavHeader(16000, 10)
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val withList = canonical.take(36) ++ list ++ canonical.drop(36)
    val m2 = MediaHeaders.parseWav(withList).get
    assert(m2.sampleRate === 16000)
    assert(m2.headerLen === 44 + 12, "content offset past the inserted chunk")
    assert(MediaHeaders.parseWav("RIFFxxxxNOPE".getBytes).isEmpty)
    // a fmt chunk whose declared size is too short for the rate field
    // must fail the parse, not read into the following chunk's bytes
    val shortFmt = canonical.clone()
    shortFmt(16) = 4 // fmt size 16 -> 4
    assert(MediaHeaders.parseWav(shortFmt).isEmpty, "short fmt chunk parsed")
  }

  test("MP4 box walk reads timescale and duration; corruption rejected") {
    for ((ts, dur) <- Seq((600, 0L), (1000, 1L), (90000, 0xfffffffeL), (24000, 123456L))) {
      val bytes = MediaHeaders.mp4Header(ts, dur) ++ Array[Byte](9, 8, 7)
      val m = MediaHeaders.parseMp4(bytes).get
      assert((m.kind, m.timescale, m.durationTicks, m.headerLen) === (("video", ts, dur, 136)))
    }
    // a v1 mvhd (u64 times) built by hand must parse too
    val v1 = {
      val b = java.nio.ByteBuffer.allocate(20 + 8 + 8 + 4 + 8 + 8 + 4 + 8)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(20); b.put("ftyp".getBytes("US-ASCII"))
      b.put("isom".getBytes("US-ASCII")); b.putInt(0); b.put("isom".getBytes("US-ASCII"))
      val mvhdSize = 8 + 4 + 8 + 8 + 4 + 8
      b.putInt(8 + mvhdSize); b.put("moov".getBytes("US-ASCII"))
      b.putInt(mvhdSize); b.put("mvhd".getBytes("US-ASCII"))
      b.putInt(0x01000000)      // version 1
      b.putLong(0L)             // creation (u64)
      b.putLong(0L)             // modification (u64)
      b.putInt(48000)           // timescale
      b.putLong(10000000000L)   // duration > u32
      b.array()
    }
    val mv1 = MediaHeaders.parseMp4(v1).get
    assert((mv1.timescale, mv1.durationTicks) === ((48000, 10000000000L)))
    // corruption: broken box size, missing mvhd, truncation
    val good = MediaHeaders.mp4Header(600, 42L)
    val badSize = good.clone(); badSize(23) = 0x02 // moov size now overruns
    assert(MediaHeaders.parseMp4(badSize).isEmpty, "overrunning box size parsed")
    assert(MediaHeaders.parseMp4(good.take(100)).isEmpty, "truncated moov parsed")
    assert(MediaHeaders.parseMp4("notmp4".getBytes).isEmpty)
    // the mvhd-only prefix remains a valid movie header: codec empty
    assert(MediaHeaders.parseMp4(good).get.codec === "")
  }

  test("MP4 trak walk reads the stsd codec fourcc; malformed tracks rejected") {
    for (codec <- Seq("avc1", "hev1", "mp4a", "av01")) {
      val bytes = MediaHeaders.mp4HeaderWithTrack(90000, 123L, codec) ++
        Array[Byte](9, 8, 7)
      val m = MediaHeaders.parseMp4(bytes).get
      assert((m.kind, m.timescale, m.durationTicks, m.codec, m.headerLen) ===
        (("video", 90000, 123L, codec, 357)))
    }
    val good = MediaHeaders.mp4HeaderWithTrack(600, 42L, "avc1")
    // the walk tolerates nothing torn: an stsd whose entry_count says
    // one but whose entry size overruns the box must fail the parse
    val overrunEntry = good.clone()
    // entry size field sits 8 bytes into stsd's payload; stsd payload
    // starts at 357 - 24 (16-byte entry + 8-byte fullbox prefix)
    val entrySizeOff = 357 - 24 + 8
    assert(good(entrySizeOff + 3) === 16.toByte, "test offset drifted")
    overrunEntry(entrySizeOff + 3) = 64 // declared entry size > box
    assert(MediaHeaders.parseMp4(overrunEntry).isEmpty, "overrunning sample entry parsed")
    // stsd declaring zero entries is not a playable track
    val zeroEntries = good.clone()
    val entryCountOff = 357 - 24 + 4
    assert(good(entryCountOff + 3) === 1.toByte, "test offset drifted")
    zeroEntries(entryCountOff + 3) = 0
    assert(MediaHeaders.parseMp4(zeroEntries).isEmpty, "zero-entry stsd parsed")
    // a trak whose child box size overruns the trak is torn
    val tornTrak = good.clone()
    val trakPayload = 20 + 8 + 108 + 8 // ftyp + moov hdr + mvhd + trak hdr
    // tkhd size (92) -> 0xff: overruns the trak
    tornTrak(trakPayload + 3) = 0xff.toByte
    assert(MediaHeaders.parseMp4(tornTrak).isEmpty, "overrunning tkhd parsed")
  }

  test("video metadata query parses planned values out of real bytes") {
    val rows = Multimodal.videoMetadata(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"asset ${r.getLong(0)} failed header parse")
      val nContent = r.getLong(1) - 357
      val (ts, dur, codec) = Multimodal.plannedVideo(nContent)
      assert(r.getInt(2) === ts)
      assert(r.getLong(3) === dur)
      assert(r.getLong(4) === dur * 1000L / ts)
      assert(r.getString(5) === codec)
    }
    spark.catalog.clearCache()
  }

  test("sniffing dispatches by signature") {
    assert(MediaHeaders.parse(MediaHeaders.pngHeader(2, 3)).get.kind === "image")
    assert(MediaHeaders.parse(MediaHeaders.jpegHeader(2, 3)).get.kind === "image")
    assert(MediaHeaders.parse(MediaHeaders.wavHeader(8000, 0)).get.kind === "audio")
    assert(MediaHeaders.parse("plain text".getBytes).isEmpty)
    assert(MediaHeaders.parse(null).isEmpty)
  }

  test("feature kernel recovers the planned dims by parsing real payload bytes") {
    import org.apache.spark.sql.functions._
    val feats = Multimodal.extractFeatures(
      Multimodal.assetsFromDocuments(spark, dir)).toDF().cache()
    val n = feats.count()
    assert(n > 0)
    assert(feats.filter(!col("header_ok")).count() === 0,
      "every synthesized container must parse")
    // decoded dims equal the fixture's planned dims (parse ∘ encode = id)
    val mismatched = feats.collect().count { r =>
      val contentLen = r.getAs[Long]("n_bytes") - (r.getAs[Long]("asset_id") match {
        case id if id % 4 == 0 => 33L
        case id if id % 2 == 0 => 39L
        case _ => 44L
      })
      val (w, h, sr) = Multimodal.plannedDims(r.getAs[String]("media_type"), contentLen)
      (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("sample_rate")) != ((w, h, sr))
    }
    assert(mismatched === 0, s"$mismatched assets decoded dims != planned dims")
    feats.unpersist()
  }

  test("m06: PCM stats recover a hand-computed waveform exactly") {
    // samples [100, -200, 0, 300]: sumAbs 600, sumSq 140000, peak 300,
    // crossings: 100→-200 (1), -200→0 (2: 0 is non-negative), 0→300 (no)
    val pcm = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(100, -200, 0, 300).foreach(s => pcm.putShort(s.toShort))
    val bytes = MediaHeaders.wavHeader(16000, 8) ++ pcm.array()
    val m = MediaHeaders.parseWav(bytes).get
    assert(m.sampleRate === 16000)
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val samples = (0 until 4).map(i => b.getShort(m.headerLen + i * 2).toInt)
    assert(samples === Seq(100, -200, 0, 300),
      "Int16 LE decode behind the RIFF walk must be byte-exact")
  }

  test("m06: the query's stats survive the full synth->parse round trip") {
    val rows = Multimodal.audioPcmStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_samples")
      assert(n >= 64 && n < 256, "sample count outside the generator band")
      assert(r.getAs[Long]("peak") <= 32768L)
      assert(r.getAs[Long]("sum_abs") <= n * 32768L)
      assert(r.getAs[Long]("zero_crossings") < n)
    }
  }

  test("m07: EXIF round-trips in BOTH TIFF byte orders") {
    for (little <- Seq(true, false)) {
      val bytes = MediaHeaders.exifJpegHeader(640, 480, "Nikon", 6, 800, little)
      val e = MediaHeaders.parseExif(bytes)
        .getOrElse(fail(s"parseExif failed (littleEndian=$little)"))
      assert(e.make === "Nikon")
      assert(e.orientation === 6)
      assert(e.iso === 800)
      assert(e.endian === (if (little) "II" else "MM"))
      // the plain JPEG dimension walk must skip the APP1 and still
      // find SOF0 — EXIF presence can't break image decoding
      val m = MediaHeaders.parseJpeg(bytes).get
      assert((m.width, m.height) === ((640, 480)))
    }
  }

  test("m07: torn EXIF headers fail loudly, never misread") {
    val good = MediaHeaders.exifJpegHeader(8, 8, "Canon", 1, 100, littleEndian = true)
    // corrupt the TIFF magic (42 → 43): APP1 starts at 2, TIFF block
    // at 2+4+6, magic at +2 (little-endian, low byte first)
    val badMagic = good.clone(); badMagic(2 + 4 + 6 + 2) = 43.toByte
    assert(MediaHeaders.parseExif(badMagic) === None)
    // IFD0 offset pointing past the segment
    val badIfd = good.clone(); badIfd(2 + 4 + 6 + 4) = 0xff.toByte
    assert(MediaHeaders.parseExif(badIfd) === None)
    // truncation mid-IFD
    assert(MediaHeaders.parseExif(good.take(30)) === None)
    // a plain JPEG with no APP1 has no EXIF
    assert(MediaHeaders.parseExif(MediaHeaders.jpegHeader(8, 8)) === None)
  }

  test("m07: the query decodes every asset with planned fields") {
    val rows = Multimodal.exifMetadata(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("header_ok")))
    // both endiannesses must actually occur across the corpus
    val endians = rows.map(_.getAs[String]("endian")).toSet
    assert(endians === Set("II", "MM"),
      s"fixture should exercise both byte orders, got $endians")
  }

  test("m08: MP3 header round-trips every planned field") {
    for (br <- Seq(128, 192, 256, 320); sr <- Seq(44100, 48000, 32000);
         mode <- Seq("stereo", "joint", "mono")) {
      val bytes = MediaHeaders.mp3Header(br, sr, mode, "A Song", "The Band")
      val m = MediaHeaders.parseMp3(bytes ++ Array.fill(9)(0x55.toByte))
      assert(m.exists(x => x.bitrateKbps == br && x.sampleRate == sr &&
        x.mode == mode && x.title == "A Song" && x.artist == "The Band"),
        s"round trip failed for ($br, $sr, $mode): $m")
    }
  }

  test("m08: torn MP3 headers fail loudly, never misread") {
    val good = MediaHeaders.mp3Header(192, 44100, "joint", "T", "A")
    assert(MediaHeaders.parseMp3(good).nonEmpty)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(MediaHeaders.parseMp3(badMagic).isEmpty)
    // ID3v2.4 (unsupported version byte) refuses rather than misparsing
    val v4 = good.clone(); v4(3) = 4.toByte
    assert(MediaHeaders.parseMp3(v4).isEmpty)
    // truncated mid-tag
    assert(MediaHeaders.parseMp3(good.take(16)).isEmpty)
    // frame sync destroyed
    val noSync = good.clone(); noSync(good.length - 4) = 0x00.toByte
    assert(MediaHeaders.parseMp3(noSync).isEmpty)
    // free-format bitrate index (0) is out of contract
    val freeBr = good.clone(); freeBr(good.length - 2) =
      (freeBr(good.length - 2) & 0x0f).toByte
    assert(MediaHeaders.parseMp3(freeBr).isEmpty)
    // reserved sample-rate index (3)
    val badSr = good.clone(); badSr(good.length - 2) =
      (badSr(good.length - 2) | 0x0c).toByte
    assert(MediaHeaders.parseMp3(badSr).isEmpty)
    // a frame size overrunning the tag is torn, not read past the end
    val overrun = good.clone(); overrun(14) = 0x7f.toByte
    assert(MediaHeaders.parseMp3(overrun).isEmpty)
  }

  test("m09: tEXt chunks round-trip; torn chunks poison, never read as absent") {
    val good = MediaHeaders.pngHeaderWithText(640, 480,
      Seq("Caption" -> "a red fox", "Origin" -> "crawl"))
    val t = MediaHeaders.parsePngTexts(good ++ Array.fill(7)(0x33.toByte))
    assert(t === Some(Map("Caption" -> "a red fox", "Origin" -> "crawl")))
    // a flipped byte inside a tEXt body breaks that chunk's CRC —
    // the parse must POISON (None), not skip the chunk
    val torn = good.clone()
    torn(33 + 12) = 'X'.toByte // first byte of the Caption keyword
    assert(MediaHeaders.parsePngTexts(torn).isEmpty, "torn tEXt must poison")
    // no chunks at all: valid PNG, empty metadata (not a failure)
    assert(MediaHeaders.parsePngTexts(
      MediaHeaders.pngHeader(64, 64) ++ Array.fill(5)(0x44.toByte)) ===
      Some(Map.empty[String, String]))
    // keyword validation per spec
    intercept[IllegalArgumentException] {
      MediaHeaders.pngHeaderWithText(64, 64, Seq("bad key" -> "v"))
    }
  }

  test("m08: the query decodes every asset with planned fields") {
    val got = graft.multimodal.Multimodal
      .audioTagMetadata(spark, dir, maxId = 40).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getBoolean(7)), "every asset must parse")
    val modes = got.map(_.getString(4)).toSet
    assert(modes.subsetOf(Set("stereo", "joint", "mono")) && modes.size >= 2,
      s"fixture should exercise multiple channel modes, got $modes")
    assert(got.forall(_.getString(5).startsWith("TRACK-")))
  }
}
