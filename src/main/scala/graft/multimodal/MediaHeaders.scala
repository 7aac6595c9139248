package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real media-container header codecs — PNG IHDR, JPEG SOF, WAV RIFF —
  * implemented from the public format specs with zero dependencies.
  *
  * The PARSERS are production-shaped: they work on any real file of
  * these formats (JPEG marker walk finds SOFn wherever it sits; PNG
  * IHDR CRC is actually verified; WAV chunks are walked, not assumed),
  * so `extractFeatures` decodes width/height/sample-rate from actual
  * bytes. The ENCODERS exist for the fixture side: this container has
  * no codecs or sample media, so the asset source wraps document text
  * in genuine format headers (valid signatures, real CRC32, correct
  * endianness) — the decode path then has real bytes to prove itself
  * on.
  */
object MediaHeaders {

  /** Parsed container metadata: pixel dims (images), sample rate
    * (audio), or movie timescale/duration (video), plus where the
    * header ends (content offset for the fixture's header‖content
    * layout). The video fields default so image/audio construction
    * sites are untouched. */
  final case class Media(kind: String, width: Int, height: Int,
      sampleRate: Int, headerLen: Int,
      timescale: Int = 0, durationTicks: Long = 0L,
      codec: String = "")

  // ------------------------------------------------------------- PNG

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** PNG signature + IHDR chunk (8-bit RGB, no interlace): 33 bytes,
    * CRC32 computed for real over the chunk type + data per spec. */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    b.put(pngSig)
    b.putInt(13) // IHDR data length
    b.put("IHDR".getBytes("US-ASCII"))
    b.putInt(width).putInt(height)
    b.put(8.toByte)  // bit depth
    b.put(2.toByte)  // color type: truecolor
    b.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val crc = new java.util.zip.CRC32
    crc.update(b.array(), 12, 17) // type + data
    val out = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    out.put(b.array(), 0, 29)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Parse + VALIDATE a PNG prefix: signature, IHDR layout, and the
    * IHDR CRC32 (a torn/corrupt header fails decode rather than
    * yielding garbage dims). */
  def parsePng(bytes: Array[Byte]): Option[Media] = {
    if (bytes.length < 33) return None
    if (!pngSig.indices.forall(i => bytes(i) == pngSig(i))) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (b.getInt(8) != 13) return None
    if (!"IHDR".getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => bytes(12 + i) == c })
      return None
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 17)
    if (crc.getValue.toInt != b.getInt(29)) return None
    Some(Media("image", b.getInt(16), b.getInt(20), 0, 33))
  }

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val t = chunkType.getBytes("US-ASCII")
    val b = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(data.length).put(t).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** COMPLETE grayscale PNG encoder (spec: 8-bit, color type 0, filter
    * 0 per scanline, zlib IDAT, real CRC32s) — a decodable image any
    * PNG reader opens, not a header stand-in. Pure JVM (Deflater is
    * java.util.zip); `pixels` is row-major, length w*h, one byte per
    * pixel. The fixture-scale thumbnail writer (m03) runs this per
    * row inside an executor kernel; output size is O(w*h). */
  def pngEncodeGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] =
    pngEncode(width, height, pixels, bpp = 1, colorType = 0, "pngEncodeGray")

  /** COMPLETE TRUECOLOR PNG encoder (spec: 8-bit, color type 2 — RGB,
    * filter 0 per scanline, zlib IDAT, real CRC32s); `pixels` is
    * row-major, 3 bytes per pixel (R,G,B). Same profile discipline as
    * [[pngEncodeGray]], so the fixture-scale thumbnail path covers
    * color assets too — the digest stand-in is only for genuinely
    * large media. */
  def pngEncodeRgb(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] =
    pngEncode(width, height, pixels, bpp = 3, colorType = 2, "pngEncodeRgb")

  private def pngEncode(width: Int, height: Int, pixels: Array[Byte],
      bpp: Int, colorType: Int, fn: String): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height * bpp,
      s"$fn: need $width x $height x $bpp = ${width * height * bpp} bytes," +
        s" got ${pixels.length}")
    val ihdr = {
      val b = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      b.putInt(width).putInt(height)
      b.put(8.toByte)          // bit depth
      b.put(colorType.toByte)  // 0 = grayscale, 2 = truecolor RGB
      b.put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    // raw scanline stream: one filter byte (0 = None) per row
    val rowBytes = width * bpp
    val raw = new Array[Byte]((rowBytes + 1) * height)
    var r = 0
    while (r < height) {
      raw(r * (rowBytes + 1)) = 0
      System.arraycopy(pixels, r * rowBytes, raw, r * (rowBytes + 1) + 1, rowBytes)
      r += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    pngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** COMPLETE grayscale PNG decoder for the [[pngEncodeGray]] profile:
    * validates signature + IHDR CRC ([[parsePng]]), requires 8-bit
    * grayscale non-interlaced, walks the chunk stream collecting
    * CRC-valid IDATs, inflates, and un-filters (filter 0 rows — the
    * only filter the encoder emits; any other poisons the decode).
    * Returns (width, height, row-major pixels); None on ANY
    * malformation — a torn image must fail decode, never yield
    * garbage pixels. */
  def pngDecodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    pngDecode(bytes, colorType = 0, bpp = 1)

  /** TRUECOLOR twin of [[pngDecodeGray]] for the [[pngEncodeRgb]]
    * profile (8-bit color type 2, filter 0): returns row-major
    * 3-bytes-per-pixel RGB; None on any malformation. */
  def pngDecodeRgb(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    pngDecode(bytes, colorType = 2, bpp = 3)

  private def pngDecode(bytes: Array[Byte], colorType: Int,
      bpp: Int): Option[(Int, Int, Array[Byte])] = {
    val media = parsePng(bytes) match {
      case Some(m) => m
      case None => return None
    }
    // profile check: 8-bit, expected color type, no interlace
    // (IHDR offsets 24-28)
    if (bytes(24) != 8 || bytes(25) != colorType || bytes(28) != 0) return None
    val w = media.width * bpp; val h = media.height
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33 // first chunk after IHDR
    var sawEnd = false
    while (!sawEnd) {
      if (off + 12 > bytes.length) return None
      val len = b.getInt(off)
      // bound check in overflow-safe form: a crafted length near
      // Int.MaxValue would wrap `off + 12 + len` negative and slip
      // past a direct comparison, then crash the CRC update instead
      // of returning the contract's None
      if (len < 0 || len > bytes.length - off - 12) return None
      val chunkType = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue.toInt != b.getInt(off + 8 + len)) return None
      chunkType match {
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks are skippable per spec
      }
      off += 12 + len
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // ANY zero-progress state is malformed-for-this-profile:
        // truncated input (needsInput), a preset-dictionary stream
        // (needsDictionary — zlib FDICT, which PNG forbids and which
        // would otherwise spin this loop forever), or anything else
        if (n == 0) return None
        got += n
      }
      if (got != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    val pixels = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      if (raw(r * (w + 1)) != 0) return None // only filter 0 supported
      System.arraycopy(raw, r * (w + 1) + 1, pixels, r * w, w)
      r += 1
    }
    Some((media.width, media.height, pixels)) // w above is the ROW stride
  }

  /** PNG header + tEXt METADATA chunks (keyword NUL text, CRC32 per
    * spec like IHDR's) — the alt-text/caption/provenance channel a
    * real image corpus carries. */
  def pngHeaderWithText(width: Int, height: Int,
      texts: Seq[(String, String)]): Array[Byte] = {
    val base = pngHeader(width, height)
    val chunks = texts.map { case (key, value) =>
      require(key.nonEmpty && key.length <= 79 && !key.contains(' '),
        s"tEXt keyword out of spec: '$key'")
      val data = key.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
        value.getBytes("ISO-8859-1")
      val b = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(data.length)
      b.put("tEXt".getBytes("US-ASCII"))
      b.put(data)
      val crc = new java.util.zip.CRC32
      crc.update(b.array(), 4, 4 + data.length)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    chunks.foldLeft(base)(_ ++ _)
  }

  /** Walk the chunk stream after IHDR collecting CRC-VALID tEXt
    * entries (keyword → text). Stops at the first position that
    * cannot be a chunk (the fixture's raw content tail); a tEXt chunk
    * whose CRC fails is torn and poisons the whole parse (None) —
    * silently skipping it would misreport metadata as absent. */
  def parsePngTexts(bytes: Array[Byte]): Option[Map[String, String]] = {
    if (parsePng(bytes).isEmpty) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var off = 33
    val out = scala.collection.mutable.Map.empty[String, String]
    var done = false
    while (!done && off + 12 <= bytes.length) {
      val len = b.getInt(off)
      val isText = len >= 1 && off + 12 + len <= bytes.length &&
        bytes(off + 4) == 't' && bytes(off + 5) == 'E' &&
        bytes(off + 6) == 'X' && bytes(off + 7) == 't'
      if (!isText) done = true
      else {
        val crc = new java.util.zip.CRC32
        crc.update(bytes, off + 4, 4 + len)
        if (crc.getValue.toInt != b.getInt(off + 8 + len)) return None
        val data = bytes.slice(off + 8, off + 8 + len)
        val nul = data.indexOf(0.toByte)
        if (nul <= 0) return None
        out.put(new String(data, 0, nul, "ISO-8859-1"),
          new String(data, nul + 1, data.length - nul - 1, "ISO-8859-1"))
        off += 12 + len
      }
    }
    Some(out.toMap)
  }

  // ------------------------------------------------------------ JPEG

  /** SOI + APP0/JFIF + SOF0 (baseline, 3 components): 39 bytes. Real
    * segment layout — any JPEG dimension reader recovers the dims. */
  def jpegHeader(width: Int, height: Int): Array[Byte] = {
    require(width <= 0xffff && height <= 0xffff, "JPEG dims are 16-bit")
    val b = ByteBuffer.allocate(39).order(ByteOrder.BIG_ENDIAN)
    b.putShort(0xffd8.toShort)                     // SOI
    b.putShort(0xffe0.toShort).putShort(16)        // APP0, len 16
    b.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    b.putShort(0x0102.toShort)                     // version 1.2
    b.put(0.toByte)                                // aspect units
    b.putShort(1).putShort(1)                      // aspect ratio 1:1
    b.put(0.toByte).put(0.toByte)                  // no thumbnail
    b.putShort(0xffc0.toShort).putShort(17)        // SOF0, len 17
    b.put(8.toByte)                                // precision
    b.putShort(height.toShort).putShort(width.toShort)
    b.put(3.toByte)                                // 3 components
    for (c <- 1 to 3) { b.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    b.array()
  }

  /** Walk JPEG markers to the first SOFn frame header (the standard
    * dimension-extraction algorithm: skip every variable-length
    * segment by its declared length; SOF0–15 minus DHT/JPG/DAC carry
    * the dims). Works on real JPEGs regardless of preceding APPn/COM
    * segments. */
  def parseJpeg(bytes: Array[Byte]): Option[Media] = {
    if (bytes.length < 4 || bytes(0) != 0xff.toByte || bytes(1) != 0xd8.toByte)
      return None
    var i = 2
    while (i + 4 <= bytes.length) {
      if (bytes(i) != 0xff.toByte) return None
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no SOF seen
      else {
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > bytes.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return Some(Media("image", w, h, 0, i + 2 + len))
        }
        i += 2 + len
      }
    }
    None
  }

  // ------------------------------------------------------------- WAV

  /** Canonical 44-byte RIFF/WAVE header (PCM, mono, 16-bit). */
  def wavHeader(sampleRate: Int, dataLen: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1)                                  // PCM
    b.putShort(1)                                  // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2)                       // byte rate
    b.putShort(2)                                  // block align
    b.putShort(16)                                 // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array()
  }

  /** Walk RIFF chunks to `fmt ` (sample rate) and `data` (content
    * offset) — chunk walk, not fixed offsets, so non-canonical WAVs
    * (extra LIST/fact chunks) still parse. */
  def parseWav(bytes: Array[Byte]): Option[Media] = {
    def ascii(off: Int, s: String) =
      off + s.length <= bytes.length &&
        s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => bytes(off + i) == c }
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var rate = -1
    while (i + 8 <= bytes.length) {
      val size = b.getInt(i + 4)
      if (size < 0) return None
      if (ascii(i, "fmt ")) {
        // a PCM fmt chunk carries at least 16 data bytes; a shorter
        // declared size means the sample-rate field lies outside the
        // chunk — fail the parse, never read the next chunk's bytes
        if (size < 16 || i + 16 > bytes.length) return None
        rate = b.getInt(i + 12)
      } else if (ascii(i, "data")) {
        return if (rate > 0) Some(Media("audio", 0, 0, rate, i + 8)) else None
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  // ------------------------------------------------------------- MP4

  private def putAscii(b: ByteBuffer, s: String): Unit =
    b.put(s.getBytes("US-ASCII"))

  /** ISO BMFF (MP4) prefix: `ftyp` (major brand isom) + `moov`
    * holding one version-0 `mvhd` — 136 bytes of real big-endian box
    * structure per ISO/IEC 14496-12 (sizes, fourcc types, unity
    * matrix, 1.0 rate). Any MP4 metadata reader recovers the movie
    * timescale and duration from it. Duration must fit u32 (the v0
    * field); the parser additionally understands v1 (u64). */
  def mp4Header(timescale: Int, durationTicks: Long): Array[Byte] = {
    require(timescale > 0, s"timescale must be positive, got $timescale")
    require(durationTicks >= 0 && durationTicks <= 0xffffffffL,
      s"v0 mvhd duration must fit u32, got $durationTicks")
    val b = ByteBuffer.allocate(136).order(ByteOrder.BIG_ENDIAN)
    b.putInt(20); putAscii(b, "ftyp")                    // ftyp box
    putAscii(b, "isom"); b.putInt(0); putAscii(b, "isom")
    b.putInt(116); putAscii(b, "moov")                   // moov box
    putMvhd(b, timescale, durationTicks)
    b.array()
  }

  private def putMvhd(b: ByteBuffer, timescale: Int, durationTicks: Long): Unit = {
    b.putInt(108); putAscii(b, "mvhd")                   // mvhd v0
    b.putInt(0)                                          // version + flags
    b.putInt(0).putInt(0)                                // creation, modification
    b.putInt(timescale)
    b.putInt(durationTicks.toInt)
    b.putInt(0x00010000)                                 // rate 1.0
    b.putShort(0x0100.toShort)                           // volume 1.0
    b.putShort(0)                                        // reserved
    b.putLong(0L)                                        // reserved[2]
    b.putInt(0x00010000); b.putInt(0); b.putInt(0)       // unity matrix
    b.putInt(0); b.putInt(0x00010000); b.putInt(0)
    b.putInt(0); b.putInt(0); b.putInt(0x40000000)
    (1 to 6).foreach(_ => b.putInt(0))                   // pre_defined
    b.putInt(2)                                          // next_track_ID
  }

  /** MP4 prefix WITH one track carrying a codec identity: ftyp +
    * moov{ mvhd + trak{ tkhd + mdia{ mdhd + hdlr + minf{ stbl{
    * stsd{ <codec sample entry> } } } } } } — 357 bytes of real
    * ISO/IEC 14496-12 box nesting, including the sibling boxes
    * (tkhd, mdhd, hdlr) a real file carries, so the parser's stsd
    * walk has to SKIP siblings rather than assume stbl comes first.
    * The sample entry is the 16-byte base SampleEntry (6 reserved
    * bytes + data_reference_index = 1) under the given fourcc —
    * what every codec-identification reader keys on. */
  def mp4HeaderWithTrack(timescale: Int, durationTicks: Long,
      codec: String): Array[Byte] = {
    require(timescale > 0, s"timescale must be positive, got $timescale")
    require(durationTicks >= 0 && durationTicks <= 0xffffffffL,
      s"v0 mvhd duration must fit u32, got $durationTicks")
    require(codec.length == 4 && codec.forall(c => c >= 0x20 && c < 0x7f),
      s"codec must be a 4-char printable fourcc, got '$codec'")
    val b = ByteBuffer.allocate(357).order(ByteOrder.BIG_ENDIAN)
    b.putInt(20); putAscii(b, "ftyp")
    putAscii(b, "isom"); b.putInt(0); putAscii(b, "isom")
    b.putInt(337); putAscii(b, "moov")
    putMvhd(b, timescale, durationTicks)
    b.putInt(221); putAscii(b, "trak")
    b.putInt(92); putAscii(b, "tkhd")                    // tkhd v0
    b.putInt(0x00000007)                                 // v0, flags: enabled|in_movie|in_preview
    b.putInt(0).putInt(0)                                // creation, modification
    b.putInt(1)                                          // track_ID
    b.putInt(0)                                          // reserved
    b.putInt(durationTicks.toInt)
    b.putLong(0L)                                        // reserved[2]
    b.putShort(0).putShort(0).putShort(0).putShort(0)    // layer, alt_group, volume, reserved
    b.putInt(0x00010000); b.putInt(0); b.putInt(0)       // unity matrix
    b.putInt(0); b.putInt(0x00010000); b.putInt(0)
    b.putInt(0); b.putInt(0); b.putInt(0x40000000)
    b.putInt(0).putInt(0)                                // width, height (16.16)
    b.putInt(121); putAscii(b, "mdia")
    b.putInt(32); putAscii(b, "mdhd")                    // mdhd v0
    b.putInt(0)                                          // version + flags
    b.putInt(0).putInt(0)                                // creation, modification
    b.putInt(timescale)
    b.putInt(durationTicks.toInt)
    b.putShort(0x55c4.toShort)                           // language 'und'
    b.putShort(0)                                        // pre_defined
    b.putInt(33); putAscii(b, "hdlr")                    // hdlr
    b.putInt(0)                                          // version + flags
    b.putInt(0)                                          // pre_defined
    putAscii(b, "vide")                                  // handler_type
    b.putInt(0).putInt(0).putInt(0)                      // reserved[3]
    b.put(0.toByte)                                      // empty NUL name
    b.putInt(48); putAscii(b, "minf")
    b.putInt(40); putAscii(b, "stbl")
    b.putInt(32); putAscii(b, "stsd")                    // stsd fullbox
    b.putInt(0)                                          // version + flags
    b.putInt(1)                                          // entry_count
    b.putInt(16); putAscii(b, codec)                     // base SampleEntry
    b.putInt(0).putShort(0)                              // 6 reserved bytes
    b.putShort(1)                                        // data_reference_index
    b.array()
  }

  /** Walk top-level ISO BMFF boxes to `moov`, then its children:
    * `mvhd` (v0 u32 / v1 u64 layouts) for timescale/duration, and
    * every `trak`'s mdia → minf → stbl → stsd chain for the per-track
    * codec fourcc (what a video-corpus pipeline filters on; multiple
    * tracks join comma-separated in track order). Stops at the first
    * unrecognizable box boundary (the fixture's header‖content layout
    * puts raw content right after `moov`), and any MALFORMED box —
    * overrunning size, stsd with zero entries, truncated sample entry
    * — fails the whole parse rather than yielding partial garbage:
    * the torn-header contract every parser in this file follows. A
    * moov with no trak at all parses with codec "" (mvhd-only
    * prefixes are still valid movie headers — the pre-track encoder's
    * output and m04's fixtures). */
  def parseMp4(bytes: Array[Byte]): Option[Media] = {
    def ascii(off: Int, s: String) =
      off + s.length <= bytes.length &&
        s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => bytes(off + i) == c }
    if (bytes.length < 16 || !ascii(4, "ftyp")) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)

    // First stsd sample-entry fourcc of one trak's stbl, or None on
    // any malformed box in the chain. `lo`/`hi` bound the child walk
    // at each nesting level (the same boundary discipline as moov's).
    def trakCodec(lo: Int, hi: Int): Option[String] = {
      def findChild(lo: Int, hi: Int, fourcc: String): Option[(Int, Int)] = {
        var j = lo
        while (j + 8 <= hi) {
          val csize = b.getInt(j)
          if (csize < 8 || j + csize > hi) return None
          if (ascii(j + 4, fourcc)) return Some((j + 8, j + csize))
          j += csize
        }
        None
      }
      for {
        (mdiaLo, mdiaHi) <- findChild(lo, hi, "mdia")
        (minfLo, minfHi) <- findChild(mdiaLo, mdiaHi, "minf")
        (stblLo, stblHi) <- findChild(minfLo, minfHi, "stbl")
        (stsdLo, stsdHi) <- findChild(stblLo, stblHi, "stsd")
        // fullbox (ver/flags + entry_count) + 8-byte entry header
        if stsdLo + 16 <= stsdHi && b.getInt(stsdLo + 4) >= 1
        entrySize = b.getInt(stsdLo + 8)
        if entrySize >= 16 && stsdLo + 8 + entrySize <= stsdHi
      } yield new String(bytes, stsdLo + 12, 4, "US-ASCII")
    }

    var i = 0
    while (i + 8 <= bytes.length) {
      val size = b.getInt(i)
      if (size < 8 || i.toLong + size > bytes.length) return None
      if (ascii(i + 4, "moov")) {
        var j = i + 8
        val moovEnd = i + size
        var mvhd: Option[(Int, Long)] = None
        val codecs = scala.collection.mutable.ListBuffer.empty[String]
        while (j + 8 <= moovEnd) {
          val csize = b.getInt(j)
          if (csize < 8 || j + csize > moovEnd) return None
          if (ascii(j + 4, "mvhd")) {
            val version = bytes(j + 8) & 0xff
            version match {
              case 0 if csize >= 28 =>
                mvhd = Some((b.getInt(j + 20), b.getInt(j + 24).toLong & 0xffffffffL))
              case 1 if csize >= 40 =>
                mvhd = Some((b.getInt(j + 28), b.getLong(j + 32)))
              case _ => return None
            }
          } else if (ascii(j + 4, "trak")) {
            trakCodec(j + 8, j + csize) match {
              case Some(c) => codecs += c
              case None    => return None // malformed track = torn header
            }
          }
          j += csize
        }
        return mvhd.map { case (ts, dur) =>
          Media("video", 0, 0, 0, moovEnd, ts, dur, codecs.mkString(","))
        } // moov without mvhd is not a playable movie header
      }
      i += size
    }
    None
  }

  // ------------------------------------------------------------ EXIF

  /** Parsed EXIF metadata: camera make (IFD0 ASCII tag 0x010F),
    * orientation (0x0112), ISO speed (Exif-sub-IFD tag 0x8827 —
    * reached through the 0x8769 IFD pointer, the mechanism that makes
    * EXIF a WALK, not a flat scan), and the TIFF byte order the file
    * declared ("II" little / "MM" big). */
  final case class Exif(make: String, orientation: Int, iso: Int,
      endian: String)

  /** A real JPEG with a real EXIF APP1 segment: SOI + APP1("Exif\0\0"
    * + TIFF block) + SOF0. The TIFF block is written per spec in the
    * REQUESTED byte order — II and MM files both occur in the wild,
    * and a reader that hardcodes one silently corrupts every field of
    * the other — with IFD0 {Make(ASCII, out-of-line), Orientation
    * (SHORT, inline), ExifIFDPointer(LONG)} sorted by tag as the spec
    * demands, and the pointed-to Exif IFD carrying ISOSpeedRatings. */
  def exifJpegHeader(width: Int, height: Int, make: String,
      orientation: Int, iso: Int, littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad orientation $orientation")
    val makeBytes = make.getBytes("US-ASCII")
    val makeCount = makeBytes.length + 1            // ASCII count includes NUL
    val makePadded = makeCount + (makeCount & 1)    // word-align next IFD
    val tiffLen = 8 + 2 + 3 * 12 + 4 + makePadded + (2 + 12 + 4)
    val t = ByteBuffer.allocate(tiffLen)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    t.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    t.putShort(42).putInt(8)                        // magic + IFD0 offset
    val makeOff = 8 + 2 + 3 * 12 + 4                // string data after IFD0
    val exifIfdOff = makeOff + makePadded
    t.putShort(3)                                   // IFD0: 3 entries
    t.putShort(0x010f.toShort).putShort(2).putInt(makeCount).putInt(makeOff)
    t.putShort(0x0112.toShort).putShort(3).putInt(1)
    t.putShort(orientation.toShort).putShort(0)     // SHORT inline, 2B pad
    t.putShort(0x8769.toShort).putShort(4).putInt(1).putInt(exifIfdOff)
    t.putInt(0)                                     // no next IFD
    t.put(makeBytes).put(0.toByte)
    if ((makeCount & 1) == 1) t.put(0.toByte)
    t.putShort(1)                                   // Exif IFD: 1 entry
    t.putShort(0x8827.toShort).putShort(3).putInt(1)
    t.putShort(iso.toShort).putShort(0)
    t.putInt(0)
    val app1Payload = "Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ t.array()
    // exact size: SOI(2) + APP1 marker+len(4) + payload + SOF0(19 =
    // marker 2 + the 17-byte segment whose declared length includes
    // its own two length bytes) — over-allocating would leave a stray
    // zero byte between header and the content appended after it
    val b = ByteBuffer.allocate(2 + 4 + app1Payload.length + 19)
      .order(ByteOrder.BIG_ENDIAN)
    b.putShort(0xffd8.toShort)                      // SOI
    b.putShort(0xffe1.toShort)                      // APP1
    b.putShort((2 + app1Payload.length).toShort)
    b.put(app1Payload)
    b.putShort(0xffc0.toShort).putShort(17)         // SOF0, len 17
    b.put(8.toByte)
    b.putShort(height.toShort).putShort(width.toShort)
    b.put(3.toByte)
    for (c <- 1 to 3) { b.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    b.array()
  }

  /** Walk JPEG markers to the EXIF APP1 segment and parse its TIFF
    * block: declared byte order, magic 42, IFD0 entries (Make ASCII —
    * inline or via value offset — and Orientation), then FOLLOW the
    * 0x8769 pointer into the Exif sub-IFD for ISO. Any structural
    * violation (bad magic, entry/IFD out of the segment's bounds,
    * missing required tag) returns None — torn headers must be
    * detected, never misread. */
  def parseExif(bytes: Array[Byte]): Option[Exif] = {
    if (bytes.length < 4 || bytes(0) != 0xff.toByte || bytes(1) != 0xd8.toByte)
      return None
    var i = 2
    while (i + 4 <= bytes.length) {
      if (bytes(i) != 0xff.toByte) return None
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xff) { i += 1 }
      else if (marker == 0xd9 || marker == 0xda) return None
      else {
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > bytes.length) return None
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
            new String(bytes, i + 4, 4, "US-ASCII") == "Exif" &&
            bytes(i + 8) == 0 && bytes(i + 9) == 0)
          return parseTiff(bytes, i + 10, i + 2 + len)
        i += 2 + len
      }
    }
    None
  }

  /** The TIFF block of an EXIF APP1: `base` is the first byte of the
    * byte-order mark, `end` one past the segment. */
  private def parseTiff(bytes: Array[Byte], base: Int, end: Int): Option[Exif] = {
    if (base + 8 > end) return None
    val endian = new String(bytes, base, 2, "US-ASCII")
    val order = endian match {
      case "II" => ByteOrder.LITTLE_ENDIAN
      case "MM" => ByteOrder.BIG_ENDIAN
      case _    => return None
    }
    val b = ByteBuffer.wrap(bytes).order(order)
    def u16(off: Int): Int = b.getShort(off) & 0xffff
    def u32(off: Int): Long = b.getInt(off).toLong & 0xffffffffL
    if (u16(base + 2) != 42) return None
    // (tag → (type, count, valueFieldOffset)) of one IFD, or None on
    // any bound violation
    def ifd(off: Long): Option[Map[Int, (Int, Long, Int)]] = {
      val o = base + off
      if (o < base || o + 2 > end) return None
      val n = u16(o.toInt)
      if (o + 2 + n * 12 + 4 > end) return None
      Some((0 until n).map { k =>
        val e = (o + 2 + k * 12).toInt
        u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
      }.toMap)
    }
    def ascii(entry: (Int, Long, Int)): Option[String] = entry match {
      case (2, count, vf) if count >= 1 =>
        val off = if (count <= 4) vf.toLong - base else u32(vf)
        val lo = base + off
        if (lo < base || lo + count > end) None
        else Some(new String(bytes, lo.toInt, count.toInt - 1, "US-ASCII"))
      case _ => None
    }
    def short(entry: (Int, Long, Int)): Option[Int] = entry match {
      case (3, 1L, vf) => Some(u16(vf))
      case _           => None
    }
    for {
      ifd0 <- ifd(u32(base + 4))
      make <- ifd0.get(0x010f).flatMap(ascii)
      orientation <- ifd0.get(0x0112).flatMap(short)
      exifPtr <- ifd0.get(0x8769).collect { case (4, 1L, vf) => u32(vf) }
      exifIfd <- ifd(exifPtr)
      iso <- exifIfd.get(0x8827).flatMap(short)
    } yield Exif(make, orientation, iso, endian)
  }

  /** Sniff + parse: tries each container by signature. */
  def parse(bytes: Array[Byte]): Option[Media] =
    if (bytes == null) None
    else parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseWav(bytes))
      .orElse(parseMp4(bytes))

  // ------------------------------------------------------------- MP3

  final case class Mp3(title: String, artist: String, bitrateKbps: Int,
      sampleRate: Int, mode: String, headerLen: Int)

  /** MPEG-1 Layer III bitrate table (public spec, index 1–14; 0 is
    * free-format and 15 is forbidden — both rejected at parse). */
  private val mp3Bitrates = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  private val mp3SampleRates = Array(44100, 48000, 32000) // index 3 reserved
  private val mp3Modes = Array("stereo", "joint", "dual", "mono")

  private def syncsafe(n: Int): Array[Byte] = Array(
    ((n >>> 21) & 0x7f).toByte, ((n >>> 14) & 0x7f).toByte,
    ((n >>> 7) & 0x7f).toByte, (n & 0x7f).toByte)

  /** ID3v2.3 tag (TIT2 title + TPE1 artist, ISO-8859-1 frames with
    * plain 32-bit v2.3 frame sizes and the syncsafe tag size the spec
    * mandates) followed by one MPEG-1 Layer III frame header with the
    * requested bitrate/sample-rate/channel-mode bits. */
  def mp3Header(bitrateKbps: Int, sampleRate: Int, mode: String,
      title: String, artist: String): Array[Byte] = {
    val bi = mp3Bitrates.indexOf(bitrateKbps)
    val si = mp3SampleRates.indexOf(sampleRate)
    val mi = mp3Modes.indexOf(mode)
    require(bi >= 1, s"unsupported MPEG1-L3 bitrate $bitrateKbps")
    require(si >= 0, s"unsupported MPEG1 sample rate $sampleRate")
    require(mi >= 0, s"unsupported channel mode $mode")
    def frame(id: String, text: String): Array[Byte] = {
      val body = 0.toByte +: text.getBytes("ISO-8859-1") // encoding 0x00
      val b = ByteBuffer.allocate(10 + body.length)
      putAscii(b, id); b.putInt(body.length); b.putShort(0)
      b.put(body); b.array()
    }
    val frames = frame("TIT2", title) ++ frame("TPE1", artist)
    val b = ByteBuffer.allocate(10 + frames.length + 4)
    putAscii(b, "ID3"); b.put(3.toByte); b.put(0.toByte); b.put(0.toByte)
    b.put(syncsafe(frames.length))
    b.put(frames)
    // frame sync (11 bits) | MPEG1 (11) | Layer III (01) | no CRC (1)
    b.put(0xff.toByte); b.put(0xfb.toByte)
    b.put((((bi & 0xf) << 4) | ((si & 0x3) << 2)).toByte)
    b.put(((mi & 0x3) << 6).toByte)
    b.array()
  }

  /** Walk the ID3v2.3 tag (syncsafe tag size; per-frame plain 32-bit
    * sizes) collecting TIT2/TPE1, then decode the MPEG audio frame
    * header that must follow the tag. None on: bad magic, truncated
    * tag or frames, missing frame sync, non-MPEG1-Layer-III version/
    * layer bits, free-format (0) or forbidden (15) bitrate index,
    * reserved sample-rate index. */
  def parseMp3(bytes: Array[Byte]): Option[Mp3] = {
    if (bytes == null || bytes.length < 14) return None
    if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')) return None
    if (bytes(3) != 3) return None // ID3v2.3 only
    val b = ByteBuffer.wrap(bytes)
    val tagLen = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    val tagEnd = 10 + tagLen
    if (tagEnd + 4 > bytes.length) return None
    var off = 10
    var title: Option[String] = None
    var artist: Option[String] = None
    while (off + 10 <= tagEnd) {
      val id = new String(bytes, off, 4, "ISO-8859-1")
      val len = b.getInt(off + 4)
      if (len < 1 || off + 10 + len > tagEnd) return None
      val text = new String(bytes, off + 11, len - 1, "ISO-8859-1")
      if (id == "TIT2") title = Some(text)
      if (id == "TPE1") artist = Some(text)
      off += 10 + len
    }
    // MPEG frame header directly after the tag
    val h1 = bytes(tagEnd) & 0xff
    val h2 = bytes(tagEnd + 1) & 0xff
    if (h1 != 0xff || (h2 & 0xe0) != 0xe0) return None
    if (((h2 >> 3) & 0x3) != 0x3) return None // MPEG1
    if (((h2 >> 1) & 0x3) != 0x1) return None // Layer III
    val h3 = bytes(tagEnd + 2) & 0xff
    val bi = (h3 >> 4) & 0xf
    val si = (h3 >> 2) & 0x3
    if (bi == 0 || bi == 15 || si == 3) return None
    val mi = ((bytes(tagEnd + 3) & 0xff) >> 6) & 0x3
    for (t <- title; a <- artist)
      yield Mp3(t, a, mp3Bitrates(bi), mp3SampleRates(si), mp3Modes(mi),
        tagEnd + 4)
  }
}
