package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL codecs for the media containers a pure JVM can parse without
  * native libraries: RIFF/PCM-16 WAV audio, 24-bit BI_RGB BMP images,
  * and zlib-compressed PNG (8-bit grey/RGB/RGBA, non-interlaced — the
  * DEFLATE half is the JDK's own Inflater). These replace
  * `Multimodal.StubCodec` for payloads carrying their magic; formats
  * needing codecs the JVM doesn't ship (JPEG's DCT, mp3, h264) keep the
  * documented native-codec swap — but the container parsing, byte-order
  * handling, row padding, chunk walking, and PNG scanline unfiltering
  * here are the real thing, round-trip / reference-decoder tested.
  *
  * Both decoders fail loudly on malformed headers (a silent zero-fill
  * would poison downstream feature stats at scale).
  */
object RealCodec {

  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])
  final case class BmpImage(width: Int, height: Int, rgb: Array[Byte])

  def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

  def isBmp(payload: Array[Byte]): Boolean =
    payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M'

  /** Canonical 44-byte-header mono/stereo PCM-16 WAV. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "sample count must be a multiple of channels")
    val dataBytes = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking WAV parse: finds "fmt " and "data" wherever they sit
    * (real files interleave LIST/INFO chunks), requires PCM-16.
    */
  def decodeWavPcm16(payload: Array[Byte]): WavAudio = {
    require(isWav(payload), "not a RIFF/WAVE payload")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val p0 = buf.position()
          val fmt = buf.getShort
          require(fmt == 1, s"not PCM (format tag $fmt)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          require(bits == 16, s"only PCM-16 supported, got $bits-bit")
          buf.position(p0 + size + (size & 1)) // chunks are word-aligned
        case "data" =>
          require(size % 2 == 0, "odd PCM-16 data size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          if ((size & 1) == 1) buf.get()
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(sampleRate > 0 && channels > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    require(samples.length % channels == 0, "data size not a frame multiple")
    WavAudio(sampleRate, channels, samples)
  }

  /** 24-bit BI_RGB BMP: 14-byte file header + 40-byte info header,
    * bottom-up rows padded to 4-byte boundaries. `rgb` is row-major
    * top-down, 3 bytes/pixel in B,G,R order (the on-disk convention).
    */
  def encodeBmp24(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need width*height*3 bytes, got ${rgb.length} for ${width}x$height")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1)  // planes
      .putShort(24) // bpp
      .putInt(0)    // BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val pad = new Array[Byte](rowSize - width * 3)
    // bottom-up: last image row is written first
    for (y <- height - 1 to 0 by -1) {
      buf.put(rgb, y * width * 3, width * 3)
      buf.put(pad)
    }
    buf.array()
  }

  def decodeBmp24(payload: Array[Byte]): BmpImage = {
    require(isBmp(payload), "not a BMP payload")
    require(payload.length >= 54, "truncated BMP header")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(10)
    val dataOffset = buf.getInt
    val headerSize = buf.getInt
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val width = buf.getInt
    val height = buf.getInt
    require(width > 0 && height > 0, s"unsupported BMP dims ${width}x$height")
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 24, s"only 24-bit BI_RGB supported, got $bpp-bit")
    val compression = buf.getInt
    require(compression == 0, s"compressed BMP (type $compression) not supported")
    val rowSize = (width * 3 + 3) / 4 * 4
    require(payload.length >= dataOffset + rowSize * height, "truncated BMP pixel data")
    val rgb = new Array[Byte](width * height * 3)
    for (y <- 0 until height) {
      // rows are stored bottom-up
      val src = dataOffset + (height - 1 - y) * rowSize
      System.arraycopy(payload, src, rgb, y * width * 3, width * 3)
    }
    BmpImage(width, height, rgb)
  }

  // ---------- JPEG/GIF (via the JDK's bundled ImageIO codecs) ----------

  def isJpeg(payload: Array[Byte]): Boolean =
    payload.length >= 3 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
      (payload(2) & 0xff) == 0xff

  def isGif(payload: Array[Byte]): Boolean =
    payload.length >= 6 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8'

  /** Decode JPEG/GIF through `javax.imageio` — bundled JDK codecs, no
    * native libraries, so these formats do NOT need the stub swap point
    * either. (We hand-roll WAV/BMP/PNG because their containers are
    * simple enough to own outright; JPEG's entropy coding + DCT is what
    * the JDK codec is for.) Returns row-major RGB. Fails loudly on
    * payloads ImageIO rejects — a silent zero-fill would poison feature
    * stats downstream.
    */
  def decodeRgbWithImageIO(payload: Array[Byte]): PngImage = {
    // ImageIO reports corruption inconsistently (null OR IIOException);
    // normalize both to the same loud failure the other decoders throw
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(s"corrupt media payload: $e")
      }
    require(img != null, "ImageIO could not decode payload (corrupt or unsupported)")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val base = (y * w + x) * 3
        out(base) = ((px >> 16) & 0xff).toByte
        out(base + 1) = ((px >> 8) & 0xff).toByte
        out(base + 2) = (px & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PngImage(w, h, 3, out)
  }

  // ---------- PNG (compressed, zlib via the JDK's Inflater) ----------

  final case class PngImage(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  def isPng(payload: Array[Byte]): Boolean =
    payload.length >= 8 && (0 until 8).forall(i => payload(i) == pngSig(i))

  private[multimodal] def be32(a: Array[Byte], i: Int): Int =
    ((a(i) & 0xff) << 24) | ((a(i + 1) & 0xff) << 16) |
      ((a(i + 2) & 0xff) << 8) | (a(i + 3) & 0xff)

  /** Minimal conforming PNG encoder: filter-0 scanlines, one zlib IDAT
    * (JDK Deflater), CRC32 per chunk — the symmetric half of
    * [[decodePng]], and the generator behind q138's oracle-checked
    * round-trip. Decoders agree: ours, and the JDK's ImageIO (asserted
    * in MultimodalSpec).
    */
  def encodePng(
      pixels: Array[Byte], width: Int, height: Int, channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"channels must be 1/3/4, got $channels")
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val colorType = channels match { case 1 => 0; case 3 => 2; case _ => 6 }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    for (y <- 0 until height) {
      raw(y * (stride + 1)) = 0 // filter: None
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val idatOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      idatOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + data.length) // big-endian (PNG)
      b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII"))
      crc.update(data)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    pngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idatOut.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Chunk-walking PNG parse for the web baseline: 8-bit greyscale /
    * RGB / RGBA, non-interlaced. The "compressed formats need native
    * libs" boundary does NOT apply here — PNG's compression is zlib
    * DEFLATE, which the JDK ships (`java.util.zip.Inflater`), so the
    * whole decode (chunk walk → inflate → per-scanline unfilter with
    * all five spec filters incl. Paeth) is pure JVM. Palette, 16-bit,
    * and interlaced images fail loudly (the documented swap point
    * remains for those and for JPEG/video).
    */
  def decodePng(payload: Array[Byte]): PngImage = {
    require(isPng(payload), "not a PNG (bad signature)")
    var off = 8
    var width = -1
    var height = -1
    var bitDepth = -1
    var colorType = -1
    var seenIhdr = false
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(off + 8 <= payload.length, "truncated PNG (no IEND)")
      val len = be32(payload, off)
      val typ = new String(payload, off + 4, 4, "US-ASCII")
      require(len >= 0 && off + 8 + len + 4 <= payload.length,
        s"truncated PNG chunk $typ")
      // the spec's integrity contract: CRC32 over type+data must equal
      // the stored trailer — without this, a bit-flipped IHDR/IDAT that
      // still inflates to the right length decodes silently into wrong
      // pixel stats (the encoder emits these; the decoder must check)
      val crc = new java.util.zip.CRC32()
      crc.update(payload, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(payload, off + 8 + len),
        f"PNG chunk $typ CRC mismatch (stored 0x${be32(payload, off + 8 + len)}%08x, computed 0x${crc.getValue.toInt}%08x)")
      typ match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          width = be32(payload, off + 8)
          height = be32(payload, off + 12)
          bitDepth = payload(off + 16) & 0xff
          colorType = payload(off + 17) & 0xff
          require((payload(off + 18) & 0xff) == 0, "unknown compression method")
          require((payload(off + 19) & 0xff) == 0, "unknown filter method")
          require((payload(off + 20) & 0xff) == 0, "interlaced PNG unsupported")
          seenIhdr = true
        case "IDAT" => idat.write(payload, off + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) skipped
      }
      off += 8 + len + 4 // length + type + data + crc
    }
    require(seenIhdr && width > 0 && height > 0, "missing/invalid IHDR")
    require(bitDepth == 8, s"unsupported bit depth $bitDepth (8 required)")
    val channels = colorType match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 6 => 4 // truecolor + alpha
      case t => throw new IllegalArgumentException(
        s"unsupported PNG color type $t (greyscale/RGB/RGBA required)")
    }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0, "truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length,
      s"IDAT inflated to $got bytes, expected ${raw.length}")
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val rawB = raw(rowIn + x) & 0xff
        val left = if (x >= channels) out(rowOut + x - channels) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val ul =
          if (y > 0 && x >= channels) out(rowOut - stride + x - channels) & 0xff
          else 0
        val rec = filter match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            rawB + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case f =>
            throw new IllegalArgumentException(s"bad scanline filter $f at row $y")
        }
        out(rowOut + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PngImage(width, height, channels, out)
  }
}
