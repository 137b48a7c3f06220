package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val media = Multimodal.mediaFromDocuments(docs)

  test("media schema: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == docs.count())
    // kind partitions by id mod 3
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
  }

  test("feature extraction: mean intensity equals driver-side recompute") {
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.take(20).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val f = feats(id)
      assert(f.payload_bytes == bytes.length)
      assert(math.abs(f.mean_intensity - bytes.sum.toDouble / bytes.length) < 1e-9)
      assert(f.histogram.sum == bytes.length)
    }
  }

  test("frame sampling: every 4th frame, correct count") {
    val sampled = Multimodal.sampleFrames(media, 4).collect()
    assert(sampled.nonEmpty)
    sampled.take(10).foreach { r =>
      val ids = r.getSeq[Int](2)
      assert(ids.zipWithIndex.forall { case (f, i) => f == i * 4 })
      assert(r.getInt(1) == ids.length)
    }
  }

  test("resize plan preserves aspect ratio and respects maxDim") {
    val plans = Multimodal.resizePlan(media, maxDim = 64).collect()
    assert(plans.nonEmpty)
    plans.foreach { r =>
      val (w, h, tw, th) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(tw <= 64 && th <= 64)
      if (w <= 64 && h <= 64) assert(tw == w && th == h)
    }
  }

  test("stub codec contract: the swap point's documented behavior is pinned") {
    // a real codec replaces StubCodec.decode with the surrounding
    // dataflow unchanged; this pins the contract a drop-in swap must
    // honor — samples in [0, 255], one sample per payload unit (the stub
    // is byte-identity; a real decode keeps the per-unit shape), total
    // determinism across calls, and empty-payload safety
    val payload = Array[Byte](0, 127, -1, -128, 64)
    val out1 = Multimodal.StubCodec.decode(payload)
    val out2 = Multimodal.StubCodec.decode(payload.clone())
    assert(out1.toSeq == Seq(0, 127, 255, 128, 64), "unsigned byte identity")
    assert(out1.toSeq == out2.toSeq, "decode must be deterministic")
    assert(out1.forall(s => s >= 0 && s <= 255), "samples bounded to [0,255]")
    assert(Multimodal.StubCodec.decode(Array.empty[Byte]).isEmpty,
      "empty payload decodes to no samples, not an error")
  }

  test("feature extraction is a narrow transform (no shuffle in plan)") {
    val plan = Multimodal.extractFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("WAV codec: PCM-16 round-trips bit-exactly, incl. negative samples and stereo") {
    val rnd = new scala.util.Random(42)
    val mono = Array.fill(1001)(rnd.nextInt(65536) - 32768).map(_.toShort)
    val a = RealCodec.decodeWavPcm16(RealCodec.encodeWavPcm16(mono, 16000))
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.samples.toSeq == mono.toSeq)
    val stereo = Array.fill(400)(rnd.nextInt(65536) - 32768).map(_.toShort)
    val b = RealCodec.decodeWavPcm16(RealCodec.encodeWavPcm16(stereo, 44100, channels = 2))
    assert(b.sampleRate == 44100 && b.channels == 2)
    assert(b.samples.toSeq == stereo.toSeq)
  }

  test("WAV codec: chunk walking skips unknown chunks before fmt/data") {
    val samples = Array[Short](1, -2, 300)
    val std = RealCodec.encodeWavPcm16(samples, 8000)
    // splice a LIST chunk between WAVE and fmt — real files do this
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = std.take(12) ++ extra ++ std.drop(12)
    java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(spliced.length - 8)
    val a = RealCodec.decodeWavPcm16(spliced)
    assert(a.sampleRate == 8000 && a.samples.toSeq == samples.toSeq)
  }

  test("BMP codec: multi-row images round-trip through bottom-up padded storage") {
    val rnd = new scala.util.Random(7)
    // width 3 → row stride 12 with 3 pad bytes: exercises padding AND
    // row order (asymmetric content would betray a flipped image)
    for (w <- 1 to 5; h <- Seq(1, 3)) {
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = RealCodec.decodeBmp24(RealCodec.encodeBmp24(rgb, w, h))
      assert(img.width == w && img.height == h, s"${w}x$h dims")
      assert(img.rgb.toSeq == rgb.toSeq, s"${w}x$h pixels")
    }
  }

  test("codecs reject malformed payloads loudly") {
    intercept[IllegalArgumentException] {
      RealCodec.decodeWavPcm16("RIFFxxxxWAVE".getBytes("US-ASCII") ++ Array[Byte](1, 2))
    }
    intercept[IllegalArgumentException] {
      RealCodec.decodeBmp24(Array[Byte]('B', 'M', 0, 0, 0))
    }
    // a data chunk whose declared size overruns the payload must not
    // silently truncate
    val good = RealCodec.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    intercept[IllegalArgumentException] {
      RealCodec.decodeWavPcm16(good.dropRight(2))
    }
  }

  test("real media table carries genuine containers; features match a driver recompute") {
    val m = Multimodal.realMediaFromDocuments(spark, docs.limit(30))
    val rows = m.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      if (r.getAs[String]("kind") == "audio") assert(RealCodec.isWav(payload))
      else assert(RealCodec.isBmp(payload))
    }
    val feats = Multimodal.extractRealFeatures(spark, m)
      .orderBy("media_id").collect()
    val texts = docs.limit(30).select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect().toMap
    feats.foreach { f =>
      val bytes = texts(f.getAs[Long]("media_id")).getBytes("UTF-8")
      val vals =
        if (f.getAs[String]("kind") == "audio") bytes.map(_ & 0xff)
        else bytes.take(bytes.length / 3 * 3).map(_ & 0xff)
      val mean = vals.map(_.toLong).sum.toDouble / vals.length
      assert(math.abs(f.getAs[Double]("mean_intensity") - mean) < 1e-9)
    }
  }

  test("PNG decode == ImageIO reference on RGB / RGBA / greyscale, all filter paths") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import java.io.ByteArrayOutputStream
    val rnd = new scala.util.Random(42)

    def encode(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out), "JDK PNG writer unavailable")
      out.toByteArray
    }

    // RGB: gradients + noise exercise Sub/Up/Average/Paeth filters the
    // encoder picks per row; pixel-exact equality against getRGB
    val w = 37; val h = 23 // odd sizes catch stride bugs
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7 + y) % 256; val g = (y * 11) % 256
      val b = rnd.nextInt(256)
      rgb.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val decoded = RealCodec.decodePng(encode(rgb))
    assert(decoded.width == w && decoded.height == h && decoded.channels == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val px = rgb.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((decoded.pixels(base) & 0xff) == ((px >> 16) & 0xff), s"R at ($x,$y)")
      assert((decoded.pixels(base + 1) & 0xff) == ((px >> 8) & 0xff), s"G at ($x,$y)")
      assert((decoded.pixels(base + 2) & 0xff) == (px & 0xff), s"B at ($x,$y)")
    }

    // RGBA: alpha channel survives
    val rgba = new BufferedImage(8, 5, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 5; x <- 0 until 8)
      rgba.setRGB(x, y, (((x * 31 + y * 17) % 256) << 24) | (x << 16) | (y << 8) | 200)
    val d4 = RealCodec.decodePng(encode(rgba))
    assert(d4.channels == 4)
    for (y <- 0 until 5; x <- 0 until 8) {
      val px = rgba.getRGB(x, y)
      val base = (y * 8 + x) * 4
      assert((d4.pixels(base + 3) & 0xff) == ((px >> 24) & 0xff), s"A at ($x,$y)")
    }

    // greyscale
    val grey = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 6)
      grey.getRaster.setSample(x, y, 0, (x * 40 + y * 13) % 256)
    val d1 = RealCodec.decodePng(encode(grey))
    assert(d1.channels == 1)
    for (y <- 0 until 4; x <- 0 until 6)
      assert((d1.pixels(y * 6 + x) & 0xff) == grey.getRaster.getSample(x, y, 0),
        s"grey at ($x,$y)")

    // malformed payloads fail loudly
    intercept[IllegalArgumentException] {
      RealCodec.decodePng("nonsense bytes".getBytes)
    }
    val truncated = encode(rgb).take(60)
    intercept[IllegalArgumentException] { RealCodec.decodePng(truncated) }
  }

  test("PNG encoder round-trips through BOTH decoders (ours and ImageIO)") {
    val rnd = new scala.util.Random(7)
    for (channels <- Seq(1, 3, 4)) {
      val (w, h) = (13, 9)
      val px = Array.fill(w * h * channels)(rnd.nextInt(256).toByte)
      val png = RealCodec.encodePng(px, w, h, channels)
      // our decoder: exact round-trip
      val back = RealCodec.decodePng(png)
      assert(back.width == w && back.height == h && back.channels == channels)
      assert(back.pixels.sameElements(px), s"round-trip mismatch at $channels ch")
      // the JDK's independent decoder accepts our container + CRCs
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"ImageIO rejected our $channels-channel PNG")
      assert(img.getWidth == w && img.getHeight == h)
      // spot-check pixel values through ImageIO for the RGB case
      if (channels == 3) {
        for (y <- 0 until h; x <- 0 until w) {
          val base = (y * w + x) * 3
          val want = ((px(base) & 0xff) << 16) |
            ((px(base + 1) & 0xff) << 8) | (px(base + 2) & 0xff)
          assert((img.getRGB(x, y) & 0xffffff) == want, s"ImageIO pixel ($x,$y)")
        }
      }
    }
  }

  test("JPEG/GIF route through the JDK codec path, not the stub") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import java.io.ByteArrayOutputStream
    // flat mid-grey: JPEG is lossy but preserves a uniform field closely,
    // so the decoded mean must sit near 128, never at the stub's value
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", out), "JDK JPEG writer unavailable")
    val jpeg = out.toByteArray
    assert(RealCodec.isJpeg(jpeg))
    val decoded = RealCodec.decodeRgbWithImageIO(jpeg)
    assert(decoded.width == 16 && decoded.height == 16 && decoded.channels == 3)
    val mean = decoded.pixels.map(_ & 0xff).map(_.toLong).sum.toDouble /
      decoded.pixels.length
    assert(math.abs(mean - 128.0) < 3.0, s"JPEG mid-grey mean drifted: $mean")

    // end-to-end: the Spark feature path dispatches on the JPEG magic
    val media = Seq((1L, "image", jpeg)).toDF("media_id", "kind", "payload")
    val f = Multimodal.extractRealFeatures(spark, media).head()
    assert(f.getAs[Int]("dim") == 16, "dim must be the DECODED width")
    assert(math.abs(f.getAs[Double]("mean_intensity") - mean) < 1e-9)

    // corrupt payload with a JPEG magic fails loudly
    intercept[IllegalArgumentException] {
      RealCodec.decodeRgbWithImageIO(
        Array(0xff, 0xd8, 0xff, 0x00, 0x11, 0x22).map(_.toByte))
    }

    // GIF: our RGB extraction equals ImageIO's own re-read of the same
    // bytes, pixel for pixel. (The JDK GIF *writer* itself is lossy on
    // small palettes — its own round-trip diverges from the source — so
    // the contract here is plumbing equality with the reference reader,
    // same as the JPEG path.)
    val gifImg = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      gifImg.setRGB(x, y, if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff)
    val gifOut = new ByteArrayOutputStream()
    assert(ImageIO.write(gifImg, "gif", gifOut), "JDK GIF writer unavailable")
    val gif = gifOut.toByteArray
    assert(RealCodec.isGif(gif))
    val gifDec = RealCodec.decodeRgbWithImageIO(gif)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(gif))
    for (y <- 0 until 4; x <- 0 until 4) {
      val base = (y * 4 + x) * 3
      val px = ref.getRGB(x, y)
      assert((gifDec.pixels(base) & 0xff) == ((px >> 16) & 0xff) &&
        (gifDec.pixels(base + 1) & 0xff) == ((px >> 8) & 0xff) &&
        (gifDec.pixels(base + 2) & 0xff) == (px & 0xff), s"GIF pixel ($x,$y)")
    }
  }

  test("PNG decode rejects a chunk whose stored CRC32 does not match") {
    // corrupt the stored CRC ITSELF (last 4 bytes = IEND's trailer):
    // the payload still parses, inflates, and unfilters perfectly — the
    // ONLY thing wrong is the integrity trailer, which is exactly the
    // bit-flip class that used to decode silently into accepted pixels
    val good = RealCodec.encodePng(
      Array.tabulate(12 * 3)(i => (i * 7).toByte), 12, 1, 3)
    assert(RealCodec.decodePng(good).width == 12, "baseline decodes")
    val flippedCrc = good.clone()
    flippedCrc(flippedCrc.length - 1) = (flippedCrc.last ^ 0x01).toByte
    val e1 = intercept[IllegalArgumentException](RealCodec.decodePng(flippedCrc))
    assert(e1.getMessage.contains("CRC mismatch"), e1.getMessage)
    // and a flipped DATA bit (IHDR width byte) is caught by the CRC
    // check before the bogus geometry can propagate
    val flippedData = good.clone()
    flippedData(19) = (flippedData(19) ^ 0x01).toByte // IHDR width LSB
    val e2 = intercept[IllegalArgumentException](RealCodec.decodePng(flippedData))
    assert(e2.getMessage.contains("CRC mismatch"), e2.getMessage)
  }

  test("dispatch contract: the stub leg is reached ONLY for unknown magic, deterministically") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import java.io.ByteArrayOutputStream
    // one payload per real-codec leg + one with no known magic
    val wav = RealCodec.encodeWavPcm16(Array[Short](100, -100, 3000), 8000)
    val bmp = RealCodec.encodeBmp24(Array.tabulate(6 * 3)(i => i.toByte), 6, 1)
    val png = RealCodec.encodePng(Array.tabulate(5)(i => (40 * i).toByte), 5, 1, 1)
    val img = new BufferedImage(7, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 7) img.setRGB(x, y, 0x406080)
    val jOut = new ByteArrayOutputStream(); ImageIO.write(img, "jpg", jOut)
    val gOut = new ByteArrayOutputStream(); ImageIO.write(img, "gif", gOut)
    val mp3 = ContainerCodec.encodeMp3Frames("payload-bytes".getBytes("US-ASCII"))
    val mp4 = ContainerCodec.encodeMp4("frames".getBytes("US-ASCII"),
      width = 320, height = 240, timescale = 600L, duration = 42L)
    val unknown = "OPAQ rest-of-an-unknown-codec-payload".getBytes("ISO-8859-1")
    assert(!RealCodec.isWav(unknown) && !RealCodec.isBmp(unknown) &&
      !RealCodec.isPng(unknown) && !RealCodec.isJpeg(unknown) &&
      !RealCodec.isGif(unknown) && !ContainerCodec.isMp3(unknown) &&
      !ContainerCodec.isMp4(unknown), "test payload must carry no known magic")
    val media = Seq(
      (1L, "audio", wav), (2L, "image", bmp), (3L, "image", png),
      (4L, "image", jOut.toByteArray), (5L, "image", gOut.toByteArray),
      (6L, "audio", unknown), (7L, "audio", mp3), (8L, "video", mp4))
      .toDF("media_id", "kind", "payload")
    def run() = Multimodal.extractRealFeatures(spark, media)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getDouble(4))).toMap
    val f = run()
    // every known-magic payload takes a REAL decode leg: dim is the
    // parsed header geometry (width / sample rate), never the stub's 0
    assert(f(1L)._1 == 8000 && f(2L)._1 == 6 && f(3L)._1 == 5 &&
      f(4L)._1 == 7 && f(5L)._1 == 7 && f(7L)._1 == 44100 && f(8L)._1 == 320,
      s"known container routed to the stub: $f")
    // the unknown payload — and ONLY it — takes the stub leg: dim 0 and
    // the stub's documented byte-identity mean
    val stubMean = unknown.map(_ & 0xff).map(_.toLong).sum.toDouble / unknown.length
    assert(f(6L)._1 == 0 && math.abs(f(6L)._2 - stubMean) < 1e-12,
      s"stub leg contract violated: ${f(6L)}")
    // deterministic: a future JNI codec swap must be provably drop-in,
    // so the current dispatch must give the same bytes-in → values-out
    // on every run
    assert(run() == f, "dispatch must be deterministic across runs")
  }

  test("MP3 container: frame walk recovers rate/bitrate/frames and the payload region") {
    val data = Array.tabulate(1000)(i => (i % 251).toByte)
    val mp3 = ContainerCodec.encodeMp3Frames(data)
    // 1000 bytes over 413-byte frame capacity -> 3 frames of 417 bytes
    assert(mp3.length == 3 * 417)
    val info = ContainerCodec.parseMp3(mp3)
    assert(info.sampleRate == 44100 && info.bitrate == 128000 && info.nFrames == 3)
    // payload region = source bytes + zero padding to the frame grid
    assert(info.dataBytes.length == 3 * 413)
    assert(info.dataBytes.take(1000).sameElements(data))
    assert(info.dataBytes.drop(1000).forall(_ == 0))
    // an ID3v2-tagged stream parses identically (tag skipped)
    val tagBody = "some-tag-frames".getBytes("US-ASCII")
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0,
      0, 0, (tagBody.length >> 7).toByte, (tagBody.length & 0x7f).toByte) ++
      tagBody ++ mp3
    val tagged = ContainerCodec.parseMp3(id3)
    assert(tagged.nFrames == 3 && tagged.sampleRate == 44100 &&
      tagged.dataBytes.sameElements(info.dataBytes))
    // malformed: truncated final frame, lost sync, reserved bitrate
    intercept[IllegalArgumentException](ContainerCodec.parseMp3(mp3.dropRight(1)))
    val badSync = mp3.clone(); badSync(417) = 0x00
    intercept[IllegalArgumentException](ContainerCodec.parseMp3(badSync))
    val badRate = mp3.clone(); badRate(2) = 0xf0.toByte // bitrate index 15
    intercept[IllegalArgumentException](ContainerCodec.parseMp3(badRate))
    // empty input still yields one valid (zero-padded) frame
    val empty = ContainerCodec.parseMp3(ContainerCodec.encodeMp3Frames(Array.empty))
    assert(empty.nFrames == 1 && empty.dataBytes.forall(_ == 0))
  }

  test("MP4 container: box walk recovers timing/geometry/mdat; malformed boxes fail loudly") {
    val data = "h264-bitstream-stand-in".getBytes("US-ASCII")
    val mp4 = ContainerCodec.encodeMp4(data, width = 640, height = 360,
      timescale = 600L, duration = 1234L)
    val info = ContainerCodec.parseMp4(mp4)
    assert(info.timescale == 600L && info.duration == 1234L)
    assert(info.width == 640 && info.height == 360)
    assert(info.mdat.sameElements(data))
    // a box whose declared size overruns its container must not parse
    val overrun = mp4.clone()
    overrun(0) = 0x7f // ftyp size becomes enormous
    intercept[IllegalArgumentException](ContainerCodec.parseMp4(overrun))
    // geometry must come from tkhd: corrupting the fixed-point width
    // field changes the parsed width exactly (16.16 shift honored)
    val half = ContainerCodec.parseMp4(ContainerCodec.encodeMp4(
      data, width = 320, height = 360, timescale = 600L, duration = 1L))
    assert(half.width == 320)
    // truncated payload (mdat cut) fails rather than returning a
    // shorter movie
    intercept[IllegalArgumentException](
      ContainerCodec.parseMp4(mp4.dropRight(1)))
  }

  test("audioStats: hand-computed DSP values on crafted signals; decoded == source-derived") {
    // square-ish wave [0,100,0,100]: mean 50, every step crosses it
    val sq = RealCodec.encodeWavPcm16(Array[Short](0, 100, 0, 100), 16000)
    // constant [5,5,5]: zero crossings, rms = value exactly
    val flat = RealCodec.encodeWavPcm16(Array[Short](5, 5, 5), 16000)
    val df = Seq((1L, "audio", sq), (2L, "audio", flat), (3L, "image", sq))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.audioStats(spark, df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // rms(sq) = 1e6*sqrt((0+1e4+0+1e4)/4) = round(70710678.1...)
    assert(got(1L) == ((4L, 70710678L, 1000000L, 100L, 0L, 250L)), s"$got")
    assert(got(2L) == ((3L, 5000000L, 0L, 5L, 5L, 187L)), s"$got")
    assert(!got.contains(3L), "non-audio rows must be excluded")
    // real corpus rows: stats recomputed from the SOURCE bytes must
    // equal stats computed from the DECODED samples (the q148 contract)
    val m = Multimodal.realMediaFromDocuments(spark, docs.limit(20))
    val stats = Multimodal.audioStats(spark, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = docs.limit(20).select("doc_id", "text").collect()
      .filter(_.getLong(0) % 2 == 0)
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8").map(b => (b & 0xff).toLong)
        val n = bytes.length.toLong
        val rms = math.round(1000000.0 * math.sqrt(
          bytes.map(v => v * v).sum.toDouble / n))
        r.getLong(0) -> (n, rms)
      }.toMap
    assert(stats == src, "decoded-sample stats diverged from source bytes")
  }

  test("imageDHash: identical images hash equal; planted bump flips ≤2 bits") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
    val media = Multimodal.syntheticImagesFromDocuments(spark, docs)
    val hashes = Multimodal.imageDHash(spark, media).collect()
      .map(r => r.getLong(0) -> Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    def ham(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    // same base, neither bumped → identical images → identical hashes
    val plain = hashes.keys.filter(_ % 3 != 0).toSeq.groupBy(_ % 40)
    plain.values.filter(_.size >= 2).foreach { ids =>
      val hs = ids.map(hashes)
      assert(hs.forall(h => ham(h, hs.head) == 0), s"same-base ids $ids hash apart")
    }
    // bumped doc vs an unbumped same-base sibling: one pixel affects at
    // most the two comparisons that read it → ≤2 dHash bits
    for {
      bumped <- hashes.keys.filter(_ % 3 == 0)
      sibling <- plain.getOrElse(bumped % 40, Seq.empty).headOption
    } assert(ham(hashes(bumped), hashes(sibling)) <= 2,
      s"bump flipped >2 bits: $bumped vs $sibling")
  }

  test("imageNearDupPairs: banded join equals brute-force all-pairs (pigeonhole)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
    val media = Multimodal.syntheticImagesFromDocuments(spark, docs)
    val hashDf = Multimodal.imageDHash(spark, media)
    val got = Multimodal.imageNearDupPairs(spark, hashDf, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashDf.collect()
      .map(r => r.getLong(0) -> Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = ha.zip(hb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute, "banded pairs diverge from brute-force Hamming")
    assert(brute.nonEmpty, "test corpus planted no near-dup image pairs")
  }
}
