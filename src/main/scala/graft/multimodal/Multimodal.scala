package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, plus batched
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema (binary payload + metadata struct),
  * partition-parallel batched processing via typed mapPartitions, feature
  * schema out — is real and tested. The codec layer is REAL everywhere a
  * pure JVM can be: `RealCodec` parses RIFF/PCM-16 WAV, 24-bit BI_RGB
  * BMP, and PNG (zlib + scanline filters) natively, JPEG/GIF through the
  * JDK's bundled ImageIO, and `ContainerCodec` walks MP3 frame streams
  * and ISO-BMFF (MP4) box trees for rates/frame counts/geometry/payload
  * regions — all dispatched on container magic. The ONLY stubbed step is
  * the entropy decode of MP3/H.264 payload bytes (and any unknown
  * format), which routes to the clearly-marked deterministic `StubCodec`:
  * this container has no native media libraries, so a real deployment
  * swaps that one decode call (e.g. JNI ffmpeg) with the surrounding
  * dataflow — container walk included — unchanged.
  *
  * Scale notes: payloads never pass through a shuffle — decode/feature
  * extraction are narrow (per-partition) transforms pipelined onto the
  * scan; only the small feature vectors/metadata flow onward. Partition
  * sizing for 100 TB of media = spark.sql.files.maxPartitionBytes on the
  * parquet side; one task decodes one batch of files.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      payload_bytes: Int,
      mean_intensity: Double,
      histogram: Array[Long])

  /** Derive a deterministic media table from `documents`: payload = UTF-8
    * bytes of the text (stand-in for encoded media), kind/meta derived
    * from id and length. Purely for exercising the pipeline on driver
    * testdata.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("n_chars"), lit(640)) + 16).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + 16).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (pmod(col("n_chars"), lit(240)) + 1).cast("int").as("nFrames")).as("meta"))

  /** STUB decode: a real implementation would turn `payload` into pixel/
    * sample arrays here (JNI libjpeg/ffmpeg). The deterministic fake
    * treats payload bytes as "samples" so downstream feature math is
    * real, batched, and reproducible.
    */
  object StubCodec {
    def decode(payload: Array[Byte]): Array[Int] =
      payload.map(b => (b & 0xff)) // ??? real codec goes here
  }

  /** Batched per-partition decode + feature extraction: 16-bin intensity
    * histogram and mean intensity. Typed mapPartitions — one decode batch
    * per partition, no shuffle.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val samples = StubCodec.decode(payload)
          val hist = new Array[Long](16)
          var sum = 0L
          samples.foreach { s => hist(s / 16) += 1; sum += s }
          val mean = if (samples.isEmpty) 0.0 else sum.toDouble / samples.length
          MediaFeatures(id, kind, payload.length, mean, hist)
        }
      }
  }

  /** REAL-container media table from `documents`: even doc_ids become
    * genuine RIFF/PCM-16 WAV payloads (one 0..255 sample per text byte,
    * 16 kHz), odd doc_ids genuine 24-bit BMP payloads (a 1-row image of
    * the first 3·⌊nb/3⌋ text bytes). The payloads are REAL files — any
    * external WAV/BMP reader parses them — so decode below is a real
    * container parse, not a stub. Narrow typed map; payloads never
    * shuffle.
    */
  def realMediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          if (id % 2 == 0) {
            val samples = bytes.map(b => (b & 0xff).toShort)
            (id, "audio", RealCodec.encodeWavPcm16(samples, sampleRate = 16000))
          } else {
            val w = bytes.length / 3
            require(w > 0, s"doc $id too short to image-encode (${bytes.length} bytes)")
            (id, "image", RealCodec.encodeBmp24(bytes.take(w * 3), w, 1))
          }
        }
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Real COMPRESSED-container media table: even doc_ids become genuine
    * CBR MP3 frame streams (128 kbps / 44.1 kHz headers carrying the
    * text bytes as frame payload), odd doc_ids genuine ISO-BMFF MP4
    * trees (ftyp·moov(mvhd·trak(tkhd))·mdat, geometry/duration derived
    * from n_chars, text bytes as mdat). The CONTAINERS are spec-true —
    * external walkers report the same rates/frame counts/geometry — and
    * only their entropy decode (Huffman audio / H.264) is the stub step.
    */
  def containerMediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text", "n_chars").as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, text, nChars) =>
          val bytes = text.getBytes("UTF-8")
          if (id % 2 == 0)
            (id, "audio", ContainerCodec.encodeMp3Frames(bytes))
          else
            (id, "video", ContainerCodec.encodeMp4(bytes,
              width = (nChars % 640 + 16).toInt,
              height = (nChars % 480 + 16).toInt,
              timescale = 600L,
              duration = nChars % 240 + 1))
        }
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Real-codec feature extraction: dispatch on container magic — WAV →
    * chunk-walking PCM parse, BMP → padded bottom-up pixel parse,
    * PNG/JPEG/GIF → pixel decode, MP3/MP4 → REAL container walk
    * (headers/boxes parsed; the frame/mdat entropy decode is the one
    * remaining stub step), else the stub. `dim` = sample rate (audio) /
    * width (image, video): decoded from the CONTAINER HEADER, so the
    * oracle cross-checks the real parse, not a metadata echo.
    */
  def extractRealFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (dim, values) =
            if (RealCodec.isWav(payload)) {
              val a = RealCodec.decodeWavPcm16(payload)
              (a.sampleRate, a.samples.map(_.toInt))
            } else if (RealCodec.isBmp(payload)) {
              val img = RealCodec.decodeBmp24(payload)
              (img.width, img.rgb.map(b => b & 0xff))
            } else if (RealCodec.isPng(payload)) {
              val img = RealCodec.decodePng(payload)
              (img.width, img.pixels.map(b => b & 0xff))
            } else if (RealCodec.isJpeg(payload) || RealCodec.isGif(payload)) {
              val img = RealCodec.decodeRgbWithImageIO(payload)
              (img.width, img.pixels.map(b => b & 0xff))
            } else if (ContainerCodec.isMp4(payload)) {
              // REAL ISO-BMFF box walk (geometry/timing from moov);
              // the mdat entropy decode is the remaining stubbed step
              val m = ContainerCodec.parseMp4(payload)
              (m.width, m.mdat.map(b => b & 0xff))
            } else if (ContainerCodec.isMp3(payload)) {
              // REAL MPEG frame walk (rate/bitrate/frame count from
              // headers); the frame-payload Huffman decode is the
              // remaining stubbed step
              val m = ContainerCodec.parseMp3(payload)
              (m.sampleRate, m.dataBytes.map(b => b & 0xff))
            } else (0, StubCodec.decode(payload))
          val mean = if (values.isEmpty) 0.0
            else values.foldLeft(0L)(_ + _).toDouble / values.length
          (id, kind, payload.length, dim, mean)
        }
      }
      .toDF("media_id", "kind", "payload_bytes", "dim", "mean_intensity")
  }

  /** Audio-analysis primitives over the DECODED PCM stream of each WAV
    * row: RMS level (micro-units), MEAN-crossing rate (ppm of
    * inter-sample steps — the dominant-frequency proxy; computed
    * against the mean, not zero, so it is meaningful for unsigned /
    * DC-offset material), peak/trough sample values, and duration.
    * The real content-based audio triage pass (silence/clipping/tone
    * detection) a multimodal pipeline gates on.
    *
    * Exact-integer construction so the oracle can replay every value
    * from the SOURCE bytes while this side computes from the DECODED
    * samples — any decode defect (endianness, chunk offset, stride)
    * hash-fails: Σv and Σv² are exact long sums; a mean crossing at
    * step i is sign((n·vᵢ − Σv)) ≠ sign((n·vᵢ₊₁ − Σv)) with both
    * strictly nonzero — no division, no float mean; only the final RMS
    * takes one sqrt on the exact (Σv², n) pair and quantizes.
    *
    * Scale shape: narrow mapPartitions over payload rows — payloads
    * never shuffle; output is a handful of longs per row.
    */
  def audioStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val a = RealCodec.decodeWavPcm16(payload)
          val s = a.samples
          val n = s.length.toLong
          var sumv = 0L
          var sumsq = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong; sumv += v; sumsq += v * v; i += 1
          }
          var mcr = 0L
          i = 0
          while (i < s.length - 1) {
            // n·v ≤ ~2^31·2^15 and the product of two such deltas fits a
            // long only because payloads here are bounded; for arbitrary
            // inputs compare signs, don't multiply
            val d0 = n * s(i) - sumv
            val d1 = n * s(i + 1) - sumv
            if ((d0 < 0 && d1 > 0) || (d0 > 0 && d1 < 0)) mcr += 1
            i += 1
          }
          var peak = Long.MinValue
          var trough = Long.MaxValue
          s.foreach { v => peak = math.max(peak, v); trough = math.min(trough, v) }
          val rmsMicro =
            if (n == 0) 0L else math.round(1000000.0 * math.sqrt(sumsq.toDouble / n))
          val mcrPpm = if (n >= 2) 1000000L * mcr / (n - 1) else 0L
          (id, n, rmsMicro, mcrPpm,
            if (n == 0) 0L else peak, if (n == 0) 0L else trough,
            if (a.sampleRate > 0) 1000000L * n / a.sampleRate else 0L)
        }
      }
      .toDF("media_id", "n_samples", "rms_micro", "mcr_ppm",
        "peak", "trough", "duration_us")
  }

  /** Robust audio fingerprint over DECODED PCM: frame the sample stream
    * into fixed `frameSamples` windows, take each frame's exact integer
    * energy (Σ s²), and emit up to `maxBits` sign-of-energy-delta bits
    * (bit f = 1 iff energy rises from frame f to f+1) packed into one
    * long — the Shazam-family energy-difference fingerprint reduced to
    * its integer-exact core: invariant to uniform gain DIRECTION
    * changes, cheap to band-join (the q150 Hamming machinery applies),
    * and bit-identical on any engine because nothing is ever a float.
    * The trailing partial frame is dropped (deterministic framing).
    *
    * Scale shape: narrow mapPartitions — payloads never shuffle; one
    * (id, n_frames, fp) row out per clip.
    */
  def audioFingerprint(
      spark: SparkSession,
      media: DataFrame,
      frameSamples: Int = 16,
      maxBits: Int = 60): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val s = RealCodec.decodeWavPcm16(payload).samples
          val nf = s.length / frameSamples
          val es = new Array[Long](nf)
          var f = 0
          while (f < nf) {
            var e = 0L
            var i = f * frameSamples
            val end = i + frameSamples
            while (i < end) { e += s(i).toLong * s(i); i += 1 }
            es(f) = e
            f += 1
          }
          var fp = 0L
          var b = 0
          while (b < math.min(nf - 1, maxBits)) {
            if (es(b + 1) > es(b)) fp |= 1L << b
            b += 1
          }
          (id, nf.toLong, fp)
        }
      }
      .toDF("media_id", "n_frames", "fp")
  }

  /** Frame sampling: keep every `stride`-th frame index of each video —
    * pure metadata transform (the real pipeline would slice the payload
    * at frame boundaries the same way).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.nFrames") - 1, lit(stride)).as("frame_ids"))
      .select(col("media_id"), size(col("frame_ids")).as("n_sampled"),
        col("frame_ids"))

  /** Resize plan: target dims preserving aspect ratio to fit maxDim —
    * metadata math now, payload rewrite at the stubbed codec boundary.
    */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxDim) / w, lit(maxDim) / h, lit(1.0))
    media.filter(col("kind") === "image")
      .select(col("media_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        round(w * scale).cast("int").as("target_width"),
        round(h * scale).cast("int").as("target_height"))
  }

  /** Deterministic 9×8 grayscale BMP test images, one per document:
    * pixel (x,y) is an integer formula of (doc_id % 40) — so documents
    * sharing a base render IDENTICAL images — and every third doc bumps
    * exactly one pixel, planting near-duplicates that differ in ≤2 dHash
    * bits. Real files (any BMP reader opens them); narrow map.
    */
  def syntheticImagesFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val (w, h) = (9, 8)
    docs.select("doc_id").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = (id % 40).toInt
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val bump =
                if (id % 3 == 0 && x == (id % 9).toInt && y == (id % 8).toInt) 40
                else 0
              val g = (((x + 1) * (base + 2) + (y + 1) * (base + 5) + bump) % 256).toByte
              val p = (y * w + x) * 3
              rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
              x += 1
            }
            y += 1
          }
          (id, "image", RealCodec.encodeBmp24(rgb, w, h))
        }
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Difference hash (dHash) over the DECODED pixels of each image: the
    * standard perceptual fingerprint for image near-dup detection —
    * bit (y,x) set iff brightness increases from column x to x+1 on the
    * (here already 8×9) grayscale grid; a real pipeline average-pools
    * any image down to that grid first, which changes none of the
    * machinery below. The 64 bits ship as four 16-bit band values
    * (b0..b3) rather than one packed long so downstream banding needs no
    * bit slicing and no sign-bit edge cases cross engines.
    *
    * Decode is the REAL container parse ([[RealCodec.decodeBmp24]]) —
    * the q150 oracle recomputes the hash from the pixel FORMULA, so a
    * decode defect (stride, padding, bottom-up flip) hash-fails.
    * Narrow mapPartitions; payloads never shuffle.
    */
  def imageDHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val img = RealCodec.decodeBmp24(payload)
          val (w, h) = (img.width, img.height)
          require(w >= 9 && h >= 8, s"image $id too small for dHash ($w x $h)")
          def gray(x: Int, y: Int): Int = img.rgb((y * w + x) * 3) & 0xff
          val bands = new Array[Int](4)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (gray(x + 1, y) > gray(x, y)) {
                val bit = y * 8 + x
                bands(bit / 16) |= 1 << (bit % 16)
              }
              x += 1
            }
            y += 1
          }
          (id, bands(0), bands(1), bands(2), bands(3))
        }
      }
      .toDF("media_id", "b0", "b1", "b2", "b3")
  }

  /** Image near-dup pairs by banded dHash: candidates join on any equal
    * 16-bit band, then the full 64-bit Hamming distance verifies. For
    * `maxHamming` ≤ 3 the 4-band pigeonhole makes this EXACT — ≤3
    * differing bits cannot touch all 4 bands, so every qualifying pair
    * shares a band — which is why the q150 oracle can brute-force
    * all-pairs and still expect hash equality with this banded plan.
    *
    * Scale shape: one shuffle on (band, value); candidate volume is
    * Σ bucket² over band buckets, never n². Identical images all land in
    * the same buckets — run exact payload dedup (q28) FIRST at corpus
    * scale so bucket sizes track near-dup density, not copy counts.
    */
  def imageNearDupPairs(
      spark: SparkSession, hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(spark, hashes, maxHamming)

  /** Generic 4-band Hamming near-dup join over any (media_id, b0..b3)
    * band table — the candidate machinery behind [[imageNearDupPairs]]
    * (16-bit dHash bands) and the audio fingerprint join (15-bit
    * energy-delta bands): by pigeonhole, Hamming ≤ 3 over the full word
    * forces at least one of 4 bands equal, so the band equi-join is
    * EXACT for maxHamming ≤ 3.
    */
  def bandedHammingPairs(
      spark: SparkSession, hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"banded Hamming join is only exact for maxHamming <= 3, got $maxHamming")
    // the hash table (5 ints per image) is read three times below (band
    // explode + both Hamming sides) — pin it so an upstream decode
    // lineage (payload scan + codec) never runs more than once
    val pinned = hashes.localCheckpoint()
    val bands = pinned.select(col("media_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "bv")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .distinct()
    def side(alias: String, idOut: String) = pinned.select(
      col("media_id").as(idOut),
      col("b0").as(s"${alias}0"), col("b1").as(s"${alias}1"),
      col("b2").as(s"${alias}2"), col("b3").as(s"${alias}3"))
    cand.join(side("a", "id_a"), "id_a").join(side("b", "id_b"), "id_b")
      .withColumn("hamming",
        expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + " +
          "bit_count(a2 ^ b2) + bit_count(a3 ^ b3)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
