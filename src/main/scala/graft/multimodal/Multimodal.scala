package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, plus batched
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema (binary payload + metadata struct),
  * partition-parallel batched processing via typed mapPartitions, feature
  * schema out — is real and tested. The codec itself is a clearly-marked
  * deterministic STUB (`StubCodec`): this container has no image/audio
  * libraries, so a real deployment swaps `StubCodec.decode` for e.g. a
  * JNI JPEG decode with the surrounding dataflow unchanged.
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
}
