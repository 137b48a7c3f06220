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
}
