package graft.streaming

import graft.SparkSpec
import graft.kv.{KvOp, KvStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The exactly-once upsert sink must (a) materialize the CDC change feed
  * to the same final state as batch replay, (b) be idempotent under
  * batch re-delivery (the restart-recovery contract of foreachBatch),
  * and (c) never regress on out-of-order version reads (always through
  * `_LATEST`).
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def mkOps(n: Int): Seq[KvOp] =
    (0 until n).map { i =>
      val op = if (i % 3 == 0) KvOp.Put else KvOp.Append
      KvOp(i.toLong, op, s"k${i % 7}", s"v$i.")
    }

  private def expectedState(ops: Seq[KvOp]): Map[String, String] =
    KvStore.replay(ops.toDF()).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("streamed change feed through the sink == batch replay; replays are no-ops") {
    val ops = mkOps(90)
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KvOp]
    val q = KvStreaming.changeFeed(spark, input.toDS())
      .writeStream
      .foreachBatch((ds: org.apache.spark.sql.Dataset[KvStreaming.KvChange], id: Long) =>
        UpsertSink.upsertBatch(dir)(ds.toDF(), id))
      .outputMode(OutputMode.Append())
      .start()
    try {
      ops.grouped(30).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = UpsertSink.load(spark, dir).get
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(got == expectedState(ops), s"sink state diverged from batch replay")

    // simulate post-restart re-delivery of an already-committed batch:
    // a stale batchId must not change the table or the version pointer
    val vBefore = UpsertSink.latestVersion(spark, dir).get
    val staleRows = Seq(KvStreaming.KvChange(999L, "k0", "POISON")).toDF()
    UpsertSink.upsertBatch(dir)(staleRows, vBefore)
    assert(UpsertSink.latestVersion(spark, dir).contains(vBefore))
    val after = UpsertSink.load(spark, dir).get
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(after == got, "replayed batch must be a no-op")
  }

  test("bucketed sink == plain sink state; untouched buckets are not rewritten") {
    val ops = mkOps(60)
    val dir = java.nio.file.Files.createTempDirectory("graft-upsertb").toString
    // replay the op stream through changeFeed in 2 chunks, second chunk
    // touching only one key → at most a couple of buckets
    val changes = {
      var st = Map.empty[String, String].withDefaultValue("")
      ops.sortBy(_.seq).map { o =>
        val next = KvStreaming.step(st(o.key), o)._1
        st = st.updated(o.key, next)
        KvStreaming.KvChange(o.seq, o.key, next)
      }
    }
    val (c0, c1full) = changes.splitAt(40)
    val c1 = c1full.filter(_.key == "k1")
    UpsertSink.upsertBatchBucketed(dir, nBuckets = 8)(c0.toDF(), 0L)
    UpsertSink.upsertBatchBucketed(dir, nBuckets = 8)(c1.toDF(), 1L)
    val got = UpsertSink.loadBucketed(spark, dir).get
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    val expected = expectedState(ops.take(40) ++
      ops.drop(40).filter(_.key == "k1"))
    assert(got == expected)
    // write amplification: v1 holds only the touched buckets' rows
    val v1Keys = spark.read.parquet(s"$dir/v1")
      .select("key").distinct().collect().map(_.getString(0)).toSet
    assert(v1Keys.contains("k1") && v1Keys.size < 7,
      s"v1 should hold only touched buckets, got keys $v1Keys")
    // replayed bucketed batch: no-op
    UpsertSink.upsertBatchBucketed(dir, nBuckets = 8)(
      Seq(KvStreaming.KvChange(999L, "k1", "POISON")).toDF(), 1L)
    val after = UpsertSink.loadBucketed(spark, dir).get
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(after == got)
  }

  test("a fresh batch advances the version and readers see the new snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert2").toString
    UpsertSink.upsertBatch(dir)(
      Seq(KvStreaming.KvChange(1L, "a", "x")).toDF(), 0L)
    UpsertSink.upsertBatch(dir)(
      Seq(KvStreaming.KvChange(2L, "a", "y"), KvStreaming.KvChange(3L, "b", "z")).toDF(), 1L)
    assert(UpsertSink.latestVersion(spark, dir).contains(1L))
    val got = UpsertSink.load(spark, dir).get
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(got == Map("a" -> "y", "b" -> "z"))
  }
}
