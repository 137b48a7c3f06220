package graft.streaming

import graft.SparkSpec
import graft.kv.KvOp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming KV fold: ops arriving across micro-batches must converge to
  * the same state as batch replay.
  */
class KvStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState fold across micro-batches == batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KvOp]
    val q = KvStreaming.statefulReplay(spark, input.toDS())
      .writeStream.format("memory").queryName("kvstate")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(KvOp(0, "put", "a", "x"), KvOp(1, "append", "a", "y"))
      q.processAllAvailable()
      input.addData(KvOp(2, "append", "a", "z"), KvOp(3, "put", "b", "q"))
      q.processAllAvailable()
      input.addData(KvOp(4, "append", "b", "r"), KvOp(5, "put", "a", "fresh"))
      q.processAllAvailable()
      // last emitted state per key across the update-mode output
      val rows = spark.sql(
        """SELECT key, value FROM (
          |  SELECT key, value,
          |         row_number() OVER (PARTITION BY key ORDER BY mono DESC) rn
          |  FROM (SELECT key, value, monotonically_increasing_id() mono
          |        FROM kvstate)
          |) WHERE rn = 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows("a") == "fresh")
      assert(rows("b") == "qr")
    } finally q.stop()
  }

  test("flatMapGroupsWithState change feed emits one row per applied op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KvOp]
    val q = KvStreaming.changeFeed(spark, input.toDS())
      .writeStream.format("memory").queryName("kvfeed")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(KvOp(0, "put", "a", "x"), KvOp(1, "append", "a", "y"))
      q.processAllAvailable()
      input.addData(KvOp(2, "append", "a", "z"))
      q.processAllAvailable()
      val feed = spark.sql("SELECT seq, key, value FROM kvfeed ORDER BY seq")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // per-op intermediate states, state carried across micro-batches
      assert(feed.toSeq == Seq((0L, "a", "x"), (1L, "a", "xy"), (2L, "a", "xyz")),
        feed.mkString(","))
    } finally q.stop()
  }

  test("within-batch ordering respects seq, not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KvOp]
    val q = KvStreaming.statefulReplay(spark, input.toDS())
      .writeStream.format("memory").queryName("kvstate2")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // arrival order scrambled; seq order is put(k,A) then appends B, C
      input.addData(KvOp(9, "append", "k", "C"), KvOp(3, "put", "k", "A"),
        KvOp(5, "append", "k", "B"))
      q.processAllAvailable()
      val v = spark.sql("SELECT value FROM kvstate2 WHERE key='k'")
        .collect().head.getString(0)
      assert(v == "ABC")
    } finally q.stop()
  }
}
