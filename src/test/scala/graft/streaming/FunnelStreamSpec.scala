package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming funnel must agree with the q71 batch funnel: feeding the
  * real event table through MemoryStream in event-time-ordered chunks
  * yields per-user stages whose ≥k counts equal the batch CTE counts.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def loadEvents() =
    graft.tables.Tables.eventsTs(spark, sf0001)
      .select(col("user_id").as("userId"), col("event_type").as("eventType"),
        unix_micros(col("ts")).as("tsUs"))
      .as[StreamOps.FunnelEvent]

  private def stageCounts(stages: Map[Long, Int]): Seq[Long] =
    (1 to 4).map(k => stages.values.count(_ >= k).toLong)

  test("streaming funnel states == batch q71 stage counts") {
    val batchExpected = SparkEntry.queries("q71_funnel")(spark, sf0001)
      .orderBy("stage").collect().map(_.getAs[Long]("n_users")).toSeq

    val all = loadEvents().collect().sortBy(e => (e.tsUs, e.eventType))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.FunnelEvent]
    val q = StreamOps.funnelStages(spark, input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update())
      .start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      // last emitted state per user is the live stage
      val finalStages = spark.sql(
        "SELECT userId, stage FROM funnel").as[(Long, Int)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
      assert(stageCounts(finalStages) == batchExpected,
        s"stream=${stageCounts(finalStages)} batch=$batchExpected")
    } finally q.stop()
  }

  test("funnel fold applied in one batch == applied incrementally") {
    val all = loadEvents().collect().sortBy(e => (e.tsUs, e.eventType))
    val byUser = all.groupBy(_.userId)
    byUser.foreach { case (u, evs) =>
      val once = StreamOps.funnelFold(
        StreamOps.FunnelStage(u, 0, Long.MinValue), evs.toSeq)
      val (h, t) = evs.toSeq.splitAt(evs.length / 2)
      val twice = StreamOps.funnelFold(
        StreamOps.funnelFold(StreamOps.FunnelStage(u, 0, Long.MinValue), h), t)
      assert(once == twice, s"user $u: fold must be prefix-composable")
    }
  }
}
