package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

/** Streaming windowed aggregation: the same StreamOps code must produce
  * identical results in batch mode and incrementally over a stream, and
  * the watermark must drop late data.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val batch = Seq(
    Ev(ts(0), "click", 1.0, 1), Ev(ts(5), "click", 2.0, 1),
    Ev(ts(20), "view", 3.0, 2), Ev(ts(59), "click", 4.0, 1))

  test("tumbling counts: streaming (append, watermark) == batch") {
    val batchRes = StreamOps.tumblingCounts(batch.toDF(), "30 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(
        StreamOps.withWatermark(input.toDF(), "10 minutes"), "30 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(batch.take(2): _*)
      q.processAllAvailable()
      input.addData(batch.drop(2): _*)
      q.processAllAvailable()
      // advance watermark far enough to close all windows
      input.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "late", 0.0, 9))
      q.processAllAvailable()
      val streamRes = spark.sql("SELECT * FROM tumbling")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(batchRes.subsetOf(streamRes),
        s"batch=$batchRes stream=$streamRes")
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(
        StreamOps.withWatermark(input.toDF(), "5 minutes"), "10 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(Ev(ts(0), "a", 1.0, 1))
      q.processAllAvailable()
      // advance event time well past the first window + watermark
      input.addData(Ev(Timestamp.valueOf("2024-01-01 11:00:00"), "a", 1.0, 1))
      q.processAllAvailable()
      // this event is > watermark late → must be dropped
      input.addData(Ev(ts(1), "a", 100.0, 1))
      q.processAllAvailable()
      input.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "a", 1.0, 1))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n FROM late ORDER BY win_start")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      // first window emitted with only the on-time event
      assert(rows.head == ("2024-01-01 10:00:00.0", 1), rows.mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      (1L, 7L, ts(0)), (2L, 7L, ts(3)), (3L, 7L, ts(20)),
      (4L, 8L, ts(1)), (5L, 8L, ts(2)))
    // batch expectation: pairs of same-user events within 5 minutes after
    val expected = (for {
      (xe, xu, xt) <- evs; (ye, yu, yt) <- evs
      if xu == yu && yt.after(xt) && yt.getTime <= xt.getTime + 5 * 60 * 1000
    } yield (xe, ye)).toSet

    val inA = MemoryStream[(Long, Long, Timestamp)]
    val inB = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamOps.streamStreamFollowJoin(
        inA.toDF().toDF("event_id", "user_id", "ts"),
        inB.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // feed in event-time order: rows below the advancing watermark are
      // (correctly) dropped as late, so the late event 3 goes last
      val (early, late) = evs.partition(_._3.before(ts(10)))
      inA.addData(early: _*); inB.addData(early: _*)
      q.processAllAvailable()
      inA.addData(late: _*); inB.addData(late: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, b_event_id FROM ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"got=$got expected=$expected")
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival per content digest, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(ts: Timestamp, text: String)
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamOps.streamingDedup(
        input.toDF().toDF("ts", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((ts(0), "alpha"), (ts(1), "beta"), (ts(2), "alpha"))
      q.processAllAvailable()
      // duplicate arriving within the watermark window → dropped
      input.addData((ts(3), "beta"), (ts(4), "gamma"))
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM dedup")
        .collect().map(_.getString(0)).sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"), texts.mkString(","))
    } finally q.stop()
  }

  test("session windows merge events within gap and split across it") {
    val evs = Seq(
      Ev(ts(0), "a", 1.0, 7), Ev(ts(3), "a", 1.0, 7), Ev(ts(6), "a", 1.0, 7),
      // 20-minute gap → new session
      Ev(ts(26), "a", 1.0, 7),
      Ev(ts(0), "a", 1.0, 8))
    val sess = StreamOps.sessionCounts(evs.toDF(), "10 minutes")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val u7 = sess.filter(_._1 == 7).map(_._2).sorted
    assert(u7.toSeq == Seq(1, 3), s"got ${sess.mkString(",")}")
    assert(sess.count(_._1 == 8) == 1)
  }

  test("streaming session windows: within-watermark events merge, beyond-watermark events drop; == batch replay of the kept events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.sessionCounts(
        StreamOps.withWatermark(input.toDF(), "5 minutes"), "10 minutes")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 7's session + user 8's singleton
      input.addData(Ev(ts(0), "a", 1.0, 7), Ev(ts(3), "a", 1.0, 7),
        Ev(ts(0), "a", 1.0, 8))
      q.processAllAvailable()
      // batch 2: an event still INSIDE user 7's open session gap and
      // inside the watermark — must merge, not open a new session
      input.addData(Ev(ts(8), "a", 1.0, 7))
      q.processAllAvailable()
      // sentinel one hour on: watermark passes every open session + gap
      input.addData(Ev(ts(59), "s", 1.0, 99))
      q.processAllAvailable()
      // batch 4: user 7 again at 10:04 — the watermark is now ~10:54,
      // so this late event must be DROPPED (no new session, no merge)
      input.addData(Ev(ts(4), "late", 1.0, 7))
      q.processAllAvailable()
      input.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "s", 1.0, 98))
      q.processAllAvailable()
      val got = spark.sql("SELECT sess_start, sess_end, user_id, n_events FROM sess_late")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
          r.getLong(2), r.getLong(3))).toSet
      // batch replay over exactly the KEPT events (the late 10:04 row
      // excluded) must agree on every closed session
      val kept = Seq(
        Ev(ts(0), "a", 1.0, 7), Ev(ts(3), "a", 1.0, 7), Ev(ts(8), "a", 1.0, 7),
        Ev(ts(0), "a", 1.0, 8), Ev(ts(59), "s", 1.0, 99))
      val batchRes = StreamOps.sessionCounts(kept.toDF(), "10 minutes")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(batchRes.subsetOf(got),
        s"streaming sessions must equal batch replay of kept events:\n" +
          s"stream=$got\nbatch=$batchRes")
      // the dropped event contributed nothing: user 7 has exactly ONE
      // session and it counts 3 events (00, 03, 08 merged; 04 dropped)
      val u7 = got.filter(_._3 == 7L)
      assert(u7.size == 1 && u7.head._4 == 3L,
        s"late event must not reopen or inflate user 7's session: $u7")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sess_late")
    }
  }

  test("windowed term counts: streaming (append) == batch; top-k cut is deterministic") {
    val docs = Seq(
      (ts(1), "spark spark flink"),
      (ts(7), "spark duckdb"),
      (ts(40), "flink flink flink spark"),
      (ts(45), "duckdb"))
    val docsDf = docs.toDF("ts", "text")

    val batchRes = StreamOps.windowedTermCounts(docsDf, "30 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // sanity: first window counts spark 3x, flink 1x, duckdb 1x
    val w0 = batchRes.filter(_._1 == ts(0)).map(t => t._2 -> t._3).toMap
    assert(w0 == Map("spark" -> 3L, "flink" -> 1L, "duckdb" -> 1L), s"$w0")

    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, String)]
    val q = StreamOps.windowedTermCounts(
        input.toDF().toDF("ts", "text"), "30 minutes")
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "closer"))
      q.processAllAvailable()
      val streamRes = spark.sql("SELECT * FROM trending")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamRes == batchRes, s"stream $streamRes != batch $batchRes")
    } finally q.stop()

    // top-k cut: k=1 keeps the max-count term per window, ties on term
    val top = StreamOps.topTermsPerWindow(
        StreamOps.windowedTermCounts(docsDf, "30 minutes"), k = 1)
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(top == Set((ts(0), "spark"), (ts(30), "flink")), s"$top")
  }

  test("quality-drift monitor: stream == batch; PSI flags the shifted window only") {
    // window A repeats the reference score mix; window B is shifted hard
    val refScores = Seq(50000L, 150000L, 150000L, 250000L)
    val rows =
      refScores.map(s => (ts(0), s)) ++
        Seq(850000L, 950000L, 950000L, 950000L).map(s => (ts(30), s))
    val scoredDf = rows.toDF("ts", "score")
    val batchHist = StreamOps.windowedScoreHistogram(scoredDf, "score", "30 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = StreamOps.windowedScoreHistogram(
        input.toDF().toDF("ts", "score"), "score", "30 minutes")
      .writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // close both windows so append mode emits them
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 1L))
      q.processAllAvailable()
      val streamHist = spark.sql("SELECT * FROM drift")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamHist == batchHist, s"stream $streamHist != batch $batchHist")
    } finally q.stop()

    val reference = refScores
      .map(s => math.min(s / 100000L, 9L)).groupBy(identity)
      .map { case (b, xs) => (b, xs.size.toLong) }.toSeq.toDF("bucket", "n")
    val psi = StreamOps.psiPerWindow(
        StreamOps.windowedScoreHistogram(scoredDf, "score", "30 minutes"),
        reference)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // identical mix: only add-1 smoothing noise; shifted mix: strong alert
    assert(math.abs(psi(ts(0))) < 100000L,
      s"same-distribution window flagged: ${psi(ts(0))}")
    // the industry convention flags PSI > 0.2; the fully-shifted window
    // lands ~3x past it even with add-1 smoothing damping tiny counts
    assert(psi(ts(30)) > 300000L,
      s"shifted window must alert loudly: ${psi(ts(30))}")
  }

  test("streaming EWMA == the batch q171 fold across arbitrary batch splits; late days dropped") {
    import StreamOps.{DayCount, EwmaState}
    val days = Seq(
      DayCount(1L, 10L, 3L), DayCount(1L, 11L, 1L), DayCount(1L, 14L, 7L),
      DayCount(2L, 10L, 2L), DayCount(2L, 12L, 2L))
    // batch reference: one fold over everything
    val want = days.groupBy(_.userId).map { case (u, ds) =>
      u -> StreamOps.ewmaFold(EwmaState(u, Long.MinValue, 0L, 0L), ds)
    }
    // sanity vs the q171 arithmetic by hand for user 1:
    // 0 -> (0*9+3e6)/10=300000 -> (2.7e6+1e6)/10=370000 -> (3.33e6+7e6)/10=1033000
    assert(want(1L).ewmaMicro == 1033000L && want(1L).nDays == 3L)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DayCount]
    val q = StreamOps.ewmaEngagement(spark, input.toDS())
      .writeStream.format("memory").queryName("ewma")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(days.take(2): _*) // batch 1: user1 days 10,11
      q.processAllAvailable()
      input.addData(days.drop(2): _*) // batch 2: the rest
      q.processAllAvailable()
      input.addData(DayCount(1L, 11L, 999L)) // late replay of a folded day
      q.processAllAvailable()
      // Update-mode sink appends one row per state emission per batch;
      // the latest state is the one with the most folded days
      val got = spark.sql(
          "SELECT userId, ewmaMicro, nDays, lastDay FROM ewma").collect()
        .groupBy(_.getLong(0))
        .map { case (u, rows) => u -> rows.maxBy(_.getLong(2)) }
      assert(got(1L).getLong(1) == want(1L).ewmaMicro &&
        got(1L).getLong(2) == want(1L).nDays,
        s"user1 stream=${got(1L)} batch=${want(1L)}")
      assert(got(2L).getLong(1) == want(2L).ewmaMicro)
      assert(got(1L).getLong(3) == 14L, "late day must not advance state")
    } finally q.stop()
  }

  test("session emitter: in-batch closes emit immediately; trailing session closes on watermark") {
    import StreamOps.{SEvent, ClosedSession}
    def ev(u: Long, hhmm: String) =
      SEvent(u, Timestamp.valueOf(s"2024-01-01 $hhmm:00"))
    def us(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00").getTime * 1000L

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    // 2 h watermark delay: batch-2's 09:08 event must not be late
    // against batch-1's 09:30 maximum
    val q = StreamOps.sessionEmitter(spark,
        StreamOps.withWatermark(input.toDF(), "2 hours").as[SEvent],
        gapMinutes = 10)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 has two sessions IN ONE BATCH (25-min gap);
      // user 2 one open session
      input.addData(ev(1, "09:00"), ev(1, "09:05"), ev(1, "09:30"),
        ev(2, "09:00"))
      q.processAllAvailable()
      // batch 2: user 2 extends within gap; a sentinel user far in the
      // future advances the watermark past every open session + gap
      input.addData(ev(2, "09:08"))
      q.processAllAvailable()
      input.addData(ev(99, "12:00"))
      q.processAllAvailable()
      input.addData(ev(98, "13:00")) // one more batch so timeouts fire
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sessions").as[ClosedSession]
        .collect().toSet
      val want = Set(
        ClosedSession(1L, us("09:00"), us("09:05"), 2L), // closed in-batch
        ClosedSession(1L, us("09:30"), us("09:30"), 1L), // closed by timeout
        ClosedSession(2L, us("09:00"), us("09:08"), 2L)) // spans batches
      assert(want.subsetOf(got), s"got $got")
      // exactly one session per (user, start): append-mode, no dupes
      assert(got.toSeq.map(c => (c.userId, c.startUs)).distinct.size == got.size)
    } finally q.stop()
  }

  test("session emitter: watermark-stale batches neither crash the query nor leak state") {
    import StreamOps.{SEvent, ClosedSession}
    def ev(u: Long, hhmm: String) =
      SEvent(u, Timestamp.valueOf(s"2024-01-01 $hhmm:00"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    // tight 1-minute watermark delay so batch 2's events land far below
    // the watermark. This pins the engine contract the emitter's timeout
    // clamp is written against: flatMapGroupsWithState FILTERS input
    // older than the watermark (so the stale user never gets state), and
    // any event surviving the filter has ts >= watermark, so the clamped
    // setTimeoutTimestamp can never be rejected — the query must keep
    // running through a stale-only batch, not die with
    // IllegalArgumentException.
    val q = StreamOps.sessionEmitter(spark,
        StreamOps.withWatermark(input.toDF(), "1 minute").as[SEvent],
        gapMinutes = 10)
      .writeStream.format("memory").queryName("stale_sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(ev(99, "12:00")) // watermark → 11:59
      q.processAllAvailable()
      // batch 2: ONLY events hours older than the watermark, for a user
      // with no prior state — filtered as late, no crash, no state
      input.addData(ev(1, "09:00"), ev(1, "09:05"))
      q.processAllAvailable()
      input.addData(ev(98, "13:00")) // advance watermark; fire timeouts
      q.processAllAvailable()
      input.addData(ev(97, "14:00")) // one more trigger for the close
      q.processAllAvailable()
      assert(q.isActive && q.exception.isEmpty,
        s"stale-only batch must not fail the query: ${q.exception}")
      val got = spark.sql("SELECT * FROM stale_sessions").as[ClosedSession]
        .collect().toSet
      // dropped-late contract: user 1 produced NO session (its rows
      // never reached the state function), while the on-time sentinel
      // sessions closed normally
      assert(!got.exists(_.userId == 1L),
        s"watermark-stale rows must be dropped, not sessionized: $got")
      assert(got.exists(_.userId == 99L) && got.exists(_.userId == 98L),
        s"on-time sessions must still close via timeout: $got")
    } finally q.stop()
  }

  test("blocklist gate: stateless stream == batch; banned docs drop mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val terms = Seq("banned phrase", "spamword")
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.blocklistFilter(
        input.toDF().toDF("doc_id", "text"), terms)
      .writeStream.format("memory").queryName("blockgate")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(1L -> "a clean page", 2L -> "has a banned phrase inside")
      q.processAllAvailable()
      input.addData(3L -> "spamword opener", 4L -> "also clean")
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM blockgate")
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 4L), kept.mkString(","))
      // identical rows from the batch path on the same data
      val batch = StreamOps.blocklistFilter(
        Seq(1L -> "a clean page", 2L -> "has a banned phrase inside",
          3L -> "spamword opener", 4L -> "also clean").toDF("doc_id", "text"),
        terms).collect().map(_.getLong(0)).sorted
      assert(batch.toSeq == kept.toSeq)
      // the audit side returns the offenders with what matched
      val flagged = StreamOps.blocklistFilter(
        Seq(5L -> "spamword and a banned phrase").toDF("doc_id", "text"),
        terms, keepClean = false).head()
      assert(flagged.getSeq[String](2) == Seq("banned phrase", "spamword"))
    } finally q.stop()
  }
}
