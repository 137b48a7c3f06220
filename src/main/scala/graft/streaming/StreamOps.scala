package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Structured-streaming transforms over the events stream. Each op is a
  * plain DataFrame→DataFrame function, so the SAME code runs in batch
  * mode (driver testdata, DuckDB-oracle-checkable) and behind
  * readStream/writeStream with watermarks (see StreamOpsSpec) — the
  * Spark-idiomatic way to keep one definition for both planes.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type. The value sum is
    * quantized to exact integer cents per row (values are 2-decimal) so
    * the aggregate is independent of partition/merge order — required for
    * bit-stable results across batch re-runs AND streaming state merges. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * 100).cast("long")).cast("double") / 100, 2)
          .as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window counts (width, slide). */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"), col("n"))

  /** Session windows per user (gap-based). */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Attach a watermark for streaming use (no-op in batch mode). */
  def withWatermark(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Stream–stream interval join: events joined to same-user events in
    * the `within` interval after them (the streaming form of the q54
    * batch range join). Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can evict buffered
    * rows once the watermark passes — the state-boundedness contract
    * every stream–stream join needs to survive unbounded input.
    */
  def streamStreamFollowJoin(
      a: DataFrame,
      b: DataFrame,
      within: String = "5 minutes",
      delay: String = "10 minutes"): DataFrame = {
    val left = a.withWatermark("ts", delay)
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = b.withWatermark("ts", delay)
      .select(col("event_id").as("b_event_id"),
        col("user_id").as("b_user_id"), col("ts").as("b_ts"))
    left.join(right,
      col("user_id") === col("b_user_id") &&
        col("b_ts") > col("ts") &&
        col("b_ts") <= col("ts") + expr(s"INTERVAL $within"))
  }

  /** Per-user funnel progression as live state: the streaming twin of the
    * q71 batch funnel. Each user's GroupState holds (stage, since); a
    * micro-batch folds its events in event-time order through the same
    * strict-ordering rule the batch CTEs use (stage k+1 requires its
    * event strictly after stage k's time), so on in-order delivery the
    * final states equal the batch stages exactly (FunnelStreamSpec).
    * Out-of-order reprocessing belongs to the batch form — this surface
    * is the low-latency dashboard path. State per user is 2 longs + an
    * int, partitioned by user across executors and checkpointed by the
    * state store — bounded regardless of stream length.
    */
  final case class FunnelEvent(userId: Long, eventType: String, tsUs: Long)
  final case class FunnelStage(userId: Long, stage: Int, sinceUs: Long)

  private val funnelOrder = Vector("signup", "view", "click", "purchase")

  def funnelFold(st0: FunnelStage, events: Seq[FunnelEvent]): FunnelStage =
    events.sortBy(e => (e.tsUs, e.eventType)).foldLeft(st0) { (st, e) =>
      if (st.stage < funnelOrder.length && e.eventType == funnelOrder(st.stage)
          && (st.stage == 0 || e.tsUs > st.sinceUs))
        FunnelStage(st.userId, st.stage + 1, e.tsUs)
      else st
    }

  def funnelStages(
      spark: org.apache.spark.sql.SparkSession,
      events: Dataset[FunnelEvent]): Dataset[FunnelStage] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelStage]) =>
          val st = funnelFold(
            state.getOption.getOrElse(FunnelStage(uid, 0, Long.MinValue)),
            it.toSeq)
          state.update(st)
          st
      }
  }

  /** One user's daily activity count entering the EWMA fold. */
  final case class DayCount(userId: Long, day: Long, c: Long)

  /** Per-user EWMA state: last folded day, days seen, score in exact
    * micro-units — 3 longs per user, bounded regardless of stream length.
    */
  final case class EwmaState(userId: Long, lastDay: Long, nDays: Long,
      ewmaMicro: Long)

  /** The q171 integer fold: s ← (9·s + 10⁶·c) div 10 over day-sorted
    * counts, skipping days at or before the already-folded watermark —
    * shared by the batch spec reference and the streaming state update.
    */
  def ewmaFold(st0: EwmaState, days: Seq[DayCount]): EwmaState =
    days.sortBy(_.day).foldLeft(st0) { (st, d) =>
      if (d.day <= st.lastDay) st // late replay of a folded day: dropped
      else EwmaState(st.userId, d.day, st.nDays + 1,
        (st.ewmaMicro * 9 + d.c * 1000000L) / 10)
    }

  /** Streaming twin of the q171 EWMA engagement score: each user's
    * GroupState folds newly-arrived daily counts through the SAME exact
    * integer recursion the batch query runs, so on day-ordered delivery
    * the live score equals the batch score bit-for-bit (StreamOpsSpec
    * pins it across multi-batch splits). Late days at or before the
    * per-user fold watermark are dropped — reprocessing out-of-order
    * history belongs to the batch form; this surface is the live
    * engagement dashboard. Scale shape: state is 3 longs per user,
    * partitioned across executors by the state store.
    */
  def ewmaEngagement(
      spark: org.apache.spark.sql.SparkSession,
      daily: Dataset[DayCount]): Dataset[EwmaState] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    daily.groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[DayCount],
         state: org.apache.spark.sql.streaming.GroupState[EwmaState]) =>
          val st = ewmaFold(
            state.getOption.getOrElse(EwmaState(uid, Long.MinValue, 0L, 0L)),
            it.toSeq)
          state.update(st)
          st
      }
  }

  /** One event entering the streaming sessionizer. */
  final case class SEvent(userId: Long, ts: java.sql.Timestamp)

  /** Open-session accumulator: 3 longs per user. */
  final case class SessionAcc(startUs: Long, lastUs: Long, n: Long)

  /** A closed session, emitted once — append-mode safe. */
  final case class ClosedSession(userId: Long, startUs: Long, endUs: Long,
      nEvents: Long)

  /** Streaming sessionizer via `flatMapGroupsWithState` + EVENT-TIME
    * timeout: the q75 lag-gap rule (a gap strictly greater than
    * `gapMinutes` closes the session) run incrementally. Sessions that
    * close INSIDE a micro-batch emit immediately; the trailing open
    * session emits when the WATERMARK passes lastEvent + gap (event-time
    * timeout — deterministic, unlike a wall-clock timeout, and exactly
    * the rule the batch form applies). This is the append-mode
    * complement to `sessionCounts` (session_window aggregation): that
    * shape yields windowed aggregates, this one yields one immutable
    * record per closed session — the form a downstream fact table
    * ingests. State per user is one open session (3 longs), evicted on
    * emit. Requires a watermark on `ts` upstream (withWatermark).
    *
    * In-batch events fold in event-time order; late events older than
    * the open session's last timestamp extend counts only if they fall
    * within the gap of the session's span start (standard
    * at-least-once session semantics — exact reprocessing belongs to
    * the batch form, q75).
    */
  def sessionEmitter(
      spark: org.apache.spark.sql.SparkSession,
      events: Dataset[SEvent],
      gapMinutes: Int = 10): Dataset[ClosedSession] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SEvent], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val acc = state.get
            state.remove()
            Iterator(ClosedSession(uid, acc.startUs, acc.lastUs, acc.n))
          } else {
            val ts = it.map(e => e.ts.getTime * 1000L).toArray.sorted
            var acc = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            ts.foreach { t =>
              acc =
                if (acc == null) SessionAcc(t, t, 1L)
                else if (t - acc.lastUs > gapUs) {
                  closed += ClosedSession(uid, acc.startUs, acc.lastUs, acc.n)
                  SessionAcc(t, t, 1L)
                } else SessionAcc(acc.startUs, math.max(acc.lastUs, t), acc.n + 1L)
            }
            state.update(acc)
            // Spark's flatMapGroupsWithState filters input rows older
            // than the watermark (StreamOpsSpec pins that), so surviving
            // events have ts >= watermark and lastUs + gap lands past it
            // in the common case. The clamp is the invariant guard for
            // the boundary (ts == watermark exactly) and for any future
            // divergence between the late-events and eviction watermarks
            // (they are separate values in the engine): a timeout <=
            // current watermark is REJECTED by Spark and would fail the
            // whole query, so never request one. watermark+1 means "this
            // session is already expired — close it at the next trigger".
            val want = acc.lastUs / 1000L + gapMinutes * 60L * 1000L
            state.setTimeoutTimestamp(math.max(want, state.getCurrentWatermarkMs() + 1L))
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup on a content digest: keeps the first arrival
    * of each distinct `textCol` value. With a watermark on `tsCol`,
    * dropDuplicatesWithinWatermark bounds the dedup state — entries older
    * than the watermark are evicted, which is the only way streaming
    * dedup survives an unbounded stream (plain dropDuplicates grows state
    * forever). The digest (not the text) is the state key, so state size
    * is 16 bytes/doc no matter how large documents are.
    */
  def streamingDedup(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      delay: String = "30 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming blocklist gate: drop any document containing a banned
    * phrase, annotating survivors-audit rows with what matched. The
    * Aho-Corasick automaton ([[graft.functions.MultiMatch]]) is a
    * constant inside the projection, so this is a STATELESS narrow
    * transform — it runs identically behind readStream (no watermark,
    * no state store) and in batch (q201's oracle-checked path), and a
    * restart replays it idempotently. Output: the input columns plus
    * `matched` (sorted banned terms found; kept rows have none when
    * `keepClean = true`).
    */
  def blocklistFilter(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String = "text",
      keepClean: Boolean = true): DataFrame = {
    val flagged = docs.withColumn("matched",
      graft.functions.MultiMatchFunctions.graftMultiMatch(col(textCol), terms))
    if (keepClean) flagged.filter(size(col("matched")) === 0)
    else flagged.filter(size(col("matched")) > 0)
  }

  /** Windowed term counts over a text stream — the ingest-monitoring
    * aggregation behind "what's trending this hour". Tokens explode
    * map-side and the (window, term) count is a standard watermarked
    * streaming aggregate: state is one counter per live (window, term),
    * evicted once the watermark passes the window end. Runs identically
    * in batch (oracle-checkable) and behind readStream.
    */
  def windowedTermCounts(
      docs: DataFrame,
      width: String = "1 hour",
      textCol: String = "text",
      tsCol: String = "ts",
      delay: String = "30 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), width).as("win"),
        explode(graft.textops.TextAnalysis.wsTokens(col(textCol))).as("term"))
      .groupBy(col("win"), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("term"), col("n"))

  /** Per-window top-k cut over [[windowedTermCounts]] output — run this
    * batch-side (or inside foreachBatch on the completed windows): a
    * per-window row_number is only safe where the window's counts are
    * final. Deterministic ties on (n DESC, term).
    */
  def topTermsPerWindow(counts: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("win_start").orderBy(col("n").desc, col("term"))
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Windowed quality-drift monitor: per event-time window, the score
    * histogram of arriving documents (integer `scoreCol` bucketed by
    * `bucketWidth`, clamped to `nBuckets`) — the streaming half of the
    * q159 PSI gate. State is one counter per live (window, bucket):
    * ≤ nBuckets per window regardless of traffic, evicted by the
    * watermark. Runs identically in batch (oracle-checkable shape) and
    * behind readStream.
    */
  def windowedScoreHistogram(
      docs: DataFrame,
      scoreCol: String,
      width: String = "1 hour",
      tsCol: String = "ts",
      delay: String = "30 minutes",
      bucketWidth: Long = 100000L,
      nBuckets: Int = 10): DataFrame =
    docs
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), width).as("win"),
        least(floor(col(scoreCol) / bucketWidth), lit(nBuckets - 1L))
          .cast("long").as("bucket"))
      .groupBy(col("win"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("bucket"), col("n"))

  /** PSI of each window's histogram against a REFERENCE histogram
    * (bucket → count, e.g. yesterday's corpus) — q159's add-1-smoothed
    * integer-micro-nat formula per window. Run batch-side or in
    * foreachBatch on completed windows (a drifting window is an alert,
    * so the consumer is a threshold check on `psi_micro`). The
    * reference is broadcast; per window the math touches ≤ nBuckets
    * rows.
    */
  def psiPerWindow(
      hist: DataFrame,
      reference: DataFrame,
      nBuckets: Int = 10): DataFrame = {
    val ref = reference.select(col("bucket"), col("n").as("rn"))
    val refTot = ref.agg(sum("rn").as("rt"))
    val winTot = hist.groupBy("win_start").agg(sum("n").as("wt"))
    // the FULL bucket grid, not just buckets either side observed — a
    // score region empty in the reference but active in a window (the
    // textbook drift) must still contribute its term
    val spark = hist.sparkSession
    import spark.implicits._
    val buckets = (0L until nBuckets.toLong).toDF("bucket")
    val grid = hist.select(col("win_start")).distinct()
      .crossJoin(broadcast(buckets))
    val full = grid
      .join(hist, Seq("win_start", "bucket"), "left")
      .join(broadcast(ref), Seq("bucket"), "left")
      .select(col("win_start"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("rn"), lit(0L)).as("rn"))
      .join(broadcast(winTot), "win_start")
      .crossJoin(broadcast(refTot))
    val pw = (col("n") + 1).cast("double") / (col("wt") + nBuckets)
    val pr = (col("rn") + 1).cast("double") / (col("rt") + nBuckets)
    full.select(col("win_start"), col("bucket"),
        round(lit(1000000) * (pw - pr) * log(pw / pr)).cast("long").as("q"))
      .groupBy("win_start")
      .agg(sum("q").as("psi_micro"))
  }
}
