package graft.streaming

import graft.kv.KvOp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the KV surface: a continuous op stream folded into
  * per-key state with mapGroupsWithState — the Spark-native analog of the
  * reference's apply loop (/root/reference/src/raft/raft.go:897-918
  * feeding the server's map). Each micro-batch emits the keys it touched
  * with their updated state.
  *
  * Within a micro-batch, ops for a key are applied in `seq` order —
  * matching batch replay; across batches the GroupState carries the fold
  * forward. At scale, state is partitioned by key across executors and
  * checkpointed by Spark's state store (RocksDB/HDFS-backed in a real
  * cluster), so a 100 TB op history streams through bounded memory.
  */
object KvStreaming {

  final case class KeyState(key: String, value: String)

  /** The single KV state-transition function (mirrors the reference's
    * KvModel step, /root/reference/src/models/kv.go:40-54): new state,
    * plus whether the op mutated it. Both streaming surfaces fold through
    * THIS — one definition, so the change feed can never diverge from the
    * per-key state.
    */
  def step(state: String, op: KvOp): (String, Boolean) = op.op match {
    case KvOp.Put    => (op.value, true)
    case KvOp.Append => (state + op.value, true)
    case _           => (state, false)
  }

  def updateKey(
      key: String,
      ops: Iterator[KvOp],
      state: GroupState[String]): KeyState = {
    val sorted = ops.toSeq.sortBy(_.seq)
    val st0 = state.getOption.getOrElse("")
    val st = sorted.foldLeft(st0) { (s, o) => step(s, o)._1 }
    state.update(st)
    KeyState(key, st)
  }

  /** Attach the stateful fold to a (streaming or batch) Dataset[KvOp]. */
  def statefulReplay(spark: SparkSession, ops: Dataset[KvOp]): Dataset[KeyState] = {
    import spark.implicits._
    ops.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateKey)
  }

  final case class KvChange(seq: Long, key: String, value: String)

  /** Change-feed form: one output row PER APPLIED OP (seq, key, value
    * after the op) — the flatMapGroupsWithState surface, where a key
    * emits 0..n rows per micro-batch instead of exactly one. This is the
    * shape a downstream CDC consumer or audit log wants; the final row
    * per key equals statefulReplay's state.
    */
  def changeFeed(
      spark: SparkSession,
      ops: Dataset[KvOp]): Dataset[KvChange] = {
    import spark.implicits._
    ops.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[KvOp], state: GroupState[String]) =>
          val sorted = it.toSeq.sortBy(_.seq)
          var st = state.getOption.getOrElse("")
          val out = sorted.flatMap { o =>
            val (next, mutated) = step(st, o)
            st = next
            if (mutated) Some(KvChange(o.seq, key, st)) else None
          }
          state.update(st)
          out.iterator
      }
  }
}
