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

  def updateKey(
      key: String,
      ops: Iterator[KvOp],
      state: GroupState[String]): KeyState = {
    val sorted = ops.toSeq.sortBy(_.seq)
    val st0 = state.getOption.getOrElse("")
    val st = sorted.foldLeft(st0) { (s, o) =>
      o.op match {
        case KvOp.Put    => o.value
        case KvOp.Append => s + o.value
        case _           => s
      }
    }
    state.update(st)
    KeyState(key, st)
  }

  /** Attach the stateful fold to a (streaming or batch) Dataset[KvOp]. */
  def statefulReplay(spark: SparkSession, ops: Dataset[KvOp]): Dataset[KeyState] = {
    import spark.implicits._
    ops.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateKey)
  }
}
