package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One operation of the reference's linearizable string-KV surface.
  * Semantics are the executable spec in
  * /root/reference/src/models/kv.go:40-54: get returns current value (""
  * for missing), put replaces, append concatenates (state + value).
  * `seq` is the linearization order (the Raft log index in the reference);
  * batch replay folds per key in seq order.
  */
final case class KvOp(seq: Long, op: String, key: String, value: String)

object KvOp {
  val Get = "get"
  val Put = "put"
  val Append = "append"
}

/** Batch replay of a KV op log to its final state, two ways:
  *
  *  - `replay`: relational (scales) — the final state of a key is the
  *    ordered concatenation of values from the last put onward (appends
  *    before any put are preserved only when no put exists). Expressed
  *    with a window max + ordered aggregation, so Catalyst plans it with
  *    partial aggregation and a single shuffle on key; no holistic buffer.
  *  - `replayHolistic`: the direct per-key fold (groupByKey.flatMapGroups),
  *    mirroring the KvModel step function 1:1 — the semantic reference,
  *    used to cross-check the relational form in tests.
  *
  * The Raft machinery that produces the op order in the reference
  * (/root/reference/src/raft/raft.go:897-918 apply loop) is out of scope
  * per SURVEY.md §2.4: `seq` IS the commit order.
  */
object KvStore {

  /** Relational replay: Dataset[KvOp]-shaped DataFrame → (key, value). */
  def replay(ops: DataFrame): DataFrame = {
    val w = Window.partitionBy("key")
    ops
      .filter(col("op") =!= KvOp.Get)
      .withColumn("last_put",
        max(when(col("op") === KvOp.Put, col("seq"))).over(w))
      .filter(col("last_put").isNull || col("seq") >= col("last_put"))
      .groupBy("key")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seq"), col("value")))),
          _.getField("value")),
        "").as("value"))
  }

  /** Holistic per-key fold — the KvModel step function verbatim. */
  def replayHolistic(spark: SparkSession, ops: Dataset[KvOp]): Dataset[(String, String)] = {
    import spark.implicits._
    ops.groupByKey(_.key).mapGroups { (k, it) =>
      val state = it.toSeq.sortBy(_.seq).foldLeft("") { (st, o) =>
        o.op match {
          case KvOp.Put    => o.value
          case KvOp.Append => st + o.value
          case _           => st
        }
      }
      (k, state)
    }
  }

  /** Linearizable get over a replayed state: "" for missing keys
    * (src/models/kv.go:43-46, src/kvraft/client.go:28-31).
    */
  def get(state: DataFrame, key: String): String = {
    val rows = state.filter(col("key") === key).select("value").collect()
    if (rows.isEmpty) "" else rows(0).getString(0)
  }

  /** key2shard: first byte of key mod NShards
    * (/root/reference/src/shardkv/client.go:22-29).
    */
  val NShards = 10
  def shardOf(key: String): Int =
    if (key.isEmpty) 0 else (key.charAt(0).toInt % NShards)
  def shardCol(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(ascii(key), lit(NShards))

  /** Physical data movement for a shard-controller config: route each row
    * to the partition of the group owning its shard (the Spark analog of
    * the reference's shard migration — SURVEY.md §1.3: "rebalance =
    * repartition by the new shard→group map"). Groups are laid out in
    * ascending-gid order; one partition per group.
    */
  def repartitionByConfig(state: DataFrame, config: ShardConfig): DataFrame = {
    val gids = config.groups.keys.toSeq.sorted
    val gidIndex = gids.zipWithIndex.toMap
    val shardToPartition = config.shards.map(g => gidIndex.getOrElse(g, 0))
    val partitionCol = element_at(
      array(shardToPartition.map(lit): _*), shardCol(col("key")) + 1)
    state
      .withColumn("_gpart", partitionCol)
      .repartitionByRange(math.max(gids.size, 1), col("_gpart"))
      .drop("_gpart")
  }
}
