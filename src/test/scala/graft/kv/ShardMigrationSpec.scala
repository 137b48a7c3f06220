package graft.kv

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

/** Sharded-KV migration replay across config changes — the reference
  * pins shard MOVEMENT between successive configs, not just each config
  * in isolation (/root/reference/src/shardkv/client.go:68-130 re-homes
  * every key per config; /root/reference/src/shardctrler/common.go:6-16
  * states the rebalance contract). This spec replays a
  * Join→Join→Leave→Move history with op batches interleaved between
  * config steps: after every step the state is physically re-homed with
  * `repartitionByConfig`, the next batch applies ON TOP of the migrated
  * data (so lost or duplicated migration state cannot hide), and two
  * invariants hold throughout:
  *   (1) content — the union of all groups' partitions equals the
  *       sequential KvModel fold of every op so far;
  *   (2) placement — every key's row sits in the partition of the group
  *       owning its shard under the current config.
  */
class ShardMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def model(ops: Seq[KvOp]): Map[String, String] =
    ops.sortBy(_.seq).foldLeft(Map.empty[String, String]) { (m, o) =>
      o.op match {
        case KvOp.Put    => m.updated(o.key, o.value)
        case KvOp.Append => m.updated(o.key, m.getOrElse(o.key, "") + o.value)
        case _           => m
      }
    }

  test("Join -> Join -> Leave -> Move history re-homes keys and preserves every append") {
    val sc = new ShardCtrler()
    var allOps = Vector.empty[KvOp]
    var seq = 0L
    // state as (key, value), carried ACROSS steps through the migrated
    // frame — batch i+1 applies to the physically re-homed output of
    // batch i, exactly like a group serving ops from migrated shards
    var state = Seq.empty[(String, String)].toDF("key", "value")

    def applyBatch(cfg: ShardConfig, batch: Seq[(String, String, String)]): Unit = {
      val ops = batch.map { case (op, k, v) => seq += 1; KvOp(seq, op, k, v) }
      allOps ++= ops
      // current state folds in as a baseline put BELOW every new seq —
      // replay then applies the batch on top of it per key
      val baseline = state.select(lit(0L).as("seq"), lit(KvOp.Put).as("op"),
        $"key", $"value")
      state = KvStore.replay(baseline.unionByName(
        ops.toDF().select($"seq", $"op", $"key", $"value")))
      val parted = KvStore.repartitionByConfig(state, cfg)
      // (2) placement under the CURRENT config
      val gidIndex = cfg.groups.keys.toSeq.sorted.zipWithIndex.toMap
      val placed = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
        it.map(r => (pid, r.getString(0)))
      }.collect()
      placed.foreach { case (pid, key) =>
        val owner = cfg.shards(KvStore.shardOf(key))
        assert(gidIndex(owner) == pid,
          s"cfg ${cfg.num}: key $key (shard ${KvStore.shardOf(key)}, " +
            s"owner $owner) landed in partition $pid")
      }
      // (1) content == sequential KvModel fold of the whole history
      val got = parted.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == model(allOps),
        s"cfg ${cfg.num}: migrated state diverged from the KvModel fold")
      state = parted
    }

    // keys spanning many shards: shard = first char % 10
    val keys = ('a' to 'j').map(_.toString)

    // cfg1: one group owns everything; seed every key
    val cfg1 = sc.join(Map(1 -> Seq("s1")))
    applyBatch(cfg1, keys.map(k => (KvOp.Put, k, s"base-$k-")))

    // cfg2: two more groups join — most shards re-home off g1; appends
    // must land on the MIGRATED values
    val cfg2 = sc.join(Map(2 -> Seq("s2"), 3 -> Seq("s3")))
    applyBatch(cfg2, keys.map(k => (KvOp.Append, k, "x")))

    // cfg3: the original group leaves — its shards' data re-homes again;
    // appends to those keys prove nothing was lost or doubled
    val cfg3 = sc.leave(Seq(1))
    assert(!cfg3.shards.contains(1), "departed gid still owns shards")
    applyBatch(cfg3, keys.map(k => (KvOp.Append, k, "y")) ++
      Seq((KvOp.Put, "e", "fresh-"), (KvOp.Append, "e", "z")))

    // cfg4: admin Move of key "a"'s shard to g3, then touch every key
    val cfg4 = sc.move(KvStore.shardOf("a"), 3)
    assert(cfg4.shards(KvStore.shardOf("a")) == 3)
    applyBatch(cfg4, keys.map(k => (KvOp.Append, k, "w")))

    // end-to-end: values accumulated across all four configs
    val fin = state.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fin("a") == "base-a-xyw", s"got ${fin("a")}")
    assert(fin("e") == "fresh-zw", s"got ${fin("e")}")
  }
}
