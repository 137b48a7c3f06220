package graft.kv

import scala.collection.mutable

/** Versioned shard→group assignment config, mirroring
  * /root/reference/src/shardctrler/common.go:25-29: `num` is the config
  * version, `shards(i)` the gid owning shard i (0 = unassigned), `groups`
  * the gid → server list map.
  */
final case class ShardConfig(
    num: Int,
    shards: Vector[Int],
    groups: Map[Int, Seq[String]])

/** The shard controller's metadata surface — Join/Leave/Move/Query with
  * the rebalancing contract stated in
  * /root/reference/src/shardctrler/common.go:6-16 and enforced by
  * /root/reference/src/shardctrler/test_test.go:12-53:
  *   (1) every shard is owned by a live group,
  *   (2) shard counts across groups differ by at most 1,
  *   (3) as few shards as possible move between consecutive configs.
  *
  * Deterministic greedy rebalance: groups in ascending gid order receive
  * ceil/floor targets; only orphaned shards (departed owner) or shards
  * above their owner's target move. Pure metadata — actual data movement
  * in the engine is a `repartition` by the new assignment (SURVEY.md §1.3).
  */
final class ShardCtrler(nShards: Int = KvStore.NShards) {
  private val configs = mutable.ArrayBuffer(
    ShardConfig(0, Vector.fill(nShards)(0), Map.empty))

  def latest: ShardConfig = configs.last

  def query(num: Int): ShardConfig =
    if (num < 0 || num >= configs.size) configs.last else configs(num)

  def join(newGroups: Map[Int, Seq[String]]): ShardConfig =
    push(rebalance(latest.shards, latest.groups ++ newGroups))

  def leave(gids: Seq[Int]): ShardConfig = {
    val remaining = latest.groups -- gids
    val orphaned = latest.shards.map(g => if (gids.contains(g)) 0 else g)
    push(rebalance(orphaned, remaining))
  }

  def move(shard: Int, gid: Int): ShardConfig =
    push((latest.shards.updated(shard, gid), latest.groups))

  private def push(sg: (Vector[Int], Map[Int, Seq[String]])): ShardConfig = {
    val cfg = ShardConfig(latest.num + 1, sg._1, sg._2)
    configs += cfg
    cfg
  }

  private def rebalance(
      current: Vector[Int],
      groups: Map[Int, Seq[String]]): (Vector[Int], Map[Int, Seq[String]]) = {
    if (groups.isEmpty) return (Vector.fill(nShards)(0), groups)
    val gids = groups.keys.toVector.sorted
    val base = nShards / gids.size
    val extra = nShards % gids.size
    // target count per gid: first `extra` gids (ascending) get base+1
    val target = gids.zipWithIndex.map { case (g, i) =>
      g -> (base + (if (i < extra) 1 else 0))
    }.toMap
    val owned = mutable.Map(gids.map(g => g -> mutable.ArrayBuffer[Int]()): _*)
    val free = mutable.ArrayBuffer[Int]()
    current.zipWithIndex.foreach { case (g, shard) =>
      if (owned.contains(g)) owned(g) += shard else free += shard
    }
    // strip overfull groups (highest shard indices first → deterministic)
    gids.foreach { g =>
      while (owned(g).size > target(g)) {
        free += owned(g).remove(owned(g).size - 1)
      }
    }
    // hand free shards (ascending) to underfull groups (ascending gid)
    val freeSorted = free.sorted
    var fi = 0
    val result = current.toArray
    gids.foreach { g =>
      while (owned(g).size < target(g)) {
        val shard = freeSorted(fi); fi += 1
        owned(g) += shard
      }
    }
    owned.foreach { case (g, shards) => shards.foreach(sh => result(sh) = g) }
    (result.toVector, groups)
  }
}
