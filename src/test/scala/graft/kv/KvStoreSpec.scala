package graft.kv

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}

/** Model-based checks: both replay forms must equal the in-memory KvModel
  * fold (/root/reference/src/models/kv.go:40-54) on random histories.
  */
class KvStoreSpec extends SparkSpec with graft.PropHelper {
  import spark.implicits._

  /** In-memory reference fold — the KvModel step function. */
  private def model(ops: Seq[KvOp]): Map[String, String] =
    ops.sortBy(_.seq).foldLeft(Map.empty[String, String]) { (m, o) =>
      o.op match {
        case KvOp.Put    => m.updated(o.key, o.value)
        case KvOp.Append => m.updated(o.key, m.getOrElse(o.key, "") + o.value)
        case _           => m
      }
    }

  private val genOps: Gen[List[KvOp]] = for {
    n <- Gen.choose(1, 120)
    ops <- Gen.listOfN(n, for {
      op <- Gen.oneOf(KvOp.Get, KvOp.Put, KvOp.Append)
      key <- Gen.oneOf("a", "b", "c", "x7", "zz")
      v <- Gen.alphaNumStr.map(_.take(4))
    } yield (op, key, v))
  } yield ops.zipWithIndex.map { case ((op, k, v), i) => KvOp(i.toLong, op, k, v) }

  test("relational replay == KvModel fold on random histories") {
    checkProp(Prop.forAll(genOps) { ops =>
      val got = KvStore.replay(ops.toDF())
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val want = model(ops).filter { case (k, _) =>
        // keys only ever read (get) never enter the state table
        ops.exists(o => o.key == k && o.op != KvOp.Get)
      }
      got == want
    }, minSuccessful = 30)
  }

  test("holistic replay == relational replay") {
    checkProp(Prop.forAll(genOps) { ops =>
      val rel = KvStore.replay(ops.toDF())
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val hol = KvStore.replayHolistic(spark, ops.toDS())
        .collect().toMap
        .filter { case (k, _) => rel.contains(k) || rel.keySet.contains(k) }
      // holistic includes keys that only saw gets (state ""): drop them
      val holData = hol.filter { case (k, _) =>
        ops.exists(o => o.key == k && o.op != KvOp.Get)
      }
      rel == holData
    }, minSuccessful = 20)
  }

  test("get semantics: missing key returns empty string") {
    val st = KvStore.replay(Seq(KvOp(0, "put", "a", "v")).toDF())
    assert(KvStore.get(st, "a") == "v")
    assert(KvStore.get(st, "nope") == "")
  }

  test("append to missing key acts like put") {
    val st = KvStore.replay(Seq(KvOp(0, "append", "k", "x"),
      KvOp(1, "append", "k", "y")).toDF())
    assert(KvStore.get(st, "k") == "xy")
  }

  test("repartitionByConfig co-locates keys of the same shard owner") {
    val sc = new ShardCtrler()
    sc.join(Map(1 -> Seq("s1")))
    val cfg = sc.join(Map(2 -> Seq("s2")))
    val state = (0 until 200).map(i => (s"${('a' + i % 26).toChar}k$i", s"v$i"))
      .toDF("key", "value")
    val parted = KvStore.repartitionByConfig(state, cfg)
    assert(parted.rdd.getNumPartitions == 2)
    assert(parted.count() == 200)
    // every partition holds keys of only one group's shards
    val gidIndex = cfg.groups.keys.toSeq.sorted.zipWithIndex.toMap
    val rows = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map(r => (pid, r.getString(0)))
    }.collect()
    rows.foreach { case (pid, key) =>
      val owner = cfg.shards(KvStore.shardOf(key))
      assert(gidIndex(owner) == pid,
        s"key $key (shard ${KvStore.shardOf(key)}, owner $owner) in partition $pid")
    }
  }

  test("shardOf matches reference key2shard") {
    // int(key[0]) % 10 — /root/reference/src/shardkv/client.go:22-29
    assert(KvStore.shardOf("a") == 'a'.toInt % 10)
    assert(KvStore.shardOf("0") == '0'.toInt % 10)
    assert(KvStore.shardOf("") == 0)
  }
}
