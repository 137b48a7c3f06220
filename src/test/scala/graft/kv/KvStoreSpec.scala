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

  // ---- concurrent-history linearizability (Porcupine-style) ----
  // The reference machine-checks OVERLAPPING client histories against the
  // KvModel (/root/reference/src/porcupine/porcupine.go, kvraft
  // test_test.go:369-377). Here: a generator produces interleaved client
  // ops with invocation/response intervals (get returns taken from a
  // hidden commit-point witness inside each interval), a backtracking
  // checker searches for ANY admissible linearization (real-time
  // precedence respected, get returns consistent with the KvModel step),
  // and the found order — fed back through the engine's relational
  // replay — must reproduce the checker's final state.

  /** One invoked operation: [inv, res] interval and observed get return. */
  private case class HOp(id: Int, op: String, key: String, value: String,
      inv: Long, res: Long, ret: String)

  /** Search for an admissible linearization: repeatedly pick an op whose
    * interval started before every unchosen op's response (real-time
    * order), whose get return matches the simulated state. */
  private def linearize(history: List[HOp]): Option[List[HOp]] = {
    def step(remaining: List[HOp], state: Map[String, String],
        acc: List[HOp]): Option[List[HOp]] = remaining match {
      case Nil => Some(acc.reverse)
      case _ =>
        val minRes = remaining.map(_.res).min
        remaining.filter(_.inv <= minRes).sortBy(_.id).foldLeft(None: Option[List[HOp]]) {
          case (found @ Some(_), _) => found
          case (None, o) =>
            val cur = state.getOrElse(o.key, "")
            o.op match {
              case KvOp.Get if o.ret != cur => None // inconsistent here; try next
              case KvOp.Get =>
                step(remaining.filterNot(_.id == o.id), state, o :: acc)
              case KvOp.Put =>
                step(remaining.filterNot(_.id == o.id),
                  state.updated(o.key, o.value), o :: acc)
              case KvOp.Append =>
                step(remaining.filterNot(_.id == o.id),
                  state.updated(o.key, cur + o.value), o :: acc)
            }
        }
    }
    step(history, Map.empty, Nil)
  }

  /** Overlapping histories with a hidden witness: each client runs ops
    * sequentially, clients interleave; every op commits at a point inside
    * its interval, and gets observe the state at their commit point. */
  private val genHistory: Gen[List[HOp]] = for {
    nClients <- Gen.choose(2, 4)
    opsPer <- Gen.choose(2, 4)
    keys = Seq("x", "y")
    raw <- Gen.sequence[List[(Int, String, String, String, Long, Long, Long)],
        (Int, String, String, String, Long, Long, Long)](
      (0 until nClients).flatMap(c => (0 until opsPer).map(i => for {
        op <- Gen.oneOf(KvOp.Get, KvOp.Put, KvOp.Append)
        key <- Gen.oneOf(keys)
        v <- Gen.choose(0, 9).map(d => s"$c$i$d")
        // client-local slot [i*100, i*100+99]; random sub-interval + commit
        a <- Gen.choose(i * 100L, i * 100L + 40)
        b <- Gen.choose(i * 100L + 60, i * 100L + 99)
        commit <- Gen.choose(a, b)
      } yield (c * 100 + i, op, key, v, a, b, commit))).toList)
  } yield {
    // apply at commit points to fix get returns (the witness)
    val byCommit = raw.sortBy(_._7)
    var st = Map.empty[String, String]
    val withRet = byCommit.map { case (id, op, key, v, a, b, _) =>
      val cur = st.getOrElse(key, "")
      op match {
        case KvOp.Put    => st = st.updated(key, v);       HOp(id, op, key, v, a, b, "")
        case KvOp.Append => st = st.updated(key, cur + v); HOp(id, op, key, v, a, b, "")
        case KvOp.Get    =>                                HOp(id, op, key, v, a, b, cur)
      }
    }
    withRet.sortBy(_.id)
  }

  test("linearizability: overlapping client histories admit a linearization matching the fold") {
    checkProp(Prop.forAll(genHistory) { history =>
      linearize(history) match {
        case None => false // witness exists by construction — must be found
        case Some(order) =>
          // the linearization, replayed by the ENGINE in that order, must
          // end in the same state the checker's model fold reached
          val ops = order.zipWithIndex.map { case (o, i) =>
            KvOp(i.toLong, o.op, o.key, o.value)
          }
          val mutated = ops.filter(_.op != KvOp.Get).map(_.key).toSet
          val got = KvStore.replay(ops.toDF())
            .collect().map(r => r.getString(0) -> r.getString(1)).toMap
          val want = model(ops).filter { case (k, _) => mutated.contains(k) }
          got == want
      }
    }, minSuccessful = 25)
  }

  test("linearizability checker rejects non-linearizable histories") {
    // stale read: Get(x) overlapping nothing observes "" AFTER Put(x,"1")
    // completed — no admissible order exists
    val stale = List(
      HOp(0, KvOp.Put, "x", "1", 0, 10, ""),
      HOp(1, KvOp.Get, "x", "", 20, 30, ""))
    assert(linearize(stale).isEmpty, "stale read accepted")
    // phantom read: value never written
    val phantom = List(
      HOp(0, KvOp.Put, "x", "1", 0, 10, ""),
      HOp(1, KvOp.Get, "x", "", 5, 15, "2"))
    assert(linearize(phantom).isEmpty, "phantom read accepted")
    // lost append: get sees the put but not the append that completed first
    val lost = List(
      HOp(0, KvOp.Put, "x", "1", 0, 10, ""),
      HOp(1, KvOp.Append, "x", "2", 20, 30, ""),
      HOp(2, KvOp.Get, "x", "", 40, 50, "1"))
    assert(linearize(lost).isEmpty, "lost append accepted")
    // sanity: the concurrent variant of the stale read IS linearizable
    val concurrent = List(
      HOp(0, KvOp.Put, "x", "1", 0, 10, ""),
      HOp(1, KvOp.Get, "x", "", 5, 15, ""))
    assert(linearize(concurrent).nonEmpty)
  }
}
