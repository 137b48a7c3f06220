package graft.kv

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's rebalance invariants
  * (/root/reference/src/shardctrler/test_test.go:12-53): every shard owned
  * by a live group, counts differ by ≤1, minimal movement.
  */
class ShardCtrlerSpec extends AnyFunSuite with graft.PropHelper {

  private def checkInvariants(c: ShardConfig): Unit = {
    if (c.groups.nonEmpty) {
      assert(c.shards.forall(c.groups.contains),
        s"shard owned by dead group: ${c.shards} vs ${c.groups.keySet}")
      val counts = c.groups.keys.map(g => c.shards.count(_ == g))
      assert(counts.max - counts.min <= 1, s"unbalanced: $counts")
    } else {
      assert(c.shards.forall(_ == 0))
    }
  }

  private def moved(a: ShardConfig, b: ShardConfig): Int =
    a.shards.zip(b.shards).count { case (x, y) => x != y }

  test("join/leave sequence keeps invariants; movement is minimal") {
    val sc = new ShardCtrler()
    val c1 = sc.join(Map(1 -> Seq("s1")))
    checkInvariants(c1)
    assert(c1.shards.forall(_ == 1))
    val c2 = sc.join(Map(2 -> Seq("s2")))
    checkInvariants(c2)
    assert(moved(c1, c2) == 5, "exactly half the shards move when 2nd group joins")
    val c3 = sc.join(Map(3 -> Seq("s3")))
    checkInvariants(c3)
    // 10 shards over 3 groups: targets 4/3/3 — at most 3 move (only from overfull)
    assert(moved(c2, c3) <= 3)
    val c4 = sc.leave(Seq(1))
    checkInvariants(c4)
    // only shards that belonged to group 1 move
    assert(c3.shards.zip(c4.shards).forall { case (o, n) => o == n || o == 1 })
  }

  test("move is honored verbatim") {
    val sc = new ShardCtrler()
    sc.join(Map(1 -> Seq("s1"), 2 -> Seq("s2")))
    val c = sc.move(3, 2)
    assert(c.shards(3) == 2)
  }

  test("query returns historical configs; -1 and overflow return latest") {
    val sc = new ShardCtrler()
    sc.join(Map(1 -> Seq("s1")))
    sc.join(Map(2 -> Seq("s2")))
    assert(sc.query(0).num == 0)
    assert(sc.query(1).shards.forall(_ == 1))
    assert(sc.query(-1).num == 2)
    assert(sc.query(99).num == 2)
  }

  test("random join/leave histories keep invariants and minimal movement") {
    val genStep: Gen[Either[Int, Int]] =
      Gen.oneOf(Gen.choose(1, 8).map(Left(_)), Gen.choose(1, 8).map(Right(_)))
    checkProp(Prop.forAll(Gen.listOfN(24, genStep)) { steps =>
      val sc = new ShardCtrler()
      var prev = sc.latest
      var ok = true
      steps.foreach {
        case Left(g) =>
          if (!sc.latest.groups.contains(g)) {
            val c = sc.join(Map(g -> Seq(s"srv$g")))
            checkInvariants(c)
            // minimal movement: shards only move INTO the new group
            ok &= prev.shards.zip(c.shards).forall { case (o, n) => o == n || n == g }
            prev = c
          }
        case Right(g) =>
          if (sc.latest.groups.contains(g)) {
            val c = sc.leave(Seq(g))
            checkInvariants(c)
            ok &= prev.shards.zip(c.shards).forall { case (o, n) => o == n || o == g }
            prev = c
          }
      }
      ok
    }, minSuccessful = 200)
  }
}
