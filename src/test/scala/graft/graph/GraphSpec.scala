package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankMicro: hub outranks leaves, results deterministic across partitionings") {
    // star: every leaf points at the hub and back (bidirectional)
    val star = (1L to 20L).flatMap(i => Seq((i, 0L), (0L, i))).toDF("src", "dst")
    val r = Graph.pageRankMicro(star, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) * 5, s"hub should dominate: $r")
    assert((1L to 20L).map(r).distinct.size == 1, "symmetric leaves must tie exactly")
    // repartitioned input yields bit-identical ranks (integer arithmetic)
    val r2 = Graph.pageRankMicro(star.repartition(7), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == r)
  }

  test("pageRankMicro: disconnected components rank independently") {
    // two disjoint 2-cycles: all four nodes symmetric → equal ranks
    val e = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val r = Graph.pageRankMicro(e, 3).collect().map(x => x.getLong(1)).distinct
    assert(r.length == 1)
    // a node's rank in a 2-cycle: every round it receives the other's
    // full mass → fixpoint at 150000 + 85% of 1e6-ish; just pin >0
    assert(r.head > 0)
  }

  test("labelPropagation: bridged triangles stay two communities (where CC would merge them)") {
    def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
      pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val e = undirected(
      (1L, 2L), (2L, 3L), (3L, 1L),      // triangle A
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle B
      (3L, 10L)                           // single bridge
    ).toDF("src", "dst")
    val labels = Graph.labelPropagation(e, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val a = Set(1L, 2L, 3L).map(labels)
    val b = Set(10L, 11L, 12L).map(labels)
    assert(a.size == 1, s"triangle A must agree on one label: $labels")
    assert(b.size == 1, s"triangle B must agree on one label: $labels")
    assert(a != b, s"the bridge alone must not merge the communities: $labels")
    // bit-deterministic across partitionings
    val labels2 = Graph.labelPropagation(e.repartition(5), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels2 == labels)
  }

  test("labelPropagation: a clique converges to one community with the smallest-id label") {
    val ids = (1L to 6L)
    val e = (for { a <- ids; b <- ids if a != b } yield (a, b)).toDF("src", "dst")
    val labels = Graph.labelPropagation(e, 3)
      .collect().map(x => x.getLong(1)).distinct
    // round 1: every node's neighbor labels are all-distinct singles →
    // tie → min over neighbors; node 1 takes 2, everyone else takes 1;
    // by round 2 label 1 dominates everywhere and stays
    assert(labels.toSeq == Seq(1L), s"clique must collapse to label 1, got ${labels.toSeq}")
  }

  test("triangleCount: hand graphs — K4 has 4, a path has 0, dup/reversed edges collapse") {
    def count(pairs: (Long, Long)*): (Long, Long, Long) = {
      val r = Graph.triangleCount(pairs.toDF("u", "v")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    assert(count(k4: _*) == ((4L, 6L, 4L)), "K4: C(4,3) = 4 triangles")
    assert(count((1L, 2L), (2L, 3L), (3L, 4L)) == ((4L, 3L, 0L)), "path has none")
    // duplicates, reversed duplicates, and self-loops normalize away
    assert(count((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L)) ==
      ((3L, 3L, 1L)))
  }

  test("boundedHops: min hop distance on a hand graph; unreachable nodes absent") {
    // path 1→2→3→4→5 plus a shortcut 1→4 and an isolated pair 10→11
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val src = Seq(1L).toDF("id")
    val got = Graph.boundedHops(e, src, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut wins: 4 is at hop 1, 5 at hop 2, never the path-length 3/4
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L),
      s"got $got")
  }

  test("boundedHops: maxHops truncates; drained frontier short-circuits; multi-source min wins") {
    val chain = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("src", "dst")
    val truncated = Graph.boundedHops(chain, Seq(1L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truncated == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // two sources: every node takes the NEARER one
    val multi = Graph.boundedHops(chain, Seq(1L, 5L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 2L, 4L -> 3L))
    // frontier drains at hop 1 on a single edge — result still exact
    val tiny = Graph.boundedHops(Seq((1L, 2L)).toDF("src", "dst"),
      Seq(1L).toDF("id"), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny == Map(1L -> 0L, 2L -> 1L))
  }

  test("triangleCount matches a sequential reference on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val r = Graph.triangleCount(pairs.toDF("u", "v")).head()
    val adj = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      x <- nodes; y <- nodes if y > x && adj(x)(y)
      z <- nodes if z > y && adj(x)(z) && adj(y)(z)
    } yield 1).size.toLong
    assert(r.getLong(2) == want, s"got ${r.getLong(2)} want $want")
  }

  test("kCorePeel matches a sequential peel on a pseudo-random graph; clique survives, tree dies") {
    import graft.graph.Graph
    val rnd = new scala.util.Random(17)
    val pairs = (for (_ <- 1 to 260) yield {
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val got = Graph.kCorePeel(pairs.toDF("u", "v"), k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sequential reference: 4 peel rounds
    var es = pairs.toSet
    for (_ <- 1 to 4) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      es = es.filter(e => deg(e._1) >= 3 && deg(e._2) >= 3)
    }
    val want = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == want, s"got ${got.size} nodes, want ${want.size}")

    // a K5 clique is its own 3-core (fixpoint, survives any rounds)
    val k5 = (for (a <- 0L to 4L; b <- a + 1 to 4L) yield (a, b))
    val core = Graph.kCorePeel(k5.toDF("u", "v"), k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == (0L to 4L).map(_ -> 4L).toMap)
    // a path (tree) has no 3-core: fully peeled within rounds
    val path = (0L to 9L).sliding(2).map(s => (s.head, s.last)).toSeq
    assert(Graph.kCorePeel(path.toDF("u", "v"), k = 3, rounds = 4)
      .count() == 0L)
  }

  test("localClustering matches a sequential reference; clique = 10000, star center = 0") {
    import graft.graph.Graph
    val rnd = new scala.util.Random(31)
    val pairs = (for (_ <- 1 to 220) yield {
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val got = Graph.localClustering(pairs.toDF("u", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val adj = pairs.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    adj.foreach { case (n, nbrs) =>
      val d = nbrs.size.toLong
      val tri = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x)(y) }.toLong
      val lcc = if (d >= 2) 10000L * 2 * tri / (d * (d - 1)) else -1L
      assert(got(n) == ((d, tri, lcc)), s"node $n: ${got(n)} vs ($d,$tri,$lcc)")
    }
    // closed-form shapes
    val k4 = for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)
    val cl = Graph.localClustering(k4.toDF("u", "v")).collect()
    assert(cl.forall(r => r.getLong(3) == 10000L), "K4 nodes must be 10000")
    val star = (1L to 5L).map(i => (0L, i))
    val st = Graph.localClustering(star.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st(0L).getLong(3) == 0L, "star center has no closed wedge")
    assert((1L to 5L).forall(i => st(i).isNullAt(3)), "leaves are NULL (d=1)")
  }

  test("modularity: closed forms — two cliques high, perfect-split zero, one-community zero-ish") {
    def bidir(pairs: Seq[(Long, Long)]) =
      pairs.flatMap(e => Seq(e, e.swap)).toDF("src", "dst")
    // two disjoint K4s, labeled by component: every edge intra.
    // m=12, E=12, each d_c = 12 → S = 288; Q = (4·12·12 − 288)/(4·144)
    // = 288/576 = 0.5 exactly
    val twoK4 = (for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)) ++
      (for (a <- 10L to 13L; b <- a + 1 to 13L) yield (a, b))
    val lab2 = ((0L to 3L).map(_ -> 0L) ++ (10L to 13L).map(_ -> 1L))
      .toDF("id", "label")
    val r2 = Graph.modularity(bidir(twoK4), lab2).head()
    assert(r2.getLong(0) == 8 && r2.getLong(1) == 2 &&
      r2.getLong(2) == 12 && r2.getLong(3) == 12 && r2.getLong(4) == 5000L,
      s"two-clique Q must be exactly 0.5: $r2")
    // everything in ONE community: E = m and S = (2m)² → Q = 0 exactly
    val lab1 = (0L to 13L).map(_ -> 0L).toDF("id", "label")
    assert(Graph.modularity(bidir(twoK4), lab1).head().getLong(4) == 0L)
    // adversarial: each K4 SPLIT across two labels → intra-poor,
    // Q negative — pins the explicit-floor path (truncating div would
    // round toward zero instead)
    val labBad = (0L to 13L).map(n => n -> (n % 2)).toDF("id", "label")
    val qBad = Graph.modularity(bidir(twoK4), labBad).head().getLong(4)
    assert(qBad < 0L, s"split-clique partition must score negative: $qBad")
    // sequential reference on a pseudo-random graph + LPA labels
    val rnd = new scala.util.Random(17)
    val pairs = (for (_ <- 1 to 150) yield {
      val a = rnd.nextInt(30).toLong; val b = rnd.nextInt(30).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val edges = bidir(pairs)
    val labels = Graph.labelPropagation(edges, 3)
    val got = Graph.modularity(edges, labels).head()
    val labMap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = pairs.size.toLong
    val deg = pairs.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val dcs = deg.groupBy { case (n, _) => labMap(n) }
      .map { case (_, ds) => ds.values.sum }
    val s2 = dcs.map(d => d * d).sum
    val intra = pairs.count(e => labMap(e._1) == labMap(e._2)).toLong
    val num = 10000L * (4L * m * intra - s2)
    val den = 4L * m * m
    val qRef = java.math.BigDecimal.valueOf(num)
      .divide(java.math.BigDecimal.valueOf(den), 0,
        java.math.RoundingMode.FLOOR).longValueExact()
    assert(got.getLong(2) == m && got.getLong(3) == intra &&
      got.getLong(4) == qRef, s"got $got, want m=$m intra=$intra q=$qRef")
  }

  test("modularity: exact past the Long overflow bound (m = 1.6e7 edges)") {
    // 10⁴·(4mE − S) passes 2⁶³ once m ≳ 1.5·10⁷ with S ≪ 4mE — Long
    // arithmetic would throw under ANSI (or silently wrap without it);
    // the DECIMAL(38,0) path must stay exact. 32M directed rows on 1000
    // nodes (multigraph of self-loops, one community per node): each
    // node is src of 32000 rows → dsum = 32000 per 1-node community,
    // m = E = 16·10⁶, S = 1000·32000² = 1.024e12,
    // num = 10⁴·(4·16e6·16e6 − S) ≈ 1.023e19 > 2⁶³. Q = 9990 bp exactly.
    val spark2 = spark
    import spark2.implicits._
    val edges = spark.range(32L * 1000 * 1000)
      .select(($"id" % 1000).as("src"), ($"id" % 1000).as("dst"))
    val labels = spark.range(1000).select($"id", $"id".as("label"))
    val r = Graph.modularity(edges, labels).head()
    assert(r.getLong(2) == 16000000L && r.getLong(3) == 16000000L,
      s"m/intra: $r")
    // num = 10⁴·(4·16e6·16e6 − 1000·32000²) = 10²²·1.022976
    // den = 4·(16e6)² = 1.024e15 → Q = 9990.0 bp exactly
    assert(r.getLong(4) == 9990L, s"q_bp past the Long bound: $r")
  }
}
