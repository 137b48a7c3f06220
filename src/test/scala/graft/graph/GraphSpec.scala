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
}
