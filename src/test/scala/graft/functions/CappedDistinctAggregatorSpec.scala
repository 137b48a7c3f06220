package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class CappedDistinctAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("groups within cap return the full sorted member list; over-cap groups poison to empty") {
    // group g: members 0..g*7 % 101 (distinct by construction); sizes 1..60
    val rows = for {
      g <- 1 to 60
      m <- 1 to g
    } yield (g.toLong, (m * 1000L + g))
    // spread across partitions so merge() (partial aggregation) is exercised
    val df = rows.toDF("g", "id").repartition(7)
    val capped = udaf(new CappedDistinctAggregator(40), Encoders.scalaLong)
    val got = df.groupBy("g").agg(capped($"id").as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (g <- 1 to 60) {
      if (g <= 40)
        assert(got(g.toLong) == (1 to g).map(m => m * 1000L + g).sorted,
          s"group $g must keep its full sorted list")
      else
        assert(got(g.toLong).isEmpty, s"group $g (size > cap) must poison to empty")
    }
  }

  test("BottomKAggregator: k smallest DISTINCT values, sorted, dup-safe, partition-invariant") {
    // values with repeats, spread across partitions
    val rows = for { g <- 1 to 3; v <- Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 11L) }
      yield (g.toLong, v + g * 100L)
    val df = rows.toDF("g", "v").repartition(5)
    val bk = udaf(new BottomKAggregator(4), Encoders.scalaLong)
    val got = df.groupBy("g").agg(bk($"v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (g <- 1L to 3L)
      assert(got(g) == Seq(1L, 3L, 5L, 7L).map(_ + g * 100L),
        s"group $g: ${got(g)}")
    // fewer distinct values than k -> all of them
    val small = Seq((1L, 5L), (1L, 5L), (1L, 2L)).toDF("g", "v")
    val s2 = small.groupBy("g").agg(bk($"v")).head().getSeq[Long](1)
    assert(s2 == Seq(2L, 5L))
  }

  test("exactly-at-cap group survives; cap+1 drops") {
    val df = ((1 to 5).map(m => (1L, m.toLong)) ++ (1 to 6).map(m => (2L, m.toLong)))
      .toDF("g", "id").repartition(3)
    val capped = udaf(new CappedDistinctAggregator(5), Encoders.scalaLong)
    val got = df.groupBy("g").agg(capped($"id").as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == (1L to 5L))
    assert(got(2L).isEmpty)
  }
}
