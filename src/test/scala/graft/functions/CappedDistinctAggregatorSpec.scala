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
