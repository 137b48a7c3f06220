package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest at-or-before match, inclusive ties, null when none") {
    val left = Seq(
      (1L, 10L), (1L, 20L), (1L, 5L), // key 1 at ts 10, 20, 5
      (2L, 100L),                     // key 2: no right rows at all
      (3L, 50L))                      // key 3: exact-ts match
      .toDF("k", "ts")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 15L, "r15"),
      (3L, 50L, "r50"))
      .toDF("k", "rts", "v")
    val got = Temporal.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2))).toMap
    assert(got((1L, 5L)).isEmpty, "match before any right row must be null")
    assert(got((1L, 10L)).contains("r10"), "inclusive: equal ts matches")
    assert(got((1L, 20L)).contains("r15"), "latest prior, not first")
    assert(got((2L, 100L)).isEmpty)
    assert(got((3L, 50L)).contains("r50"))
  }

  test("asofJoin preserves left row count (left-outer semantics)") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_id", $"user_id", timestamp_micros(($"ts" / 1000L).cast("long")).as("ts"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(max("o_totalprice").as("order_price"))
    val joined = Temporal.asofJoin(e, o, "user_id", "ts", "o_orderdate",
      Seq("o_orderdate", "order_price"))
    assert(joined.count() == e.count())
  }

  test("asofJoin plan: single shuffle on key, no non-equi join") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_id", $"user_id", timestamp_micros(($"ts" / 1000L).cast("long")).as("ts"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(max("o_totalprice").as("order_price"))
    val plan = Temporal.asofJoin(e, o, "user_id", "ts", "o_orderdate",
      Seq("order_price")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
  }
}
