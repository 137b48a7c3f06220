package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate aggregates: error bounds vs exact, and determinism under
  * repartitioning (HLL merge is commutative+idempotent).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on real data") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx"),
        countDistinct($"l_partkey").as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx=$a exact=$e")
    }
  }

  test("approx_percentile within 1% of the exact percentile (q69 scale path)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(Exact.cents($"l_extendedprice").as("cents"), $"l_returnflag")
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_percentile($"cents", lit(0.5), lit(10000)).as("approx"),
        percentile($"cents", lit(0.5)).as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getDouble(2))
      assert(math.abs(a - e) / e < 0.01, s"${r.getString(0)}: approx=$a exact=$e")
    }
  }

  test("HLL result is deterministic under repartitioning") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(li) == run(li.repartition(13)))
  }

  test("HLL sketch union is associative: incremental merge == all-at-once merge (q144 contract)") {
    // 50k keys spread over 12 "days" via a hash mix — enough cardinality
    // to leave coupon mode (lgK=12 promotes past ~3k) and exercise the
    // real register-max path
    val rows = spark.range(0, 50000)
      .select((col("id") % 12).as("day"), xxhash64(col("id")).as("k"))
    val daily = rows.groupBy("day")
      .agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
      .localCheckpoint()
    def estimate(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("e"))
      .collect()(0).getLong(0)
    val allAtOnce = estimate(daily)
    // three different old/new split points, each folded as
    // merge(merge(old days), merge(new days))
    Seq(3L, 6L, 9L).foreach { cut =>
      val folded = daily.filter(col("day") < cut)
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
        .union(daily.filter(col("day") >= cut)
          .agg(hll_union_agg(col("sk"), lit(false)).as("sk")))
      assert(estimate(folded) == allAtOnce,
        s"incremental fold at day $cut diverged from the all-at-once union")
    }
    // and the estimate itself is within the lgK=12 error envelope
    assert(math.abs(allAtOnce - 50000.0) / 50000.0 < 0.05)
    // partition invariance of the whole incremental pipeline
    val daily2 = rows.repartition(17).groupBy("day")
      .agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
    assert(estimate(daily2) == allAtOnce)
  }
}
