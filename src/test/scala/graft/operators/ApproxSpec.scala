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
}
