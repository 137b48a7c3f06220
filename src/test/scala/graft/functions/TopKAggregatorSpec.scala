package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def randomScored(n: Int, groups: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i =>
      (s"g${rnd.nextInt(groups)}", rnd.nextInt(1000).toDouble, i.toLong))
      .toDF("g", "score", "id")
  }

  test("TopKAggregator equals the row_number window on random data") {
    val df = randomScored(5000, 23, seed = 11).repartition(9)
    val topk = udaf(new TopKAggregator(5), Encoders.product[Scored])
    val got = df.groupBy("g")
      .agg(topk($"score", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "s")))
      .select($"g", ($"pos" + 1).as("rank"), $"s.score", $"s.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy($"score".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"g", $"rank", $"score", $"id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("TopKAggregator result is independent of partitioning (merge order)") {
    val topk = udaf(new TopKAggregator(4), Encoders.product[Scored])
    def run(parts: Int): Seq[(String, Seq[Scored])] = {
      randomScored(2000, 7, seed = 42).repartition(parts)
        .groupBy("g").agg(topk($"score", $"id").as("top"))
        .as[(String, Seq[Scored])].collect().toSeq.sortBy(_._1)
    }
    assert(run(2) == run(17))
  }

  test("groups smaller than k return all their rows, ordered") {
    val df = Seq(("a", 3.0, 1L), ("a", 9.0, 2L), ("b", 5.0, 3L)).toDF("g", "score", "id")
    val topk = udaf(new TopKAggregator(10), Encoders.product[Scored])
    val got = df.groupBy("g").agg(topk($"score", $"id").as("top"))
      .as[(String, Seq[Scored])].collect().toMap
    assert(got("a") == Seq(Scored(9.0, 2L), Scored(3.0, 1L)))
    assert(got("b") == Seq(Scored(5.0, 3L)))
  }

  test("plan runs partial+final aggregation (map-side k-pruning)") {
    val df = randomScored(1000, 5, seed = 7).repartition(4)
    val topk = udaf(new TopKAggregator(3), Encoders.product[Scored])
    val agg = df.groupBy("g").agg(topk($"score", $"id").as("top"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    val nAggs = "ObjectHashAggregate".r.findAllIn(plan).length +
      "SortAggregate".r.findAllIn(plan).length
    assert(nAggs >= 2, s"expected partial+final typed aggregation:\n$plan")
  }
}
