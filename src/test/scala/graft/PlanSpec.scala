package graft

import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan assertions — the 100 TB properties must not regress:
  * filters/columns reach the parquet scan, dims broadcast, aggregations
  * run partial+final (map-side combine), hot paths stay in codegen.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q2: filters and projection are pushed into the parquet scan") {
    val plan = planOf("q2_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filter not pushed:\n$plan")
    // column pruning: untouched wide columns never leave the scan
    assert(!plan.contains("l_comment") && !plan.contains("l_tax"),
      "scan reads pruned columns")
  }

  test("q5: dimension joins broadcast (no shuffle of the fact side for dims)") {
    val plan = planOf("q5_multi_join")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q1/q21: aggregation is partial+final (map-side combine)") {
    Seq("q1_agg", "q21_wordcount").foreach { q =>
      val plan = planOf(q)
      val nAggs = "HashAggregate".r.findAllIn(plan).length
      assert(nAggs >= 2,
        s"$q: expected partial+final HashAggregate, found $nAggs:\n$plan")
    }
  }

  test("q1: hot path is whole-stage codegen") {
    // AQE finalizes the plan only after execution — run, then inspect
    val df = SparkEntry.queries("q1_agg")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n)" in the simple plan form
    assert(plan.contains("*("), s"no codegen spans:\n$plan")
  }

  test("q29 ANN: corpus side is not shuffled (broadcast of query set only)") {
    val plan = planOf("q29_ann_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$plan")
  }
}
