package graft.tools
import graft.{GraftSession, SparkEntry}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-plandump")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(s"==== $q ====")
      // full EXECUTED plan (post-AQE): runtime stage reuse
      // (ReusedExchange / table-cache hits) only appears here, never in
      // the pre-execution explain
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
