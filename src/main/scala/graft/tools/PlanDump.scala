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
      println(df.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
