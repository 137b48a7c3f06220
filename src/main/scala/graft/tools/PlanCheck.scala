package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump formatted physical plans for the given query names (or
  * the headline set) so scan pruning / pushdown / join strategies can be
  * audited. Usage: runMain graft.tools.PlanCheck [sfDir] [q1 q2 ...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.headlines.map(_.name)
    val spark = GraftSession.getOrCreate("graft-plancheck")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
