package graft.tools
import graft.{GraftSession, SparkEntry}

/** Repeated-run timer for one catalog query: surfaces run-to-run variance
  * that a min-of-2 bench hides. Usage: QTime <name> [sfDir] [runs].
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = GraftSession.getOrCreate("graft-qtime")
    val fn = SparkEntry.queries(q)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, dir).count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
      // drop dead localCheckpoint blocks between runs, as Bench does —
      // accumulated blocks stall later runs by tens of seconds
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
