package graft.tools
import graft.{GraftSession, SparkEntry}

/** Repeated-run timer for catalog queries: surfaces run-to-run variance
  * that a min-of-2 bench hides. Usage: QTime <name>[,<name>…] [sfDir]
  * [runs] — multiple names share one JVM (the A/B-isolation workflow
  * times a handful of queries per checkout).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = GraftSession.getOrCreate("graft-qtime")
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      var best = Double.MaxValue
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        best = math.min(best, secs)
        println(f"[$q] run$i: $secs%.3f s rows=$c")
        // drop dead localCheckpoint blocks between runs, as Bench does —
        // accumulated blocks stall later runs by tens of seconds
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      println(f"[$q] best: $best%.3f s over $n runs")
    }
    spark.stop()
  }
}
