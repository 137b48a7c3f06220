package graft.tools

import graft.{Bench, GraftSession, SparkEntry}
import scala.util.Random

/** Session-order robustness study for the headline bench: run the full
  * headline suite in N deterministic pseudo-random orders inside ONE
  * shared JVM (the bench's own execution shape) and report per-query
  * order-to-order variance. Every per-query timing uses the bench's
  * exact protocol (Bench.timeQuery: boundary GC, block cleanup,
  * converged min-of-runs), so the residual spread is attributable to
  * SESSION ORDER — JIT/code-cache state, heap occupancy, AQE stat
  * carry-over — not to protocol differences.
  *
  * Purpose: the BenchDiff gate's 25% / 0.25 s floor was judgment; this
  * measures the floor. A query whose max/min across orders exceeds the
  * gate needs a per-query annotation (or a bigger floor), otherwise
  * round-over-round diffs keep flagging session artifacts as
  * regressions (r6 q200 +76%, r7 q134 +130% — both isolated to parity).
  *
  * Usage: BenchOrder [sfDir] [nOrders] — prints a markdown table
  * (query | per-order seconds | max/min) plus summary percentiles,
  * ready to paste into ADJUDICATIONS.md's methodology appendix.
  */
object BenchOrder {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nOrders = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate("graft-bench-order")
    val base = SparkEntry.headlines
    val results: Seq[Map[String, Double]] = (1 to nOrders).map { k =>
      val order = new Random(k).shuffle(base)
      System.err.println(s"[bench-order] order $k/$nOrders: " +
        order.map(_.name).mkString(", "))
      order.map(q => q.name -> Bench.timeQuery(spark, q.fn, sfDir)).toMap
    }
    val names = base.map(_.name)
    def ratio(ts: Seq[Double]): Double = ts.max / math.max(ts.min, 1e-9)
    println(s"| Query | " + (1 to nOrders).map(i => s"order$i s").mkString(" | ") +
      " | max/min | max−min s |")
    println("|---|" + ("---|" * (nOrders + 2)))
    names.sorted.foreach { n =>
      val ts = results.map(_(n))
      println(f"| $n | ${ts.map(t => f"$t%.3f").mkString(" | ")} " +
        f"| ${ratio(ts)}%.2f | ${ts.max - ts.min}%.3f |")
    }
    val ratios = names.map(n => ratio(results.map(_(n)))).sorted
    def pct(p: Double) = ratios((p * (ratios.size - 1)).round.toInt)
    val overGate = names.filter { n =>
      val ts = results.map(_(n))
      ratio(ts) > 1.25 && ts.max - ts.min >= 0.25
    }
    println(f"[bench-order] ${names.size} queries x $nOrders orders; " +
      f"max/min median ${pct(0.5)}%.2f p90 ${pct(0.9)}%.2f worst ${ratios.last}%.2f")
    println(s"[bench-order] queries exceeding the 25%%/0.25s gate floor on ORDER " +
      s"ALONE (${overGate.size}): ${overGate.sorted.mkString(", ")}")
    spark.stop()
  }
}
