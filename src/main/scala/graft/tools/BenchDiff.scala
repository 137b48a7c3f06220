package graft.tools

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Round-over-round bench regression gate.
  *
  * Usage: BenchDiff <old_bench.json> <new_bench.json> [adjudication.md]
  *
  * Parses the flat `"queries":{name:sec,…}` map out of two Bench JSON
  * lines, prints every common query's delta (worst first), and exits
  * nonzero if any query regressed more than 25% (and ≥0.25 s absolute —
  * sub-second queries jitter past 25% on stage overhead alone) without
  * a matching entry in the adjudication file. An adjudication entry is
  * any line in the given markdown file containing the query name — the
  * committed record that a human looked at the regression and either
  * accepted the trade or pinned it to noise with isolated QTime runs.
  *
  * This is the gate the round judge applies by hand; running it before
  * committing a round's bench keeps regressions from compounding
  * silently. No JSON library: the bench format is a flat object of
  * string→number, greppable by construction.
  */
object BenchDiff {
  private val entryRe = """"([^"]+)"\s*:\s*(-?[0-9.]+)""".r

  def parseQueries(path: String): Map[String, Double] = {
    val text = Files.readString(Path.of(path))
    val qStart = text.indexOf("\"queries\"")
    require(qStart >= 0, s"$path: no \"queries\" object")
    val body = text.substring(text.indexOf('{', qStart) + 1)
    val objEnd = body.indexOf('}')
    entryRe.findAllMatchIn(body.substring(0, objEnd))
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 >= 0) // -1 = every run failed; not a timing
      .toMap
  }

  def main(args: Array[String]): Unit = {
    val (oldPath, newPath) = (args(0), args(1))
    val adjudicated: String => Boolean = args.lift(2) match {
      case Some(p) if Files.exists(Path.of(p)) =>
        val lines = Files.readAllLines(Path.of(p)).asScala.toVector
        name => lines.exists(_.contains(name))
      case _ => _ => false
    }
    val o = parseQueries(oldPath)
    val n = parseQueries(newPath)
    val common = o.keySet & n.keySet
    val rows = common.toSeq
      .map(q => (q, o(q), n(q), (n(q) - o(q)) / math.max(o(q), 1e-9)))
      .sortBy(-_._4)
    println(f"[benchdiff] ${common.size} common queries " +
      f"(old total ${common.toSeq.map(o).sum}%.1f s → new ${common.toSeq.map(n).sum}%.1f s)")
    rows.foreach { case (q, ov, nv, d) =>
      println(f"[benchdiff] $ov%7.2f → $nv%7.2f  ${d * 100}%+6.1f%%  $q")
    }
    val regressions = rows.filter { case (_, ov, nv, d) => d > 0.25 && nv - ov >= 0.25 }
    val unexplained = regressions.filterNot { case (q, _, _, _) => adjudicated(q) }
    regressions.foreach { case (q, _, _, d) =>
      val tag = if (adjudicated(q)) "adjudicated" else "UNADJUDICATED"
      println(f"[benchdiff] REGRESSION ${d * 100}%+.0f%% $q ($tag)")
    }
    (o.keySet -- n.keySet).toSeq.sorted
      .foreach(q => println(s"[benchdiff] dropped from suite: $q"))
    (n.keySet -- o.keySet).toSeq.sorted
      .foreach(q => println(s"[benchdiff] new in suite: $q"))
    if (unexplained.nonEmpty) {
      println(s"[benchdiff] FAIL: ${unexplained.size} regression(s) >25% " +
        "without an adjudication entry — run QTime A/Bs and record the verdict")
      sys.exit(1)
    }
    println("[benchdiff] OK")
  }
}
