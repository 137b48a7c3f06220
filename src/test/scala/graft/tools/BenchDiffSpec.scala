package graft.tools

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BenchDiff gate's two parsing contracts: the query-map anchor
  * must survive a decoy `"queries"` inside the driver file's free-text
  * `tail` field, and adjudication matching is exact-name, first-column,
  * latest-round-only.
  */
class BenchDiffSpec extends AnyFunSuite {

  private def tmp(content: String, suffix: String = ".json"): String = {
    val f = Files.createTempFile("benchdiff", suffix)
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("parseQueries anchors on parsed, not a decoy in the tail log") {
    // the tail echoes the bench's own stdout JSON line — with a DIFFERENT
    // (stale) timing than the structured parsed object; the parser must
    // read the parsed one
    val driverFile =
      """{
        |  "rc": 0,
        |  "tail": "some log line {\"metric\":\"total\",\"queries\":{\"q1_agg\":9.999}} trailing",
        |  "parsed": {
        |    "metric": "total",
        |    "queries": {
        |      "q1_agg": 0.286,
        |      "q3_join_agg": 0.331
        |    },
        |    "sf": "/root/testdata/sf0.1"
        |  }
        |}""".stripMargin
    val m = BenchDiff.parseQueries(tmp(driverFile))
    assert(m === Map("q1_agg" -> 0.286, "q3_join_agg" -> 0.331))
  }

  test("parseQueries reads a raw one-line local bench output") {
    val raw = """{"metric":"total","value":1.2,"unit":"sec","queries":{"q1_agg":0.5,"q9_window_running":0.7},"sf":"x"}"""
    val m = BenchDiff.parseQueries(tmp(raw))
    assert(m === Map("q1_agg" -> 0.5, "q9_window_running" -> 0.7))
  }

  test("parseQueries drops -1 (all-runs-failed) entries and rejects empty maps") {
    val raw = """{"metric":"total","value":0,"unit":"sec","queries":{"q_broken":-1.000,"q_ok":0.4},"sf":"x"}"""
    assert(BenchDiff.parseQueries(tmp(raw)) === Map("q_ok" -> 0.4))
    val empty = """{"metric":"total","value":0,"unit":"sec","queries":{},"sf":"x"}"""
    assertThrows[IllegalArgumentException](BenchDiff.parseQueries(tmp(empty)))
  }

  test("adjudicatedSet: latest round only, first-column exact tokens, tables outside Round sections ignored") {
    val md =
      """# Bench regression adjudications
        |
        |Narrative mentioning q999_narrative_only should never count.
        |
        |## Round 7 (old)
        |
        || Query | verdict |
        ||---|---|
        || q200_cdc_dedup | session noise |
        || q31_minhash_neardup | watch |
        |
        |## Round 8
        |
        || Query | r7 | HEAD | verdict |
        ||---|---|---|---|
        || q134_containment | 1.0 | 1.1 | noise |
        || q222_c4_line_filter | 2.0 | 2.1 | noise |
        |
        |## Order-variance study (round 8)
        |
        || Query | var |
        ||---|---|
        || q65_full_pipeline | 0.1 |
        |""".stripMargin
    val s = BenchDiff.adjudicatedSet(tmp(md, ".md"))
    assert(s.contains("q134_containment"))
    assert(s.contains("q222_c4_line_filter"))
    // older round's rows no longer shield their queries
    assert(!s.contains("q200_cdc_dedup"))
    assert(!s.contains("q31_minhash_neardup"))
    // narrative text and non-Round-section tables never count
    assert(!s.contains("q999_narrative_only"))
    assert(!s.contains("q65_full_pipeline"))
    // header row token is captured but is not a query name — harmless
  }

  test("adjudicatedSet: missing file is empty") {
    assert(BenchDiff.adjudicatedSet("/nonexistent/adjudications.md") === Set.empty[String])
  }

  test("per-query gate floors cover measured order variance") {
    // q233_hits measured 1.40 max/min on session order alone → its floor
    // is raised to 0.55; a default query keeps the 0.25 gate
    assert(BenchDiff.perQueryGate("q233_hits") === 0.55)
    assert(BenchDiff.perQueryGate.getOrElse("q65_full_pipeline", 0.25) === 0.25)
    // every raised floor clears its measured spread with margin
    val measured = Map( // ADJUDICATIONS.md appendix, round-8 BenchOrder
      "q118_dup_spans" -> 0.38, "q123_cluster_reps" -> 0.33,
      "q160_incremental_quantile" -> 0.29, "q233_hits" -> 0.40,
      "q239_charlm_perplexity" -> 0.30)
    measured.foreach { case (q, spread) =>
      assert(BenchDiff.perQueryGate(q) >= spread + 0.05, s"$q floor too tight")
    }
  }
}
