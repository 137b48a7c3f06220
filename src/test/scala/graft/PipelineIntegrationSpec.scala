package graft

import graft.dedup.Dedup
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline composition: quality filter →
  * exact dedup → near-dup removal → tokenize/fingerprint — the workflow
  * a user of this engine actually runs, asserted for correct
  * composition (not just per-operator behavior).
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("filter -> dedup -> near-dedup -> analyze composes correctly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // plant: 3 exact copies + 3 near copies of the first docs
    val exactCopies = docs.filter($"doc_id" < 3)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val nearCopies = docs.filter($"doc_id" >= 3 && $"doc_id" < 6)
      .select(($"doc_id" + 200000L).as("doc_id"),
        concat($"text", lit(" extra tail words")).as("text"),
        $"lang", $"source", $"n_chars")
    val corpus = docs.unionByName(exactCopies).unionByName(nearCopies)

    // 1. quality gate (keep docs with >= 20 tokens)
    val quality = corpus.filter(TextAnalysis.tokenCount($"text") >= 20)
    // 2. exact dedup (keep min id)
    val exactDeduped = Dedup.exactDedup(quality)
    assert(exactDeduped.filter($"doc_id" >= 100000L && $"doc_id" < 200000L).count() == 0,
      "exact copies survived")
    // 3. near-dup removal: drop the higher id of each verified pair
    val near = Dedup.nearDupPairs(exactDeduped.select("doc_id", "text"), threshold = 0.7)
    val dropIds = near.select($"id_b".as("doc_id")).distinct()
    val cleaned = exactDeduped.join(dropIds, Seq("doc_id"), "left_anti")
    assert(cleaned.filter($"doc_id" >= 200000L).count() == 0,
      "planted near-copies survived")
    // 4. analysis columns over the cleaned corpus
    val analyzed = cleaned.select($"doc_id",
      TextAnalysis.tokenCount($"text").as("tokens"),
      TextAnalysis.qualityScore($"text").as("quality"),
      TextAnalysis.fingerprint($"text").as("fp"))
    val n = analyzed.count()
    assert(n > 0 && n <= docs.count())
    assert(analyzed.filter($"tokens" < 20).count() == 0)
  }

  test("gopher gate -> containment de-quote -> memorization triage composes") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // pick a source whose 30-token quote ALSO passes the gopher gate, so
    // the containment stage (not the quality gate) must do the dropping
    val quoteText = concat_ws(" ", slice(TextAnalysis.wsTokens($"text"), 1, 30))
    val quoteOk = TextAnalysis.gopherRules(
      docs.select($"doc_id", quoteText.as("text")), minTokens = 20)
      .filter($"keep").select("doc_id")
    val srcOk = TextAnalysis.gopherRules(docs, minTokens = 20)
      .filter($"keep" && $"n_tokens" >= 40).select("doc_id")
    val srcId = quoteOk.join(srcOk, "doc_id").agg(min("doc_id")).head.getLong(0)
    val quote = docs.filter($"doc_id" === srcId)
      .select(lit(900000L).as("doc_id"), quoteText.as("text"))
    val corpus = docs.unionByName(quote)

    // 1. Gopher heuristics: structural junk never reaches dedup
    val kept = TextAnalysis.gopherRules(corpus, minTokens = 20)
      .filter($"keep").select("doc_id")
    val gated = corpus.join(kept, "doc_id")
    assert(gated.filter($"doc_id" === 900000L).count() == 1,
      "the planted quote must reach the containment stage")

    // 2. containment: drop every contained (smaller) side
    val contained = Dedup.containmentPairs(gated, k = 5, tauBp = 8000)
      .select($"contained_id".as("doc_id")).distinct()
    val dequoted = gated.join(contained, Seq("doc_id"), "left_anti")
    assert(dequoted.filter($"doc_id" === 900000L).count() == 0,
      "planted quote must be dropped by the containment stage")
    // the source itself may be dropped as the smaller-id side of an
    // ORGANIC dup pair (ties keep the larger id) — but its full content
    // always survives through the chain's maximal element
    val srcText = docs.filter($"doc_id" === srcId).head.getString(1)
    assert(dequoted.filter($"text" === srcText).count() >= 1,
      "a full copy of the quoted content must survive")

    // 3. memorization triage over the cleaned corpus: scores exist for
    // every surviving doc and stay in [0, 1e6]
    val risk = Dedup.memorizationRisk(dequoted, l = 16, minCount = 2)
    assert(risk.count() == dequoted.count())
    assert(risk.filter($"risk_ppm" < 0 || $"risk_ppm" > 1000000L).count() == 0)
  }
}
