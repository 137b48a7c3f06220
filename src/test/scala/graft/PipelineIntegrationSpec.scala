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
}
