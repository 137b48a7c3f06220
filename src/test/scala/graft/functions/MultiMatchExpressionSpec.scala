package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiMatchExpressionSpec extends SparkSpec with graft.PropHelper {
  import spark.implicits._

  private def composed(terms: Seq[String]) =
    sort_array(filter(
      typedLit(terms), t => contains($"text", t)))

  test("equal to sort_array(filter(terms, contains)) on real docs") {
    val terms = Seq("big table", "crash", "slow scan", "stream merge",
      "vector", "window window")
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    val got = df.select($"doc_id",
        MultiMatchFunctions.graftMultiMatch($"text", terms).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val want = df.select($"doc_id", composed(terms).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got == want)
    assert(got.values.exists(_.nonEmpty), "corpus should trip the blocklist")
  }

  test("overlapping, nested, and repeated patterns all surface — once each") {
    // "ab" inside "aba"; "aba" overlapping itself in "ababa"; a term
    // that is a suffix of another ("ba")
    val terms = Seq("ab", "aba", "ba", "zzz")
    val df = Seq((1L, "ababa"), (2L, "ba"), (3L, "xyx")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        MultiMatchFunctions.graftMultiMatch($"text", terms).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got == Map(1L -> Seq("ab", "aba", "ba"), 2L -> Seq("ba"),
      3L -> Seq.empty))
  }

  test("multi-byte UTF-8 terms match byte-substring semantics") {
    val terms = Seq("日本", "café", "naï")
    val df = Seq((1L, "le café 日本語"), (2L, "naïve"), (3L, "cafe"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        MultiMatchFunctions.graftMultiMatch($"text", terms).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val want = df.select($"doc_id", composed(terms).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got == want)
    assert(got(1L) == Seq("café", "日本") && got(2L) == Seq("naï"))
  }

  test("SQL registration: graft_multi_match(text, ...) works in spark.sql") {
    GraftFunctions.register(spark)
    Seq((1L, "a big table scan")).toDF("doc_id", "text")
      .createOrReplaceTempView("mm_docs")
    val got = spark.sql(
      """SELECT graft_multi_match(text, 'big table', 'crash') AS m
        |FROM mm_docs""".stripMargin).head().getSeq[String](0)
    assert(got == Seq("big table"))
  }

  test("property: equal to the composed form on random texts and term sets") {
    import org.scalacheck.{Gen, Prop}
    val alpha = Gen.oneOf("a", "b", "ab", "ba", "aab", "café", "x")
    val textGen = Gen.listOf(alpha).map(_.mkString)
    val termsGen = Gen.nonEmptyListOf(alpha).map(_.distinct.take(8))
    checkProp(Prop.forAll(textGen, termsGen) { (text, terms) =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val got = df.select(
        MultiMatchFunctions.graftMultiMatch($"text", terms)).head().getSeq[String](0)
      val want = terms.distinct.sorted.filter(text.contains(_))
      got == want
    })
  }

  test("FuseContainsChain rewrites contains-OR chains into one automaton pass") {
    GraftFunctions.register(spark)
    // parquet-backed source: a local relation would constant-fold the
    // whole filter before the rule could be observed
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    val terms = Seq("big table", "slow scan", "stream merge", "vector",
      "window window")
    val chain = terms.map(t => contains($"text", lit(t))).reduce(_ || _)
    val q = docs.filter(chain)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_multi_match"),
      s"contains chain did not fuse:\n$plan")
    assert(!plan.contains("Contains("),
      s"chain leaves survived the rewrite:\n$plan")
    // identical row set vs the unfused semantics (computed per-term)
    val want = docs.collect().filter { r =>
      !r.isNullAt(1) && terms.exists(r.getString(1).contains)
    }.map(_.getLong(0)).sorted.toSeq
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == want)
    assert(want.nonEmpty, "corpus should trip the chain")
    // NULL text stays NULL through the rewrite (projection form)
    val withNull = docs.limit(1)
      .select($"doc_id", lit(null).cast("string").as("text"))
    val nulls = withNull.select(chain.as("hit")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("FuseContainsChain leaves short, mixed, and differing-text chains alone") {
    GraftFunctions.register(spark)
    // parquet-backed (local relations constant-fold and prove nothing)
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text", $"source".as("other"))
    // only 3 terms: below threshold
    val short3 = Seq("a", "b", "c").map(t => contains($"text", lit(t)))
      .reduce(_ || _)
    val p1 = df.filter(short3).queryExecution.optimizedPlan.toString
    assert(!p1.contains("graft_multi_match") && p1.contains("Contains("), p1)
    // mixed text columns: must not fuse across different inputs
    val mixed = contains($"text", lit("a")) || contains($"other", lit("b")) ||
      contains($"text", lit("c")) || contains($"other", lit("d"))
    val p2 = df.filter(mixed).queryExecution.optimizedPlan.toString
    assert(!p2.contains("graft_multi_match") && p2.contains("Contains("), p2)
    // empty-string term (constant-true contains): left untouched
    val withEmpty = Seq("a", "", "c", "d", "e")
      .map(t => contains($"text", lit(t))).reduce(_ || _)
    val p3 = df.filter(withEmpty).queryExecution.optimizedPlan.toString
    assert(!p3.contains("graft_multi_match"), p3)
    assert(df.filter(withEmpty).count() == df.count(),
      "empty term matches everything")
  }

  test("more than 64 terms (multi-word bitset) and a 1000-term automaton") {
    val terms = (0 until 1000).map(i => s"term$i needle")
    val df = Seq((1L, "has term7 needle and term999 needle here"),
      (2L, "none")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        MultiMatchFunctions.graftMultiMatch($"text", terms).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got == Map(1L -> Seq("term7 needle", "term999 needle"),
      2L -> Seq.empty))
  }
}
