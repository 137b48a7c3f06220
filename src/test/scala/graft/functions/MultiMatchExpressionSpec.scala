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

  // ---- graft_multi_count: the replace-semantics occurrence counter ----

  /** The composed count the oracles spell: non-overlapping occurrences
    * via length difference under replace, one column per term, in
    * sorted-distinct-term order.
    */
  private def composedCounts(terms: Seq[String]) =
    array(terms.distinct.sorted.map(t =>
      ((length($"text") - length(regexp_replace($"text",
        java.util.regex.Pattern.quote(t), ""))) / t.length).cast("long")): _*)

  test("multi_count equals composed replace counts on real docs") {
    val terms = graft.textops.TextAnalysis.langMarkers.flatMap(_._2)
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", concat(lit(" "), lower($"text"), lit(" ")).as("text"))
    val got = df.select($"doc_id",
        MultiMatchFunctions.graftMultiCount($"text", terms).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select($"doc_id", composedCounts(terms).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
    assert(got.values.exists(_.exists(_ > 1)), "corpus should repeat markers")
  }

  test("multi_count: overlap is counted greedily left-to-right, like replace") {
    // "aba" in "ababa": match at 0 consumes through index 2, the
    // overlapping match at 2 is rejected — count 1, exactly what
    // replace('ababa','aba','') leaves behind. " the the " style
    // shared-space overlaps behave the same way.
    val terms = Seq("aba", " the ", "aa")
    val df = Seq((1L, "ababa"), (2L, " the the the "), (3L, "aaaa"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        MultiMatchFunctions.graftMultiCount($"text", terms).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select($"doc_id", composedCounts(terms).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
    // sorted term order is (" the ", "aa", "aba")
    assert(got(1L) == Seq(0L, 0L, 1L))
    assert(got(2L) == Seq(2L, 0L, 0L), "' the the ' overlaps on the space")
    assert(got(3L) == Seq(0L, 2L, 0L))
  }

  test("multi_count: multi-byte terms and SQL registration") {
    GraftFunctions.register(spark)
    Seq((1L, "的是的的 café café")).toDF("doc_id", "text")
      .createOrReplaceTempView("mc_docs")
    val got = spark.sql(
      """SELECT graft_multi_count(text, '的', 'café', 'zz') AS c
        |FROM mc_docs""".stripMargin).head().getSeq[Long](0)
    // sorted order: café, zz, 的
    assert(got == Seq(2L, 0L, 3L))
  }
}
