package graft.functions

import graft.SparkSpec
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

class GramHashExpressionSpec extends SparkSpec with graft.PropHelper {
  import spark.implicits._

  private def composed(k: Int, distinct: Boolean) = {
    val t = transform(TextAnalysis.shingles($"text", k),
      s => TextAnalysis.md5Long(s))
    if (distinct) array_distinct(t) else t
  }

  test("bit-for-bit equal to transform(shingles, md5Long) on real docs") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    for (k <- Seq(3, 5); d <- Seq(false, true)) {
      val got = df.select($"doc_id",
          GramHashFunctions.graftGramMd5(
            TextAnalysis.wsTokens($"text"), k, d).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = df.select($"doc_id", composed(k, d).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"mismatch at k=$k distinct=$d")
    }
  }

  test("short docs (< k tokens) hash the single whole-text shingle") {
    val df = Seq((1L, "a b"), (2L, "solo"), (3L, "  a   b  ")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        GramHashFunctions.graftGramMd5(TextAnalysis.wsTokens($"text"), 5, distinct = true).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select($"doc_id", composed(5, distinct = true).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
    assert(got(1L).length == 1 && got(3L) == got(1L), // ws-split equal
      "whitespace runs must not change the token stream")
  }

  test("distinct preserves first-occurrence order (array_distinct contract)") {
    val text = "x y x y x y x y" // 3-grams repeat with period 2
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = df.select(GramHashFunctions.graftGramMd5(
        TextAnalysis.wsTokens($"text"), 3, distinct = true))
      .head().getSeq[Long](0)
    val want = df.select(composed(3, distinct = true)).head().getSeq[Long](0)
    assert(got == want && got.length == 2)
  }

  test("property: equal to the composed form on random unicode token streams") {
    import org.scalacheck.{Gen, Prop}
    // tokens with multi-byte UTF-8 (accents, CJK, emoji) — the kernel
    // hashes raw UTF8String bytes, which must agree with md5(concat_ws)
    val tokGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("café", "naïve", "日本語", "données", "🦊", "Ω≈ç", "мир")))
      .map(_.take(30))
    checkProp(Prop.forAll(tokGen, Gen.choose(1, 6)) { (toks, k) =>
      val text = toks.mkString(" ")
      val df = Seq(Tuple1(text)).toDF("text")
      val got = df.select(GramHashFunctions.graftGramMd5(
          TextAnalysis.wsTokens($"text"), k, distinct = true))
        .head().getSeq[Long](0)
      val want = df.select(array_distinct(transform(
          TextAnalysis.shingles($"text", k), s => TextAnalysis.md5Long(s))))
        .head().getSeq[Long](0)
      got == want
    }, minSuccessful = 40)
  }

  test("graft_gram_md5 callable from SQL; equals the column API") {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("gram_docs_v")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_gram_md5(
        |  filter(split(text, '\\s+'), t -> t != ''), 5, true) AS h
        |FROM gram_docs_v""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", GramHashFunctions.graftGramMd5(
        TextAnalysis.wsTokens($"text"), 5, distinct = true).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaCol)
  }

  test("interpreted (eval) path agrees with codegen path") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", TextAnalysis.wsTokens($"text").as("toks"))
    val expr = GramHashFunctions.graftGramMd5($"toks", 5, distinct = true).as("h")
    val gen = df.select($"doc_id", expr).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select($"doc_id", expr).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(gen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
