package graft.functions

import graft.SparkSpec
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class WinnowExpressionSpec extends SparkSpec with graft.PropHelper {
  import spark.implicits._

  /** The composed higher-order form the native kernel replaces. */
  private def composed(hs: org.apache.spark.sql.Column, w: Int) =
    when(size(hs) < w, array(array_min(hs)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(hs) - (w - 1)),
        i => array_min(slice(hs, i, lit(w))))))

  test("bit-for-bit equal to the composed array_distinct/transform/array_min on real docs") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id",
        GramHashFunctions.graftGramMd5(TextAnalysis.wsTokens($"text"), 3).as("hs"))
    for (w <- Seq(2, 4, 9)) {
      val got = df.select($"doc_id",
          WinnowFunctions.graftWinnow($"hs", w).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = df.select($"doc_id", composed($"hs", w).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"mismatch at w=$w")
    }
  }

  test("property: random long arrays match the composed form, incl. ties and short arrays") {
    val gen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 6L))) // tiny domain → dense ties
    checkProp(org.scalacheck.Prop.forAll(gen) { xs =>
      val df = Seq(Tuple1(xs)).toDF("hs")
      val got = df.select(WinnowFunctions.graftWinnow($"hs", 4))
        .head.getSeq[Long](0)
      val want = df.select(composed($"hs", 4)).head.getSeq[Long](0)
      got == want
    }, minSuccessful = 25)
  }

  test("SQL registration: graft_winnow resolves and agrees with the Column API") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet").limit(20)
      .select($"doc_id",
        GramHashFunctions.graftGramMd5(TextAnalysis.wsTokens($"text"), 3).as("hs"))
    val got = df.selectExpr("doc_id", "graft_winnow(hs, 4) AS f")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select($"doc_id", WinnowFunctions.graftWinnow($"hs", 4).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
  }
}
