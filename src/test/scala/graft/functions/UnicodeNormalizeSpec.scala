package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // All non-ASCII content is built from explicit \u escapes - decomposed
  // and precomposed forms RENDER identically, so literal characters in
  // source would be unreadable in the assertions (and easy to corrupt).
  private val decomposedCafe = "cafe\u0301"  // e + combining acute
  private val precomposedCafe = "caf\u00e9"

  private def nfcOf(s: String): String =
    Seq(s).toDF("t")
      .select(TextNormFunctions.graftNfc(col("t")))
      .collect()(0).getString(0)

  test("graft_nfc: decomposed sequences compose, precomposed and ASCII pass through") {
    assert(nfcOf(decomposedCafe) == precomposedCafe)
    assert(nfcOf(precomposedCafe) == precomposedCafe)
    assert(nfcOf("plain ascii 123") == "plain ascii 123")
    assert(nfcOf("\u1100\u1161") == "\uac00") // Hangul jamo pair -> GA syllable
    assert(nfcOf("A\u030a") == "\u00c5")      // A + ring above -> A WITH RING
  }

  test("graft_nfc: idempotent, and non-BMP code points survive untouched") {
    val emoji = "\ud83d\ude00 ok" // U+1F600 as a surrogate pair
    assert(nfcOf(emoji) == emoji)
    val once = nfcOf(decomposedCafe + " x\u0327")
    assert(nfcOf(once) == once)
  }

  test("graft_nfc: codegen (DataFrame) and interpreted (eval) paths agree; null in -> null out") {
    val inputs = Seq(decomposedCafe, precomposedCafe, "ascii", "\u1100\u1161", "")
    inputs.foreach { s =>
      val interp = UnicodeNorm.nfc(UTF8String.fromString(s)).toString
      assert(nfcOf(s) == interp, s"mismatch for ${s.codePoints().toArray.toSeq}")
    }
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(TextNormFunctions.graftNfc(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("graft_nfc: callable from SQL (function registry)") {
    // Spark's char() is ASCII-mod-256, so feed the combining mark
    // through a column rather than a SQL literal
    val viaSql = Seq(decomposedCafe).toDF("t")
      .selectExpr("graft_nfc(t) AS n").collect()(0).getString(0)
    assert(viaSql == precomposedCafe)
  }

  test("graft_nfc: already-normalized fast paths return the input buffer (no rewrite)") {
    val s = UTF8String.fromString("pure ascii")
    assert(UnicodeNorm.nfc(s) eq s)
    val nonAsciiNormalized = UTF8String.fromString(precomposedCafe)
    assert(UnicodeNorm.nfc(nonAsciiNormalized) eq nonAsciiNormalized)
  }

  test("graft_strip_accents: strips precomposed AND decomposed marks; keeps non-decomposables") {
    def strip(s: String): String =
      UnicodeNorm.stripAccents(UTF8String.fromString(s)).toString
    assert(strip("café") == "cafe")         // precomposed é
    assert(strip("café") == "cafe")        // decomposed e + ´
    assert(strip("Zürich Łódź") == "Zurich Łodz")
    assert(strip("œuvre straße æon") == "œuvre straße æon",
      "œ/ß/æ have no canonical decomposition and must survive")
    assert(strip("日本語") == "日本語")
    val ascii = UTF8String.fromString("plain")
    assert(UnicodeNorm.stripAccents(ascii) eq ascii, "ASCII fast path")
    // SQL name registered; idempotent
    val viaSql = Seq("naïve").toDF("t")
      .selectExpr("graft_strip_accents(graft_strip_accents(t)) AS n")
      .collect()(0).getString(0)
    assert(viaSql == "naive")
  }
}
