package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

/** graft_simhash must be bit-for-bit interchangeable with the composed
  * builtin form (which the q32 DuckDB oracle replays), across both the
  * codegen and interpreted paths.
  */
class SimHashExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native sketch == composed-builtin sketch on the real corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val native = Dedup.simHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simHashComposed(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
    assert(native.values.exists(_ != 0L))
  }

  test("edge cases: empty token array, single token, duplicates, null elements") {
    val df = Seq(
      (1L, ""), (2L, "solo"), (3L, "dup dup dup"), (4L, "a b")
    ).toDF("doc_id", "text")
    val native = Dedup.simHash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simHashComposed(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
    assert(native(1L) == 0L, "no tokens -> empty sketch")
    // a single token's sketch is its own 60-bit hash (majority of 1)
    val h = df.filter($"doc_id" === 2L)
      .select(TextAnalysis.md5Long(lit("solo"))).head.getLong(0)
    assert(native(2L) == h)
    // deterministic on the duplicate-heavy doc: two independent runs agree
    val rerun = Dedup.simHash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rerun == native)
    // null array elements (SQL surface): count in the denominator, set no
    // bits — same as the composed form
    GraftFunctions.register(spark)
    val withNull = spark.sql(
      "SELECT graft_simhash(array('solo', CAST(NULL AS STRING), CAST(NULL AS STRING))) AS s")
      .head.getLong(0)
    assert(withNull == 0L, "1 set vote vs 3 elements is not a majority")
    val nullMinority = spark.sql(
      "SELECT graft_simhash(array('solo', 'solo', 'solo', CAST(NULL AS STRING))) AS s")
      .head.getLong(0)
    assert(nullMinority == h, "3-of-4 majority keeps the token's bits")
  }

  test("SQL surface: graft_simhash registered and equal to the column API") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
      .createOrReplaceTempView("shdocs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(filter(split(text, '\\s+'), t -> t != '')) AS s
        |FROM shdocs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = Dedup.simHash(
      spark.read.parquet(s"$sf0001/documents.parquet").limit(50))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("interpreted (eval) path agrees with codegen path") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", TextAnalysis.wsTokens($"text").as("toks"))
    val withCg = df.select($"doc_id",
      SimHashFunctions.graftSimHash($"toks").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select($"doc_id",
        SimHashFunctions.graftSimHash($"toks").as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(interp == withCg)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
