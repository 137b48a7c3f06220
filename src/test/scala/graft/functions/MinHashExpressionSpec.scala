package graft.functions

import graft.SparkSpec
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

class MinHashExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("signature length and determinism; identical inputs -> identical sigs") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words in here folks")).toDF("doc_id", "text")
    val sigs = df.select($"doc_id",
        MinHashFunctions.graftMinHash(TextAnalysis.wsTokens($"text"), 3, 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 64)
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("signature agreement estimates jaccard (minhash property)") {
    // two 60-token docs sharing ~half their shingles
    val shared = (1 to 30).map(i => s"w$i").mkString(" ")
    val a = shared + " " + (1 to 30).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (1 to 30).map(i => s"b$i").mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sigs = df.select($"doc_id",
        MinHashFunctions.graftMinHash(TextAnalysis.wsTokens($"text"), 3, 256).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 256.0
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val jac = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
    assert(math.abs(agree - jac) < 0.15, s"agree=$agree jaccard=$jac")
  }

  test("interpreted (eval) path agrees with codegen path") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", TextAnalysis.wsTokens($"text").as("sh"))
    val expr = MinHashFunctions.graftMinHash($"sh", 3, 32).as("sig")
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

  test("graft_minhash callable from SQL; signature pipeline is shuffle-free") {
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_v")
    val sql = spark.sql(
      "SELECT doc_id, graft_minhash(split(text, ' '), 3, 16) AS sig FROM docs_v LIMIT 5")
    assert(sql.collect().forall(_.getSeq[Long](1).length == 16))
    val plan = graft.dedup.Dedup.minHashSignatures(
      spark.read.parquet(s"$sf0001/documents.parquet"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature computation shuffles:\n$plan")
  }
}
