package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearModelSpec extends SparkSpec {

  // deterministic pseudo-random integer features; label from a known
  // linear rule, so the data is separable by construction
  private def synth(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val f1 = (i * 7919L) % 1000
      val f2 = (i * 104729L) % 1000
      val y = if (3 * f1 - 2 * f2 + 50 > 0) 1L else -1L
      (i.toLong, 1L, f1, f2, y)
    }.toDF("id", "f_bias", "f1", "f2", "y")
  }
  private val fcols = Seq("f_bias", "f1", "f2")

  /** Sequential reference: BigInt moments (exactly what DECIMAL(38,0)
    * sums produce) + the same pivoted solve, written independently.
    */
  private def referenceFit(
      rows: Seq[Array[Long]], labels: Seq[Long], lambda: Double): Array[Long] = {
    val d = rows.head.length
    val xtx = Array.ofDim[BigInt](d, d).map(_.map(_ => BigInt(0)))
    val xty = Array.fill(d)(BigInt(0))
    rows.zip(labels).foreach { case (x, y) =>
      for (i <- 0 until d; j <- 0 until d) xtx(i)(j) += BigInt(x(i)) * x(j)
      for (i <- 0 until d) xty(i) += BigInt(x(i)) * y
    }
    val a = Array.tabulate(d, d)((i, j) =>
      xtx(i)(j).toDouble + (if (i == j) lambda else 0.0))
    val b = Array.tabulate(d)(i => xty(i).toDouble)
    // independent solve: naive Cramer via LU-free Gauss-Jordan w/ pivot
    for (k <- 0 until d) {
      val piv = (k until d).maxBy(i => math.abs(a(i)(k)))
      val t = a(k); a(k) = a(piv); a(piv) = t
      val tb = b(k); b(k) = b(piv); b(piv) = tb
      for (i <- k + 1 until d) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until d) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val w = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until d) s -= a(i)(j) * w(j)
      w(i) = s / a(i)(i)
    }
    w.map(x => Math.round(x * 1e9))
  }

  test("fit matches a sequential BigInt reference implementation exactly") {
    val df = synth(400)
    val w = LinearModel.fitRidgeNano(df, fcols, "y", lambda = 1.0)
    val local = df.select("f_bias", "f1", "f2", "y").collect()
    val ref = referenceFit(
      local.map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      local.map(_.getLong(3)).toSeq, lambda = 1.0)
    assert(w.toSeq == ref.toSeq)
  }

  test("weights and scores are invariant under partitioning") {
    val df = synth(500)
    val ws = Seq(1, 7, 32).map(p =>
      LinearModel.fitRidgeNano(df.repartition(p), fcols, "y", lambda = 1.0).toSeq)
    assert(ws.distinct.size == 1, s"weights varied with partitioning: $ws")
    val scores = Seq(1, 13).map { p =>
      synth(500).repartition(p)
        .select(col("id"), LinearModel.scoreNano(ws.head.toArray, fcols).as("s"))
        .orderBy("id").collect().map(_.getLong(1)).toSeq
    }
    assert(scores.distinct.size == 1)
  }

  test("classifier separates linearly-separable data") {
    val df = synth(600)
    val w = LinearModel.fitRidgeNano(df, fcols, "y", lambda = 1.0)
    val scored = df.select(col("y"),
      LinearModel.scoreNano(w, fcols).as("s"))
    val acc = scored
      .filter((col("s") > 0 && col("y") === 1L) || (col("s") <= 0 && col("y") === -1L))
      .count().toDouble / 600
    // least-squares classification isn't max-margin: allow a small slack
    assert(acc >= 0.95, s"accuracy $acc on separable data")
  }

  test("empty input and singular systems fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("id", "f_bias", "f1", "f2", "y")
    intercept[IllegalArgumentException] {
      LinearModel.fitRidgeNano(empty, fcols, "y", lambda = 1.0)
    }
    // duplicated column => rank-deficient moments; λ=0 must not return
    // silently wrong weights
    val dup = synth(50).withColumn("f2", col("f1"))
    intercept[IllegalArgumentException] {
      LinearModel.fitRidgeNano(dup, fcols, "y", lambda = 0.0)
    }
  }
}
