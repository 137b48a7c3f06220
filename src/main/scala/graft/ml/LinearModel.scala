package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic distributed ridge regression / linear classifier via
  * closed-form normal equations — the quality-classifier training step
  * of a data pipeline (score documents with a linear model distilled
  * from labels), built so the SAME bytes come out under ANY partitioning:
  *
  *  - features and labels must be EXACT integer-valued longs (callers
  *    quantize ratios to ppm first, as q27/q33 do);
  *  - the distributed pass computes only the moment sums XᵀX and Xᵀy,
  *    with per-row products in long (caller contract: |xᵢ·xⱼ| < 2⁶³)
  *    summed as DECIMAL(38,0) — EXACT integer sums, immune to both
  *    float association and long overflow at 100 TB row counts;
  *  - the only floating-point work (solving the d×d system) happens
  *    ONCE on the driver over those exact sums, so weights are a pure
  *    function of the dataset, not of partitioning or scheduling;
  *  - weights quantize to nano-units (long), and scoring is a pure
  *    integer dot product — bit-reproducible everywhere.
  *
  * Scale shape: one scan + one partial+final aggregate producing a
  * single d(d+3)/2-column row; no shuffle of the corpus, no iteration.
  * (Mirrors the reference's "derive a model, apply it" analytics loop —
  * /root/reference/src/mrapps/wc.go being the degenerate count case —
  * re-expressed as declarative aggregation.)
  */
object LinearModel {

  /** Fit (XᵀX + λI) w = Xᵀy over exact-integer feature columns and a
    * ±1 (or any integer) label column; returns weights in nano-units.
    * λ is added raw to the diagonal of the UN-normalized moment matrix —
    * callers pick it relative to n (a tiny λ like 1.0 just pins
    * degenerate directions).
    */
  def fitRidgeNano(
      df: DataFrame,
      features: Seq[String],
      label: String,
      lambda: Double): Array[Long] = {
    val d = features.size
    require(d > 0, "need at least one feature column")
    val dec = DecimalType(38, 0)
    val momentCols =
      (for (i <- 0 until d; j <- i until d) yield
        sum((col(features(i)) * col(features(j))).cast(dec)).as(s"m_${i}_$j")) ++
      (0 until d).map(i =>
        sum((col(features(i)) * col(label)).cast(dec)).as(s"v_$i")) :+
      count(lit(1)).as("n")
    val row = df.agg(momentCols.head, momentCols.tail: _*).head()
    require(row.getLong(row.fieldIndex("n")) > 0, "cannot fit on an empty dataset")

    val xtx = Array.ofDim[Double](d, d)
    val xty = new Array[Double](d)
    for (i <- 0 until d; j <- i until d) {
      val m = row.getDecimal(row.fieldIndex(s"m_${i}_$j")).doubleValue()
      xtx(i)(j) = m
      xtx(j)(i) = m
    }
    for (i <- 0 until d) {
      xtx(i)(i) += lambda
      xty(i) = row.getDecimal(row.fieldIndex(s"v_$i")).doubleValue()
    }
    solve(xtx, xty).map(w => Math.round(w * 1e9))
  }

  /** Pure-integer score: Σ wNanoⱼ·xⱼ (units: nano × feature units). */
  def scoreNano(wNano: Array[Long], features: Seq[String]): Column =
    features.zip(wNano).map { case (f, w) => col(f) * lit(w) }
      .reduce(_ + _)

  /** In-place Gaussian elimination with partial pivoting (d is tiny —
    * feature counts, not rows — so O(d³) on the driver is free).
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    // relative singularity floor: a rank-deficient system eliminates to
    // pivots that are pure cancellation residue (~machine-eps of the
    // matrix scale), not exact zeros
    val scale = a.iterator.flatten.map(math.abs).max.max(Double.MinPositiveValue)
    for (k <- 0 until d) {
      val piv = (k until d).maxBy(i => math.abs(a(i)(k)))
      require(math.abs(a(piv)(k)) > scale * 1e-12,
        s"singular (rank-deficient) moment matrix at column $k — " +
          "duplicate/collinear features? add ridge λ > 0")
      val (rk, rp) = (a(k), a(piv)); a(k) = rp; a(piv) = rk
      val (bk, bp) = (b(k), b(piv)); b(k) = bp; b(piv) = bk
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
    w
  }
}
