package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks entirely (SURVEY.md §2.4
  * "joins: ABSENT") but any event pipeline needs.
  *
  * asofJoin uses the union + ordered-window trick: tag both inputs, union
  * on a common layout, and carry the latest right-side payload forward
  * with last(ignoreNulls) over (key ORDER BY ts, side). This is ONE
  * shuffle on the key and no range-condition join — the non-equi range
  * join Spark would otherwise plan degenerates to a per-key cross join at
  * scale, while the union trick stays linear in |left| + |right|.
  */
object Temporal {

  /** For each left row, attach the most recent right payload with
    * rightTs <= leftTs (inclusive; null when no match). Right-side ties
    * on (key, ts) should be pre-aggregated by the caller for determinism.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lSel: Seq[Column] =
      Seq(col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")) ++
        leftCols.map(col)
    val rSel: Seq[Column] =
      Seq(col(key).as("_k"),
        col(rightTs).cast(left.schema(leftTs).dataType).as("_ts"),
        lit(0).as("_side")) ++
        payload.map(p => col(p).as(s"_p_$p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    // right rows sort before left rows at equal ts, so an exact-ts match
    // is visible to the left row (inclusive as-of)
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols: Seq[Column] =
      leftCols.map(col) ++ Seq(col("_side")) ++
        payload.map(p => last(col(s"_p_$p"), ignoreNulls = true).over(w).as(p))
    left.select(lSel: _*).unionByName(right.select(rSel: _*))
      .select(outCols: _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Interval × interval OVERLAP join with no equi key, bucketized.
    *
    * The naive plan for `a.s <= b.e AND b.s <= a.e` is a
    * BroadcastNestedLoopJoin — |A|·|B| comparisons, a scale-killer the
    * moment neither side broadcasts. This maps each interval to the
    * fixed-width time buckets it covers (explode over
    * `floor(s/W) .. floor(e/W)`), equi-joins on the bucket, and verifies
    * the exact overlap predicate on the survivors — the temporal analog
    * of the LSH band trick: cost is Σ_bucket |A_b|·|B_b|, never |A|·|B|.
    *
    * Each overlapping pair shares at least the bucket containing the
    * overlap's start (`max(a.s, b.s)`), and ONLY that copy is kept
    * (`_bk == floor(greatest(s)/W)`), so the join emits every pair
    * exactly once with no distinct pass.
    *
    * Endpoints are inclusive (closed intervals, the DuckDB/SQL overlap
    * convention). Bounds are integral (epoch micros/millis — caller's
    * unit, `bucketWidth` in the same unit). Fan-out per row is
    * `span/W + 1` buckets — pick W near the typical interval length so
    * long intervals don't explode into many buckets and short ones
    * don't crowd into few. Skew: a bucket holding m_A × m_B intervals
    * costs m_A·m_B; intervals are bounded-duration in any real event
    * pipeline, so per-bucket membership is arrival-rate-bounded (unlike
    * content LSH there is no degenerate "all keys equal" corpus shape —
    * time always advances).
    *
    * `a` and `b` must have disjoint column names (rename before
    * calling); all columns of both survive.
    */
  def overlapJoinBucketed(
      a: DataFrame,
      b: DataFrame,
      aStart: String,
      aEnd: String,
      bStart: String,
      bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty, s"a/b column names must be disjoint, both have: $shared")
    // SQL `div` (exact integer division), NOT `/` + floor: `/` is double
    // division, and at epoch-micro magnitudes the rounded quotient can
    // floor into the wrong bucket at exact boundaries.
    def bdiv(c: String): Column = expr(s"`$c` div ${bucketWidth}L")
    def bucketed(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bk", explode(sequence(bdiv(s), bdiv(e))))
    val joined = bucketed(a, aStart, aEnd)
      .join(bucketed(b, bStart, bEnd).withColumnRenamed("_bk", "_bkb"),
        col("_bk") === col("_bkb"))
    joined
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(expr(s"greatest(`$aStart`, `$bStart`) div ${bucketWidth}L") === col("_bk"))
      .drop("_bk", "_bkb")
  }
}
