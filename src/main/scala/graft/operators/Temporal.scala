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
}
