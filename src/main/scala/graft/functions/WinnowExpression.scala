package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native winnowing selector over a hash array:
  * `graft_winnow(hashes, w)` → array<long>.
  *
  * Bit-for-bit equal to the composed column
  * `CASE WHEN size(hs) < w THEN array(array_min(hs))
  *  ELSE array_distinct(transform(sequence(1, size(hs) - w + 1),
  *       i -> array_min(slice(hs, i, w)))) END`
  * — every length-w window's minimum, deduplicated in first-occurrence
  * order (exactly `array_distinct`'s contract); arrays shorter than the
  * window yield their single global min.
  *
  * Why native: the composed form runs the per-window lambda interpreted
  * — O(n·w) boxed `array_min(slice(...))` calls per document made the
  * winnowing scan (q294) the slowest query in the catalog sweep at
  * 13 s / sf0.1. This kernel is the classic O(n) monotonic-deque
  * sliding minimum in one tight loop under whole-stage codegen — the
  * same treatment `graft_gram_md5` gave the shingle scan.
  */
case class WinnowMinima(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects (array<bigint>, w>0), " +
        s"got ${child.dataType.catalogString} / w=$w")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowMinima.compute(input.asInstanceOf[ArrayData], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = WinnowMinima.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.compute($arr, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMinima {

  /** O(n) monotonic-deque sliding minimum + first-occurrence dedup,
    * shared by eval and codegen. Requires n ≥ 1 (the gram kernel never
    * emits an empty array); n < w degenerates to the global min.
    */
  def compute(hs: ArrayData, w: Int): Array[Long] = {
    val n = hs.numElements()
    if (n == 0) return Array.empty[Long]
    if (n < w) {
      var m = hs.getLong(0)
      var i = 1
      while (i < n) { val v = hs.getLong(i); if (v < m) m = v; i += 1 }
      return Array(m)
    }
    val nw = n - w + 1
    // deque of indices with strictly increasing values; head = window min
    val idx = new Array[Int](n)
    var head = 0
    var tail = 0
    val seen = new java.util.HashSet[java.lang.Long](nw * 2)
    val out = new Array[Long](nw)
    var m = 0
    var i = 0
    while (i < n) {
      val v = hs.getLong(i)
      while (tail > head && hs.getLong(idx(tail - 1)) >= v) tail -= 1
      idx(tail) = i
      tail += 1
      if (idx(head) <= i - w) head += 1
      if (i >= w - 1) {
        val mv = hs.getLong(idx(head))
        if (seen.add(mv)) { out(m) = mv; m += 1 }
      }
      i += 1
    }
    if (m == nw) out else java.util.Arrays.copyOf(out, m)
  }
}

object WinnowFunctions {
  /** Distinct window-of-`w` minima from an ordered hash array. */
  def graftWinnow(hashes: Column, w: Int): Column =
    Bridge.column(WinnowMinima(Bridge.expression(hashes), w))
}
