package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native fused SimHash sketch over a token array:
  * `graft_simhash(tokens)` → long (60-bit sketch).
  *
  * Semantics are EXACTLY the composed form in graft.dedup.Dedup: per
  * token the PORTABLE 60-bit md5 hash (the lower 60 bits of md5, i.e.
  * TextAnalysis.md5Long — this is what lets the q32 DuckDB oracle replay
  * the sketch bit-for-bit), bit b of the sketch set iff set-bit
  * occurrences strictly outnumber clear ones (2·|set| > |tokens|,
  * duplicates counted).
  *
  * The composed form runs 60 filter+size array traversals per document;
  * this expression makes ONE pass — md5 each token once, update 60
  * counters — with no intermediate arrays, inside WholeStageCodegen.
  * Sketching stays a pure map-side scan op at any corpus size.
  */
case class SimHashSketch(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashSketch.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = SimHashSketch.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSketch {
  val Bits = 60

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Lower 60 bits of md5(bytes) — the digest-byte form of
    * TextAnalysis.md5Long's hex-substring spelling: hex chars 18..32 =
    * the low nibble of digest byte 8 followed by bytes 9..15.
    */
  def md5Long60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = (dig(8) & 0x0FL) << 56
    var i = 9
    while (i < 16) { h |= (dig(i) & 0xFFL) << (8 * (15 - i)); i += 1 }
    h
  }

  /** Single-pass sketch kernel, shared by eval and codegen. Null
    * elements (possible via the SQL surface) match the composed form:
    * they count toward the majority denominator but set no bits. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val cnt = new Array[Int](Bits)
    var j = 0
    while (j < n) {
      val s = tokens.getUTF8String(j)
      if (s != null) {
        val h = md5Long60(s.getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1
          b += 1
        }
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < Bits) {
      if (2L * cnt(b) > n) sim |= (1L << b)
      b += 1
    }
    sim
  }
}

object SimHashFunctions {
  /** SimHash sketch from a token array (whitespace split upstream). */
  def graftSimHash(tokens: Column): Column =
    Bridge.column(SimHashSketch(Bridge.expression(tokens)))
}
