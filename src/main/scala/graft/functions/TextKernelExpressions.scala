package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar md5-60bit: `graft_md5long(s)` → long.
  *
  * Bit-for-bit equal to TextAnalysis.md5Long's composed spelling
  * `conv(substring(md5(s), 18, 15), 16, 10) cast long` — hex digits
  * 18..32 of the md5 are the low nibble of digest byte 8 followed by
  * bytes 9..15, extracted straight from the digest — but with no 32-char
  * hex string, no substring, and no base-16 string parse per call. The
  * composed form materializes two strings and runs `Conv`'s digit loop
  * for every hash; in line-grain paths (q222 computes one md5Long per
  * planted line, cdcChunks one per rolling gram) that was the dominant
  * per-row cost. Shares [[SimHashSketch.md5Long60]], the kernel already
  * spec-equated against the hex spelling.
  */
case class Md5Long60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5long expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5long"

  override def nullSafeEval(input: Any): Any =
    SimHashSketch.md5Long60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = SimHashSketch.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.md5Long60($s.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native whitespace tokenizer: `graft_ws_tokens(s)` → array<string>.
  *
  * Bit-for-bit equal to `filter(split(s, "\\s+"), t -> t <> '')`: the
  * maximal runs of non-whitespace characters, in order, empties dropped.
  * Java's `\s` (no UNICODE_CHARACTER_CLASS) is exactly the six ASCII
  * bytes {0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20}; in UTF-8 those values
  * never occur inside a multi-byte sequence (continuation bytes are
  * ≥ 0x80), so a single byte scan splits correctly without decoding.
  *
  * Why native: the composed form compiles a regex, decodes the
  * UTF8String to a java String, allocates the split array including the
  * empties, then runs an interpreted higher-order filter over it — per
  * document, on EVERY text query's scan stage (tokenization is the first
  * step of the whole text/dedup family). This kernel makes one pass over
  * the raw bytes and emits each token with a single bounded copy.
  */
case class WsTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ws_tokens expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ws_tokens"

  override def nullSafeEval(input: Any): Any =
    WsTokensExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = WsTokensExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokensExpr {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Single-pass byte-scan tokenizer, shared by eval and codegen. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) count += 1
      inTok = !ws
      i += 1
    }
    val out = new Array[AnyRef](count)
    var m = 0
    i = 0
    var start = -1
    while (i < n) {
      if (isWs(bytes(i))) {
        if (start >= 0) {
          out(m) = UTF8String.fromBytes(bytes, start, i - start)
          m += 1
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) {
      out(m) = UTF8String.fromBytes(bytes, start, n - start)
    }
    new GenericArrayData(out)
  }
}

object TextKernelFunctions {
  /** Lower 60 bits of md5 as a long — the engine-portable hash. */
  def graftMd5Long(s: Column): Column =
    Bridge.column(Md5Long60Expr(Bridge.expression(s)))

  /** Whitespace tokens, empties dropped. */
  def graftWsTokens(s: Column): Column =
    Bridge.column(WsTokensExpr(Bridge.expression(s)))
}
