package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

/** Native [a-z ]² char-bigram codes: `graft_char_bigrams(s)` →
  * array<int> of c1·27 + c2 (a..z → 0..25, space → 26) for every
  * adjacent CHARACTER pair whose two chars both lie in [a-z ], in
  * order.
  *
  * Bit-for-bit equal to the composed spelling
  * `filter(transform(sequence(1, length(s)-1), i -> substring(s, i, 2)),
  * g -> g rlike '^[a-z ]{2}$')` mapped to codes: multi-byte characters
  * never qualify (their lead byte is ≥ 0x80, outside [a-z ]), so a
  * single byte scan that steps character starts via the UTF-8 length of
  * each lead byte visits exactly the same character pairs `substring`
  * does.
  *
  * Why native: the composed form is O(len²) — `substring(s, i, 2)`
  * walks the string from byte 0 to find character i on EVERY call — and
  * allocates a 2-char string plus a regex match per character of the
  * corpus. This kernel is one O(len) pass emitting a primitive int
  * array. The LM scoring paths (q239) group on the code, so no string
  * key ever leaves the scan stage.
  */
case class CharBigramCodesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_bigrams expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_bigrams"

  override def nullSafeEval(input: Any): Any =
    CharBigramCodesExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = CharBigramCodesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigramCodesExpr {
  /** a..z → 0..25, space → 26, anything else (incl. multi-byte lead and
    * continuation bytes, which are negative as signed bytes) → -1. */
  private def code(b: Byte): Int =
    if (b == 0x20) 26
    else if (b >= 'a' && b <= 'z') b - 'a'
    else -1

  /** Single-pass byte-scan bigram coder, shared by eval and codegen. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    var prev = -1
    while (i < n) {
      val c = code(bytes(i))
      if (prev >= 0 && c >= 0) count += 1
      prev = c
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val out = new Array[Int](count)
    var m = 0
    i = 0
    prev = -1
    while (i < n) {
      val c = code(bytes(i))
      if (prev >= 0 && c >= 0) { out(m) = prev * 27 + c; m += 1 }
      prev = c
      i += UTF8String.numBytesForFirstByte(bytes(i))
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

  /** [a-z ]² char-bigram codes (c1·27 + c2), multi-byte chars excluded. */
  def graftCharBigrams(s: Column): Column =
    Bridge.column(CharBigramCodesExpr(Bridge.expression(s)))
}
