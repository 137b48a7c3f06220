package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native fused shingle+md5Long over a TOKEN array:
  * `graft_gram_md5(tokens, k, distinct)` → array<long>.
  *
  * Bit-for-bit equal to the composed column
  * `transform(TextAnalysis.shingles(text, k), md5Long)` (wrapped in
  * `array_distinct` when `distinct = true`, preserving first-occurrence
  * order exactly as `array_distinct` does): for each k-token shingle the
  * kernel assembles the space-joined bytes into a reused buffer, MD5s
  * them once, and extracts the same 60-bit value as
  * `conv(substring(md5hex, 18, 15), 16, 10)` — hex digits 18..32 are the
  * low nibble of digest byte 8 followed by bytes 9..15, so no hex
  * string, no substring, no conv ever materializes. Docs shorter than
  * `k` tokens hash their single whole-text shingle, matching
  * `TextAnalysis.shingles`.
  *
  * Why native: higher-order functions run interpreted (per-element
  * lambda dispatch, UTF8String concat allocations, decimal conv), which
  * made the gram scan the dominant stage of every df-capped gram join —
  * this turns it into one tight loop per row under whole-stage codegen,
  * the same treatment `graft_minhash` gave signatures.
  */
case class GramMd5Hashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_md5 expects (array<string>, k>0), " +
        s"got ${child.dataType.catalogString} / k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_gram_md5"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      GramMd5Hashes.compute(input.asInstanceOf[ArrayData], k, distinct))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = GramMd5Hashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.compute($arr, $k, $distinct));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramMd5Hashes {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Single-pass gram-hash kernel, shared by eval and codegen. */
  def compute(tokens: ArrayData, k: Int, distinct: Boolean): Array[Long] = {
    val n = tokens.numElements()
    var buf = new Array[Byte](256)
    val digest = md5.get()
    val out16 = new Array[Byte](16)
    val nShingles = if (n < k) 1 else n - k + 1
    val width = if (n < k) math.max(n, 0) else k
    val hs = new Array[Long](nShingles)
    var j = 0
    while (j < nShingles) {
      var len = 0
      var t = 0
      while (t < width) {
        val s = tokens.getUTF8String(j + t)
        val sb = s.numBytes
        if (len + sb + 1 > buf.length) {
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + sb + 1))
        }
        if (t > 0) { buf(len) = ' '; len += 1 }
        s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
        len += sb
        t += 1
      }
      digest.reset()
      digest.update(buf, 0, len)
      digest.digest(out16, 0, 16)
      // == conv(substring(hex(md5), 18, 15), 16, 10): low nibble of byte
      // 8, then bytes 9..15 big-endian — 60 bits, always non-negative
      hs(j) = ((out16(8) & 0xfL) << 56) |
        ((out16(9) & 0xffL) << 48) | ((out16(10) & 0xffL) << 40) |
        ((out16(11) & 0xffL) << 32) | ((out16(12) & 0xffL) << 24) |
        ((out16(13) & 0xffL) << 16) | ((out16(14) & 0xffL) << 8) |
        (out16(15) & 0xffL)
      j += 1
    }
    if (!distinct) hs
    else {
      // first-occurrence order, exactly array_distinct's contract
      val seen = new java.util.HashSet[java.lang.Long](nShingles * 2)
      val out = new Array[Long](nShingles)
      var m = 0
      var i = 0
      while (i < nShingles) {
        if (seen.add(hs(i))) { out(m) = hs(i); m += 1 }
        i += 1
      }
      if (m == nShingles) out else java.util.Arrays.copyOf(out, m)
    }
  }
}

object GramHashFunctions {
  /** Hashed k-gram array from a token array (whitespace split upstream);
    * `distinct = true` ≡ `array_distinct` over the grams.
    */
  def graftGramMd5(tokens: Column, k: Int, distinct: Boolean = false): Column =
    Bridge.column(GramMd5Hashes(Bridge.expression(tokens), k, distinct))
}
