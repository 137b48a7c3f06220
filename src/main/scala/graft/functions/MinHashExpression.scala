package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared MinHash machinery: one 64-bit content hash per shingle, then
  * `numHashes` affine transforms (odd multiplier + offset from a SplitMix64
  * stream) standing in for independent permutations — the standard
  * one-hash MinHash construction. Hashing each shingle once instead of
  * `numHashes` times is what makes signatures scan-bound.
  */
object MinHashCore {
  val MaxHashes = 256
  // deterministic affine constants (SplitMix64 stream, seed 42)
  val (mulA: Array[Long], addB: Array[Long]) = {
    var x = 42L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.fill(MaxHashes)(next() | 1L) // odd multipliers
    val b = Array.fill(MaxHashes)(next())
    (a, b)
  }
}

/** Native fused shingle+MinHash signature over a TOKEN array:
  * `graft_minhash(tokens, k, H)` → array<long>.
  *
  * For each of the n-k+1 k-token shingles the expression assembles the
  * space-joined bytes into a reused buffer, hashes once (xxhash64), and
  * folds the `numHashes` affine-mixed values into running minima — one
  * pass, zero per-shingle allocation, full codegen. This replaces the
  * composed transform(sequence)+slice+concat_ws shingle layer AND the
  * explode+min-agg shuffle: signature computation becomes a pure
  * map-side, scan-bound operator (the only kind that survives 100 TB).
  *
  * Docs shorter than k tokens hash their single whole-text shingle,
  * matching TextAnalysis.shingles semantics.
  */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
      if k > 0 && numHashes > 0 && numHashes <= MinHashCore.MaxHashes =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<string>, k>0, 0<numHashes<=${MinHashCore.MaxHashes}), " +
        s"got ${child.dataType.catalogString} / k=$k / H=$numHashes")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(
      MinHashSignature.compute(arr, k, numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.compute($arr, $k, $numHashes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Single-pass signature kernel, shared by eval and codegen. */
  def compute(tokens: ArrayData, k: Int, numHashes: Int): Array[Long] = {
    val n = tokens.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var buf = new Array[Byte](256)
    val nShingles = if (n < k) 1 else n - k + 1
    val width = if (n < k) math.max(n, 0) else k
    var j = 0
    while (j < nShingles) {
      // assemble tokens[j..j+width-1] space-joined into buf
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
      val h = XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 0L)
      var i = 0
      while (i < numHashes) {
        val v = h * MinHashCore.mulA(i) + MinHashCore.addB(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }
}

object MinHashFunctions {
  /** MinHash signature from a token array (whitespace split upstream). */
  def graftMinHash(tokens: Column, k: Int = 3, numHashes: Int = 64): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), k, numHashes))
}
