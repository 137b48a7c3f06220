package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[NfcNormalize]] — referenced by name from the
  * generated code, so the expression stays inside WholeStageCodegen.
  */
object UnicodeNorm {
  /** Unicode NFC (canonical composition) with two no-allocation fast
    * paths, because a web-scale corpus is overwhelmingly already
    * normalized: (1) pure-ASCII strings (numBytes == numChars ⇔ every
    * code point is single-byte) are NFC by definition and return the
    * input buffer untouched; (2) non-ASCII strings that
    * `Normalizer.isNormalized` confirms (a scan, no rewrite) also return
    * the input. Only genuinely decomposed text pays for the rewrite.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  /** Accent stripping: NFD-decompose, drop combining marks, keep
    * everything else — agrees with DuckDB/utf8proc `strip_accents` on
    * precomposed Latin (é→e, ü→u, ź→z) AND on the deliberate
    * non-strips (œ, ø, æ, ß, Ł have no canonical decomposition and
    * survive on both engines). Same ASCII fast path as [[nfc]].
    */
  def stripAccents(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) s
    else {
      val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Native Unicode NFC normalization over a string column — the first
  * pass of any multilingual text-cleaning pipeline (decomposed
  * e + U+0301 and precomposed é must dedup/tokenize/fingerprint
  * identically; C4/CCNet-style cleaners normalize before everything
  * else). Spark ships no normalization function, and a Scala UDF would
  * break WholeStageCodegen around it; this expression generates a
  * straight static call (`UnicodeNorm.nfc`) into the enclosing stage.
  * Conforms to UAX #15 via `java.text.Normalizer`, which matches
  * DuckDB's utf8proc `nfc_normalize` on assigned code points — so the
  * result is oracle-checkable cross-engine (q143).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string arg, got ${other.catalogString}")
    }
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native accent stripping (NFD + drop combining marks) — the search /
  * dedup normalization step after [[NfcNormalize]]: "café" and "cafe"
  * should fingerprint together for near-dup purposes even though NFC
  * keeps them distinct. Matches DuckDB's `strip_accents`, so it is
  * oracle-checkable cross-engine (q184); same codegen shape as
  * [[NfcNormalize]].
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_strip_accents expects a string arg, got ${other.catalogString}")
    }
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry point. */
object TextNormFunctions {
  def graftNfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
  def graftStripAccents(c: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(c)))
}
