package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring matcher:
  * `graft_multi_match(text, terms)` → array<string> — the sorted
  * distinct subset of `terms` occurring as (byte-level, case-sensitive)
  * substrings of `text`. Exactly equal to
  * `sort_array(filter(terms, t -> contains(text, t)))` and to DuckDB's
  * `list_sort(list_filter(terms, t -> contains(text, t)))`.
  *
  * Why native: the blocklist/policy filter ("drop any page containing a
  * banned phrase", the C4 cleaning step) over k terms is k separate
  * `contains` scans — O(k·|text|) — as a composed column, and a regex
  * alternation backtracks. An Aho-Corasick automaton (built ONCE per
  * term list, shipped as a broadcast-style reference object into the
  * generated code) matches all k terms in ONE pass over the text bytes,
  * O(|text| + matches), independent of k — the difference between a
  * scan-bound and a CPU-bound cleaning stage when the blocklist has
  * thousands of entries. Matching runs on raw UTF-8 bytes, so its
  * semantics are precisely byte-substring (what `contains` does on both
  * engines); matched-term hits are collected in a bitset and emitted in
  * the automaton's pre-sorted term order, so output order never depends
  * on match positions.
  */
case class MultiMatch(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if terms.nonEmpty && terms.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_multi_match expects (string, non-empty terms), " +
        s"got ${child.dataType.catalogString} / ${terms.size} terms")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_multi_match"

  @transient private lazy val automaton = new AcAutomaton(terms.toArray)

  override def nullSafeEval(input: Any): Any =
    MultiMatch.compute(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val acRef = ctx.addReferenceObj("graftAc", automaton,
        classOf[AcAutomaton].getName)
      val helper = MultiMatch.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($in, $acRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiMatch {
  /** Single-pass automaton scan; shared by eval and codegen. */
  def compute(s: UTF8String, ac: AcAutomaton): ArrayData = {
    val bytes = s.getBytes
    val hits = ac.scan(bytes)
    val out = new Array[AnyRef](java.lang.Long.bitCount(hits(0)) + {
      var c = 0; var i = 1
      while (i < hits.length) { c += java.lang.Long.bitCount(hits(i)); i += 1 }
      c
    })
    var w = 0
    var t = 0
    while (t < ac.sortedTerms.length) {
      if ((hits(t >> 6) & (1L << (t & 63))) != 0) {
        out(w) = ac.sortedUtf8(t)
        w += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Aho-Corasick automaton over UTF-8 bytes. Built eagerly from the
  * (deduplicated, sorted) term list; the node tables are @transient and
  * rebuilt on first use after deserialization, so the object ships to
  * executors as just the term list.
  */
final class AcAutomaton(termsIn: Array[String]) extends Serializable {
  val sortedTerms: Array[String] = termsIn.distinct.sorted
  @transient lazy val sortedUtf8: Array[UTF8String] =
    sortedTerms.map(UTF8String.fromString)
  @transient private lazy val termByteLens: Array[Int] =
    sortedTerms.map(_.getBytes("UTF-8").length)

  // trie with dense byte-indexed goto tables (node count = total term
  // bytes + 1 — blocklist-sized, not corpus-sized), BFS fail links,
  // out-bitsets merged along fail chains
  @transient private lazy val tables: (Array[Array[Int]], Array[Array[Long]]) = {
    val words = sortedTerms.length
    val maskLen = (words + 63) >> 6
    val nodes = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val outs = scala.collection.mutable.ArrayBuffer(new Array[Long](maskLen))
    var t = 0
    while (t < words) {
      val bs = sortedTerms(t).getBytes("UTF-8")
      var st = 0
      var i = 0
      while (i < bs.length) {
        val b = bs(i) & 0xff
        if (nodes(st)(b) == -1) {
          nodes(st)(b) = nodes.length
          nodes += Array.fill(256)(-1)
          outs += new Array[Long](maskLen)
        }
        st = nodes(st)(b)
        i += 1
      }
      outs(st)(t >> 6) |= 1L << (t & 63)
      t += 1
    }
    // BFS: resolve fails, convert goto misses to fail transitions so the
    // scan is a single table lookup per byte
    val fail = new Array[Int](nodes.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var b = 0
    while (b < 256) {
      val nxt = nodes(0)(b)
      if (nxt == -1) nodes(0)(b) = 0
      else { fail(nxt) = 0; queue += nxt }
      b += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      var m = 0
      while (m < maskLen) { outs(u)(m) |= outs(fail(u))(m); m += 1 }
      var c = 0
      while (c < 256) {
        val v = nodes(u)(c)
        if (v == -1) nodes(u)(c) = nodes(fail(u))(c)
        else { fail(v) = nodes(fail(u))(c); queue += v }
        c += 1
      }
    }
    (nodes.toArray, outs.toArray)
  }
  @transient private lazy val gotoTab: Array[Array[Int]] = tables._1
  @transient private lazy val outTab: Array[Array[Long]] = tables._2
  // most states emit nothing — one boolean test per byte instead of a
  // maskLen-word merge keeps the scan flat as the term list grows
  @transient private lazy val hasOut: Array[Boolean] =
    outTab.map(_.exists(_ != 0L))

  /** Returns the matched-term bitset for one text. */
  def scan(bytes: Array[Byte]): Array[Long] = {
    val g = gotoTab
    val o = outTab
    val ho = hasOut
    val acc = new Array[Long]((sortedTerms.length + 63) >> 6)
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = g(st)(bytes(i) & 0xff)
      if (ho(st)) {
        val ob = o(st)
        var m = 0
        while (m < ob.length) { acc(m) |= ob(m); m += 1 }
      }
      i += 1
    }
    acc
  }

  /** Per-term NON-OVERLAPPING occurrence counts in sorted-term order —
    * the left-to-right greedy count `replace(text, term, '')` implies
    * (each term independent; a match is accepted iff it starts after the
    * previous accepted match of the SAME term ends). Fixed-length
    * patterns arrive in end-position == start-position order, so
    * greedy-accept here is exactly the replace semantics — which is what
    * makes a column of these counts bit-equal to the composed
    * `(length(t) − length(replace(t, m, ''))) / length(m)` form on any
    * engine. Still one automaton pass: O(|text| + matches), independent
    * of term count.
    */
  def scanCounts(bytes: Array[Byte]): Array[Long] = {
    val g = gotoTab
    val o = outTab
    val ho = hasOut
    val lens = termByteLens
    val cnt = new Array[Long](sortedTerms.length)
    val lastEnd = new Array[Int](sortedTerms.length)
    java.util.Arrays.fill(lastEnd, -1)
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = g(st)(bytes(i) & 0xff)
      if (ho(st)) {
        val ob = o(st)
        var w = 0
        while (w < ob.length) {
          var bits = ob(w)
          while (bits != 0L) {
            val t = (w << 6) + java.lang.Long.numberOfTrailingZeros(bits)
            bits &= bits - 1
            if (i - lens(t) + 1 > lastEnd(t)) { cnt(t) += 1; lastEnd(t) = i }
          }
          w += 1
        }
      }
      i += 1
    }
    cnt
  }
}

/** Native multi-pattern occurrence counter:
  * `graft_multi_count(text, terms)` → array<long>, the per-term
  * NON-overlapping match counts aligned to the SORTED DISTINCT term
  * list. Bit-equal to the composed
  * `(length(t) − length(replace(t, m, ''))) / length(m)` column for each
  * marker — the language-ID / marker-profile scoring primitive
  * (TextAnalysis.langId), where k markers as composed columns cost k
  * replace passes per row but one automaton costs a single pass.
  */
case class MultiCount(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if terms.nonEmpty && terms.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_multi_count expects (string, non-empty terms), " +
        s"got ${child.dataType.catalogString} / ${terms.size} terms")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_multi_count"

  @transient private lazy val automaton = new AcAutomaton(terms.toArray)

  override def nullSafeEval(input: Any): Any =
    MultiCount.compute(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val acRef = ctx.addReferenceObj("graftAcc", automaton,
        classOf[AcAutomaton].getName)
      val helper = MultiCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($in, $acRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiCount {
  def compute(s: UTF8String, ac: AcAutomaton): ArrayData =
    new GenericArrayData(ac.scanCounts(s.getBytes))
}

object MultiMatchFunctions {
  /** Sorted distinct terms of `terms` occurring as substrings of `text`. */
  def graftMultiMatch(text: Column, terms: Seq[String]): Column =
    Bridge.column(MultiMatch(Bridge.expression(text), terms))

  /** Non-overlapping per-term counts, aligned to `terms.distinct.sorted`. */
  def graftMultiCount(text: Column, terms: Seq[String]): Column =
    Bridge.column(MultiCount(Bridge.expression(text), terms))
}
