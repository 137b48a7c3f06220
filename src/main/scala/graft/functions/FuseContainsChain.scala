package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite an OR-chain of `contains(text, 'lit')`
  * predicates over the SAME text expression —
  * `contains(t,'a') OR contains(t,'b') OR ...` — into ONE Aho-Corasick
  * pass: `size(graft_multi_match(t, terms)) > 0`.
  *
  * Why: the OR-chain is how a blocklist filter arrives from SQL tools
  * and hand-written code, and it scans the text once PER TERM
  * (O(k·|text|)), where the automaton scans once total (ScaleProbe:
  * composed contains grows 4.3× for 16× terms while the automaton stays
  * ~flat). Legal because the rewrite is exactly equivalent, including
  * NULL semantics: for NULL text every `contains` is NULL so the OR is
  * NULL; `graft_multi_match` is null-intolerant so `size(...)` is NULL
  * and the comparison is NULL. For non-null text, "any term contained"
  * ⇔ the matched-term array is non-empty.
  *
  * Deliberately conservative: only PURE chains of ≥ `minTerms`
  * contains-with-literal over semantically-equal text rewrite; an empty
  * term literal (where `contains` is constant-true) or any other leaf
  * leaves the chain untouched. Inner pure sub-chains of a mixed OR tree
  * still rewrite (the rule transforms every Or node top-down).
  */
object FuseContainsChain extends Rule[LogicalPlan] {
  private val minTerms = 4

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case or: Or =>
        collectChain(or) match {
          case Some((text, terms))
            if terms.size >= minTerms && terms.forall(_.nonEmpty) =>
            GreaterThan(Size(MultiMatch(text, terms)), Literal(0))
          case _ => or
        }
    }

  /** (shared text expr, literal terms) for a pure contains-OR tree. */
  private def collectChain(
      e: Expression): Option[(Expression, Seq[String])] = e match {
    case Or(l, r) =>
      for {
        (tl, ll) <- collectChain(l)
        (tr, lr) <- collectChain(r)
        if tl.semanticEquals(tr)
      } yield (tl, ll ++ lr)
    case Contains(t, Literal(s: UTF8String, StringType)) =>
      Some((t, Seq(s.toString)))
    case _ => None
  }
}
