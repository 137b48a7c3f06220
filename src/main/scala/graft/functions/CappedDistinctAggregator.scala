package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded set-collect buffer. `over = true` poisons the group: the cap
  * was exceeded, contents are dropped and stay dropped (a case class so
  * the product encoder applies — columnar buffer, no kryo).
  */
final case class CapBuf(ids: List[Long], n: Int, over: Boolean)

/** Collect a group's (already-distinct) Long values as a sorted array,
  * IF the group has at most `cap` of them — otherwise return the empty
  * array. The primitive behind every df-cap / maxBucket guard: "give me
  * the full member list of small groups; drop oversized groups
  * entirely" in ONE aggregation pass with a buffer bounded at `cap`
  * elements, instead of count → filter → join-back → re-collect (two
  * extra shuffles of the exploded table).
  *
  * Once a buffer exceeds `cap` it is poisoned (`over`): contents are
  * freed immediately and every further reduce/merge is O(1), so a
  * boilerplate key with 10⁹ occurrences costs one flag, not a 10⁹-entry
  * list — the property that makes the cap a SKEW guard rather than just
  * a filter. Inputs must be distinct within the group (true for any
  * `(key, member)` relation that is distinct by construction, e.g.
  * per-doc-distinct shingle tables); duplicates would count twice
  * against the cap.
  *
  * Spark plans a ScalaAggregator as a TypedImperativeAggregate with
  * partial aggregation: map tasks ship at most `cap` ids (or the poison
  * flag) per key.
  */
/** Bottom-k (KMV) sketch aggregator: the k SMALLEST distinct Long
  * values of a group, sorted ascending — the classic k-minimum-values
  * sketch (Bar-Yossef et al. 2002): union-mergeable (merge two bottom-k
  * lists, keep the k smallest), estimates distinct counts and — over
  * hashed element sets — jaccard overlaps. Exact Long ordering (a
  * Double-scored top-k heap would round 60-bit hashes); buffer bounded
  * at k, map tasks ship ≤ k values per group.
  */
class BottomKAggregator(k: Int)
    extends Aggregator[Long, CapBuf, Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: CapBuf = CapBuf(Nil, 0, over = false)

  // ids holds AT MOST k values, sorted ascending (n tracks size)
  override def reduce(b: CapBuf, a: Long): CapBuf =
    if (b.n < k) {
      val ins = (a :: b.ids).sorted
      CapBuf(ins.distinct, ins.distinct.length, over = false)
    } else if (a < b.ids.last && !b.ids.contains(a)) {
      CapBuf(((a :: b.ids.init).sorted), k, over = false)
    } else b

  override def merge(x: CapBuf, y: CapBuf): CapBuf = {
    val m = (x.ids ++ y.ids).distinct.sorted.take(k)
    CapBuf(m, m.length, over = false)
  }

  override def finish(b: CapBuf): Seq[Long] = b.ids

  override def bufferEncoder: Encoder[CapBuf] = Encoders.product[CapBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

class CappedDistinctAggregator(cap: Int)
    extends Aggregator[Long, CapBuf, Seq[Long]] {
  require(cap > 0, s"cap must be positive, got $cap")

  override def zero: CapBuf = CapBuf(Nil, 0, over = false)

  override def reduce(b: CapBuf, a: Long): CapBuf =
    if (b.over) b
    else if (b.n >= cap) CapBuf(Nil, 0, over = true)
    else CapBuf(a :: b.ids, b.n + 1, over = false)

  override def merge(x: CapBuf, y: CapBuf): CapBuf =
    if (x.over || y.over || x.n + y.n > cap) CapBuf(Nil, 0, over = true)
    else CapBuf(x.ids reverse_::: y.ids, x.n + y.n, over = false)

  override def finish(b: CapBuf): Seq[Long] =
    if (b.over) Nil else b.ids.sorted

  override def bufferEncoder: Encoder[CapBuf] = Encoders.product[CapBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
