package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row entering a group top-k. */
final case class Scored(score: Double, id: Long)

/** Bounded top-k buffer (a case class so the product encoder applies —
  * the buffer serializes columnar, no kryo).
  */
final case class TopKBuf(items: Seq[Scored])

/** Per-group top-k as a typed `Aggregator` — the generic form of the
  * two-level top-k used by the ANN path (Similarity.localTopK), usable
  * from any `groupBy().agg()`:
  *
  * Spark plans a ScalaAggregator as a TypedImperativeAggregate with
  * partial aggregation, so each map task ships AT MOST k entries per
  * group to the reducers — a `row_number` window would instead shuffle
  * every row of every group onto one reducer per group and sort it.
  * Ordering is (score DESC, id ASC); ties are broken by id, so the
  * result is deterministic whenever ids are unique.
  *
  * The buffer keeps a sorted Seq trimmed to k (O(k log k) per update —
  * fine for the small k this exists for; a binary heap saves nothing
  * measurable below k ≈ 10⁴).
  *
  * Reference surface: the MapReduce engine's reduce is a holistic fold
  * over all values of a key (/root/reference/src/mr/worker.go:167-183);
  * this is the bounded-state refinement of that contract for top-k, the
  * case where shipping all values is wasteful.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")
  private val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf =
    if (b.items.size < k) TopKBuf((a +: b.items).sorted(ord))
    else if (ord.lt(a, b.items.last)) TopKBuf((a +: b.items.init).sorted(ord))
    else b

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.items ++ y.items).sorted(ord).take(k))

  override def finish(b: TopKBuf): Seq[Scored] = b.items.sorted(ord)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
