package graft.agg

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** One candidate row for the TopK aggregate: ranked by weight DESC with id
  * ASC as the total tie-break (determinism rule, SURVEY.md §7.3). */
case class TopKItem(weight: Double, id: Long)

/**
 * OP-26: bounded top-k as a typed `Aggregator` — the Spark analog of
 * Trill's built-in TopK aggregate (used at reference
 * TweetGateCore/Query.cs:65,98,130,156).
 *
 * The buffer never exceeds k elements and is kept sorted, so partial
 * (map-side) aggregation ships at most k rows per group per partition into
 * the shuffle — the property that makes per-group examples affordable at
 * 100 TB. `merge` is a k-bounded sorted merge, associative and commutative
 * (scalacheck-verified in TopKSpec), so the result is independent of
 * partitioning.
 *
 * For small k the composite built-in
 * `slice(sort_array(collect_list(struct(...)), false), 1, k)` is
 * equivalent (parity-tested); this aggregator is the scale path — it bounds
 * state where collect_list would buffer entire groups.
 */
class TopKIds(k: Int)
    extends Aggregator[TopKItem, Seq[TopKItem], Seq[Long]] {
  require(k > 0)

  /** weight DESC, id ASC. */
  private val ord: Ordering[TopKItem] =
    Ordering.by((t: TopKItem) => (-t.weight, t.id))

  override def zero: Seq[TopKItem] = Vector.empty

  override def reduce(b: Seq[TopKItem], a: TopKItem): Seq[TopKItem] =
    if (b.size < k) insertSorted(b, a)
    else if (ord.lt(a, b.last)) insertSorted(b.init, a)
    else b

  private def insertSorted(b: Seq[TopKItem], a: TopKItem): Seq[TopKItem] = {
    val i = b.indexWhere(x => ord.gt(x, a)) match {
      case -1 => b.size
      case n  => n
    }
    (b.take(i) :+ a) ++ b.drop(i)
  }

  override def merge(b1: Seq[TopKItem], b2: Seq[TopKItem]): Seq[TopKItem] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[TopKItem]): Seq[Long] = r.map(_.id)

  override def bufferEncoder: Encoder[Seq[TopKItem]] =
    ExpressionEncoder[Seq[TopKItem]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object TopK {
  /** Untyped (DataFrame) form: `topKIds(10)(col("value"), col("id"))`. */
  def topKIds(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKIds(k), ExpressionEncoder[TopKItem]())
    (weight, id) => fn(weight, id)
  }
}
