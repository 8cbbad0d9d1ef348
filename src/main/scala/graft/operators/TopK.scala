package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** One scored candidate flowing into the bounded top-k aggregate. */
final case class ScoredId(score: Double, id: Long)

/** Bounded accumulation buffer: at most ~2k items between compactions. */
final case class TopKBuf(items: Seq[ScoredId])

/** Bounded top-k as a real partial-merge aggregate.
  *
  * Why not `row_number().over(Window.partitionBy(q))`: the window form
  * shuffles EVERY candidate row onto |Q| reducer keys — with a 100 TB corpus
  * and 20 queries that is a handful of reducers each receiving the whole
  * corpus. An `Aggregator` compiles to a `TypedImperativeAggregate`
  * (ObjectHashAggregate), which Spark runs in partial mode BEFORE the
  * exchange: each map partition emits at most k survivors per group, so the
  * shuffle carries |partitions| x |Q| x k rows instead of |corpus| x |Q|.
  *
  * Ordering: score descending, id ascending (deterministic tie-break) —
  * matching the reference's rank semantics for batch ANN
  * (/root/reference/src: no direct analogue; semantics fixed by s5 oracle).
  */
final class BoundedTopK(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {
  private val ord: Ordering[ScoredId] = Ordering.by(s => (-s.score, s.id))

  private def compact(items: Seq[ScoredId]): Seq[ScoredId] =
    items.sorted(ord).take(k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    val appended = b.items :+ a
    // amortize: sort-truncate only when the buffer doubles past k
    if (appended.size >= 2 * k) TopKBuf(compact(appended)) else TopKBuf(appended)
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(compact(b1.items ++ b2.items))

  override def finish(r: TopKBuf): Seq[ScoredId] = compact(r.items)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopK {
  /** `topk(k)(score, id)` → array<struct<score,id>> of the k best rows per
    * group, score desc / id asc. Usable in any `groupBy(...).agg(...)`. */
  def topkAgg(k: Int)(score: Column, id: Column): Column =
    udaf(new BoundedTopK(k), Encoders.product[ScoredId])(score, id)
}
