package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (ordering, payload) candidate for [[TopKAgg]]. `ord` is an exact
  * integer ordering key (the caller packs value + tie-break into one
  * long); `id` is the payload to surface. Higher `ord` wins; equal `ord`
  * prefers the smaller `id` so results are deterministic.
  */
case class TopKEntry(ord: Long, id: Long)

/** Exact per-group top-k as a typed [[Aggregator]] — the Dataset-typed
  * custom-aggregation surface (SURVEY.md §2.3 q_agg_topk_typed).
  *
  * Why an Aggregator and not a rank window: a window plan must shuffle
  * EVERY row to its group's partition before ranking (WindowGroupLimit
  * recovers map-side partials only for the row_number-filter shape this
  * class generalizes). As an aggregate, top-k is partial-aggregable by
  * construction: each partition folds its rows into a ≤k-entry buffer
  * per group, so the exchange carries groups × k entries per partition
  * — independent of row count. At 100 TB the shuffle is KBs.
  *
  * The buffer is kept sorted (desc ord, asc id); `reduce` is O(1) for
  * the common below-threshold row (compare against the current k-th),
  * O(k) on insert; `merge` is a bounded merge of two sorted runs.
  */
class TopKAgg(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {

  /** true if `x` ranks strictly better than `y` (higher ord, tie → lower id). */
  private def beats(x: TopKEntry, y: TopKEntry): Boolean =
    x.ord > y.ord || (x.ord == y.ord && x.id < y.id)

  private def insert(sorted: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] = {
    val (better, rest) = sorted.span(e => !beats(a, e))
    (better :+ a) ++ rest
  }

  override def zero: Seq[TopKEntry] = Seq.empty

  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] =
    if (b.size < k) insert(b, a)
    else if (beats(a, b.last)) insert(b, a).take(k)
    else b

  override def merge(b1: Seq[TopKEntry], b2: Seq[TopKEntry]): Seq[TopKEntry] = {
    val out = Seq.newBuilder[TopKEntry]
    var (l, r, n) = (b1, b2, 0)
    while (n < k && (l.nonEmpty || r.nonEmpty)) {
      if (r.isEmpty || (l.nonEmpty && !beats(r.head, l.head))) { out += l.head; l = l.tail }
      else { out += r.head; r = r.tail }
      n += 1
    }
    out.result()
  }

  override def finish(reduction: Seq[TopKEntry]): Seq[TopKEntry] = reduction

  override def bufferEncoder: ExpressionEncoder[Seq[TopKEntry]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[TopKEntry]] = ExpressionEncoder()
}
