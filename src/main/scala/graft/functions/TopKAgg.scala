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
  * The buffer is kept sorted (desc ord, asc id) in an INDEXED Seq
  * (Vector / the encoder's ArraySeq), so `reduce`'s common
  * below-threshold row really is O(1): length check + one comparison
  * against the current k-th — no list walk (a List buffer made size/
  * last O(k) and every losing row paid it). Insert stays O(k); `merge`
  * is an index-walked bounded merge of two sorted runs.
  */
class TopKAgg(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  // loud at construction: k = 0 would otherwise surface as an opaque
  // IndexOutOfBounds deep inside reduce's k-th-element comparison
  require(k > 0, s"TopKAgg needs k > 0; got $k")

  /** true if `x` ranks strictly better than `y` (higher ord, tie → lower id). */
  private def beats(x: TopKEntry, y: TopKEntry): Boolean =
    x.ord > y.ord || (x.ord == y.ord && x.id < y.id)

  /** Buffers we built are already indexed; the one O(k) copy happens
    * only when the encoder hands back a non-indexed Seq after a
    * shuffle-boundary deserialization. */
  private def idx(b: Seq[TopKEntry]): IndexedSeq[TopKEntry] = b match {
    case v: IndexedSeq[TopKEntry] => v
    case other => other.toIndexedSeq
  }

  private def insert(sorted: IndexedSeq[TopKEntry], a: TopKEntry): IndexedSeq[TopKEntry] = {
    val at = sorted.indexWhere(e => beats(a, e)) match {
      case -1 => sorted.length
      case i => i
    }
    (sorted.take(at) :+ a) ++ sorted.drop(at)
  }

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] = {
    val v = idx(b)
    if (v.length < k) insert(v, a)
    else if (beats(a, v(v.length - 1))) insert(v, a).take(k)
    else v
  }

  override def merge(b1: Seq[TopKEntry], b2: Seq[TopKEntry]): Seq[TopKEntry] = {
    val (l, r) = (idx(b1), idx(b2))
    val out = Vector.newBuilder[TopKEntry]
    var i = 0
    var j = 0
    while (i + j < k && (i < l.length || j < r.length)) {
      if (j >= r.length || (i < l.length && !beats(r(j), l(i)))) { out += l(i); i += 1 }
      else { out += r(j); j += 1 }
    }
    out.result()
  }

  override def finish(reduction: Seq[TopKEntry]): Seq[TopKEntry] = reduction

  override def bufferEncoder: ExpressionEncoder[Seq[TopKEntry]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[TopKEntry]] = ExpressionEncoder()
}
