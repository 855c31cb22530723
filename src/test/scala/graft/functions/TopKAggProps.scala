package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the typed top-k Aggregator (q_agg_topk_typed).
  * The partial-aggregation contract Spark relies on is exactly these:
  * any partition split + any merge order must reproduce the one-pass
  * fold, which must itself equal the sort-and-take reference. Small
  * ord/id domains make ties and duplicates frequent — the cases where
  * a buggy cut diverges.
  */
object TopKAggProps extends Properties("TopKAgg") {

  private def reference(xs: Seq[TopKEntry], k: Int): Seq[TopKEntry] =
    xs.sortBy(e => (-e.ord, e.id)).take(k)

  private def fold(agg: TopKAgg, xs: Seq[TopKEntry]): Seq[TopKEntry] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private val entryGen: Gen[TopKEntry] = for {
    ord <- Gen.chooseNum(-50L, 50L)
    id <- Gen.chooseNum(0L, 20L)
  } yield TopKEntry(ord, id)

  private val inputGen: Gen[List[TopKEntry]] = Gen.listOf(entryGen)
  private val kGen: Gen[Int] = Gen.chooseNum(1, 8)

  property("fold equals sort-and-take") = forAll(inputGen, kGen) { (xs, k) =>
    fold(new TopKAgg(k), xs) == reference(xs, k)
  }

  property("split-and-merge equals one-pass fold") =
    forAll(inputGen, kGen, Gen.chooseNum(0, 100)) { (xs, k, cut) =>
      val agg = new TopKAgg(k)
      val (a, b) = xs.splitAt(cut % (xs.size + 1))
      agg.merge(fold(agg, a), fold(agg, b)) == reference(xs, k)
    }

  property("merge is commutative with zero identity") =
    forAll(inputGen, inputGen, kGen) { (xs, ys, k) =>
      val agg = new TopKAgg(k)
      val (ba, bb) = (fold(agg, xs), fold(agg, ys))
      agg.merge(ba, bb) == agg.merge(bb, ba) &&
        agg.merge(ba, agg.zero) == ba && agg.merge(agg.zero, bb) == bb
    }

  property("buffer stays sorted and bounded by k") =
    forAll(inputGen, kGen) { (xs, k) =>
      val b = fold(new TopKAgg(k), xs)
      b.size <= k && b == reference(b, k)
    }
}
