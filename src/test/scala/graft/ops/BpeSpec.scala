package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE trainer semantics on hand-checkable corpora: merge selection
  * (weighted counts + lexicographic tie-breaks), the greedy leftmost
  * non-overlapping application rule (the a==b run cases the window
  * islands exist for), and the stats-vs-application overlap asymmetry
  * the classical learner has too. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  private def symsOf(vocab: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    vocab.select("word", "syms").as[(String, Seq[String])].collect().toMap

  test("train: merge trajectory and final vocab on a hand-computed corpus") {
    // vocab: "ab" cnt 3, "aaa" cnt 2
    // iter1: (a,b)=3, (a,a)=2 positions × cnt2 = 4 → merge (a,a,4); "aaa"→[aa,a]
    // iter2: (a,b)=3, (aa,a)=2 → merge (a,b,3); "ab"→[ab]
    // iter3: (aa,a)=2 → merge (aa,a,2); "aaa"→[aaa]
    val (vocab, merges) = Bpe.train(docs("ab ab ab", "aaa aaa"), col("text"), 3)
    assert(merges == Seq(Bpe.Merge(1, "a", "a", 4L), Bpe.Merge(2, "a", "b", 3L),
      Bpe.Merge(3, "aa", "a", 2L)))
    assert(symsOf(vocab) == Map("ab" -> Seq("ab"), "aaa" -> Seq("aaa")))
  }

  test("mergeOnce: greedy leftmost non-overlapping for a == b runs") {
    val v = Bpe.initVocab(docs("aaaa aaaaa aba"), col("text"))
    val m = symsOf(Bpe.mergeOnce(v, "a", "a"))
    assert(m("aaaa") == Seq("aa", "aa"))   // run of 3 matches → keep offsets 0, 2
    assert(m("aaaaa") == Seq("aa", "aa", "a"))
    assert(m("aba") == Seq("a", "b", "a")) // no adjacent (a,a)
  }

  test("pairCounts: overlapping positions both counted, weighted by word frequency") {
    val v = Bpe.initVocab(docs("aaa aaa ab"), col("text"))
    val counts = Bpe.pairCounts(v).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts(("a", "a")) == 4L) // "aaa" cnt 2 × 2 adjacent positions
    assert(counts(("a", "b")) == 1L)
  }

  test("tie-break: equal counts pick the lexicographically smallest pair") {
    // pairs (a,b) and (a,c) each appear once
    val (_, merges) = Bpe.train(docs("ab ac"), col("text"), 1)
    assert(merges == Seq(Bpe.Merge(1, "a", "b", 1L)))
  }

  test("single-char words contribute no pairs and survive merges") {
    val (vocab, merges) = Bpe.train(docs("a a a bb"), col("text"), 1)
    assert(merges == Seq(Bpe.Merge(1, "b", "b", 1L)))
    assert(symsOf(vocab) == Map("a" -> Seq("a"), "bb" -> Seq("bb")))
  }
}
