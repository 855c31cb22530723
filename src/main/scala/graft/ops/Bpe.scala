package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as distributed SQL — the
  * subword-vocabulary learning pass every LLM data pipeline runs before
  * a single training token is emitted (Sennrich et al., ACL'16; the
  * algorithm behind GPT-2/RoBERTa vocabularies).
  *
  * Shape, and why it scales to a 100 TB corpus:
  *   - The corpus is touched ONCE: a word-count aggregation (map-side
  *     combined) collapses corpus tokens to a VOCABULARY table
  *     (word, cnt, syms). Everything after is vocabulary-sized — the
  *     classical trainer's `{word: freq}` dict, distributed.
  *   - Each merge iteration is: (a) a pair-count aggregation whose
  *     shuffle carries adjacent-symbol-pair rows (bounded by total
  *     symbol occurrences in the vocab, shrinking every iteration);
  *     (b) a 1-row argmax (`ORDER BY n DESC, a, b LIMIT 1` — bounded
  *     driver metadata, the same discipline as the IVF centroid
  *     literals); (c) one window pass partitioned by word that applies
  *     the merge greedily left-to-right, then rebuilds the symbol
  *     arrays in the SAME word partitioning (no second exchange — the
  *     groupBy keys are a superset of the window partition key).
  *   - Merges are applied with the classical GREEDY leftmost
  *     non-overlapping rule (Python `re.sub` semantics in the original
  *     learner): a match consumes its right symbol, so an overlapping
  *     run like `aaa` with pair (a,a) merges once, `aaaa` twice. Runs
  *     of consecutive match positions only arise when a == b, and the
  *     greedy rule is then "keep every other match from the run start"
  *     — computed exactly with a gaps-and-islands window (no
  *     sequential scan, no UDF).
  *   - Pair STATISTICS count every adjacent position (the original
  *     `get_stats` does too), so stats and greedy application can
  *     disagree on overlap — faithfully mirrored, and ties on count
  *     break lexicographically (a, then b) so any engine picks the
  *     same merge.
  *
  * Everything is integer arithmetic + character substring ops, so a SQL
  * oracle replays training bit-for-bit (q_bpe_train). No end-of-word
  * marker: the corpus token rule (space split) already bounds merges to
  * word interiors, which is exactly what the marker enforces.
  */
object Bpe {

  /** One learned merge: at `step`, pair (`a`,`b`) had summed weight `n`. */
  final case class Merge(step: Int, a: String, b: String, n: Long)

  /** Corpus → vocabulary table (word, cnt, syms = per-character split).
    * The one corpus-sized pass; its output is vocabulary-sized. */
  def initVocab(docs: DataFrame, text: Column): DataFrame =
    docs
      .select(explode(Text.tokens(text)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn(
        "syms",
        expr("transform(sequence(1, length(word)), j -> substring(word, j, 1))"))

  /** Adjacent-symbol pair weights over the vocabulary (every position
    * counts, including overlapping ones — the classical `get_stats`). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(
        col("cnt"),
        explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** Apply one merge (a,b) → ab greedily (leftmost non-overlapping) to
    * every word. ONE exchange on `word`; the island/parity windows and
    * the rebuild aggregation all reuse that partitioning. */
  def mergeOnce(vocab: DataFrame, a: String, b: String): DataFrame = {
    val wOrd = Window.partitionBy(col("word")).orderBy(col("i"))
    val wIsl = Window.partitionBy(col("word"), col("island"))
    val pos = vocab
      .select(col("word"), col("cnt"), posexplode(col("syms")).as(Seq("i", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(wOrd))
      .withColumn("isM", col("sym") === lit(a) && col("nxt") === lit(b))
      // match ordinal → island id: consecutive match positions (possible
      // only when a == b) share an island; greedy keeps even offsets.
      .withColumn("mrn", sum(when(col("isM"), 1L).otherwise(0L)).over(wOrd))
      .withColumn("island", when(col("isM"), col("i") - col("mrn")))
    pos
      .withColumn("off", col("i") - min(when(col("isM"), col("i"))).over(wIsl))
      .withColumn("kept", col("isM") && pmod(col("off"), lit(2)) === 0)
      .withColumn("gone", coalesce(lag(col("kept"), 1).over(wOrd), lit(false)))
      .filter(!col("gone"))
      .withColumn("sym2", when(col("kept"), lit(a + b)).otherwise(col("sym")))
      .groupBy(col("word"), col("cnt"))
      .agg(expr("transform(array_sort(collect_list(struct(i, sym2))), x -> x.sym2)")
        .as("syms"))
  }

  /** Train `iters` merges. Returns (final vocabulary, learned merges).
    * Each iteration localCheckpoints the vocabulary: it is consumed
    * twice (pair stats + merge application) and the checkpoint keeps
    * the growing plan from re-deriving iteration k-1 inside k. */
  def train(docs: DataFrame, text: Column, iters: Int): (DataFrame, Seq[Merge]) = {
    var vocab = initVocab(docs, text).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (k <- 1 to iters) {
      val best = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      require(best.nonEmpty, s"BPE iteration $k: no pair left to merge")
      val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += Merge(k, a, b, n)
      vocab = mergeOnce(vocab, a, b).localCheckpoint()
    }
    (vocab, merges.result())
  }
}
