package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: token
  * ops, shingling, portable hashing, MinHash/SimHash, language-ID
  * heuristics, quality scoring, fingerprinting. Everything is built from
  * codegen'd built-in expressions (no UDFs) so it stays inside
  * WholeStageCodegen and scales linearly — a 100 TB corpus is just more
  * partitions of the same narrow map work.
  *
  * Hash portability: all content hashes are md5-derived (lexicographic
  * min of md5 strings for MinHash; first-12-hex-chars-as-int48 for
  * numeric hashing), so any SQL engine reproduces them bit-for-bit and
  * the whole dedup family stays oracle-checkable.
  */
object Text {

  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from a tokens array column; empty array for
    * docs shorter than n tokens. Backed by the codegen'd
    * [[graft.functions.NgramShingles]] expression (the composed
    * higher-order form below is interpreted and shingling feeds every
    * dedup operator). */
  def shingles(toks: Column, n: Int): Column =
    graft.functions.NgramShingles(toks, n)

  /** Built-in-composed twin of [[shingles]] (semantic reference; pinned
    * equal by OpsSpec). */
  def shinglesComposed(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, (i + lit(k)).cast("int"))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Portable 48-bit hash: first 12 hex chars of md5, parsed base-16.
    * 48 bits stay exact in a double, so even engines without 64-bit
    * integer hex parsing can reproduce it. */
  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Lexicographic-min-md5 MinHash component for seed `i`: md5 is a
    * uniform hash, so the min over a shingle set is a valid MinHash
    * signature component; P(sig_a == sig_b) = Jaccard(a, b). */
  def minhashComponent(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, sh => md5(concat(lit(s"s$seed:"), sh))))

  /** k-component MinHash signature as array<string>, k·|sh| md5 calls. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map(i => minhashComponent(shingleArr, i)): _*)

  /** Same signature shape from ONE md5 per shingle: component i is the
    * min of hex substring [i·5, i·5+5) of md5(shingle). md5's bits are
    * independent, so disjoint 20-bit substrings act as k independent
    * uniform hashes (collision within a component adds only 2⁻²⁰ to the
    * match probability) — 1/k-th the hashing cost of
    * [[minhashSignature]]. k ≤ 6 (32 hex chars / 5). Callers pass a
    * pre-materialized `transform(sh, md5)` column so the md5 pass runs
    * once (the expression is interpreted — see simhash16FromMd5s). */
  def minhashSignatureFromMd5s(md5s: Column, k: Int): Column = {
    require(k <= 6, s"k=$k needs ${k * 5} hex chars; md5 has 32")
    array((0 until k).map(i =>
      array_min(transform(md5s, m => substring(m, i * 5 + 1, 5)))): _*)
  }

  /** LSH band keys: concat r consecutive signature components per band
    * (prefixed with the band index so bands never collide across index).
    * P(some band matches) = 1 - (1 - J^r)^b. */
  def lshBands(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      val comps = (0 until r).map(j => element_at(sig, b * r + j + 1))
      concat_ws("|", lit(s"b$b") +: comps: _*)
    }: _*)

  /** 16-bit SimHash over the token multiset: bit i of the fingerprint is
    * set iff Σ_tokens (±1 on bit i of hash48(token)) > 0. Built as a raw
    * SQL expression because Column-API shift functions only take literal
    * shift amounts. `toksExpr` is a SQL expression string yielding the
    * tokens array (e.g. "split(text, ' ')"). */
  def simhash16(toksExpr: String): Column = expr(
    s"""aggregate(
       |  sequence(0, 15), CAST(0 AS BIGINT),
       |  (acc, i) -> acc + IF(
       |    aggregate(
       |      transform($toksExpr, t -> CAST(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT)),
       |      CAST(0 AS BIGINT),
       |      (a, h) -> a + IF((h & shiftleft(CAST(1 AS BIGINT), i)) != 0, CAST(1 AS BIGINT), CAST(-1 AS BIGINT))
       |    ) > 0,
       |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)

  /** Oracle-portable 16-bit SimHash over the token multiset: bit i of the
    * fingerprint is set iff Σ_tokens (±1 by the high bit of md5 nibble i)
    * > 0. Each hex digit of md5(token) supplies one independent uniform
    * bit (digit ≥ '8' ⇔ nibble high bit set), so this is a standard
    * random-projection SimHash whose every sub-expression (md5, substring,
    * set membership, fold) exists verbatim in any SQL engine — unlike the
    * shiftleft/conv form, which needs 64-bit hex parsing. */
  def simhash16Portable(toks: Column): Column =
    simhash16FromMd5s(transform(toks, t => md5(t)))

  /** Same fingerprint from a pre-materialized `transform(toks, md5)`
    * column. Higher-order functions are interpreted (CodegenFallback), so
    * md5 must be computed ONCE per token and referenced 16 times — not
    * inlined 16× (callers should materialize the md5 array in its own
    * projection; CollapseProject keeps non-cheap expressions with
    * multiple references un-inlined). Bit i set ⟺ Σ±1 > 0 ⟺
    * 2·|{hi-nibble tokens}| > |tokens|. */
  def simhash16FromMd5s(md5s: Column): Column = {
    val hiNibble = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    (0 until 16).map { i =>
      val hi = size(filter(md5s, m => substring(m, i + 1, 1).isin(hiNibble: _*)))
      when(hi * 2 > size(md5s), lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Exact n-gram Jaccard between two shingle-array columns (distinct
    * sets). Integer arithmetic → oracle-exact. Rounded floor-half-up:
    * inter/union is a small rational that can terminate EXACTLY on a
    * .xxxx5 (union a power of two), where engines' round() tie rules
    * diverge — floor(x·10⁴+½) pins the rule on identical doubles. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    floor(inter.cast("double") / (size(da) + size(db) - inter) * 10000 + 0.5) / 10000
  }

  /** Character-level polynomial rolling hashes over sliding windows of
    * width `w`: h(i) = (Σ_j code(c_{i+j})·31^(w-1-j)) mod 2³¹-1. The sum
    * is computed WITHOUT per-step modular reduction — with w ≤ 8 it
    * stays well inside int64, so any engine reproduces it exactly
    * (classic Rabin-Karp reduces per step, which is engine-hostile).
    * Returns array<long>, one hash per window; empty for short docs.
    * Note sequence(1, n) counts DOWN when n < 1 — hence the guard. */
  def rollingHashes(text: Column, w: Int = 8): Column = {
    require(w <= 8, s"w=$w risks int64 overflow on high code points")
    val nWin = length(text) - (w - 1)
    val hashes = transform(sequence(lit(1), nWin), i =>
      ((0 until w).map(j => ascii(text.substr(i + lit(j), lit(1))).cast("long") *
        lit(math.pow(31, w - 1 - j).toLong)).reduce(_ + _) % lit(2147483647L)))
    when(nWin >= 1, hashes).otherwise(array().cast("array<bigint>"))
  }

  /** Exploded (doc_id, term) token stream — the one corpus scan every
    * retrieval consumer (doc lengths, corpus stats, document
    * frequencies, term matches) shares; callers cache() it. */
  def tokenStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode_outer(tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")

  /** Document frequency per term over a token stream (vocabulary-sized). */
  def docFreq(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** BM25 top-k document ranking (k1 = 1.2, b = 0.75) of a token stream
    * against a (term, df) query dim. The query dim BROADCASTS (a query
    * has a handful of terms; the corpus never re-shuffles for it) and
    * the per-term scores sum through an explicit SORTED left fold so
    * the result is reproducible by any engine — double addition is not
    * associative. Same log-free rational idf core as q_tfidf.
    *
    * `qterms` rows are deduplicated on `term` here: a duplicate term
    * row would double-count tf through the toks⋈qterms join and emit
    * duplicate per-term scores into the fold. `df` must be functionally
    * determined by `term` (it is a document frequency — one value per
    * term by construction); which duplicate's df survives is otherwise
    * unspecified. */
  def bm25TopK(toks: DataFrame, qterms: DataFrame, k: Int): DataFrame = {
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = toks.agg(count(lit(1)).as("t_total"),
      countDistinct(col("doc_id")).as("n_docs"))
    val tf = toks.join(broadcast(qterms.dropDuplicates("term")), "term")
      .groupBy(col("doc_id"), col("term"), col("df")).agg(count(lit(1)).as("tf"))
    bm25Rank(tf.join(dl, "doc_id"), stats, k)
  }

  /** The single copy of the BM25 scoring math (k1 = 1.2, b = 0.75,
    * log-free rational idf, sorted-fold sum, fixed 1e-4 rounding) over a
    * prepared (doc_id, term, df, tf, dl) frame and a 1-row
    * (t_total, n_docs) stats frame — shared by the token-stream path
    * ([[bm25TopK]]) and the persisted-index serve path
    * ([[TextIndex.topK]]) so the two can never drift. */
  def bm25Rank(tf: DataFrame, stats: DataFrame, k: Int): DataFrame =
    tf.crossJoin(broadcast(stats)) // 1-row scalar
      .withColumn("avgdl", col("t_total").cast("double") / col("n_docs"))
      .withColumn("sc",
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg((floor(expr("aggregate(sort_array(collect_list(sc)), 0D, (a, x) -> a + x)")
        * 10000 + 0.5) / 10000).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)

  /** The user-facing retrieval entry point: BM25 top-k documents for a
    * free-text query string. The query tokenizes with the same rule as
    * the corpus ([[tokens]]), looks its document frequencies up in the
    * corpus index, and rides the plan as a broadcast literal dim —
    * terms the corpus has never seen contribute nothing (their postings
    * are empty) and drop out. One cached token scan feeds all four
    * consumers, exactly the oracled q_text_search plan with the derived
    * top-df query replaced by the user's. */
  def search(docs: DataFrame, idCol: String, textCol: String,
             query: String, k: Int): DataFrame = {
    val toks = tokenStream(docs, idCol, textCol).cache()
    val qtoks = query.split(" ").filter(_.nonEmpty).distinct.toSeq
    val qdf = docs.sparkSession.createDataset(qtoks)(Encoders.STRING).toDF("term")
    bm25TopK(toks, qdf.join(docFreq(toks), "term"), k)
  }

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "les", "des", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Count of profile stopwords present in the token array. */
  def langScore(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))

  /** argmax over profiles with alphabetical tie-break (CASE chain —
    * identical construct on the oracle side). */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    val ordered = scores.sortBy(_._1)
    ordered.init.foldRight(lit(ordered.last._1)) { case ((lang, s), rest) =>
      val others = ordered.filter(_._1 != lang).map(_._2)
      when(others.foldLeft(lit(true))((c, o) => c && s >= o), lang).otherwise(rest)
    }
  }
}
