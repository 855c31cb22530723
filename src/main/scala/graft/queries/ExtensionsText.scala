package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** Text-analysis family: stats, language-ID, quality, fingerprints, BM25
  * search (ad-hoc + served), TF-IDF, collocations/keywords, BPE tokenizer.
  *
  * One family file of the [[Extensions]] registry (split round 18 —
  * the single 6k-line file had become the review bottleneck). Blocks
  * are verbatim moves; shared fixtures/oracle helpers live in
  * [[QFixtures]]. Every query keeps its DuckDB oracle and scale note.
  */
private[queries] object ExtensionsText {

  import QFixtures._

  def queries: Seq[GQuery] = Seq(

    // ------------------------------------------------------ text analysis
    GQuery(
      "q_text_stats",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(Text.tokens(col("text"))))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            round(sum(col("n_tokens").cast("long")).cast("double") / count(lit(1)), 4).as("avg_tokens"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
             |  round(sum(len(string_split(text, ' ')))::DOUBLE / count(*), 4) AS avg_tokens,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |  round(sum(n_chars)::DOUBLE / count(*), 4) AS avg_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Language-ID: stopword-profile scores + deterministic argmax
    // (alphabetical tie-break) — the CASE chain is identical on both
    // engines. Narrow map, linear.
    GQuery(
      "q_lang_id",
      (s, dir) => {
        val withToks = Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(lower(col("text"))))
        val scores = Text.langProfiles.map { case (l, sws) =>
          l -> Text.langScore(col("toks"), sws)
        }
        withToks
          .select(col("doc_id"), col("lang").as("lang_actual"),
            Text.langPredict(scores).as("lang_pred"))
          .withColumn("is_match", col("lang_pred") === col("lang_actual"))
          // r21 (guide §1): materialize the narrow per-doc scalars once
          // — the global orderBy's range sampling otherwise re-runs the
          // whole scan+score pipeline (no exchange below the sort to
          // reuse), doubling the query
          .localCheckpoint()
          .orderBy(col("doc_id"))
      },
      Some {
        val profs = Text.langProfiles.map { case (l, sws) =>
          l -> s"len(list_filter(string_split(lower(text), ' '), t -> list_contains([${sws.map(w => s"'$w'").mkString(",")}], t)))"
        }
        val ordered = profs.sortBy(_._1)
        val caseChain = ordered.init.map { case (l, sc) =>
          val others = ordered.filter(_._1 != l).map(_._2)
          s"WHEN ${others.map(o => s"$sc >= $o").mkString(" AND ")} THEN '$l'"
        }.mkString(" ")
        s"""SELECT doc_id, lang AS lang_actual,
           |  CASE $caseChain ELSE '${ordered.last._1}' END AS lang_pred,
           |  (CASE $caseChain ELSE '${ordered.last._1}' END) = lang AS is_match
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single non-alnum marks).
    GQuery(
      "q_token_count",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("n_ws"),
            size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).as("n_bpe"),
            col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' '))::INT AS n_ws,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::INT AS n_bpe,
             |  n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length saturation + stopword density − punctuation
    // noise, the standard cheap pre-filter for training corpora.
    GQuery(
      "q_quality_score",
      (s, dir) => {
        val enStops = Text.langProfiles.toMap.apply("en")
        val toks = Text.tokens(col("text"))
        // r4: explicit HALF_UP (floor(x·10⁴+½)/10⁴) — the score is a sum
        // of small rationals that can land EXACTLY on a .xxxx5 boundary,
        // where Spark's round() goes up but DuckDB's goes to even. The
        // underlying doubles are bitwise-identical across engines (same
        // inputs, same op order), so pinning the tie rule pins the hash.
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(toks))
          .withColumn("n_stop", Text.langScore(toks, enStops))
          .withColumn("n_punct", size(expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)")))
          .select(col("doc_id"),
            r4(col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"),
            r4(col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
            r4(
              least(lit(1.0), col("n_chars").cast("double") / 400) * 0.4
                + (col("n_stop").cast("double") / col("n_tokens")) * 0.4
                + (lit(1.0) - col("n_punct").cast("double") / col("n_chars")) * 0.2
              ).as("quality"))
          // r21: same materialize-once-before-sort as q_lang_id
          .localCheckpoint()
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  floor((n_punct::DOUBLE / n_chars) * 10000 + 0.5) / 10000 AS punct_ratio,
             |  floor((n_stop::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 AS stop_ratio,
             |  floor((least(1.0, n_chars::DOUBLE / 400) * 0.4
             |        + (n_stop::DOUBLE / n_tokens) * 0.4
             |        + (1.0 - n_punct::DOUBLE / n_chars) * 0.2) * 10000 + 0.5) / 10000 AS quality
             |FROM (SELECT doc_id, n_chars,
             |        len(string_split(text, ' ')) AS n_tokens,
             |        len(list_filter(string_split(text, ' '),
             |              t -> list_contains(['the','a','of','and','is'], t))) AS n_stop,
             |        len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct
             |      FROM documents) t ORDER BY doc_id""".stripMargin)),

    // Document fingerprinting: min-of-md5 over 3-gram shingles (a
    // winnowing-style content fingerprint, portable across engines).
    GQuery(
      "q_fingerprint",
      (s, dir) => {
        val sh = Text.shingles(Text.tokens(col("text")), 3)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            coalesce(array_min(transform(sh, x => md5(x))), md5(col("text"))).as("fp"),
            size(sh).as("n_shingles"))
          // r21: same materialize-once-before-sort as q_lang_id
          .localCheckpoint()
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  coalesce(list_aggregate(list_transform(sh, x -> md5(x)), 'min'), md5(text)) AS fp,
             |  len(sh)::INT AS n_shingles
             |FROM (SELECT doc_id, text,
             |        CASE WHEN len(toks) >= 3
             |          THEN list_transform(range(1, len(toks) - 1),
             |                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             |          ELSE [] END AS sh
             |      FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents) x) y
             |ORDER BY doc_id""".stripMargin)),

    // Exact heavy hitters: top-10 terms per language — the vocabulary
    // profile pass (stopword discovery, boilerplate detection) every
    // corpus audit runs. Two-level shape: the (lang, term) hash agg
    // does map-side partial counting so the shuffle carries vocabulary
    // rows, not corpus tokens; the per-lang top-k window then sees only
    // each language's vocabulary. No sketch needed — exactness costs
    // one agg.
    GQuery(
      "q_heavy_hitters",
      (s, dir) => {
        val counts = fanout(Tables.documents(s, dir))
          .select(col("lang"), explode_outer(Text.tokens(col("text"))).as("term"))
          .filter(col("term").isNotNull && col("term") =!= "")
          .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
        counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
          .select(col("lang"), col("rk"), col("term"), col("n"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""SELECT lang, rk::INT AS rk, term, n FROM (
             |  SELECT lang, term, n,
             |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rk
             |  FROM (
             |    SELECT lang, term, count(*)::BIGINT AS n FROM (
             |      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents) z
             |    WHERE term <> '' GROUP BY 1, 2) c) r
             |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin)),

    // TF-IDF top terms per document over the corpus inverted index.
    // The idf core is the pure-rational BM25 form
    // (N - df + 0.5)/(df + 0.5) — rank-equivalent to the log variant
    // per term and exactly reproducible cross-engine (log() is libm-
    // dependent at the last ulp; a hash-compared oracle can't ride it).
    // Three shuffles: (doc,term) tf agg, term df agg + key join back,
    // per-doc top-3 window. df rides the term key — no broadcast of a
    // vocabulary-sized side at scale.
    GQuery(
      "q_tfidf",
      (s, dir) => {
        val docs = fanout(Tables.documents(s, dir))
        // the inverted index is materialized ONCE (localCheckpoint) —
        // without it the whole tokenize+agg subtree runs twice, feeding
        // the df aggregate and the join separately (two corpus scans)
        val terms = docs
          .select(col("doc_id"), explode_outer(Text.tokens(col("text"))).as("term"))
          .filter(col("term").isNotNull && col("term") =!= "")
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val dfs = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        terms.join(dfs, "term")
          .crossJoin(broadcast(nDocs)) // 1-row scalar
          .withColumn("score",
            floor(col("tf") * (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) * 10000 + 0.5) / 10000)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("score"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH terms AS (
             |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) z
             |  WHERE term <> '' GROUP BY 1, 2),
             |dfs AS (SELECT term, count(*)::BIGINT AS df FROM terms GROUP BY 1),
             |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
             |scored AS (
             |  SELECT t.doc_id, t.term,
             |    floor(t.tf * (n.n_docs - d.df + 0.5) / (d.df + 0.5) * 10000 + 0.5) / 10000 AS score
             |  FROM terms t JOIN dfs d USING (term) CROSS JOIN n)
             |SELECT doc_id, rk::INT AS rk, term, score FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
             |  FROM scored) z
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // Within-document repetition (the Gopher-family duplicate-n-gram
    // filter): fraction of a doc's 3-grams that are repeats of an
    // earlier 3-gram in the SAME doc — boilerplate and template spam
    // score high and get cut before training. Pure per-row expression
    // work (shingle + distinct + ratio), linear at any scale; the
    // HALF_UP rounding pins engine round-rule ties like q_quality_score.
    GQuery(
      "q_repetition",
      (s, dir) => {
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(col("text")))
          .filter(size(col("toks")) >= 3)
          .withColumn("sh", Text.shingles(col("toks"), 3))
          .select(col("doc_id"), size(col("sh")).as("n_grams"),
            r4(lit(1.0) - size(array_distinct(col("sh"))).cast("double") / size(col("sh")))
              .as("rep_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, len(sh)::INT AS n_grams,
             |  floor((1.0 - len(list_distinct(sh))::DOUBLE / len(sh)) * 10000 + 0.5) / 10000 AS rep_ratio
             |FROM (SELECT doc_id, list_transform(range(1, len(toks) - 1),
             |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
             |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
             |      WHERE len(toks) >= 3) s
             |ORDER BY doc_id""".stripMargin)),

    // COLLOCATION mining (Dice-coefficient bigram association — the
    // log-free sibling of PMI, per the house rational-arithmetic rule):
    // which word PAIRS co-occur far beyond their parts' base rates —
    // the phrase/token-merge candidate generator (BPE merges, MWE
    // lexicons, q_text_phrase's shingle space) as a corpus statistic.
    // dice = 2·c(ab)/(c(a)+c(b)), scaled ×10000 into exact integer
    // floor division both engines reproduce bit-for-bit. Plan: the
    // token array materializes once (cache) and feeds BOTH the unigram
    // and the positional-bigram counts; bigram generation is a pure
    // codegen'd transform-with-index (no self-join, no explode×join —
    // adjacency comes free from the array); two vocabulary-keyed hash
    // joins attach the unigram counts; min-support c(ab) ≥ 5 prunes
    // BEFORE the joins so they are survivor-sized.
    GQuery(
      "q_text_collocations",
      (s, dir) => {
        val toks = fanout(Tables.documents(s, dir))
          .select(split(col("text"), " ").as("t")).cache()
        val uni = toks.select(explode(col("t")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val big = toks
          .select(explode(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS lt, t[i + 1] AS rt))")).as("bg"))
          .select(col("bg.lt").as("lt"), col("bg.rt").as("rt"))
          .groupBy(col("lt"), col("rt")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
        big
          .join(uni.select(col("tok").as("lt"), col("c").as("ca")), "lt")
          .join(uni.select(col("tok").as("rt"), col("c").as("cb")), "rt")
          .select(concat_ws(" ", col("lt"), col("rt")).as("bigram"), col("c_ab"),
            expr("(2 * c_ab * 10000) div (ca + cb)").as("dice_bp"))
          .orderBy(col("dice_bp").desc, col("bigram")).limit(20)
      },
      Some("""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
             |uni AS (SELECT u AS tok, count(*) AS c FROM (
             |          SELECT unnest(t) AS u FROM toks) z GROUP BY 1),
             |big AS (SELECT l AS lt, r AS rt, count(*) AS c_ab FROM (
             |          SELECT t[i] AS l, t[i + 1] AS r FROM (
             |            SELECT t, unnest(range(1, len(t))) AS i FROM toks) z) w
             |        GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT lt || ' ' || rt AS bigram, c_ab::BIGINT AS c_ab,
             |  ((2 * c_ab * 10000) // (a.c + b.c))::BIGINT AS dice_bp
             |FROM big JOIN uni a ON a.tok = lt JOIN uni b ON b.tok = rt
             |ORDER BY dice_bp DESC, bigram LIMIT 20""".stripMargin)),

    // Rolling-hash fingerprint: min of character-level polynomial
    // rolling hashes (winnowing-lite). Narrow map; the per-window sums
    // avoid per-step modular reduction so both engines compute the
    // identical int64 values (Text.rollingHashes).
    GQuery(
      "q_fingerprint_rolling",
      (s, dir) => {
        // r21 (guide §1/§2.3): the global orderBy's range sampling
        // evaluates its whole input, so the rolling-hash projection
        // ran TWICE (sample pass + real pass — the two ~0.65 s jobs in
        // the profile). The narrow per-doc result (3 scalars) is now
        // materialized ONCE with localCheckpoint before the sort: one
        // hash evaluation, and the sampler reads 12 MB of scalars from
        // the block manager instead of re-hashing the corpus. The
        // compute stays on fanout's spread partitions — sorting FIRST
        // was tried and rejected: the post-sort shuffle is small, AQE
        // coalesces it, and the hash compute collapses onto one core
        // (13.5 s measured — the §2.5 synthetic-partitioning trap).
        fanout(Tables.documents(s, dir))
          .withColumn("h", Text.rollingHashes(col("text"), 8))
          .select(col("doc_id"), array_min(col("h")).as("min_hash"),
            size(col("h")).as("n_windows"))
          .localCheckpoint()
          .orderBy(col("doc_id"))
      },
      Some {
        val terms = (0 until 8).map(j =>
          s"ascii(substr(text, i+$j, 1))::BIGINT * ${math.pow(31, 7 - j).toLong}").mkString(" + ")
        s"""SELECT doc_id, list_aggregate(h, 'min') AS min_hash, len(h)::INT AS n_windows
           |FROM (SELECT doc_id, CASE WHEN length(text) >= 8 THEN
           |        list_transform(range(1, length(text) - 6), i -> ($terms) % 2147483647)
           |      ELSE [] END AS h
           |      FROM documents) t ORDER BY doc_id""".stripMargin
      }),

    // TEXTRANK keyword extraction (Mihalcea & Tarau EMNLP'04): PageRank
    // over the token CO-OCCURRENCE graph — the unsupervised
    // keyword/keyphrase pass (the graph-centrality complement to
    // tf-idf's frequency contrast and q_text_collocations' pairwise
    // association). Nodes are tokens THEMSELVES (ops/Graph.pagerank
    // joins on the endpoint values — no id-assignment pass needed),
    // edges are distinct adjacent pairs with min co-occurrence 3
    // (hapax-edge pruning), and the rank iteration is the suite's
    // integer-exact fixed-point formulation — the same 1e9-grid
    // floor arithmetic q_graph_pagerank oracles, so five rounds are
    // bit-identical on any engine/partitioning. Scale: the graph is
    // VOCABULARY-sized (edges ≤ distinct bigrams), so after the one
    // corpus bigram pass every iteration touches vocab rows only.
    GQuery(
      "q_text_keywords",
      (s, dir) => {
        val toks = fanout(Tables.documents(s, dir)).select(split(col("text"), " ").as("t"))
        val bp = toks.select(explode(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS a, t[i + 1] AS b))")).as("bg"))
          .select(col("bg.a").as("a"), col("bg.b").as("b"))
          .filter(col("a") =!= col("b") && col("a") =!= "" && col("b") =!= "")
        val pairs = bp
          .select(least(col("a"), col("b")).as("id_a"), greatest(col("a"), col("b")).as("id_b"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 3)
          .select(col("id_a"), col("id_b"))
        graft.ops.Graph.pagerank(pairs, rounds = 5)
          .select(col("doc_id").as("token"), col("rank"))
          .orderBy(col("rank").desc, col("token")).limit(20)
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""c$i AS (SELECT e.dst, sum((r.rank * 17) // (20 * d.deg))::BIGINT AS in_c
             |       FROM edges e JOIN r${i - 1} r ON e.src = r.token
             |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
             |r$i AS (SELECT d.src AS token,
             |         ((150000000 // nn.n) + coalesce(c$i.in_c, 0))::BIGINT AS rank
             |       FROM deg d CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = d.src)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
           |bp AS (SELECT l AS a, r AS b FROM (
           |         SELECT t[i] AS l, t[i + 1] AS r FROM (
           |           SELECT t, unnest(range(1, len(t))) AS i FROM toks) z) w
           |       WHERE l <> r AND l <> '' AND r <> ''),
           |pairs AS (SELECT least(a, b) AS id_a, greatest(a, b) AS id_b
           |          FROM bp GROUP BY 1, 2 HAVING count(*) >= 3),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS token, (1000000000 // nn.n)::BIGINT AS rank
           |       FROM deg CROSS JOIN nn),
           |$iters
           |SELECT token, rank FROM r5 ORDER BY rank DESC, token LIMIT 20""".stripMargin
      }),

    // EXACT PHRASE SEARCH — the retrieval mode BM25's bag-of-words
    // scoring can't express (term adjacency): a document matches a
    // k-word phrase iff the phrase appears among its k-gram shingles,
    // so phrase stats reduce to the SAME codegen'd shingle machinery
    // the dedup family runs — no positional index needed while phrase
    // length is known at plan time. Both lengths' shingles come from
    // ONE corpus pass (2- and 3-grams concatenated per doc before the
    // generate); explode_outer + filter keeps the generator predicate
    // OUT of the scan (the ngramPairCounts pushdown-recompute lesson);
    // the phrase-set filter drops everything but matching n-grams
    // BEFORE the one tiny phrase-key shuffle. n_occ counts occurrences
    // (non-distinct shingles), n_docs distinct documents.
    GQuery(
      "q_text_phrase",
      (s, dir) => {
        val phrases = Seq("table hash", "part filter", "data batch scan")
        fanout(Tables.documents(s, dir))
          .withColumn("toks", Text.tokens(col("text")))
          .withColumn("sh", concat(Text.shingles(col("toks"), 2),
            Text.shingles(col("toks"), 3)))
          .select(col("doc_id"), explode_outer(col("sh")).as("p"))
          .filter(col("p").isin(phrases: _*))
          .groupBy(col("p").as("phrase"))
          .agg(count(lit(1)).as("n_occ"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("phrase"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |g AS (SELECT doc_id, unnest(list_concat(
             |    list_transform(range(1, len(toks)),
             |      i -> concat_ws(' ', toks[i], toks[i+1])),
             |    list_transform(range(1, len(toks) - 1),
             |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS p
             |  FROM t)
             |SELECT p AS phrase, count(*) AS n_occ,
             |  count(DISTINCT doc_id) AS n_docs
             |FROM g WHERE p IN ('table hash', 'part filter', 'data batch scan')
             |GROUP BY p ORDER BY phrase""".stripMargin)),

    // oracle can reproduce it. The idf core is the same log-free
    // rational as q_tfidf; the per-term scores are summed through an
    // explicit SORTED left fold (sort_array → aggregate /list_sort →
    // list_reduce) so both engines add the ≤3 doubles in the same
    // order — double addition is not associative and a bare SUM() would
    // tie the hash gate to aggregation order. One token scan cache()'d
    // for its four consumers; the query-term dim broadcasts.
    GQuery(
      "q_text_search",
      (s, dir) => {
        // Text.search is the user-query twin of this plan (same cached
        // token scan, same broadcast query dim; OpsSpec pins equality
        // when the user query equals the derived terms)
        val toks = Text.tokenStream(fanout(Tables.documents(s, dir)),
          "doc_id", "text").cache()
        val dft = Text.docFreq(toks)
        val qterms = dft.orderBy(col("df").desc, col("term")).limit(3)
        Text.bm25TopK(toks, qterms, 10)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, t AS term FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
             |  WHERE t IS NOT NULL AND t <> ''),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
             |stats AS (SELECT count(*) AS t_total, count(DISTINCT doc_id) AS n_docs FROM toks),
             |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
             |qterms AS (SELECT term, df FROM dft ORDER BY df DESC, term LIMIT 3),
             |tf AS (SELECT doc_id, term, df, count(*) AS tf FROM toks
             |       JOIN qterms USING (term) GROUP BY doc_id, term, df),
             |sc AS (SELECT t.doc_id,
             |         (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)
             |           * (tf * 2.2::DOUBLE)
             |           / (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl
             |              / (t_total::DOUBLE / n_docs))) AS sc
             |       FROM tf t JOIN dl d USING (doc_id) CROSS JOIN stats)
             |SELECT doc_id,
             |  floor(list_reduce(list_sort(list(sc)), (a, x) -> a + x) * 10000 + 0.5) / 10000 AS bm25
             |FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

    // SERVED text search through the oracle gate: the same BM25 answer
    // as q_text_search, produced from the PERSISTED inverted index
    // (ops/TextIndex — term-bucketed postings with dl denormalized in,
    // per-segment 1-row stats, delta protocol) instead of a corpus
    // re-scan. The fixture builds the base over half the corpus and
    // appends the other half as a delta, so the serve path exercises
    // the base+delta union; the oracle replays the FULL-corpus BM25
    // with the fixed query terms — served-from-index must equal
    // computed-from-scratch, the whole point of the index. Per-query
    // work ∝ the three terms' postings (partition-pruned reads), never
    // corpus size.
    GQuery(
      "q_text_search_served",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_tix_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
          graft.ops.TextIndex.build(s, root + "/idx",
            docs.filter(pmod(col("doc_id"), lit(2)) === 0))
          graft.ops.TextIndex.append(s, root + "/idx",
            docs.filter(pmod(col("doc_id"), lit(2)) === 1), 0L)
          ()
        }
        graft.ops.TextIndex.topK(s, root + "/idx", "data batch scan", 10)
      },
      Some(textSearchServedSql)),

    // --------------------------------------------- LM quality scoring
    // Unigram language-model quality score — the CCNet-family LM
    // filter stage (docs bucketed head/middle/tail by LM perplexity
    // before training). Log-free rational form for cross-engine
    // exactness (the q_tfidf rule: log() differs by ulps between
    // engines, ratios of exact integers do not): mean token corpus-
    // probability in ppm (commonness — template/boilerplate scores
    // high, gibberish low) + hapax ratio (fraction of tokens occurring
    // exactly once corpus-wide — the OOV/rare proxy; both preserve the
    // perplexity RANKING the bucketing needs). The exploded token
    // stream is cache()'d once (lazy — the localCheckpoint lesson from
    // q_agg_hll_merge) and feeds all three consumers: corpus counts,
    // the corpus total, and the per-doc join. Vocabulary-sized count
    // shuffle + one term-key join + one doc_id aggregation — linear in
    // corpus tokens, no self-joins.
    GQuery(
      "q_lm_score",
      (s, dir) => {
        val toks = fanout(Tables.documents(s, dir))
          .select(col("doc_id"), explode_outer(Text.tokens(col("text"))).as("term"))
          .filter(col("term").isNotNull && col("term") =!= "")
          .cache()
        val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("ctf"))
        val total = toks.agg(count(lit(1)).as("t_total"))
        toks.join(counts, "term")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"),
            sum(col("ctf")).cast("long").as("sum_ctf"),
            sum(when(col("ctf") === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"))
          .crossJoin(broadcast(total)) // 1-row scalar
          .select(col("doc_id"), col("n_toks"),
            (floor(col("sum_ctf").cast("double") / col("n_toks") / col("t_total")
              * 1000000.0 * 10000 + 0.5) / 10000).as("mean_ptok_ppm"),
            (floor(col("n_hapax").cast("double") / col("n_toks") * 10000 + 0.5) / 10000)
              .as("hapax_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, t AS term FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
             |  WHERE t IS NOT NULL AND t <> ''),
             |counts AS (SELECT term, count(*) AS ctf FROM toks GROUP BY term),
             |total AS (SELECT count(*) AS t_total FROM toks)
             |SELECT doc_id, count(*) AS n_toks,
             |  floor(sum(ctf)::DOUBLE / count(*) / t_total
             |    * 1000000.0 * 10000 + 0.5) / 10000 AS mean_ptok_ppm,
             |  floor(sum(CASE WHEN ctf = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
             |    * 10000 + 0.5) / 10000 AS hapax_ratio
             |FROM toks JOIN counts USING (term), total
             |GROUP BY doc_id, t_total ORDER BY doc_id""".stripMargin)),

    // -------------------------------------------- mergeable sketches II
    // Count-min sketch heavy-hitter estimation — the mergeable
    // FREQUENCY sketch beside q_agg_hll_merge's cardinality sketch.
    // Per-language sketches (d=4 hash rows × w=512 buckets of exact
    // integer counts, md5-derived row hashes so any engine replays
    // them) are UNIONED by plain cell addition into the corpus sketch —
    // the persisted-sketch rollup: per-group sketches answer the global
    // question without re-scanning raw tokens. Estimates (min over the
    // 4 rows) are probed for the exact top-10 terms; `overcount` is the
    // one-sided CMS error (est ≥ exact ALWAYS — QueriesSpec gates it).
    // Scale: the sketch shuffle carries ≤ langs·4·512 cells after
    // map-side partial agg, never corpus tokens; the probe side is 10
    // rows × 4 hashes joined against the 2048-cell union — both
    // broadcast-sized at any corpus size. The token scan is cache()'d
    // for its two consumers (sketch build + exact twin), same
    // discipline as q_text_search.
    GQuery(
      "q_heavy_hitters_cms",
      (s, dir) => {
        val toks = fanout(Tables.documents(s, dir))
          .select(col("lang"), explode(Text.tokens(col("text"))).as("term"))
          .filter(col("term") =!= "")
          .cache()
        // same bucket rule as the persisted store (ops/CmsSketch) so the
        // one-query and streaming (stream_cms_e2e) forms share semantics
        def bucket(r: org.apache.spark.sql.Column, term: org.apache.spark.sql.Column) =
          graft.ops.CmsSketch.bucket(r, term, 512)
        val cells = toks
          .select(col("lang"), col("term"), explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("b", bucket(col("r"), col("term")))
          .groupBy(col("lang"), col("r"), col("b")).agg(count(lit(1)).as("n"))
        // sketch UNION: per-language sketches merge by cell addition
        val merged = cells.groupBy(col("r"), col("b")).agg(sum(col("n")).as("cell"))
        val top10 = toks.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("term")).limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n_exact").desc, col("term"))))
        val probes = top10
          .select(col("rk"), col("term"), col("n_exact"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("b", bucket(col("r"), col("term")))
        probes.join(merged, Seq("r", "b"))
          .groupBy(col("rk"), col("term"), col("n_exact"))
          .agg(min(col("cell")).as("est"))
          .select(col("rk"), col("term"), col("n_exact"), col("est"),
            (col("est") - col("n_exact")).as("overcount"))
          .orderBy(col("rk"))
      },
      Some("""WITH t AS (
             |  SELECT lang, term FROM (
             |    SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents) z
             |  WHERE term <> ''),
             |cells AS (
             |  SELECT lang, r,
             |    ('0x' || substr(md5(r::VARCHAR || ':' || term), 1, 12))::BIGINT % 512 AS b,
             |    count(*)::BIGINT AS n
             |  FROM t CROSS JOIN range(0, 4) rr(r) GROUP BY 1, 2, 3),
             |merged AS (SELECT r, b, sum(n)::BIGINT AS cell FROM cells GROUP BY 1, 2),
             |top10 AS (
             |  SELECT term, n_exact, rk FROM (
             |    SELECT term, count(*)::BIGINT AS n_exact,
             |      row_number() OVER (ORDER BY count(*) DESC, term) AS rk
             |    FROM t GROUP BY term) z WHERE rk <= 10),
             |probes AS (
             |  SELECT rk, term, n_exact, r,
             |    ('0x' || substr(md5(r::VARCHAR || ':' || term), 1, 12))::BIGINT % 512 AS b
             |  FROM top10 CROSS JOIN range(0, 4) rr(r))
             |SELECT rk::INT AS rk, term, n_exact, min(cell)::BIGINT AS est,
             |  (min(cell) - n_exact)::BIGINT AS overcount
             |FROM probes JOIN merged USING (r, b)
             |GROUP BY rk, term, n_exact ORDER BY rk""".stripMargin)),

    // ------------------------------------------------- tokenizer training
    // BPE vocabulary learning over the corpus (graft.ops.Bpe — scaladoc
    // there carries the full scale argument): ONE corpus pass builds the
    // word-frequency vocabulary, then each of 3 merge iterations is
    // vocabulary-sized (pair-count agg + 1-row argmax + one word-window
    // merge pass). Output: the 3 learned merges in order (each depends
    // on all previous — 3 rows pin the whole training trajectory) + the
    // top-5 surviving symbols of the final vocabulary by weighted count.
    // All integer counts + character ops with lexicographic tie-breaks,
    // so the oracle replays training exactly (3 unrolled iterations).
    GQuery(
      "q_bpe_train",
      (s, dir) => {
        val (vocab, merges) = Bpe.train(Tables.documents(s, dir), col("text"), iters = 3)
        import s.implicits._
        val mergeRows = merges
          .map(m => (m.step, "merge", m.a, Option(m.b), m.n))
          .toDF("step", "kind", "sym_a", "sym_b", "cnt")
        val top = vocab
          .select(col("cnt"), explode(col("syms")).as("sym"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("sym")).limit(5)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n").desc, col("sym"))))
          .select((col("rk") + 3).cast("int").as("step"), lit("top").as("kind"),
            col("sym").as("sym_a"), lit(null).cast("string").as("sym_b"),
            col("n").as("cnt"))
        mergeRows.unionByName(top).orderBy(col("step"))
      },
      Some {
        s"""WITH ${bpeTrainCtes}
           |SELECT step, kind, sym_a, sym_b, cnt FROM (
           |  SELECT 1::INT AS step, 'merge' AS kind, a AS sym_a, b AS sym_b, n AS cnt FROM m1
           |  UNION ALL SELECT 2::INT, 'merge', a, b, n FROM m2
           |  UNION ALL SELECT 3::INT, 'merge', a, b, n FROM m3
           |  UNION ALL
           |  SELECT (3 + rk)::INT, 'top', sym, NULL::VARCHAR, n FROM (
           |    SELECT sym, n, row_number() OVER (ORDER BY n DESC, sym) AS rk FROM (
           |      SELECT sym, sum(cnt)::BIGINT AS n FROM (
           |        SELECT cnt, unnest(syms) AS sym FROM v3) u GROUP BY sym) g) t
           |  WHERE rk <= 5) f
           |ORDER BY step""".stripMargin
      })
,

    // The ENCODE half of the tokenizer: the trained vocabulary IS the
    // segmentation table — every corpus word maps to its final symbol
    // split, so encoding is one corpus token pass joined against the
    // vocabulary on `word` (broadcast when the vocab fits, word-key
    // co-partition past the threshold) + a per-doc aggregate. Per doc:
    // word count, character mass, and BPE token count — the compression
    // the 3 learned merges actually buy (n_chars ≥ n_tokens ≥ n_words,
    // QueriesSpec-gated). This is the budget pass every training-data
    // pipeline runs before shard packing (q_pack_shards consumes
    // exactly this kind of token count).
    GQuery(
      "q_bpe_encode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (vocab, _) = Bpe.train(docs, col("text"), iters = 3)
        val words = docs
          .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
          .filter(col("word") =!= "")
        words
          .join(vocab.select(col("word"), size(col("syms")).cast("long").as("n_sub"),
            length(col("word")).cast("long").as("n_chr")), Seq("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_chr")).as("n_chars"),
            sum(col("n_sub")).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH ${bpeTrainCtes},
           |words AS (
           |  SELECT doc_id, word FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) z
           |  WHERE word <> '')
           |SELECT w.doc_id, count(*)::BIGINT AS n_words,
           |  sum(length(w.word))::BIGINT AS n_chars,
           |  sum(len(v.syms))::BIGINT AS n_tokens
           |FROM words w JOIN v3 v ON w.word = v.word
           |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin
      })
  )
}
