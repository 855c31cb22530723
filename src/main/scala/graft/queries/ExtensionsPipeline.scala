package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** Pipeline/curation family: sampling and mixture control, sharding,
  * decontamination, privacy releases, data-quality checks, multimodal
  * stages, file-format sources, and the composed curation/RAG funnels.
  *
  * One family file of the [[Extensions]] registry (split round 18 —
  * the single 6k-line file had become the review bottleneck). Blocks
  * are verbatim moves; shared fixtures/oracle helpers live in
  * [[QFixtures]]. Every query keeps its DuckDB oracle and scale note.
  */
private[queries] object ExtensionsPipeline {

  import QFixtures._

  def queries: Seq[GQuery] = Seq(

    // Document CHUNKING — the tokenize-and-window step that turns a
    // curated corpus into training sequences: 32-token chunks on a
    // 24-token stride (8-token overlap so no boundary context is lost),
    // last partial chunk kept. Pure narrow plan: tokens materialize
    // once per doc, chunk starts come from sequence() + explode, the
    // slice/fingerprint runs per chunk — no shuffle at all until the
    // final presentation sort, so at 100 TB this is scan-bound and
    // embarrassingly parallel. Chunk identity is (doc_id, chunk_idx);
    // the md5 fingerprint stands in for the chunk payload so the
    // oracle compares content without hauling full text through the
    // hash comparison.
    GQuery(
      "q_chunk_docs",
      (s, dir) => {
        fanout(Tables.documents(s, dir))
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(24)))
              .as("start"))
          .select(col("doc_id"),
            (col("start") / 24).cast("long").as("chunk_idx"),
            size(slice(col("toks"), col("start") + lit(1), lit(32))).as("n_tokens"),
            md5(array_join(slice(col("toks"), col("start") + lit(1), lit(32)), " ")).as("fp"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |c AS (SELECT doc_id, toks,
          |        unnest(range(0, greatest(len(toks), 1), 24)) AS start
          |      FROM t)
          |SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_idx,
          |  len(list_slice(toks, start + 1, start + 32))::INT AS n_tokens,
          |  md5(array_to_string(list_slice(toks, start + 1, start + 32), ' ')) AS fp
          |FROM c
          |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Deterministic corpus sampling: hash-threshold on a portable
    // content hash — the production way to take a reproducible p% sample
    // (or train/test split) with no RNG state and no coordination; any
    // engine reproduces the same subset. Narrow map, linear.
    GQuery(
      "q_sample_hash",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("bucket", pmod(Text.hash48(col("text")), lit(100)))
          .filter(col("bucket") < 20) // deterministic 20% sample
          .select(col("doc_id"), col("bucket").cast("int").as("bucket"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, bucket::INT AS bucket, lang FROM (
             |  SELECT doc_id, lang,
             |    ('0x' || substr(md5(text), 1, 12))::BIGINT % 100 AS bucket
             |  FROM documents) t
             |WHERE bucket < 20 ORDER BY doc_id""".stripMargin)),

    // WEIGHTED deterministic sampling — the importance-sampling member
    // of the sampling family (q_sample_hash: uniform p%, q_sample_
    // stratified: per-stratum quotas, this: probability ∝ weight):
    // each doc keeps with chance w/w_max using its content hash as the
    // uniform draw — zero RNG state, zero coordination, bit-reproducible
    // on any engine and any retry (the reservoir alternatives A-Res/
    // A-Chao need global or per-partition state and a merge pass; the
    // hash-threshold form is embarrassingly scan-parallel, the property
    // that matters at 100 TB). The comparison u32·w_max < w·2^32 is
    // all-integer (no float probability), with w_max one broadcast
    // 1-row scalar; u32 uses 8 md5 hex chars so the product stays
    // within int64 for any w_max < 2^31.
    GQuery(
      "q_sample_weighted",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val wMax = docs.agg(max(col("n_chars")).as("w_max"))
        docs.crossJoin(broadcast(wMax))
          .withColumn("u32", conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .filter(col("u32") * col("w_max") < col("n_chars") * lit(4294967296L))
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_chars, lang
             |FROM documents CROSS JOIN (SELECT max(n_chars) AS w_max FROM documents) m
             |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT * w_max
             |      < n_chars * 4294967296
             |ORDER BY doc_id""".stripMargin)),

    // Stratified quota sampling: keep at most `cap` docs per
    // (lang, source) stratum, chosen by content-hash rank — the
    // domain/language rebalancing pass every training-data mix runs
    // (oversampled strata get capped, rare strata survive whole).
    // Deterministic: the hash rank is a pure function of the text, so
    // any engine reproduces the same subset. ONE shuffle on the
    // stratum key; per-stratum windows never see more than a stratum.
    GQuery(
      "q_sample_stratified",
      (s, dir) => {
        val cap = 8
        val w = Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("h"), col("doc_id"))
        Tables.documents(s, dir)
          .withColumn("h", Text.hash48(col("text")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= cap)
          .select(col("doc_id"), col("lang"), col("source"), col("rn"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, rn::INT AS rn FROM (
             |  SELECT doc_id, lang, source,
             |    row_number() OVER (PARTITION BY lang, source
             |      ORDER BY ('0x' || substr(md5(text), 1, 12))::BIGINT, doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 8 ORDER BY doc_id""".stripMargin)),

    // Data-MIXTURE rebalancing: downsample every over-represented
    // language to the corpus mean share (keep_frac = min(1, mean/n_lang))
    // — the fraction-based complement to q_sample_stratified's hard
    // per-stratum cap, and the shape any target-mix reweighting takes
    // (swap `mean` for target_share·total). The keep decision is EXACT
    // INTEGER math — pmod(hash48, 1e6)·n_lang·n_langs < total·1e6 — so
    // no float division can diverge between engines, and min(1,·) falls
    // out for free (under-represented langs survive whole because the
    // inequality is then always true). Plan: one tiny lang-count agg +
    // its one-row rollup, both broadcast back onto a NARROW corpus scan
    // — the corpus itself is never shuffled. Deterministic, stateless,
    // coordination-free: exactly how a 100 TB mix is rebalanced.
    GQuery(
      "q_mix_rebalance",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val shares = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
        val tot = shares.agg(sum(col("n_lang")).as("total"),
          count(lit(1)).as("n_langs"))
        docs.join(broadcast(shares), Seq("lang"))
          .crossJoin(broadcast(tot))
          .filter(pmod(Text.hash48(col("text")), lit(1000000L)) * col("n_lang") * col("n_langs")
            < col("total") * lit(1000000L))
          .select(col("doc_id"), col("lang"), col("n_lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH shares AS (
             |  SELECT lang, count(*)::BIGINT AS n_lang FROM documents GROUP BY lang),
             |tot AS (SELECT sum(n_lang)::BIGINT AS total,
             |               count(*)::BIGINT AS n_langs FROM shares)
             |SELECT d.doc_id, d.lang, s.n_lang
             |FROM documents d JOIN shares s ON d.lang = s.lang CROSS JOIN tot
             |WHERE (('0x' || substr(md5(d.text), 1, 12))::BIGINT % 1000000)
             |        * s.n_lang * tot.n_langs < tot.total * 1000000
             |ORDER BY d.doc_id""".stripMargin)),

    // Token-budget shard packing: assign docs (in doc_id order) to
    // contiguous training shards of ~4000 tokens by cumulative offset —
    // the sharding pass that turns a curated corpus into fixed-budget
    // training files. The global running sum is the scale trap: a naive
    // ORDER BY window is one partition holding the corpus. Two-level
    // plan instead (same shape as q_win_percentile's bucketed rank):
    // per-bucket partial sums → ≤nb-row offset table cumulated and
    // broadcast back → per-bucket windows add their offset. No
    // partition ever sees more than corpus/nb rows.
    GQuery(
      "q_pack_shards",
      (s, dir) => {
        val budget = 4000L
        val nb = 32
        // (doc_id, n_tok) materialized once — 16 bytes/doc — so the
        // scalar max, the offset pass and the main pass share ONE
        // corpus scan+tokenize instead of three
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
          .localCheckpoint()
        // bucket = floor(doc_id / k): monotone in doc_id, k sized off a
        // 1-row max scalar so the bucket count stays nb at any sf
        val k = docs.agg((floor(max(col("doc_id")) / nb) + 1).cast("long").as("k"))
        val withB = docs.crossJoin(broadcast(k))
          .withColumn("b", floor(col("doc_id") / col("k")).cast("long"))
        val wOff = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
        val offs = withB.groupBy(col("b")).agg(sum(col("n_tok")).as("bsum"))
          .withColumn("off", coalesce(sum(col("bsum")).over(wOff), lit(0L)))
          .select(col("b"), col("off")) // ≤ nb rows: the only global window
        val wIn = Window.partitionBy(col("b")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        withB.join(broadcast(offs), "b")
          .withColumn("shard",
            floor((coalesce(sum(col("n_tok")).over(wIn), lit(0L)) + col("off")) / budget).cast("long"))
          .select(col("doc_id"), col("n_tok"), col("shard"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents)
             |SELECT doc_id, n_tok,
             |  floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4000)::BIGINT AS shard
             |FROM d ORDER BY doc_id""".stripMargin)),

    // BLOOM decontamination — the production direction: the benchmark/
    // eval split is SMALL, the training corpus is the 100 TB side, so
    // sketch the eval shingles once (kilobytes–MBs, functions/Bloom)
    // and contamination becomes a codegen'd SCAN PREDICATE on the
    // train side — no shuffle join at all; the one exchange is the
    // final distinct. Complements q_decontaminate's exact inverted
    // index (which flags the held-out docs): this flags the TRAIN docs
    // to drop. No false negatives ever (no contaminated doc escapes);
    // at these (items, bits) the deterministic FP count at the gate
    // SFs is zero, so the exact-overlap oracle value-pins the result.
    GQuery(
      "q_decontaminate_bloom",
      (s, dir) => {
        val shingled = fanout(Tables.documents(s, dir))
          .withColumn("toks", Text.tokens(col("text")))
          .withColumn("sh", array_distinct(Text.shingles(col("toks"), 5)))
        // r21: the sketch rides as a SCALAR SUBQUERY (the native
        // InjectRuntimeFilter shape, guide §3.2) instead of a driver
        // collect + 2 MB plan literal — no query-path collect (§5),
        // and the task binary drops from >1 MB (re-broadcast every
        // stage) to plan-sized. Same bits, same zero-FP gate.
        val bf = shingled.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(explode(col("sh")).as("g"))
          .agg(graft.functions.Bloom.agg(col("g"), 1L << 17, 1L << 24).as("bf"))
        shingled.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"), explode_outer(col("sh")).as("g"))
          .filter(col("g").isNotNull &&
            graft.functions.Bloom.mightContain(bf, col("g")))
          .select(col("doc_id")).distinct()
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |posts AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
             |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS g
             |  FROM t WHERE len(toks) >= 5),
             |ev AS (SELECT DISTINCT g FROM posts WHERE doc_id % 10 = 0)
             |SELECT DISTINCT p.doc_id FROM posts p JOIN ev ON p.g = ev.g
             |WHERE p.doc_id % 10 <> 0 ORDER BY doc_id""".stripMargin)),

    // Train/test decontamination: flag held-out docs sharing any 5-gram
    // with the training split — the standard n-gram-overlap contamination
    // check. Inverted-index semi-join: one shuffle on the shingle key,
    // per-shingle work bounded by df (no corpus self-join).
    GQuery(
      "q_decontaminate",
      (s, dir) => {
        // SINGLE corpus scan (the q_dedup_ngram ride-along): the
        // train/test tag rides each posting, postings aggregate per
        // shingle ONCE into a test-id list and a train-id list
        // (collect_list drops the nulls the `when` leaves on the other
        // split), and test×train pairs are emitted from the per-shingle
        // lists — no self-join, so the scan + interpreted shingle
        // expression run once instead of once per join side. Two
        // shuffles total: shingle key, then the per-test-doc distinct
        // aggregation. Per-shingle work is bounded by df, as before.
        fanout(Tables.documents(s, dir))
          .withColumn("toks", Text.tokens(col("text")))
          .withColumn("sh", array_distinct(Text.shingles(col("toks"), 5)))
          .withColumn("is_test", pmod(col("doc_id"), lit(10)) === 0)
          .select(col("doc_id"), col("is_test"), explode_outer(col("sh")).as("g"))
          .filter(col("g").isNotNull)
          .groupBy(col("g"))
          .agg(collect_list(when(col("is_test"), col("doc_id"))).as("test_ids"),
            collect_list(when(!col("is_test"), col("doc_id"))).as("train_ids"))
          .filter(size(col("test_ids")) > 0 && size(col("train_ids")) > 0)
          .select(col("g"), explode(col("test_ids")).as("doc_id"), col("train_ids"))
          .select(col("g"), col("doc_id"), explode(col("train_ids")).as("train_id"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("g")).as("shared_ngrams"),
            countDistinct(col("train_id")).as("contaminating_docs"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH posts AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
             |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
             |  WHERE len(toks) >= 5)
             |SELECT a.doc_id, count(DISTINCT a.g) AS shared_ngrams,
             |       count(DISTINCT b.doc_id) AS contaminating_docs
             |FROM posts a JOIN posts b ON a.g = b.g
             |WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
             |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)),

    // The CURATION pipeline — the four pre-training corpus gates
    // composed in one query: language filter (lang_pred = 'en'),
    // quality gate (the q_quality_score formula ≥ 0.5), exact-dedup
    // canonical-copy selection (doc_id = min over the content-hash
    // group), and test-set decontamination (anti-join against train
    // docs sharing any 5-shingle with a held-out doc). ONE corpus scan
    // builds the narrow per-doc projection (lang/quality/hash/shingle
    // set), explicitly materialized with localCheckpoint so the
    // dedup-window branch and the contamination branch both reuse it
    // instead of re-scanning + re-shingling (three scans otherwise —
    // the q_decontaminate lesson). Three shuffles end-to-end: hash
    // window, shingle aggregation, anti-join.
    GQuery(
      "q_curate",
      (s, dir) => {
        val enStops = Text.langProfiles.toMap.apply("en")
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        val enriched = fanout(Tables.documents(s, dir))
          .withColumn("toks", Text.tokens(col("text")))
          .withColumn("ltoks", Text.tokens(lower(col("text"))))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop", Text.langScore(col("toks"), enStops))
          .withColumn("n_punct", size(expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)")))
          .withColumn("lang_pred", Text.langPredict(
            Text.langProfiles.map { case (l, sws) => l -> Text.langScore(col("ltoks"), sws) }))
          .withColumn("quality", r4(
            least(lit(1.0), col("n_chars").cast("double") / 400) * 0.4
              + (col("n_stop").cast("double") / col("n_tokens")) * 0.4
              + (lit(1.0) - col("n_punct").cast("double") / col("n_chars")) * 0.2))
          .withColumn("h", md5(lower(trim(col("text")))))
          .withColumn("is_test", pmod(col("doc_id"), lit(10)) === 0)
          .withColumn("sh", array_distinct(Text.shingles(col("toks"), 5)))
          .select(col("doc_id"), col("lang_pred"), col("quality"), col("h"),
            col("is_test"), col("sh"))
          .localCheckpoint()
        val contaminated = enriched
          .select(col("doc_id"), col("is_test"), explode_outer(col("sh")).as("g"))
          .filter(col("g").isNotNull)
          .groupBy(col("g"))
          .agg(max(when(col("is_test"), 1).otherwise(0)).as("has_test"),
            collect_set(when(!col("is_test"), col("doc_id"))).as("train_ids"))
          .filter(col("has_test") === 1)
          .select(explode(col("train_ids")).as("doc_id"))
          .distinct()
        enriched
          .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("h"))))
          .filter(!col("is_test") && col("lang_pred") === "en" &&
            col("quality") >= 0.5 && col("doc_id") === col("keep_id"))
          .join(contaminated, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang_pred"), col("quality"))
          .orderBy(col("doc_id"))
      },
      Some {
        val profs = Text.langProfiles.map { case (l, sws) =>
          l -> s"len(list_filter(ltoks, t -> list_contains([${sws.map(w => s"'$w'").mkString(",")}], t)))"
        }
        val ordered = profs.sortBy(_._1)
        val caseChain = ordered.init.map { case (l, sc) =>
          val others = ordered.filter(_._1 != l).map(_._2)
          s"WHEN ${others.map(o => s"$sc >= $o").mkString(" AND ")} THEN '$l'"
        }.mkString(" ")
        s"""WITH t AS (SELECT doc_id, text, n_chars,
           |            string_split(text, ' ') AS toks,
           |            string_split(lower(text), ' ') AS ltoks FROM documents),
           |q AS (SELECT doc_id,
           |        CASE $caseChain ELSE '${ordered.last._1}' END AS lang_pred,
           |        floor((least(1.0, n_chars::DOUBLE / 400) * 0.4
           |          + (len(list_filter(toks, t2 -> list_contains(['the','a','of','and','is'], t2)))::DOUBLE / len(toks)) * 0.4
           |          + (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::DOUBLE / n_chars) * 0.2) * 10000 + 0.5) / 10000 AS quality,
           |        md5(lower(trim(text))) AS h
           |      FROM t),
           |k AS (SELECT doc_id, lang_pred, quality, min(doc_id) OVER (PARTITION BY h) AS keep_id FROM q),
           |posts AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
           |            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS g
           |          FROM t WHERE len(toks) >= 5),
           |contam AS (SELECT DISTINCT b.doc_id FROM posts a JOIN posts b ON a.g = b.g
           |           WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
           |SELECT doc_id, lang_pred, quality FROM k
           |WHERE doc_id % 10 <> 0 AND lang_pred = 'en' AND quality >= 0.5
           |  AND doc_id = keep_id AND doc_id NOT IN (SELECT doc_id FROM contam)
           |ORDER BY doc_id""".stripMargin
      }),

    // K-ANONYMITY release — the data-governance companion to
    // q_redact_pii (content scrub) and q_cdc_purge (erasure): a
    // release of customer rows where every QUASI-IDENTIFIER class
    // (nation × segment × coarse balance band) must contain ≥ k = 5
    // individuals, classes below k released with their QI columns
    // SUPPRESSED to '*' (the suppression-only k-anonymity model —
    // generalization hierarchies are policy, suppression is the
    // mechanism). The `released` flag makes the suppression decision
    // itself part of the checked value. Plan: ONE exchange on the QI
    // key (a count window), masking is row-local codegen — a 100 TB
    // release costs one shuffle; the balance band uses exact
    // cents-integer floor division so the class key is bit-identical
    // on any engine.
    GQuery(
      "q_privacy_kanon",
      (s, dir) => {
        val cents = (col("c_acctbal").cast("decimal(18,4)") * 100).cast("long")
        val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        Tables.customer(s, dir)
          .withColumn("band", floor(cents / lit(100000.0)).cast("long"))
          .withColumn("csize", count(lit(1)).over(w))
          .select(col("c_custkey"),
            when(col("csize") >= 5, col("c_nationkey").cast("string")).otherwise("*").as("nation_qi"),
            when(col("csize") >= 5, col("c_mktsegment")).otherwise("*").as("seg_qi"),
            when(col("csize") >= 5, col("band").cast("string")).otherwise("*").as("band_qi"),
            (col("csize") >= 5).as("released"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH b AS (
             |  SELECT c_custkey, c_nationkey, c_mktsegment,
             |    CAST(floor((c_acctbal::DECIMAL(18,4) * 100)::BIGINT / 100000.0) AS BIGINT) AS band
             |  FROM customer),
             |sz AS (SELECT *, count(*) OVER (PARTITION BY c_nationkey, c_mktsegment, band) AS csize FROM b)
             |SELECT c_custkey,
             |  CASE WHEN csize >= 5 THEN c_nationkey::VARCHAR ELSE '*' END AS nation_qi,
             |  CASE WHEN csize >= 5 THEN c_mktsegment ELSE '*' END AS seg_qi,
             |  CASE WHEN csize >= 5 THEN band::VARCHAR ELSE '*' END AS band_qi,
             |  csize >= 5 AS released
             |FROM sz ORDER BY c_custkey""".stripMargin)),

    // L-DIVERSITY release (k-anonymity's attribute-disclosure
    // extension — Machanavajjhala et al. ICDE'06): a k-anonymous class
    // whose members all share ONE sensitive value still leaks that
    // value for everyone in it, so each released class must also
    // carry ≥ l DISTINCT sensitive values (here: market segment as the
    // sensitive attribute, nation × balance band as the QI; k=5, l=3).
    // Spark has no DISTINCT-in-window, so the diversity count is
    // size(collect_set) over the same ONE QI exchange the class-size
    // count rides — still a single shuffle; the oracle replays with
    // DuckDB's native count(DISTINCT) OVER (the q_win_running_distinct
    // cross-validation pattern). collect_set is bounded by the
    // sensitive domain (segments), not class size — constant-ish
    // per-row state at any scale.
    GQuery(
      "q_privacy_ldiv",
      (s, dir) => {
        val cents = (col("c_acctbal").cast("decimal(18,4)") * 100).cast("long")
        val w = Window.partitionBy(col("c_nationkey"), col("band"))
        val ok = col("csize") >= 5 && col("ldiv") >= 3
        Tables.customer(s, dir)
          .withColumn("band", floor(cents / lit(100000.0)).cast("long"))
          .withColumn("csize", count(lit(1)).over(w))
          .withColumn("ldiv", size(collect_set(col("c_mktsegment")).over(w)))
          .select(col("c_custkey"),
            when(ok, col("c_nationkey").cast("string")).otherwise("*").as("nation_qi"),
            when(ok, col("band").cast("string")).otherwise("*").as("band_qi"),
            col("ldiv").cast("int").as("ldiv"),
            ok.as("released"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH b AS (
             |  SELECT c_custkey, c_nationkey, c_mktsegment,
             |    CAST(floor((c_acctbal::DECIMAL(18,4) * 100)::BIGINT / 100000.0) AS BIGINT) AS band
             |  FROM customer),
             |sz AS (SELECT *,
             |        count(*) OVER (PARTITION BY c_nationkey, band) AS csize,
             |        count(DISTINCT c_mktsegment) OVER (PARTITION BY c_nationkey, band) AS ldiv
             |      FROM b)
             |SELECT c_custkey,
             |  CASE WHEN csize >= 5 AND ldiv >= 3 THEN c_nationkey::VARCHAR ELSE '*' END AS nation_qi,
             |  CASE WHEN csize >= 5 AND ldiv >= 3 THEN band::VARCHAR ELSE '*' END AS band_qi,
             |  ldiv::INT AS ldiv,
             |  (csize >= 5 AND ldiv >= 3) AS released
             |FROM sz ORDER BY c_custkey""".stripMargin)),

    // PII redaction: scrub email/phone/long-digit-run patterns — the
    // standard pre-training scrub pass. Pure codegen'd regexp_replace
    // chain, linear at any scale.
    GQuery(
      "q_redact_pii",
      (s, dir) => {
        val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
        val phoneRe = "[0-9]{3}-[0-9]{4}"
        val digitRe = "[0-9]{6,}"
        Tables.documents(s, dir)
          .withColumn("redacted",
            regexp_replace(regexp_replace(regexp_replace(col("text"),
              emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), digitRe, "<NUM>"))
          .select(col("doc_id"),
            (col("text") =!= col("redacted")).as("had_pii"),
            length(col("redacted")).as("redacted_len"),
            md5(col("redacted")).as("redacted_md5"))
          // r21 (guide §1): materialize the narrow per-doc scalars once
          // — the orderBy's range sampling otherwise runs the triple
          // regex redaction twice (no exchange below the sort)
          .localCheckpoint()
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, text <> redacted AS had_pii,
             |  CAST(length(redacted) AS INT) AS redacted_len, md5(redacted) AS redacted_md5
             |FROM (
             |  SELECT doc_id, text,
             |    regexp_replace(regexp_replace(regexp_replace(text,
             |      '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
             |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
             |      '[0-9]{6,}', '<NUM>', 'g') AS redacted
             |  FROM documents) t ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------- BM25 retrieval
    // Full-text retrieval over the corpus: score every document against
    // a query by BM25 (k1 = 1.2, b = 0.75) and return the top 10 — the
    // search-engine shape (tf-idf ranks a doc's own terms; this ranks
    // DOCS for a query). The query is data-derived deterministically
    // (top-3 corpus terms by document frequency, ties by term) so the
    // THE CURATION FUNNEL AS ONE QUERY — the LLM-data pipeline's
    // stages (quality gate → exact dedup → near-dup dedup → token
    // budget) COMPOSED end-to-end, per language: every stage is an
    // operator the suite already oracles in isolation (q_quality_score,
    // q_dedup_exact, q_dedup_ngram, q_token_count, q_shard_pack), and
    // this query pins that they compose — the near-dup pair predicate
    // is evaluated over the exact-dedup SURVIVORS (a pairwise property,
    // so the full-corpus pair set filters down by membership), the drop
    // rule is the deterministic keep-lowest-id, and the shard count is
    // the packed token budget of what remains. Two corpus passes total
    // (the score pass, cached for its four per-stage aggregates, and
    // the shingle pass the pair pipeline owns); everything downstream
    // is survivor- or language-sized.
    GQuery(
      "q_pipeline_curate",
      (s, dir) => {
        val enStops = Text.langProfiles.toMap.apply("en")
        val toks = Text.tokens(col("text"))
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        val base = Tables.documents(s, dir)
          .withColumn("n_tokens", size(toks))
          .withColumn("n_stop", Text.langScore(toks, enStops))
          .withColumn("n_punct", size(expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)")))
          .withColumn("quality", r4(
            least(lit(1.0), col("n_chars").cast("double") / 400) * 0.4
              + (col("n_stop").cast("double") / col("n_tokens")) * 0.4
              + (lit(1.0) - col("n_punct").cast("double") / col("n_chars")) * 0.2))
          .withColumn("fp", md5(col("text")))
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"), col("fp"))
          .cache()
        val qual = base.filter(col("quality") >= 0.5)
        val exact = qual
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
          .filter(col("rk") === 1).drop("rk")
        val exIds = exact.select(col("doc_id"))
        val survPairs = ngramPairs(s, dir).select(col("id_a"), col("id_b"))
          .join(exIds.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
          .join(exIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
        val fin = exact.join(survPairs.select(col("id_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        val a0 = base.groupBy(col("lang")).agg(count(lit(1)).as("n_in"))
        val a1 = qual.groupBy(col("lang")).agg(count(lit(1)).as("n_quality"))
        val a2 = exact.groupBy(col("lang")).agg(count(lit(1)).as("n_exact"))
        val a3 = fin.groupBy(col("lang")).agg(count(lit(1)).as("n_final"),
          sum(col("n_tokens")).as("tokens_final"))
        a0.join(a1, Seq("lang"), "left").join(a2, Seq("lang"), "left")
          .join(a3, Seq("lang"), "left")
          .select(col("lang"), col("n_in"),
            coalesce(col("n_quality"), lit(0L)).as("n_quality"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            coalesce(col("n_final"), lit(0L)).as("n_final"),
            coalesce(col("tokens_final"), lit(0L)).as("tokens_final"),
            expr("(coalesce(tokens_final, 0L) + 4095) div 4096").as("n_shards"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $ngramPairSql,
             |base AS (
             |  SELECT doc_id, lang, n_tokens,
             |    floor((least(1.0, n_chars::DOUBLE / 400) * 0.4
             |          + (n_stop::DOUBLE / n_tokens) * 0.4
             |          + (1.0 - n_punct::DOUBLE / n_chars) * 0.2) * 10000 + 0.5) / 10000 AS quality,
             |    md5(text) AS fp
             |  FROM (SELECT doc_id, lang, text, n_chars,
             |          len(string_split(text, ' ')) AS n_tokens,
             |          len(list_filter(string_split(text, ' '),
             |                t -> list_contains(['the','a','of','and','is'], t))) AS n_stop,
             |          len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct
             |        FROM documents) z),
             |qual AS (SELECT * FROM base WHERE quality >= 0.5),
             |ex AS (SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
             |    FROM qual) y WHERE rk = 1),
             |sp AS (SELECT id_a, id_b FROM pairs
             |       WHERE id_a IN (SELECT doc_id FROM ex)
             |         AND id_b IN (SELECT doc_id FROM ex)),
             |fin AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT id_b FROM sp)),
             |a0 AS (SELECT lang, count(*) AS n_in FROM base GROUP BY 1),
             |a1 AS (SELECT lang, count(*) AS n_quality FROM qual GROUP BY 1),
             |a2 AS (SELECT lang, count(*) AS n_exact FROM ex GROUP BY 1),
             |a3 AS (SELECT lang, count(*) AS n_final, sum(n_tokens)::BIGINT AS tokens_final
             |       FROM fin GROUP BY 1)
             |SELECT a0.lang, n_in,
             |  coalesce(n_quality, 0)::BIGINT AS n_quality,
             |  coalesce(n_exact, 0)::BIGINT AS n_exact,
             |  coalesce(n_final, 0)::BIGINT AS n_final,
             |  coalesce(tokens_final, 0)::BIGINT AS tokens_final,
             |  ((coalesce(tokens_final, 0) + 4095) // 4096)::BIGINT AS n_shards
             |FROM a0 LEFT JOIN a1 USING (lang) LEFT JOIN a2 USING (lang)
             |  LEFT JOIN a3 USING (lang)
             |ORDER BY a0.lang""".stripMargin)),

    // RAG CONTEXT ASSEMBLY — the serving pipeline's LAST stage,
    // composed end-to-end: the fused hybrid ranking (q_hybrid_rrf's
    // exact pipeline, shared code) packed into a model context under a
    // 256-TOKEN BUDGET — documents enter in fusion-rank order and the
    // cut is the first rank whose cumulative token count would
    // overflow (admission is all-or-nothing per doc, the standard
    // context-window rule; a doc is never truncated here — chunking is
    // q_chunk_docs' job upstream). Everything after retrieval is
    // RANK-LIST-SIZED: the token counts join touches ten docs, the
    // cumulative window sees ten rows — assembling a 100 TB corpus's
    // context costs exactly the retrieval it rode in on.
    GQuery(
      "q_pipeline_rag",
      (s, dir) => {
        val fused = rrfFusedTop10(s, dir)
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        val wR = Window.orderBy(col("rrf").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fused.join(tok, "doc_id")
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
          .withColumn("cum_tok", sum(col("n_tok")).over(wR))
          .filter(col("cum_tok") <= 256)
          .select(col("rk"), col("doc_id"), col("n_tok"), col("cum_tok"))
          .orderBy(col("rk"))
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
             |       FROM tf t JOIN dl d USING (doc_id) CROSS JOIN stats),
             |bm AS (SELECT doc_id,
             |         floor(list_reduce(list_sort(list(sc)), (a, x) -> a + x) * 10000 + 0.5) / 10000 AS bm25
             |       FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
             |tr AS (SELECT doc_id, (row_number() OVER (ORDER BY bm25 DESC, doc_id))::INT AS r_t FROM bm),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
             |vs AS (SELECT vec_id, list_cosine_similarity(v.e, q.qe) AS c
             |       FROM v CROSS JOIN q ORDER BY c DESC, vec_id LIMIT 50),
             |vr AS (SELECT vec_id AS doc_id, (row_number() OVER (ORDER BY c DESC, vec_id))::INT AS r_v FROM vs),
             |fused AS (SELECT doc_id,
             |    floor((coalesce(1::DOUBLE / (r_t + 60), 0) + coalesce(1::DOUBLE / (r_v + 60), 0))
             |          * 1000000 + 0.5) / 1000000 AS rrf
             |  FROM tr FULL OUTER JOIN vr USING (doc_id)
             |  ORDER BY rrf DESC, doc_id LIMIT 10),
             |ntok AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
             |packed AS (SELECT f.doc_id, n_tok,
             |    (row_number() OVER (ORDER BY rrf DESC, f.doc_id))::INT AS rk,
             |    (sum(n_tok) OVER (ORDER BY rrf DESC, f.doc_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tok
             |  FROM fused f JOIN ntok USING (doc_id))
             |SELECT rk, doc_id, n_tok, cum_tok FROM packed
             |WHERE cum_tok <= 256 ORDER BY rk""".stripMargin)),

    // ------------------------------------------- multi-format sources
    // JSON-lines source round-trip: documents written as JSON once per
    // (sf) fixture, read back through the DECLARED-schema reader
    // (sources/FileFormats — no inference pass), gated against the
    // parquet truth by round-trip identity. md5(text) carries byte
    // fidelity through the gate without shipping the text itself.
    GQuery(
      "q_source_json",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_srcjson_cache_v1_$sfKey") { root =>
          graft.sources.FileFormats.writeJson(Tables.documents(s, dir), root + "/docs_json")
        }
        graft.sources.FileFormats.readJson(s, root + "/docs_json")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            md5(col("text")).as("text_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // CSV source round-trip: same contract through the quoted/escaped
    // CSV path (quoteAll + escape-doubling — commas and quotes in
    // document text survive; nulls write as the unquoted \N sentinel so
    // '' and NULL round-trip distinctly; newline-bearing text is
    // REJECTED at write time, see FileFormats).
    GQuery(
      "q_source_csv",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        // v3: v2 caches predate the \N null sentinel
        val root = cachedFixture(s"graft_srccsv_cache_v3_$sfKey") { root =>
          graft.sources.FileFormats.writeCsv(Tables.documents(s, dir), root + "/docs_csv")
        }
        graft.sources.FileFormats.readCsv(s, root + "/docs_csv")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            md5(col("text")).as("text_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ORC source round-trip: the typed columnar alternate (splittable,
    // predicate-pushdown) — text round-trips with no quoting caveats;
    // same declared-schema contract and parquet-truth oracle.
    GQuery(
      "q_source_orc",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_srcorc_cache_v1_$sfKey") { root =>
          graft.sources.FileFormats.writeOrc(Tables.documents(s, dir), root + "/docs_orc")
        }
        graft.sources.FileFormats.readOrc(s, root + "/docs_orc")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            md5(col("text")).as("text_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------- multimodal
    // Opaque binary payload + typed metadata struct riding beside the
    // text — the training-data-lake column shape. Content is a
    // deterministic 16-byte stand-in (md5 of the text); the magic column
    // proves the binary roundtrip (bytes → hex) byte-for-byte.
    GQuery(
      "q_multimodal",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("content", unhex(md5(col("text"))))
          .withColumn("meta", struct(
            lit("image").as("kind"),
            (pmod(col("n_chars") * 31 + length(col("text")), lit(1024)) + 64).cast("int").as("width"),
            (pmod(col("n_chars") * 17 + 7, lit(1024)) + 64).cast("int").as("height"),
            lit(16000).as("sample_rate")))
          .select(col("doc_id"),
            col("meta.kind").as("kind"), col("meta.width").as("width"),
            col("meta.height").as("height"), col("meta.sample_rate").as("sample_rate"),
            length(col("content")).as("content_bytes"),
            substring(lower(hex(col("content"))), 1, 8).as("magic"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'image' AS kind,
             |  ((n_chars * 31 + length(text)) % 1024 + 64)::INT AS width,
             |  ((n_chars * 17 + 7) % 1024 + 64)::INT AS height,
             |  16000 AS sample_rate,
             |  16 AS content_bytes,
             |  substr(md5(text), 1, 8) AS magic
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // The multimodal DECODE stage through the VALUE gate: the real
    // production plumbing (opaque binary payload → partition-preserving
    // mapPartitions decode → typed feature column; graft.ops.Multimodal
    // scaladoc carries the mapInPandas analogy) run end to end. The
    // decoder body is the documented deterministic stub (no codecs in
    // this container), chosen so the oracle can replay it EXACTLY: the
    // 16 payload bytes are md5(text), each feature is a 4-byte window
    // mean, and sum-of-4-bytes / 4 is a power-of-two division — exact
    // in float on any engine. What the gate pins is the pipeline shape:
    // bytes in, Array[Float] out, row identity preserved through the
    // typed mapPartitions (encoder round-trip), no driver involvement.
    GQuery(
      "q_multimodal_decode",
      (s, dir) => {
        val df = graft.ops.Multimodal.attach(
          Tables.documents(s, dir).select(col("doc_id"), col("text")))
        graft.ops.Multimodal.decodeFeatures(df)
          .select(col("doc_id") +: (0 until 4).map(d =>
            element_at(col("features"), d + 1).as(s"f$d")): _*)
          .orderBy(col("doc_id"))
      },
      Some {
        val feats = (0 until 4).map { d =>
          val terms = (0 until 4)
            .map(b => s"('0x' || substr(md5(text), ${(d * 4 + b) * 2 + 1}, 2))::INT")
            .mkString(" + ")
          s"(($terms) / 4.0)::FLOAT AS f$d"
        }.mkString(",\n             |  ")
        s"""SELECT doc_id,
           |  $feats
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Spark 4 SQL UDF (CREATE FUNCTION ... RETURN expr) — the
    // user-extension surface that PRESERVES codegen: unlike a JVM/
    // Python UDF, a SQL UDF's body is INLINED into the plan by the
    // analyzer, so the call site optimizes, pushes down, and
    // whole-stage-compiles exactly like the hand-written expression
    // (the engine's no-UDFs rule, made available to end users). The
    // token-density body is all-integer (`div`), so the oracle replays
    // the inlined expression bit-exactly.
    GQuery(
      "q_sql_udf",
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("docs_sql_udf")
        s.sql(
          """CREATE OR REPLACE TEMPORARY FUNCTION graft_density(text STRING)
            |RETURNS BIGINT RETURN (size(split(text, ' ')) * 100L) div length(text)""".stripMargin)
        s.sql(
          """SELECT doc_id, lang, graft_density(text) AS density
            |FROM docs_sql_udf ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id, lang,
             |  (len(string_split(text, ' ')) * 100) // length(text) AS density
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling through the value gate (the video/audio chunking
    // stage): the opaque payload explodes into fixed-size indexed
    // frames as pure codegen'd expressions — at 100 TB this is a
    // narrow per-row generate, no shuffle before the presentation
    // sort. The md5-derived payload makes every frame's bytes
    // hex-replayable in the oracle.
    GQuery(
      "q_multimodal_frames",
      (s, dir) => {
        val df = graft.ops.Multimodal.attach(
          Tables.documents(s, dir).select(col("doc_id"), col("text")))
        graft.ops.Multimodal.frameSample(df, frameBytes = 4)
          // frame_idx is LONG (SQL `div` widens); the oracle column is INT
          .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
            lower(hex(col("frame"))).as("frame_hex"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, i::INT AS frame_idx,
             |  substr(md5(text), i * 8 + 1, 8) AS frame_hex
             |FROM documents CROSS JOIN range(0, 4) r(i)
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // PER-FRAME ENERGY through the value gate — the fourth multimodal
    // pipeline stage (decode → resize → frame-sample → now a per-frame
    // REDUCE): each 4-byte frame folds to the sum of its byte values,
    // the audio-energy / brightness-mean shape every media pipeline
    // runs after chunking. All-integer, pure codegen'd expressions
    // (hex-pair parse + 4 unrolled adds — no UDF, no shuffle before
    // the presentation sort); the md5-derived payload makes every
    // frame's bytes — and therefore the fold — exactly replayable in
    // the oracle.
    GQuery(
      "q_multimodal_energy",
      (s, dir) => {
        val df = graft.ops.Multimodal.attach(
          Tables.documents(s, dir).select(col("doc_id"), col("text")))
        val hexCol = lower(hex(col("frame")))
        val energy = (0 until 4).map(k =>
          conv(substring(hexCol, k * 2 + 1, 2), 16, 10).cast("int")).reduce(_ + _)
        graft.ops.Multimodal.frameSample(df, frameBytes = 4)
          .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
            energy.as("energy"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, i::INT AS frame_idx,
             |  (('0x' || substr(md5(text), i * 8 + 1, 2))::INT
             |   + ('0x' || substr(md5(text), i * 8 + 3, 2))::INT
             |   + ('0x' || substr(md5(text), i * 8 + 5, 2))::INT
             |   + ('0x' || substr(md5(text), i * 8 + 7, 2))::INT) AS energy
             |FROM documents CROSS JOIN range(0, 4) r(i)
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // RESIZE through the value gate — the third multimodal pipeline
    // stage next to decode and frame-sample: metadata struct rewritten
    // in place to the target dimensions, payload column replaced by the
    // deterministic stand-in resample (truncate toward the implied
    // size; a real decoder would resample pixels — Multimodal.resizeStub
    // scaladoc). 256×128 implies an 8-byte payload, so the oracle is
    // the md5 prefix. Narrow map, no shuffle, stays in codegen.
    GQuery(
      "q_multimodal_resize",
      (s, dir) => {
        val df = graft.ops.Multimodal.attach(
          Tables.documents(s, dir).select(col("doc_id"), col("text")))
        graft.ops.Multimodal.resizeStub(df, 256, 128)
          .select(col("doc_id"), col("meta.kind").as("kind"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            lower(hex(col("content"))).as("content_hex"),
            expr("octet_length(content)").as("n_bytes"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'image' AS kind, 256 AS width, 128 AS height,
             |  substr(md5(text), 1, 16) AS content_hex, 8 AS n_bytes
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // DATA-QUALITY CONSTRAINT VALIDATION — the Deequ/dbt-test companion
    // to q_profile_stats (profiling describes; constraints JUDGE): a
    // declared suite of table checks evaluated in one pass each,
    // emitting (constraint, violations, ok). The plan discipline:
    // same-table ROW-LOCAL predicates FUSE into one conditional
    // aggregate over one column-pruned scan (three lineitem rules =
    // one pass — fusing is free because conditional counts are plain
    // aggs), while rules needing different data shapes get their own
    // minimal pass (key uniqueness = one single-distinct agg;
    // referential integrity = one anti-join whose build side is the
    // pruned key column). Two rules FAIL by design (quantity ≤ 40,
    // acctbal ≥ 0) so the verdict path is exercised, not just the
    // happy path. At 100 TB each pass is a narrow scan-agg and the FK
    // anti-join shuffles only the two key columns; nothing is
    // per-constraint rescanned when rules share a shape.
    GQuery(
      "q_quality_constraints",
      (s, dir) => {
        def row(name: String, viol: org.apache.spark.sql.Column) =
          struct(lit(name).as("constraint"), viol.cast("long").as("violations"))
        val liRules = Tables.lineitem(s, dir).agg(explode(array(
          row("lineitem_quantity_in_1_50",
            count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))),
          row("lineitem_quantity_le_40", count(when(col("l_quantity") > 40, 1))),
          row("lineitem_returnflag_domain",
            count(when(!col("l_returnflag").isin("A", "N", "R"), 1))))).as("r"))
        val ordRules = Tables.orders(s, dir).agg(explode(array(
          row("orders_pk_unique", count(lit(1)) - countDistinct(col("o_orderkey"))),
          row("orders_custkey_not_null", count(lit(1)) - count(col("o_custkey"))))).as("r"))
        val custRules = Tables.customer(s, dir).agg(explode(array(
          row("customer_acctbal_nonneg", count(when(col("c_acctbal") < 0, 1))))).as("r"))
        val fk = Tables.lineitem(s, dir).select(col("l_orderkey"))
          .join(Tables.orders(s, dir).select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(row("lineitem_orders_fk", count(lit(1))).as("r"))
        liRules.unionByName(ordRules).unionByName(custRules).unionByName(fk)
          .select(col("r.constraint").as("constraint"),
            col("r.violations").as("violations"),
            (col("r.violations") === 0).as("ok"))
          .orderBy(col("constraint"))
      },
      Some("""SELECT "constraint", violations, violations = 0 AS ok FROM (
             |  SELECT 'lineitem_quantity_in_1_50' AS "constraint",
             |    count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS violations
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem_quantity_le_40',
             |    count(CASE WHEN l_quantity > 40 THEN 1 END) FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem_returnflag_domain',
             |    count(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END) FROM lineitem
             |  UNION ALL
             |  SELECT 'orders_pk_unique', count(*) - count(DISTINCT o_orderkey) FROM orders
             |  UNION ALL
             |  SELECT 'orders_custkey_not_null', count(*) - count(o_custkey) FROM orders
             |  UNION ALL
             |  SELECT 'customer_acctbal_nonneg',
             |    count(CASE WHEN c_acctbal < 0 THEN 1 END) FROM customer
             |  UNION ALL
             |  SELECT 'lineitem_orders_fk', count(*) FROM lineitem l
             |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
             |) t ORDER BY "constraint" """.stripMargin)),

    // Robust corpus-QC outlier detection: per-language median + MAD
    // (median absolute deviation) of document length, flagging docs
    // with |len − median| > 2·MAD — the quality-control pass that
    // catches truncated/concatenated documents where mean±σ would be
    // dragged by the very outliers it hunts. Medians of INTEGER lengths
    // are ints or exact .5 halves (binary-exact), so the 2·MAD
    // threshold comparison is deterministic across engines — no ε, no
    // rounding. Plan: two tiny per-lang stat aggregates (the second
    // needs the first's median) broadcast back onto ONE cached narrow
    // projection of the corpus — the corpus is never shuffled, the
    // q_mix_rebalance discipline.
    GQuery(
      "q_quality_outliers",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars")).cache()
        val med = d.groupBy(col("lang"))
          .agg(expr("percentile(n_chars, 0.5)").as("med"))
        val withDev = d.join(broadcast(med), Seq("lang"))
          .withColumn("dev", abs(col("n_chars") - col("med")))
        val mad = withDev.groupBy(col("lang"))
          .agg(expr("percentile(dev, 0.5)").as("mad"))
        withDev.join(broadcast(mad), Seq("lang"))
          .filter(col("dev") > lit(2) * col("mad"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            col("med"), col("mad"), col("dev"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH med AS (
             |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
             |  FROM documents GROUP BY lang),
             |dev AS (
             |  SELECT d.doc_id, d.lang, d.n_chars, m.med,
             |    abs(d.n_chars - m.med) AS dev
             |  FROM documents d JOIN med m ON d.lang = m.lang),
             |mad AS (
             |  SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY lang)
             |SELECT v.doc_id, v.lang, v.n_chars, v.med, a.mad, v.dev
             |FROM dev v JOIN mad a ON v.lang = a.lang
             |WHERE v.dev > 2 * a.mad
             |ORDER BY v.doc_id""".stripMargin))
  )
}
