package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** Deduplication + duplicate-graph family: exact through embedding near-dup,
  * connected components, and the graph analytics that ride the dup graph.
  *
  * One family file of the [[Extensions]] registry (split round 18 —
  * the single 6k-line file had become the review bottleneck). Blocks
  * are verbatim moves; shared fixtures/oracle helpers live in
  * [[QFixtures]]. Every query keeps its DuckDB oracle and scale note.
  */
private[queries] object ExtensionsDedup {

  import QFixtures._

  def queries: Seq[GQuery] = Seq(

    // ----------------------------------------------------- dedup family
    // Exact dedup: group by content hash, keep the smallest doc_id.
    // Narrow map + one hash-shuffle groupBy — embarrassingly scalable.
    GQuery(
      "q_dedup_exact",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("h", md5(lower(trim(col("text")))))
          .groupBy(col("h"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"), col("h"))
          .orderBy(col("keep_id"))
      },
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
             |  md5(lower(trim(text))) AS h
             |FROM documents GROUP BY 3 ORDER BY keep_id""".stripMargin)),

    // SOFT dedup: keep every copy but weight it 1/n_copies — the
    // alternative curation policy to dropping (train on everything,
    // down-weight repeats so the corpus-level gradient matches the
    // deduped one). Same narrow hash + ONE shuffle on the content-hash
    // key as q_dedup_exact; the count comes back as a window over that
    // key so no second join is needed.
    GQuery(
      "q_dedup_weight",
      (s, dir) => {
        val w = Window.partitionBy(col("h"))
        Tables.documents(s, dir)
          .withColumn("h", md5(lower(trim(col("text")))))
          .withColumn("n_copies", count(lit(1)).over(w))
          .select(col("doc_id"), col("n_copies"),
            round(lit(1.0) / col("n_copies"), 4).as("weight"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_copies,
             |  round(1.0::DOUBLE / n_copies, 4) AS weight FROM (
             |  SELECT doc_id,
             |    count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS n_copies
             |  FROM documents) t ORDER BY doc_id""".stripMargin)),

    // MinHash + LSH near-dup detection: 2-gram shingles → 6-component
    // md5-min signature → 3 bands of 2 → candidate pairs share a band →
    // verify exact Jaccard ≥ 0.5. Scale: the band join is ONE shuffle on
    // the band key; pairwise work only within a band bucket
    // (P(band match) = 1-(1-J^2)^3, so true near-dups are almost never
    // missed while random pairs almost never collide).
    GQuery(
      "q_dedup_minhash",
      (s, dir) => {
        // Perf discipline for the (interpreted, CodegenFallback)
        // higher-order expressions: filter on CHEAP codegen'd exprs only
        // (token count — pushed to the scan), materialize sig in its own
        // projection (CollapseProject keeps multi-referenced non-cheap
        // exprs un-inlined), and generate in-bucket pairs via
        // groupBy+collect instead of a self-join. The shingle set RIDES
        // THE BAND STREAM through the groupBy (the q_dedup_ngram
        // ride-along trick) so the corpus is scanned ONCE and the
        // shingle arrays are computed once — not re-scanned and
        // re-shingled twice more for the verify joins. A pair sharing
        // k bands costs k cheap array-intersects but no extra scan;
        // the dedup shuffles only the small (id_a, id_b, jac) tuple.
        // band semantics live in LshIndex.bands — ONE definition shared
        // with the persisted incremental index (q_dedup_incremental)
        val banded = LshIndex.bands(fanout(Tables.documents(s, dir)))
        banded.groupBy(col("band"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("sh")))).as("ids"))
          .filter(size(col("ids")) > 1)
          .select(explode(expr(
            """flatten(transform(ids, (x, i) ->
              |  transform(slice(ids, i + 2, size(ids)),
              |            y -> struct(x.doc_id AS id_a, x.sh AS sha, y.doc_id AS id_b, y.sh AS shb))))"""
              .stripMargin)).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
            Text.jaccard(col("p.sha"), col("p.shb")).as("jac"))
          .filter(col("jac") >= 0.5)
          .distinct()
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)),
             |         i -> concat_ws(' ', toks[i], toks[i+1]))) AS sh
             |       FROM t WHERE len(toks) >= 2),
             |md AS (SELECT doc_id, sh, list_transform(sh, x -> md5(x)) AS md5s FROM sh),
             |sig AS (SELECT doc_id, sh,
             |  [list_aggregate(list_transform(md5s, m -> substr(m, 1, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 6, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 11, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 16, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 21, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 26, 5)), 'min')] AS sig
             |  FROM md),
             |bands AS (SELECT doc_id, unnest([
             |    'b0|' || sig[1] || '|' || sig[2],
             |    'b1|' || sig[3] || '|' || sig[4],
             |    'b2|' || sig[5] || '|' || sig[6]]) AS band FROM sig),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
             |jj AS (SELECT id_a, id_b,
             |  floor(len(list_intersect(x.sh, y.sh))::DOUBLE /
             |        (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) * 10000 + 0.5) / 10000 AS jac
             |  FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
             |SELECT id_a, id_b, jac FROM jj WHERE jac >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // INCREMENTAL near-dup against a PERSISTED index — the daily-ingest
    // form of the minhash pipeline: the corpus (doc_id % 5 != 0) is
    // indexed once into a band-bucket-partitioned layout (cached
    // fixture, same protocol as morTable); the query dedups the
    // incoming batch (doc_id % 5 == 0) by probing ONLY the band buckets
    // its signatures hash into. What verify oracles and bench time is
    // the per-batch serve cost — batch bands + touched-bucket bytes —
    // exactly what a 100 TB corpus charges per landed batch; the
    // full-corpus scan is a once-ever build. The oracle replays the
    // identical bands + exact-Jaccard verify restricted to
    // corpus-side × batch-side pairs.
    GQuery(
      "q_dedup_incremental",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val docs = Tables.documents(s, dir)
        val idxDir = cachedFixture(s"graft_lsh_cache_v1_$sfKey") { root =>
          LshIndex.build(s, root + "/idx",
            fanout(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)), nBuckets = 16)
        } + "/idx"
        val batch = fanout(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
        LshIndex.matches(s, idxDir, batch)
          .orderBy(col("corpus_id"), col("new_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)),
             |         i -> concat_ws(' ', toks[i], toks[i+1]))) AS sh
             |       FROM t WHERE len(toks) >= 2),
             |md AS (SELECT doc_id, sh, list_transform(sh, x -> md5(x)) AS md5s FROM sh),
             |sig AS (SELECT doc_id, sh,
             |  [list_aggregate(list_transform(md5s, m -> substr(m, 1, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 6, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 11, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 16, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 21, 5)), 'min'),
             |   list_aggregate(list_transform(md5s, m -> substr(m, 26, 5)), 'min')] AS sig
             |  FROM md),
             |bands AS (SELECT doc_id, unnest([
             |    'b0|' || sig[1] || '|' || sig[2],
             |    'b1|' || sig[3] || '|' || sig[4],
             |    'b2|' || sig[5] || '|' || sig[6]]) AS band FROM sig),
             |cand AS (SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS new_id
             |         FROM bands a JOIN bands b ON a.band = b.band
             |         WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0),
             |jj AS (SELECT corpus_id, new_id,
             |  floor(len(list_intersect(x.sh, y.sh))::DOUBLE /
             |        (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) * 10000 + 0.5) / 10000 AS jac
             |  FROM cand JOIN sh x ON x.doc_id = corpus_id JOIN sh y ON y.doc_id = new_id)
             |SELECT corpus_id, new_id, jac FROM jj WHERE jac >= 0.5
             |ORDER BY corpus_id, new_id""".stripMargin)),

    // SimHash fingerprint per doc (portable 16-bit random-projection
    // hash) + how many docs share it. Pure narrow map + one groupBy-size
    // join — linear at any scale.
    GQuery(
      "q_dedup_simhash",
      (s, dir) => {
        // md5 per token materialized ONCE (own projection), then 16 cheap
        // nibble-filters over the array; bucket sizes via a window, not a
        // groupBy+self-join — computes the fingerprint once per doc.
        val w = Window.partitionBy(col("simhash"))
        fanout(Tables.documents(s, dir))
          .withColumn("md5s", transform(Text.tokens(col("text")), t => md5(t)))
          .select(col("doc_id"), Text.simhash16FromMd5s(col("md5s")).as("simhash"))
          .withColumn("n_same", count(lit(1)).over(w))
          .orderBy(col("doc_id"))
      },
      Some(("""WITH f AS (SELECT doc_id, (""" +
        (0 until 16).map { i =>
          s"""CASE WHEN list_sum(list_transform(string_split(text, ' '),
             | t -> CASE WHEN substr(md5(t), ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) > 0
             | THEN ${1 << i} ELSE 0 END""".stripMargin.replace("\n", " ")
        }.mkString(" + ") +
        """)::INT AS simhash FROM documents)
          |SELECT doc_id, simhash, count(*) OVER (PARTITION BY simhash) AS n_same
          |FROM f ORDER BY doc_id""".stripMargin))),

    // Exact n-gram Jaccard near-dup pairs via the inverted-shingle-index
    // join: explode distinct 5-shingles, join postings on the shingle,
    // count shared per pair, Jaccard from exact set sizes. This IS the
    // scalable exact algorithm — one shuffle on the shingle key, work
    // ∝ Σ df(shingle)², no all-pairs expansion and no array intersects
    // (measured df: max 4 docs per 5-shingle at sf0.1). Pair pipeline
    // shared with q_dedup_cluster via `ngramPairs`.
    GQuery(
      "q_dedup_ngram",
      (s, dir) => ngramPairs(s, dir).orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $ngramPairSql
             |SELECT id_a, id_b, jac FROM pairs ORDER BY id_a, id_b""".stripMargin)),

    // CONTAINMENT near-dup pairs off the same inverted-index counts:
    // inter / min(|A|, |B|) — the asymmetric measure that catches a
    // short doc embedded inside a long one, which Jaccard structurally
    // misses (inter/union shrinks as the long side grows; containment
    // doesn't). Same two shuffles as q_dedup_ngram, threshold 0.8.
    GQuery(
      "q_dedup_containment",
      (s, dir) => ngramPairCounts(s, dir)
        .withColumn("cont",
          floor(col("inter").cast("double") / least(col("na"), col("nb")) * 10000 + 0.5) / 10000)
        .filter(col("cont") >= 0.8)
        .select(col("id_a"), col("id_b"), col("cont"))
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $ngramPairSql
             |SELECT id_a, id_b, cont FROM (
             |  SELECT id_a, id_b,
             |    floor(inter::DOUBLE / least(na, nb) * 10000 + 0.5) / 10000 AS cont
             |  FROM paircounts) z
             |WHERE cont >= 0.8 ORDER BY id_a, id_b""".stripMargin)),

    // FUZZY (edit-distance) near-dup pairs — the blocked record-linkage
    // shape: block on a compound deterministic key, verify candidates
    // with Levenshtein over a 120-char prefix. The O(m·n) distance only
    // ever runs INSIDE a block, so total work is Σ block² · 120², not
    // corpus². Two skew defenses make the quadratic term safe at corpus
    // scale (a bare first-3-tokens key goes quadratic on one boilerplate
    // prefix — millions of "terms of service for …" docs in one block):
    //   1. SECOND BLOCKING COMPONENT: a token-count band (width 16)
    //      joins the prefix in the key, splitting same-boilerplate-
    //      different-body docs across bands. Each doc probes its OWN
    //      band and the one above (sorted-neighborhood style), so two
    //      docs within one band-width of each other ALWAYS meet in a
    //      block: banding can only drop pairs whose token counts differ
    //      by more than 16 — a guarantee, not a boundary accident.
    //      Duplicate candidates from meeting in both bands collapse in
    //      one distinct before the Levenshtein verify.
    //   2. PER-BLOCK CAP with a deterministic survivor rule: rank by
    //      doc_id inside each block, keep the first 64. A block larger
    //      than the cap is boilerplate by construction; overflow docs
    //      produce no pairs. Caps pair count at 64²/2 per block no
    //      matter how hot the key gets (spec-proven on a 1000-doc
    //      identical-prefix corpus). The rank window is one sort of the
    //      block's MEMBERS (linear), never its pairs (quadratic).
    // One shuffle on the block key; prefix bound caps the verify cost
    // per pair regardless of document length.
    GQuery(
      "q_dedup_fuzzy",
      (s, dir) => {
        val t = fanout(Tables.documents(s, dir))
          .select(col("doc_id"), substring(col("text"), 1, 120).as("p"),
            array_join(slice(split(col("text"), " "), 1, 3), " ").as("pre"),
            floor(size(split(col("text"), " ")) / 16).cast("long").as("band"))
        val probed = t.select(col("doc_id"), col("p"),
          explode(array(
            concat_ws("|", col("pre"), col("band").cast("string")),
            concat_ws("|", col("pre"), (col("band") + 1).cast("string")))).as("blk"))
        val capped = probed
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("blk")).orderBy(col("doc_id"))))
          .filter(col("rn") <= 64).drop("rn")
        val a = capped.select(col("blk"), col("doc_id").as("id_a"), col("p").as("pa"))
        val b = capped.select(col("blk"), col("doc_id").as("id_b"), col("p").as("pb"))
        a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("pa"), col("pb"))
          .distinct() // a pair can meet in both its shared bands
          .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
          .filter(col("dist") <= 20)
          .select(col("id_a"), col("id_b"), col("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(
        """WITH t AS (SELECT doc_id, substr(text, 1, 120) AS p,
          |             array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS pre,
          |             len(string_split(text, ' ')) // 16 AS band
          |           FROM documents),
          |x AS (SELECT doc_id, p, unnest([pre || '|' || CAST(band AS VARCHAR),
          |                                pre || '|' || CAST(band + 1 AS VARCHAR)]) AS blk
          |      FROM t),
          |c AS (SELECT doc_id, p, blk FROM (
          |        SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn FROM x) z
          |      WHERE rn <= 64),
          |pr AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb
          |       FROM c a JOIN c b ON a.blk = b.blk AND a.doc_id < b.doc_id)
          |SELECT id_a, id_b, levenshtein(pa, pb) AS dist FROM pr
          |WHERE levenshtein(pa, pb) <= 20
          |ORDER BY id_a, id_b""".stripMargin)),

    // TRIANGLE enumeration over the near-dup graph — the classic graph
    // analytic (clustering-coefficient numerator; here: triples of
    // mutually-near-duplicate docs, the strongest dedup signal). The
    // compact-forward shape: edges arrive ALREADY oriented id_a < id_b
    // from ngramPairs, so the two-hop join + closing-edge check
    // enumerates each triangle exactly once and join fan-out is bounded
    // by oriented out-degree (≤ cluster size, never raw degree). The
    // tiny pair set is localCheckpoint'd once for its three join roles
    // instead of re-running the shingle pipeline per alias.
    GQuery(
      "q_graph_triangles",
      (s, dir) => {
        val p = ngramPairs(s, dir).select(col("id_a"), col("id_b")).localCheckpoint()
        val e1 = p.select(col("id_a").as("a"), col("id_b").as("b"))
        val e2 = p.select(col("id_a").as("b2"), col("id_b").as("c"))
        val e3 = p.select(col("id_a").as("a3"), col("id_b").as("c3"))
        e1.join(e2, col("b") === col("b2"))
          .join(e3, col("a") === col("a3") && col("c") === col("c3"))
          .select(col("a").as("id_a"), col("b").as("id_b"), col("c").as("id_c"))
          .orderBy(col("id_a"), col("id_b"), col("id_c"))
      },
      Some(s"""WITH $ngramPairSql
             |SELECT e1.id_a AS id_a, e1.id_b AS id_b, e2.id_b AS id_c
             |FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b
             |JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
             |ORDER BY e1.id_a, e1.id_b, e2.id_b""".stripMargin)),

    // Duplicate CLUSTERING: the stage a real dedup pipeline runs after
    // pair generation — connected components over the near-dup pair
    // graph, cluster id = min doc_id in the component (the canonical
    // document every member dedups to; singletons are their own
    // cluster). Algorithm + scale notes in ops/Components (min-label
    // propagation, lineage-truncated rounds, sum-fixpoint convergence;
    // property-tested against a union-find reference in OpsSpec).
    GQuery(
      "q_dedup_cluster",
      (s, dir) => {
        graft.ops.Components.connectedComponents(
            Tables.documents(s, dir).select(col("doc_id")),
            ngramPairs(s, dir).select(col("id_a"), col("id_b")))
          .select(col("id").as("doc_id"), col("lab").as("cluster_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $ngramPairSql,
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
             |reach AS (SELECT doc_id AS id, doc_id AS lab FROM documents
             |          UNION
             |          SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id)
             |SELECT id AS doc_id, min(lab) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // BFS SHORTEST-HOP LAYERS over the co-purchase graph (parts sharing
    // an order) — the graph family's traversal member next to PageRank
    // (influence), triangles (density) and connected components
    // (equivalence): min-hop distance from a deterministic source (the
    // smallest partkey) out to 3 hops. The scale shape is FRONTIER
    // iteration: each level is frontier ⋈ edges (shuffle bounded by
    // frontier × degree), dedup'd, then anti-joined against the visited
    // set so a node is expanded exactly once — work is O(edges touched),
    // never O(paths) (the recursive-CTE oracle DOES enumerate paths and
    // collapses them with min(d): fine at oracle scale, quadratic
    // suicide at 100 TB — the whole reason the engine side is
    // frontier-based). Lineage truncated per level (localCheckpoint,
    // the q_dedup_cluster discipline). Edges are built once and reused
    // across all levels — as ONE orderkey shuffle (groupBy ok +
    // collect_set, then the per-order pair set exploded from the
    // array: k² work per order with k bounded by order size) rather
    // than the orderkey self-join, which shuffles the fact TWICE for
    // the same k² expansion — measured 1.7-2x faster at sf0.1
    // (3.3 s -> 1.7 s, scripts/bfs_probe2.scala) and strictly fewer
    // fact-sized exchanges at 100 TB.
    GQuery(
      "q_graph_bfs",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val edges = li.groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
          .select(explode(expr(
            "flatten(transform(ps, x -> transform(filter(ps, y -> y != x), " +
              "y -> struct(x AS src, y AS dst))))")).as("p"))
          .select(col("p.src").as("src"), col("p.dst").as("dst"))
          .distinct().localCheckpoint()
        // one checkpoint per LEVEL, never of the growing visited set:
        // each level is already materialized, so visited is a cheap
        // union of checkpointed frontiers with depth-1 lineage — ~half
        // the stage barriers vs re-checkpointing the union every round
        // (measured solo at sf0.1: 5.96 s → 5.01 s)
        var levels = List(li.agg(min(col("pk")).as("pk"))
          .withColumn("depth", lit(0)).localCheckpoint())
        for (d <- 1 to 3) {
          val frontier = levels.head.select(col("pk"))
          val visitedKeys = levels.map(_.select(col("pk"))).reduce(_.union(_))
          val next = frontier.join(edges, frontier("pk") === edges("src"))
            .select(col("dst").as("pk")).distinct()
            .join(visitedKeys, Seq("pk"), "left_anti")
            .withColumn("depth", lit(d)).localCheckpoint()
          levels ::= next
        }
        levels.reduce(_.unionByName(_)).groupBy(col("depth"))
          .agg(count(lit(1)).as("n"), min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"))
          .orderBy(col("depth"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
             |walk(pk, d) AS (
             |  SELECT min(l_partkey), 0 FROM lineitem
             |  UNION ALL
             |  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.pk WHERE w.d < 3),
             |md AS (SELECT pk, min(d)::INT AS depth FROM walk GROUP BY pk)
             |SELECT depth, count(*)::BIGINT AS n, min(pk) AS min_pk, max(pk) AS max_pk
             |FROM md GROUP BY depth ORDER BY depth""".stripMargin)),

    // The SAME clustering through the round-halving algorithm
    // (large-star/small-star, Kiveris et al. 2014) under the SAME
    // recursive-CTE oracle: rounds ∝ log(diameter) instead of diameter
    // — the path a deep-component graph (long chains of pairwise-similar
    // revisions) needs at 100 TB. Algorithm + separation proof in
    // ops/Components + ComponentsProps.
    GQuery(
      "q_dedup_cluster_star",
      (s, dir) => {
        graft.ops.Components.connectedComponentsStar(
            Tables.documents(s, dir).select(col("doc_id")),
            ngramPairs(s, dir).select(col("id_a"), col("id_b")))
          .select(col("id").as("doc_id"), col("lab").as("cluster_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $ngramPairSql,
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
             |reach AS (SELECT doc_id AS id, doc_id AS lab FROM documents
             |          UNION
             |          SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id)
             |SELECT id AS doc_id, min(lab) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // INCREMENTAL duplicate-cluster maintenance — the view-maintenance
    // member of the CC family (the dedup twin of q_cdc_incr_agg/_join/
    // _topk): a third of the corpus arrives as a later ingest batch,
    // and instead of recomputing components over everything, the
    // existing assignment absorbs the batch through the CONDENSED
    // graph (touched labels + new ids only — batch-sized, never
    // corpus-sized; Components.mergeBatch scaladoc has the min-label
    // invariance argument). The oracle is q_dedup_cluster's full
    // recompute verbatim: incremental maintenance must be
    // indistinguishable from recomputation, including when a batch
    // edge bridges two existing components and when a new doc id
    // becomes its merged component's new minimum.
    //
    // The pre-batch assignment and the mined pair lists are PERSISTED
    // state, not per-query work (the same amortization contract as
    // q_dedup_incremental's LSH index and the q_cdc_incr_* fixtures):
    // the assignment is what incremental maintenance exists to avoid
    // recomputing, and batch pair mining is the ingest path's job —
    // timed on its own by q_dedup_ngram and in-stream by
    // stream_cluster_e2e. What this query measures is the true
    // per-batch serve cost: endpoint label lookups + tiny condensed CC
    // + one narrow broadcast relabel.
    GQuery(
      "q_dedup_cluster_incr",
      (s, dir) => {
        val root = cachedFixture(s"graft_ccincr_cache_v1_${sfFingerprint(dir)}") { root =>
          val pairs = ngramPairs(s, dir).select(col("id_a"), col("id_b")).localCheckpoint()
          val docs = Tables.documents(s, dir).select(col("doc_id"))
          val baseNodes = docs.filter(col("doc_id") % 3 =!= 0)
          val basePairs = pairs
            .filter(col("id_a") % 3 =!= 0 && col("id_b") % 3 =!= 0)
          graft.ops.Components.connectedComponents(baseNodes, basePairs)
            .write.parquet(root + "/state")
          docs.filter(col("doc_id") % 3 === 0)
            .write.parquet(root + "/batch_nodes")
          pairs.filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
            .write.parquet(root + "/batch_pairs")
          pairs.unpersist()
          ()
        }
        graft.ops.Components.mergeBatch(
            s.read.parquet(root + "/state"),
            s.read.parquet(root + "/batch_nodes"),
            s.read.parquet(root + "/batch_pairs"))
          .select(col("id").as("doc_id"), col("lab").as("cluster_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $ngramPairSql,
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
             |reach AS (SELECT doc_id AS id, doc_id AS lab FROM documents
             |          UNION
             |          SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id)
             |SELECT id AS doc_id, min(lab) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // Embedding-cosine near-dup pairs, candidate-limited to
    // random-hyperplane sign-LSH buckets (Charikar SimHash — bit i =
    // sign(v·h_i)): ONE shuffle on the bucket key, pairwise cosine only
    // within buckets — the 100 TB shape. Unlike an axis-aligned
    // first-k-dims key, recall survives correlated leading dimensions.
    // The hyperplane components are dyadic k/64 rationals (exact in both
    // float and double) generated from a fixed seed and embedded
    // verbatim in the oracle SQL, so the LSH bucketing itself is
    // correctness-checked bit-for-bit, not just the exact fallback.
    GQuery(
      "q_dedup_embedding",
      (s, dir) => {
        Vectors.nearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
            threshold = 0.2, bits = 8, dim = 64)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val bucket = Vectors.hyperplanes(8, 64).map { h =>
          val arr = h.mkString("[", ",", "]")
          s"(CASE WHEN list_dot_product(e, $arr::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |b AS (SELECT vec_id, e, $bucket AS bucket FROM v)
           |SELECT id_a, id_b, round(c, 4) AS cos FROM (
           |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
           |    list_cosine_similarity(a.e, b2.e) AS c
           |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id) p
           |WHERE c > 0.2 ORDER BY id_a, id_b""".stripMargin
      }),

    GQuery(
      "q_dedup_semantic",
      (s, dir) => {
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        val pairs = Vectors.semanticPairs(fanout(Tables.embeddings(s, dir)),
          "vec_id", "embedding", cents, threshold = 0.2)
        graft.ops.Components.connectedComponents(
            Tables.embeddings(s, dir).select(col("vec_id")), pairs)
          .select(col("id").as("vec_id"), col("lab").as("rep_id"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |      FROM assigned a JOIN assigned b
             |        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
             |      WHERE list_cosine_similarity(a.e, b.e) > 0.2),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM p
             |          UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
             |reach AS (SELECT vec_id AS id, vec_id AS lab FROM embeddings
             |          UNION
             |          SELECT e2.dst AS id, r.lab FROM reach r JOIN edges e2 ON e2.src = r.id)
             |SELECT id AS vec_id, min(lab) AS rep_id FROM reach GROUP BY id
             |ORDER BY vec_id""".stripMargin)),

    // --------------------------------------------------- graph ranking
    // PageRank over the near-dup graph (canonical-document selection
    // signal: inside a duplicate cluster the highest-rank member is the
    // best-connected "original"). INTEGER-EXACT formulation: ranks live
    // on a 1e9 fixed-point grid, the damping step is floor(rank·17 /
    // (20·deg)) (0.85 = 17/20) and the teleport is floor(0.15e9 / N) —
    // every iteration is integer arithmetic, so five rounds produce
    // bit-identical fixpoints on any engine and any partitioning (the
    // float formulation would tie to summation order). Five fixed
    // rounds, each ONE edge-key join + one dst aggregation over the
    // localCheckpoint'd symmetric edge list; rank state is node-sized.
    // The graph-node count is a driver aggregate scalar (bounded), the
    // edge pipeline is the shared ngramPairs. rounds=5 is the oracled
    // fixed point of the `ops.Graph.pagerank` operator (rounds is the
    // caller's accuracy dial there; SCALE.md carries the measured
    // round-4→5 residual that backs this choice).
    GQuery(
      "q_graph_pagerank",
      (s, dir) => {
        graft.ops.Graph.pagerank(
            ngramPairs(s, dir).select(col("id_a"), col("id_b")), rounds = 5)
          .orderBy(col("rank").desc, col("doc_id"))
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""c$i AS (SELECT e.dst, sum((r.rank * 17) // (20 * d.deg))::BIGINT AS in_c
             |       FROM edges e JOIN r${i - 1} r ON e.src = r.doc_id
             |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
             |r$i AS (SELECT d.src AS doc_id,
             |         ((150000000 // nn.n) + coalesce(c$i.in_c, 0))::BIGINT AS rank
             |       FROM deg d CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = d.src)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH $ngramPairSql,
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS doc_id, (1000000000 // nn.n)::BIGINT AS rank
           |       FROM deg CROSS JOIN nn),
           |$iters
           |SELECT doc_id, rank FROM r5 ORDER BY rank DESC, doc_id""".stripMargin
      }),

    // ------------------------------------------ substring-level dedup
    // Cross-document duplicate SPAN detection — the exact-substring
    // dedup family (suffix-array substring dedup à la "Deduplicating
    // Training Data Makes Language Models Better", distributed here as
    // stride-sampled fixed windows): hash a 32-char window every 8
    // chars, mark a window duplicated when the identical window text
    // occurs in ANY other document, report each doc's duplicated-window
    // fraction. Catches partial overlap (a shared paragraph inside
    // otherwise distinct docs) that whole-doc hashing misses entirely
    // and shingle-Jaccard only surfaces once the shared fraction is
    // large. Scale shape: stride sampling bounds the exploded stream at
    // corpus_chars/8 rows; the cross-doc flag is min!=max over ONE
    // window-hash shuffle (no count-distinct, no self-join, no posting
    // lists collected), then one doc_id shuffle aggregates the
    // fraction — linear in corpus bytes, the q_dedup_ngram inverted-
    // posting discipline at character granularity. Sampling is CONTENT-
    // DEFINED (keep a window iff its hash's first hex nibble is 0 or 8
    // — 1/8 in expectation, the mod-p winnowing rule): a fixed-stride
    // grid is phase-sensitive (the same paragraph at offsets differing
    // by a non-multiple of the stride never collides — the planted-
    // paragraph spec case), whereas hash-selected positions are chosen
    // by the BYTES, so both copies of a shared span sample the same
    // relative offsets no matter where the span sits. md5 keeps the
    // selection oracle-portable; at 100 TB the per-position hash would
    // be the O(1)-per-step polynomial roll (Text.rollingHashes) with
    // the same nibble rule. explode_outer (not explode) so
    // InferFiltersFromGenerate can't re-inline the window expression
    // into the scan as a size()>0 filter; null rows (docs whose every
    // window was sampled away) are dropped by the free isNotNull on the
    // generated attribute.
    GQuery(
      "q_dedup_substring",
      (s, dir) => {
        val wHash = Window.partitionBy(col("wh"))
        fanout(Tables.documents(s, dir))
          .filter(length(col("text")) >= 32)
          .select(col("doc_id"), explode_outer(expr(
            """filter(transform(sequence(1, length(text) - 31), i -> md5(substring(text, i, 32))),
              |       h -> substring(h, 1, 1) IN ('0', '8'))""".stripMargin))
            .as("wh"))
          .filter(col("wh").isNotNull)
          .withColumn("shared",
            (min(col("doc_id")).over(wHash) =!= max(col("doc_id")).over(wHash)).cast("int"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(col("shared")).cast("long").as("n_dup"))
          .withColumn("dup_frac",
            floor(col("n_dup").cast("double") / col("n_windows") * 10000 + 0.5) / 10000)
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(list_filter(
             |           list_transform(range(1, length(text) - 30),
             |             i -> md5(substr(text, i, 32))),
             |           h -> substr(h, 1, 1) IN ('0', '8'))) AS wh
             |  FROM documents WHERE length(text) >= 32),
             |m AS (
             |  SELECT doc_id,
             |    CASE WHEN min(doc_id) OVER (PARTITION BY wh)
             |           <> max(doc_id) OVER (PARTITION BY wh) THEN 1 ELSE 0 END AS shared
             |  FROM w)
             |SELECT doc_id, count(*) AS n_windows, sum(shared)::BIGINT AS n_dup,
             |  floor(sum(shared)::DOUBLE / count(*) * 10000 + 0.5) / 10000 AS dup_frac
             |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // C4-style GLOBAL boilerplate removal (Raffel et al.'s "discard any
    // line occurring 3+ times in the corpus", the MassiveText repeated-
    // line rule): documents are segmented into fixed 8-token "lines"
    // (the fixture carries no newlines — the segment grid is the line
    // analog), every segment counted GLOBALLY, segments with count ≥ 3
    // dropped, and each document REASSEMBLED from its surviving
    // segments in order (fp = md5 of the cleaned text carries byte
    // fidelity through the gate). Unlike the dedup family this op
    // rewrites documents rather than dropping them — the within-corpus
    // complement of q_dedup_substring's span detection. Scale: one
    // segment-key shuffle (corpus_tokens/8 rows) for the frequency
    // pass + the doc-key rebuild aggregate; no self-joins, no pair
    // lists — linear in corpus bytes.
    GQuery(
      "q_boilerplate",
      (s, dir) => {
        val segs = fanout(Tables.documents(s, dir))
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, (size(toks) - 1) div 8), i -> concat_ws(' ', slice(toks, i * 8 + 1, 8)))"))
            .as(Seq("i", "seg")))
        val freq = segs.groupBy(col("seg")).agg(count(lit(1)).as("n"))
        segs.join(freq, Seq("seg"))
          .withColumn("dropped", col("n") >= 3)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_segs"),
            sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
            md5(concat_ws(" ",
              expr("transform(array_sort(collect_list(CASE WHEN NOT dropped THEN struct(i, seg) END)), x -> x.seg)")))
              .as("fp"))
          // r21: a materialize-before-sort here was tried and REVERTED
          // (0.81 s → 1.23 s): the sort's input sits directly on a
          // reused shuffle, so the range sampler re-runs only the
          // final agg merge — cheaper than checkpointing its output
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             |          WHERE len(string_split(text, ' ')) > 0),
             |segs AS (
             |  SELECT doc_id,
             |    unnest(range(0, (len(toks) - 1) // 8 + 1)) AS i,
             |    unnest(list_transform(range(0, (len(toks) - 1) // 8 + 1),
             |      i -> array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' '))) AS seg
             |  FROM t),
             |freq AS (SELECT seg, count(*)::BIGINT AS n FROM segs GROUP BY seg)
             |SELECT s.doc_id, count(*)::BIGINT AS n_segs,
             |  sum(CASE WHEN f.n >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
             |  md5(coalesce(string_agg(CASE WHEN f.n < 3 THEN s.seg END, ' ' ORDER BY s.i), '')) AS fp
             |FROM segs s JOIN freq f USING (seg)
             |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin))
  )
}
