package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** The extension query surface: the reference's core CDC-merge semantics
  * made queryable (SURVEY.md §2.2/§2.3 `q_cdc_upsert_snapshot` — the
  * DeltaStreamer upsert, reference README.md:300-307, 348), plus the
  * LLM-training-data-pipeline operators (dedup family, similarity
  * search, text analysis, multimodal columns) over the `documents` /
  * `embeddings` tables.
  *
  * Every query here is built from codegen'd built-in expressions (no
  * UDFs) and carries a DuckDB oracle unless the semantics are genuinely
  * engine-specific (noted per query). Scale notes inline.
  */
object Extensions {

  private val dround = (c: org.apache.spark.sql.Column) => round(c.cast("double"), 4)

  /** Shared DuckDB replay of ops/Bpe.train(iters = 3): word-frequency
    * vocabulary v0, then 3 unrolled merge iterations vK-1 --(pair stats
    * pK, lexicographic argmax mK, greedy leftmost merge)--> vK. The
    * greedy rule mirrors Bpe.mergeOnce exactly: islands of consecutive
    * match positions, keep even offsets, drop the consumed right symbol.
    * Used by both q_bpe_train (trajectory + final symbols) and
    * q_bpe_encode (v3 as the segmentation table). */
  private lazy val bpeTrainCtes: String = {
    def iter(k: Int): String = {
      val p = s"v${k - 1}"
      s"""p$k AS (
         |  SELECT a, b, sum(cnt)::BIGINT AS n FROM (
         |    SELECT cnt,
         |      unnest(syms[1:len(syms) - 1]) AS a,
         |      unnest(syms[2:len(syms)]) AS b
         |    FROM $p WHERE len(syms) >= 2) z
         |  GROUP BY a, b),
         |m$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1),
         |pos$k AS (
         |  SELECT word, cnt,
         |    unnest(range(1, len(syms) + 1)) AS i, unnest(syms) AS sym
         |  FROM $p),
         |x$k AS (
         |  SELECT word, cnt, i, sym, a, b,
         |    coalesce(sym = a AND nxt = b, false) AS ism,
         |    sum(CASE WHEN coalesce(sym = a AND nxt = b, false) THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY word ORDER BY i) AS mrn
         |  FROM (SELECT p.*, m.a, m.b,
         |          lead(p.sym) OVER (PARTITION BY p.word ORDER BY p.i) AS nxt
         |        FROM pos$k p CROSS JOIN m$k m) w),
         |z$k AS (
         |  SELECT *, i - min(CASE WHEN ism THEN i END)
         |    OVER (PARTITION BY word, island) AS off
         |  FROM (SELECT *, CASE WHEN ism THEN i - mrn END AS island FROM x$k) y),
         |r$k AS (
         |  SELECT *, coalesce(lag(kept) OVER (PARTITION BY word ORDER BY i), false) AS gone
         |  FROM (SELECT *, ism AND off % 2 = 0 AS kept FROM z$k) q),
         |v$k AS (
         |  SELECT word, cnt,
         |    list(CASE WHEN kept THEN a || b ELSE sym END ORDER BY i) AS syms
         |  FROM r$k WHERE NOT gone GROUP BY word, cnt)""".stripMargin
    }
    s"""v0 AS (
       |  SELECT word, count(*)::BIGINT AS cnt,
       |    list_transform(range(1, length(word) + 1), j -> substring(word, j, 1)) AS syms
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
       |  WHERE word <> '' GROUP BY word),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}""".stripMargin
  }

  /** The testdata tables are single parquet files → ONE input split, so
    * every interpreted higher-order expression (shingles, minhash, dot
    * products — all CodegenFallback) would run on one core. A cheap
    * repartition of the raw rows before the expensive projection spreads
    * the compute across the cluster; on a real many-file 100 TB corpus
    * the scan already yields thousands of splits and this is a no-op
    * cost-wise (one narrow shuffle of input rows ≪ the compute it
    * parallelizes). */
  private def fanout(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact n-gram Jaccard near-dup pairs (id_a < id_b, jac >= 0.5) —
    * the shared pair pipeline behind q_dedup_ngram (pair surface) and
    * q_dedup_cluster (edge set). ONE pass over the corpus: tokens and
    * the shingle array are materialized in their own projections (the
    * interpreted lambda would otherwise re-split the text for every
    * element_at), the set size rides along the posting stream (no
    * second scan for a sizes join), explode is the empty-filter (no
    * predicate on the expensive derived column), and pairs come from
    * groupBy(shingle)+collect — the corpus is never self-joined.
    * Two shuffles total: shingle key, then pair aggregation.
    * explode_outer, NOT explode: InferFiltersFromGenerate would put a
    * size(sh)>0 filter under a plain explode, and predicate pushdown
    * re-inlines the whole shingle expression into the scan filter —
    * recomputing it per row. Outer explode infers nothing; the null-row
    * filter on the generated attribute is free. */
  private def ngramPairCounts(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val posts = fanout(Tables.documents(s, dir))
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("sh", array_distinct(Text.shingles(col("toks"), 5)))
      .select(col("doc_id"), size(col("sh")).as("n"), explode_outer(col("sh")).as("g"))
      .filter(col("g").isNotNull)
    posts.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x.doc_id AS id_a, x.n AS na, y.doc_id AS id_b, y.n AS nb))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.na").as("na"), col("p.nb").as("nb"))
      .agg(count(lit(1)).as("inter"))
  }

  private def ngramPairs(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    ngramPairCounts(s, dir)
      // floor-half-up: see Text.jaccard — power-of-two unions tie at
      // the 4th decimal where engine round() rules diverge
      .withColumn("jac", floor(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) * 10000 + 0.5) / 10000)
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jac"))

  /** DuckDB twin of [[ngramPairs]] as a CTE chain ending in `pairs`
    * (id_a, id_b, jac) — spliced into both dedup oracles so the pair
    * semantics are defined once on each side. */
  private val ngramPairSql =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3),
      |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))) AS sh
      |       FROM t WHERE len(toks) >= 5),
      |posts AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM posts a JOIN posts b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
      |paircounts AS (SELECT id_a, id_b, x.n AS na, y.n AS nb, inter
      |  FROM inter JOIN sizes x ON x.doc_id = id_a JOIN sizes y ON y.doc_id = id_b),
      |pairs AS (SELECT id_a, id_b, jac FROM (
      |  SELECT id_a, id_b,
      |    floor(inter::DOUBLE / (na + nb - inter) * 10000 + 0.5) / 10000 AS jac
      |  FROM paircounts) z
      |  WHERE jac >= 0.5)""".stripMargin

  /** The deterministic CDC change log every CDC-merge query derives
    * from `events`: event_id = monotone LSN stand-in, user_id = record
    * key, op from fixed residue rules (so the DuckDB oracle can replay
    * the identical merge in window SQL). */
  private def cdcLog(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(
      col("user_id").as("id"),
      col("event_id").as("lsn"),
      when(pmod(col("event_id"), lit(11)) === 0, "d")
        .when(pmod(col("event_id"), lit(3)) === 0, "u")
        .otherwise("c").as("op"),
      col("value"))

  /** DuckDB twin of [[cdcLog]] collapsed latest-wins — the ONE oracle
    * all four CDC-merge queries share: however the engine materializes
    * the log (one-shot window, incremental upsert, MOR read, clustered
    * read), the answer is this collapse. */
  private val latestWinsSql =
    """SELECT id, lsn, op, value FROM (
      |  SELECT user_id AS id, event_id AS lsn,
      |    CASE WHEN event_id % 11 = 0 THEN 'd'
      |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
      |    value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND op <> 'd' ORDER BY id""".stripMargin

  /** DuckDB twin shared by q_text_search_served and stream_text_e2e:
    * full-corpus BM25 with the FIXED query terms — however the engine
    * serves it (persisted base+delta index, streaming-maintained
    * index), the answer is the from-scratch computation. Same math as
    * the q_text_search oracle, query pinned to 'data batch scan'. */
  private val textSearchServedSql =
    """WITH toks AS (
      |  SELECT doc_id, t AS term FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
      |  WHERE t IS NOT NULL AND t <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |stats AS (SELECT count(*) AS t_total, count(DISTINCT doc_id) AS n_docs FROM toks),
      |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      |qterms AS (SELECT term, df FROM dft WHERE term IN ('data', 'batch', 'scan')),
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
      |FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin

  /** The MOR lifecycle shared by q_cdc_mor_read and
    * q_cdc_clustered_read: two log appends, a compaction folding them
    * into a base (optionally followed by a clustering REPLACE commit),
    * a third append left pending, then the merged snapshot view. The
    * cut points scale with the table so every SF exercises base +
    * pending.
    *
    * The table is built ONCE per (sf, variant) into a versioned cache
    * dir (everything upstream is deterministic: events parquet → fixed
    * residue rules → fixed cut points), so the query itself — the thing
    * verify oracles and bench times — is `readMerged`, the MOR read
    * path a 100 TB consumer actually pays for per query. Table services
    * (append/compact/cluster) are amortized build cost there, and their
    * latency is covered by MergeOnReadSpec/ClusteringSpec, not the
    * bench. Bump the version component whenever cdcLog, the cut points,
    * or the MergeOnRead/Clustering write path changes, or the cache
    * serves stale fixtures. */
  private def morTable(s: org.apache.spark.sql.SparkSession, dir: String,
                       cluster: Boolean): String = {
    val sfKey = sfFingerprint(dir) // basename + content fingerprint
    val variant = if (cluster) "clustered" else "plain"
    cachedFixture(s"graft_mor_cache_v1_${sfKey}_$variant") { root =>
      val log = cdcLog(s, dir)
      val Seq(c1, c2) = {
        val n = Tables.events(s, dir).count()
        Seq(n * 2 / 5, n * 4 / 5)
      }
      val mor = root + "/table"
      graft.cdc.MergeOnRead.logAppend(s, mor, log.filter(col("lsn") < c1), 0L)
      graft.cdc.MergeOnRead.logAppend(s, mor, log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L)
      graft.cdc.MergeOnRead.compact(s, mor, Seq("id"), Seq("lsn"))
      if (cluster) graft.cdc.Clustering.cluster(s, mor, Seq(col("id")), files = 4)
      graft.cdc.MergeOnRead.logAppend(s, mor, log.filter(col("lsn") >= c2), 2L)
    } + "/table"
  }

  /** Savepoint/restore lifecycle fixture (q_cdc_savepoint_restore):
    * the change log's first batch compacted to a base, SAVEPOINTED,
    * two more append+compact cycles run over it (each one a GC pass
    * that would reap the pinned base without the savepoint), then
    * [[graft.cdc.Savepoints.rollback]] restores TO the pinned version
    * — rollback refuses only pins ABOVE the target, so restoring to
    * the savepoint itself needs no release. Built once per sf (the
    * [[morTable]] cache protocol and versioning rule). */
  private def savepointTable(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val sfKey = sfFingerprint(dir)
    cachedFixture(s"graft_sp_cache_v1_$sfKey") { root =>
      val log = cdcLog(s, dir)
      val Seq(c1, c2) = {
        val n = Tables.events(s, dir).count()
        Seq(n * 2 / 5, n * 4 / 5)
      }
      val t = root + "/table"
      graft.cdc.MergeOnRead.logAppend(s, t, log.filter(col("lsn") < c1), 0L)
      graft.cdc.MergeOnRead.compact(s, t, Seq("id"), Seq("lsn"))
      require(graft.cdc.Savepoints.savepoint(s, t, 0L),
        "savepoint of the freshly compacted base must pin")
      graft.cdc.MergeOnRead.logAppend(s, t,
        log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L)
      graft.cdc.MergeOnRead.compact(s, t, Seq("id"), Seq("lsn"))
      graft.cdc.MergeOnRead.logAppend(s, t, log.filter(col("lsn") >= c2), 2L)
      graft.cdc.MergeOnRead.compact(s, t, Seq("id"), Seq("lsn"))
      // rollback returns the removed ids HIGHEST-FIRST (its crash-safe
      // deletion order) — compare order-insensitively: requiring the
      // ascending order here broke every fresh-cache build (r18 catch)
      val removed = graft.cdc.Savepoints.rollback(s, t, 0L)
      require(removed.sorted == Seq(1L, 2L),
        s"rollback must remove exactly the two later commits, got $removed")
    } + "/table"
  }

  /** File-group COW fixture: the derived change log replayed in three
    * batches through [[graft.cdc.FileGroups.commit]] — each commit
    * rewrites only the hash buckets its batch touches; the rest carry
    * forward by manifest reference. Built once per sf (same cache
    * protocol and versioning rule as [[morTable]]). */
  private def fileGroupTable(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val sfKey = sfFingerprint(dir)
    // v2: commit() writes per-bucket key blooms into the manifest (the
    // bloom-index tagging path needs them; v1 caches predate the field)
    // v3: the table dir is named like a catalog table ("employees") so
    // the same fixture serves q_cdc_sql_read's DSv2 catalog root
    cachedFixture(s"graft_fg_cache_v3_$sfKey") { root =>
      val log = cdcLog(s, dir)
      val Seq(c1, c2) = {
        val n = Tables.events(s, dir).count()
        Seq(n * 2 / 5, n * 4 / 5)
      }
      val t = root + "/employees"
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") < c1), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L, Seq("id"), Seq("lsn"))
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c2), 2L, Seq("id"), Seq("lsn"))
    } + "/employees"
  }

  /** String-keyed sibling of [[fileGroupTable]] — the UUID-PK Debezium
    * shape: the SAME 3-batch lifecycle with the record key rendered as
    * a string ('u' + id), so the round-17 generalized index (bucket +
    * key bloom over any key shape) gets its own oracle-gated fixture. */
  private def fileGroupTableStr(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val sfKey = sfFingerprint(dir)
    cachedFixture(s"graft_fgstr_cache_v1_$sfKey") { root =>
      val log = cdcLog(s, dir).withColumn("id", concat(lit("u"), col("id")))
      val Seq(c1, c2) = {
        val n = Tables.events(s, dir).count()
        Seq(n * 2 / 5, n * 4 / 5)
      }
      val t = root + "/employees"
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") < c1), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L, Seq("id"), Seq("lsn"))
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c2), 2L, Seq("id"), Seq("lsn"))
    } + "/employees"
  }

  /** Composite-keyed sibling of [[fileGroupTable]]: record identity =
    * (id, region), region derived (id % 5) so the latest-wins collapse
    * stays oracle-comparable while the index hashes/blooms the whole
    * tuple. */
  private def fileGroupTableComp(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val sfKey = sfFingerprint(dir)
    cachedFixture(s"graft_fgcomp_cache_v1_$sfKey") { root =>
      val log = cdcLog(s, dir).withColumn("region", pmod(col("id"), lit(5)).cast("int"))
      val Seq(c1, c2) = {
        val n = Tables.events(s, dir).count()
        Seq(n * 2 / 5, n * 4 / 5)
      }
      val t = root + "/orders"
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") < c1), 0L, Seq("id", "region"), Seq("lsn"), nBuckets = 16)
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L, Seq("id", "region"), Seq("lsn"))
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c2), 2L, Seq("id", "region"), Seq("lsn"))
    } + "/orders"
  }

  /** Register the `graft_cdc` DSv2 catalog over `root`, idempotently:
    * a same-value re-set is skipped, so query bodies that need the
    * catalog stay effectively side-effect-free after the first call
    * (conf mutation inside a registry of otherwise-pure functions was
    * round-15's hidden-global-state wart). Lives OUTSIDE the
    * cachedFixture builder because the builder only runs on cache
    * miss — a later process reading the on-disk fixture still needs
    * the catalog registered. */
  private def registerCdcCatalog(s: org.apache.spark.sql.SparkSession, root: String,
                                 name: String = "graft_cdc"): Unit =
    if (!s.conf.getOption(s"spark.sql.catalog.$name.root").contains(root) ||
        s.conf.getOption(s"spark.sql.catalog.$name").isEmpty) {
      s.conf.set(s"spark.sql.catalog.$name", "graft.sources.FileGroupCatalog")
      s.conf.set(s"spark.sql.catalog.$name.root", root)
    }

  /** A MUTABLE one-commit warehouse of the full CDC log, cached under
    * its own `cacheName`: the SQL write-path queries each mutate their
    * table, so none can share the read-only queries' fixture or each
    * other's (isolation lives in the cache key; the build is
    * deliberately identical so the two warehouses cannot diverge).
    * q_cdc_sql_merge's merge is a FIXPOINT on (id, lsn, value) after
    * the first application, so the persisted-cache +
    * repeated-invocation lifecycle stays oracle-stable (op flips c→u
    * on re-merge of inserted rows, which is why that query doesn't
    * select op; FileGroupMergeSpec pins op semantics on a fresh
    * table). */
  private def mutableCdcRoot(s: org.apache.spark.sql.SparkSession, dir: String,
                             cacheName: String): String =
    cachedFixture(s"${cacheName}_${sfFingerprint(dir)}") { root =>
      graft.cdc.FileGroups.commit(s, root + "/employees", cdcLog(s, dir),
        0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    }

  // v2: the merge source's lsn base changed from a hardcoded 2000000
  // to max(event_id)+1 — fixtures mutated under the old base hold
  // higher lsns than the new formula assigns, which the ord-regression
  // guard now (correctly) refuses
  private def mergeTableRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
    mutableCdcRoot(s, dir, "graft_fg_merge_cache_v2")

  private def dmlTableRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
    mutableCdcRoot(s, dir, "graft_fg_dml_cache_v1")

  /** q_cdc_sql_maintain's own warehouse (the procedures mutate
    * versions/markers — same isolation rationale as [[mergeTableRoot]]):
    * the three-batch lifecycle of [[fileGroupTable]], so the
    * post-rollback state is the deterministic `lsn < c2` prefix. After
    * the build, two-version GC retains {v1, v2}; the query's rollback
    * lands the table at v1 and stays there (re-runs: the savepoint
    * re-pins, the rollback removes nothing) — a fixpoint like the other
    * mutable SQL fixtures. */
  private def maintTableRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
    cachedFixture(s"graft_fg_maint_cache_v1_${sfFingerprint(dir)}") { root =>
      val log = cdcLog(s, dir)
      val Seq(c1, c2) = {
        val n = Tables.events(s, dir).count()
        Seq(n * 2 / 5, n * 4 / 5)
      }
      val t = root + "/employees"
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") < c1), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L, Seq("id"), Seq("lsn"))
      graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c2), 2L, Seq("id"), Seq("lsn"))
    }

  /** The MOR snapshot read over the cached lifecycle fixture: base ⊎
    * pending logs, one window shuffle. */
  private def morRead(s: org.apache.spark.sql.SparkSession, dir: String,
                      cluster: Boolean): org.apache.spark.sql.DataFrame =
    graft.cdc.MergeOnRead.readMerged(s, morTable(s, dir, cluster), Seq("id"), Seq("lsn")).get
      .select(col("id"), col("lsn"), col("op"), col("value"))
      .orderBy(col("id"))

  /** Build-once fixture cache under /tmp. `build` writes into a fresh
    * temp dir; the `_DONE` marker is written into the fresh dir BEFORE
    * the atomic rename to `/tmp/<name>`, so the rename publishes data
    * and marker together — no instant exists where the cache dir is
    * visible without its marker, which is what previously let a
    * concurrent process mistake a just-published cache for a poisoned
    * one and delete it. A killed run leaves an unrenamed (markerless)
    * temp dir — invisible garbage, never a half-cache. Losing the
    * rename race is benign: the fresh copy is used directly for this
    * invocation. */
  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  /** The streaming sink's _spark_metadata log records absolute
    * part-file paths into the pre-rename fixture build dir; a landed
    * fixture is a plain read-only parquet dir once its stream stops,
    * so every stream-fixture builder drops the log and lets reads
    * list files directly. */
  private def dropSinkLog(outDir: String): Unit =
    rmTree(new java.io.File(outDir, "_spark_metadata"))

  /** Cache-key component for testdata-derived fixtures: the sf dir's
    * basename plus a fingerprint of its parquet files' (name, size,
    * mtime). A driver-side fixture regeneration changes the fingerprint
    * and so invalidates every cached fixture built from the old data —
    * without this, r12's testdata regen left /tmp caches built from the
    * previous encoding serving stale streaming-e2e results. */
  private def sfFingerprint(dir: String): String = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val sig = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val h = java.security.MessageDigest.getInstance("MD5").digest(sig.getBytes("UTF-8"))
    new java.io.File(dir).getName + "-" + h.take(5).map("%02x".format(_)).mkString
  }

  /** The fused hybrid ranking shared by q_hybrid_rrf (which IS this
    * result) and q_pipeline_rag (which packs it into a token-budgeted
    * context): BM25 top-50 ⊕ cosine top-50 by reciprocal rank fusion,
    * top-10 by (rrf desc, doc_id). See q_hybrid_rrf's comment for the
    * scale discipline of both legs. */
  private def rrfFusedTop10(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val toks = Text.tokenStream(fanout(Tables.documents(s, dir)), "doc_id", "text").cache()
    val qterms = Text.docFreq(toks).orderBy(col("df").desc, col("term")).limit(3)
    val wT = Window.orderBy(col("bm25").desc, col("doc_id"))
    val text50 = Text.bm25TopK(toks, qterms, 50)
      .withColumn("r_t", row_number().over(wT).cast("int"))
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val wV = Window.orderBy(col("cos").desc, col("vec_id"))
    val vec50 = emb.crossJoin(broadcast(qv))
      .withColumn("cos", Vectors.cosine(col("v"), col("qv"), col("nrm"), col("qn")))
      .select(col("vec_id"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(50)
      .withColumn("r_v", row_number().over(wV).cast("int"))
    text50.select(col("doc_id"), col("r_t"))
      .join(vec50.select(col("vec_id").as("doc_id"), col("r_v")), Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        floor((coalesce(lit(1.0) / (col("r_t") + 60), lit(0.0))
          + coalesce(lit(1.0) / (col("r_v") + 60), lit(0.0))) * 1000000 + 0.5) / 1000000)
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      .select(col("doc_id"), col("r_t"), col("r_v"), col("rrf"))
  }

  /** The maintained HLL store fixture shared by stream_hll_e2e (the
    * maintenance loop) and q_hll_intersect_served (the overlap serve
    * path): all events ingested in 3 micro-batches, each appending its
    * per-event-type HLL of the user ids as a delta (Streams.hllIngest
    * over ops/HllStore), landed rows at /out, store at /idx. */
  private def hllStoreFixture(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val sfKey = sfFingerprint(dir)
    cachedFixture(s"graft_shll_cache_v1_$sfKey") { root =>
      val ev = Tables.events(s, dir)
      graft.ops.HllStore.buildEmpty(s, root + "/idx", lgK = 12)
      val src = root + "/src"
      ev.filter(pmod(col("event_id"), lit(3)) === 0)
        .coalesce(1).write.mode("append").parquet(src)
      val q = graft.streaming.Streams.hllIngest(
        s.readStream.schema(ev.schema).parquet(src),
        root + "/idx", root + "/out", root + "/ckpt")
      try {
        q.processAllAvailable()
        for (i <- 1 to 2) {
          ev.filter(pmod(col("event_id"), lit(3)) === i)
            .coalesce(1).write.mode("append").parquet(src)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
  }

  private def cachedFixture(name: String)(build: String => Unit): String = {
    val cache = new java.io.File("/tmp", name)
    val marker = new java.io.File(cache, "_DONE")
    if (marker.exists()) cache.getAbsolutePath
    else {
      val fresh = java.nio.file.Files.createTempDirectory("graft_fix").toFile
      build(fresh.getAbsolutePath)
      new java.io.File(fresh, "_DONE").createNewFile()
      if (cache.exists() && !marker.exists()) // repair a pre-protocol cache
        rmTree(cache)
      if (fresh.renameTo(cache)) cache.getAbsolutePath
      else fresh.getAbsolutePath // lost the race: use the fresh copy
    }
  }

  def queries: Seq[GQuery] = Seq(

    // ------------------------------------------------------- CDC merge
    // The reference's entire reason to exist: collapse a CDC change log
    // to the current-state snapshot — latest-by-LSN per key, deletes
    // applied (README.md:300-307; --source-ordering-field _event_lsn,
    // README.md:348). The log is derived deterministically from `events`
    // (event_id = monotone LSN stand-in, user_id = record key) so the
    // DuckDB oracle can replay the identical merge in window SQL.
    // Scale: ONE hash shuffle on the key — identical to Hudi's
    // key→file-group distribution. The window never sees more than one
    // key's events per partition slice; AQE splits skewed keys.
    GQuery(
      "q_cdc_upsert_snapshot",
      (s, dir) => {
        CdcMerge.snapshot(cdcLog(s, dir), Seq("id"), Seq("lsn"))
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(latestWinsSql)),

    // The INCREMENTAL merge path under the same oracle: snapshot the
    // first half of the log, then upsertPruned the second half in — the
    // result must equal the one-shot latest-wins collapse (that equality
    // is exactly Hudi's incremental-commit == full-recompute invariant,
    // and the scalacheck property, now value-checked against DuckDB).
    GQuery(
      "q_cdc_incremental",
      (s, dir) => {
        val log = cdcLog(s, dir)
        val mid = 5000 // event_ids are 0..n-1; sf0.01 has 10k events
        val first = CdcMerge.snapshot(log.filter(col("lsn") < mid), Seq("id"), Seq("lsn"))
        val merged = CdcMerge.upsertPruned(first, log.filter(col("lsn") >= mid), Seq("id"), Seq("lsn"))
        merged.select(col("id"), col("lsn"), col("op"), col("value")).orderBy(col("id"))
      },
      Some(latestWinsSql)),

    // MERGE_ON_READ read path under the SAME latest-wins oracle: the
    // derived change log rides the full MOR lifecycle — two log appends,
    // a compaction folding them into a base, a third append left pending
    // — and readMerged (base ⊎ pending logs, one window shuffle) must
    // equal the one-shot collapse. This is Hudi's snapshot-view
    // invariant (read amplification never changes the answer), the MOR
    // twin of q_cdc_incremental's commit == recompute check, now
    // DuckDB-value-checked rather than scalatest-only.
    GQuery(
      "q_cdc_mor_read",
      (s, dir) => morRead(s, dir, cluster = false),
      Some(latestWinsSql)),

    // Clustering REPLACE commit under the same latest-wins oracle: the
    // MOR lifecycle with a clustering pass after compaction — the
    // clustered base (range-sorted, min/max-disjoint files) plus the
    // pending log must STILL merge to the one-shot collapse. This is
    // the replace-commit invariant (layout changes, contents never do)
    // value-checked through the whole read path, not just scalatest.
    GQuery(
      "q_cdc_clustered_read",
      (s, dir) => morRead(s, dir, cluster = true),
      Some(latestWinsSql)),

    // Z-ORDER LAYOUT through the oracle gate: the Morton-interleave
    // clustering key (Clustering.zvalue — the multi-dimension variant
    // of Hudi's clustering REPLACE sort) materialized as the per-file
    // min/max stats a z-sorted rewrite of lineitem would produce, plus
    // each file's overlap verdict for a 2-D probe rectangle. The DuckDB
    // twin recomputes the interleave with its own bit arithmetic, so
    // the bit-level math (bit i of partkey → position 2i+1, suppkey →
    // 2i), the 64-way file split, and the min/max pruning all get
    // value-checked — ClusteringSpec holds the comparative claim
    // (2-D probes prune under z-order where a 1-D sort scans all).
    // Scale: file assignment replays ntile(64)'s exact arithmetic from
    // a TWO-LEVEL global rank (the q_pack_shards discipline) — the
    // naive ntile-over-one-global-window puts the whole fact through a
    // single WindowExec partition. Bucket by a monotone function of z
    // (z is the primary sort key, so bucket boundaries respect the
    // global (z,p,sk) order), per-bucket counts cumulate into a ≤nb-row
    // offset table (the only global window), and per-bucket row_numbers
    // plus their bucket offset reconstruct the global 0-based rank. The
    // SQL-standard ntile split (first n%64 tiles get ⌈n/64⌉ rows) is
    // then a closed-form expression of (rank, n), so the DuckDB twin
    // keeps verifying with its own ntile(64). No partition ever holds
    // more than corpus/nb rows; ties in (z,p,sk) are exact (p,sk)
    // duplicates, so rank order among them cannot move any file's
    // count or min/max. The production write path is
    // Clustering.cluster's sample-based range partitioner on the SAME
    // z-value — no equal-count guarantee needed there.
    GQuery(
      "q_layout_zorder",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nb = 64
        val z = graft.cdc.Clustering.zvalue(col("l_partkey"), col("l_suppkey"), 16)
        // (p, sk, z) materialized once: the max-z scalar, the bucket
        // counts, and the main pass share one scan+interleave
        val rows = Tables.lineitem(s, dir)
          .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"), z.as("z"))
          .localCheckpoint()
        // bucket width from a 1-row max scalar keeps the bucket count
        // ≤ nb at any sf; floor(z/k) is monotone in z
        val k = rows.agg((floor(max(col("z")) / nb) + 1).cast("long").as("k"))
        val withB = rows.crossJoin(broadcast(k))
          .withColumn("b", floor(col("z") / col("k")).cast("long"))
        val wOff = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
        val offs = withB.groupBy(col("b")).agg(count(lit(1)).as("bn"))
          .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
          .withColumn("n_tot", sum(col("bn")).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .select(col("b"), col("off"), col("n_tot")) // ≤ nb rows: the only global windows
        val wIn = Window.partitionBy(col("b")).orderBy(col("z"), col("p"), col("sk"))
        // ntile(nb) closed form over 0-based rank r of n rows:
        // q=⌊n/nb⌋ big-or-small tile size, rem=n%nb tiles of size q+1
        // first — identical to the SQL-standard (and DuckDB) split
        val q = floor(col("n_tot") / nb)
        val rem = col("n_tot") - q * nb
        val r = row_number().over(wIn).cast("long") - 1 + col("off")
        withB.join(broadcast(offs), "b")
          .withColumn("file_id",
            when(r < rem * (q + 1), floor(r / (q + 1)) + 1)
              .otherwise(rem + floor((r - rem * (q + 1)) / greatest(q, lit(1L))) + 1)
              .cast("long"))
          .groupBy(col("file_id"))
          .agg(count(lit(1)).as("n"),
            min(col("p")).as("p_lo"), max(col("p")).as("p_hi"),
            min(col("sk")).as("s_lo"), max(col("sk")).as("s_hi"))
          .withColumn("hit",
            col("p_lo") <= 200 && col("p_hi") >= 100 &&
              col("s_lo") <= 60 && col("s_hi") >= 10)
          .orderBy(col("file_id"))
      },
      Some("""WITH z AS (
             |  SELECT l_partkey AS p, l_suppkey AS sk,
             |    list_sum(list_transform(range(0, 16), i ->
             |      (((l_partkey >> i) & 1) << (2*i + 1)) + (((l_suppkey >> i) & 1) << (2*i)))) AS z
             |  FROM lineitem),
             |f AS (SELECT p, sk, ntile(64) OVER (ORDER BY z, p, sk) AS file_id FROM z)
             |SELECT file_id, count(*) AS n,
             |  min(p) AS p_lo, max(p) AS p_hi, min(sk) AS s_lo, max(sk) AS s_hi,
             |  (min(p) <= 200 AND max(p) >= 100 AND min(sk) <= 60 AND max(sk) >= 10) AS hit
             |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin)),

    // Incremental change feed (the consumer side of Hudi's incremental
    // query): key-level diff of the snapshot as of lsn<5000 against the
    // final snapshot — inserts, updates (precombine moved), deletes,
    // with before/after images. ONE full-outer shuffle join on the key;
    // the DuckDB oracle replays the identical diff as window SQL + FULL
    // OUTER JOIN. ChangeFeedSpec covers the version-dir wrapper
    // (betweenVersions) over the retained COW versions.
    GQuery(
      "q_cdc_changefeed",
      (s, dir) => {
        val log = cdcLog(s, dir)
        // half the log (1-row count scalar): scales with the table so
        // every SF diffs a real mid-state, not an empty feed
        val mid = Tables.events(s, dir).count() / 2
        val s1 = CdcMerge.snapshot(log.filter(col("lsn") < mid), Seq("id"), Seq("lsn"))
        val s2 = CdcMerge.snapshot(log, Seq("id"), Seq("lsn"))
        graft.cdc.ChangeFeed.diff(s1, s2, Seq("id"), "lsn", Seq("value"))
          .select(col("id"), col("change_op"), col("before_lsn"), col("after_lsn"),
            col("before_value"), col("after_value"))
          .orderBy(col("id"))
      },
      Some(
        """WITH log AS (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value FROM events),
          |s1 AS (SELECT id, lsn, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
          |  FROM log WHERE lsn < (SELECT count(*) // 2 FROM events)) t
          |  WHERE rn = 1 AND op <> 'd'),
          |s2 AS (SELECT id, lsn, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
          |  FROM log) t WHERE rn = 1 AND op <> 'd')
          |SELECT coalesce(s2.id, s1.id) AS id,
          |  CASE WHEN s1.lsn IS NULL THEN 'i'
          |       WHEN s2.lsn IS NULL THEN 'd' ELSE 'u' END AS change_op,
          |  s1.lsn AS before_lsn, s2.lsn AS after_lsn,
          |  s1.value AS before_value, s2.value AS after_value
          |FROM s1 FULL OUTER JOIN s2 ON s1.id = s2.id
          |WHERE s1.lsn IS NULL OR s2.lsn IS NULL OR s1.lsn <> s2.lsn
          |ORDER BY id""".stripMargin)),

    // INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view use the
    // change feed exists for: a downstream per-bucket (sum, count) is
    // maintained by applying the feed's (after − before) deltas to the
    // mid-state aggregate instead of re-reading the table — at 100 TB
    // the difference between touching changed keys and re-scanning
    // everything. The oracle RECOMPUTES the same aggregate from the
    // final state, so the driver value-checks maintained == recomputed
    // (sums ride DECIMAL(18,4) — order-independent, exact; count moves
    // by inserts − deletes). Plan: two latest-wins windows + the feed's
    // full-outer key join feed bucket-sized aggregates; the maintained
    // side never re-aggregates the unchanged keys.
    GQuery(
      "q_cdc_incr_agg",
      (s, dir) => {
        val dec4 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,4)")
        val zero = lit(0).cast("decimal(18,4)")
        val log = cdcLog(s, dir)
        val mid = Tables.events(s, dir).count() / 2
        val s1 = CdcMerge.snapshot(log.filter(col("lsn") < mid), Seq("id"), Seq("lsn"))
        val s2 = CdcMerge.snapshot(log, Seq("id"), Seq("lsn"))
        val base = s1.groupBy(pmod(col("id"), lit(8L)).as("bucket"))
          .agg(sum(dec4(col("value"))).as("total"), count(lit(1)).as("n"))
        val deltas = graft.cdc.ChangeFeed.diff(s1, s2, Seq("id"), "lsn", Seq("value"))
          .groupBy(pmod(col("id"), lit(8L)).as("bucket"))
          .agg(
            sum(coalesce(dec4(col("after_value")), zero)
              - coalesce(dec4(col("before_value")), zero)).as("dt"),
            sum(when(col("change_op") === "i", 1L)
              .when(col("change_op") === "d", -1L).otherwise(0L)).as("dn"))
        base.join(deltas, Seq("bucket"), "full")
          .select(col("bucket"),
            dround(coalesce(col("total"), zero) + coalesce(col("dt"), zero)).as("total"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
          .orderBy(col("bucket"))
      },
      Some(
        """WITH s2 AS (SELECT id, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |  WHERE rn = 1 AND op <> 'd')
          |SELECT id % 8 AS bucket,
          |  round(CAST(sum(value::DECIMAL(18,4)) AS DOUBLE), 4) AS total,
          |  count(*) AS n
          |FROM s2 GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // INCREMENTAL JOIN-VIEW MAINTENANCE — the enriched-view twin of
    // q_cdc_incr_agg: a materialized view V = snapshot ⋈ customer-dim
    // is maintained under a CDC batch by touching ONLY the batch's
    // keys: (1) the view's raw state columns ride along precisely so
    // the prior state of affected keys reads from V, never the base
    // table; (2) merged-affected rows re-join the dim; (3) unchanged
    // view rows carry via an anti-join. At 100 TB maintenance cost is
    // ∝ batch keys (an id-keyed semi/anti exchange over the view + a
    // dim join of batch-sized rows), never view size — the oracle
    // recomputes from scratch, so the driver checks maintained ==
    // recomputed. The dim join is NOT hint-forced: customer is
    // SF-scaled, so the planner picks broadcast at gate SF and a
    // co-partitioned hash join beyond (the q_tpch_q5 rule).
    GQuery(
      "q_cdc_incr_join",
      (s, dir) => {
        val log = cdcLog(s, dir)
        val mid = Tables.events(s, dir).count() / 2
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey").as("id"), col("c_name"), col("c_nationkey"))
        val s1 = CdcMerge.snapshot(log.filter(col("lsn") < mid), Seq("id"), Seq("lsn"))
        val v0 = s1.join(dim, Seq("id"), "left") // the materialized view state
        val delta = log.filter(col("lsn") >= mid)
        val affected = delta.select(col("id")).distinct()
        val prior = v0.join(affected, Seq("id"), "left_semi")
          .select(col("id"), col("lsn"), col("op"), col("value"))
        val merged = CdcMerge.upsert(prior, delta, Seq("id"), Seq("lsn"))
        v0.join(affected, Seq("id"), "left_anti")
          .unionByName(merged.join(dim, Seq("id"), "left"))
          .select(col("id"), col("lsn"),
            dround(col("value").cast("decimal(18,4)")).as("value"),
            col("c_name"), col("c_nationkey"))
          .orderBy(col("id"))
      },
      Some(
        """WITH s2 AS (SELECT id, lsn, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |  WHERE rn = 1 AND op <> 'd')
          |SELECT s2.id, s2.lsn,
          |  round(CAST(s2.value::DECIMAL(18,4) AS DOUBLE), 4) AS value,
          |  c.c_name, c.c_nationkey
          |FROM s2 LEFT JOIN customer c ON c.c_custkey = s2.id
          |ORDER BY id""".stripMargin)),

    // INCREMENTAL TOP-K VIEW MAINTENANCE — the RANK member completing
    // the view-maintenance trio (q_cdc_incr_agg aggregates by deltas,
    // q_cdc_incr_join enriches by keys, this one re-ranks by groups):
    // a materialized per-bucket top-3-by-value leaderboard absorbs a
    // CDC batch by touching ONLY the buckets the batch's keys land in.
    // Rank views are NOT self-maintainable — an update can demote a
    // ranked row and promote one the view never stored — so the
    // correct (and standard) maintenance bound is GROUP-scoped
    // recompute: affected buckets re-rank from their full base-state
    // slice (semi-join on the broadcast affected-bucket set), while
    // every unaffected bucket's view rows carry via anti-join without
    // being read, let alone re-sorted. At 100 TB maintenance cost is
    // ∝ touched groups × group size, never view or table size; the
    // oracle recomputes the leaderboard from the final state, so the
    // driver checks maintained == recomputed.
    GQuery(
      "q_cdc_incr_topk",
      (s, dir) => {
        val log = cdcLog(s, dir)
        val mid = Tables.events(s, dir).count() / 2
        val bucket = pmod(col("id"), lit(8L)).as("bucket")
        val wRank = Window.partitionBy(col("bucket"))
          .orderBy(col("value").desc, col("id"))
        def top3(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("bucket", pmod(col("id"), lit(8L)))
          .withColumn("rk", row_number().over(wRank))
          .filter(col("rk") <= 3)
        val s1 = CdcMerge.snapshot(log.filter(col("lsn") < mid), Seq("id"), Seq("lsn"))
        val v0 = top3(s1) // the materialized leaderboard state
        val delta = log.filter(col("lsn") >= mid)
        val affected = delta.select(bucket).distinct()
        val priorFull = s1.withColumn("bucket", pmod(col("id"), lit(8L)))
          .join(affected, Seq("bucket"), "left_semi")
          .select(col("id"), col("lsn"), col("op"), col("value"))
        val merged = CdcMerge.upsert(priorFull, delta, Seq("id"), Seq("lsn"))
        v0.join(affected, Seq("bucket"), "left_anti")
          .unionByName(top3(merged))
          .select(col("bucket"), col("rk"), col("id"), col("lsn"),
            dround(col("value").cast("decimal(18,4)")).as("value"))
          .orderBy(col("bucket"), col("rk"))
      },
      Some(
        """WITH s2 AS (SELECT id, lsn, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |  WHERE rn = 1 AND op <> 'd'),
          |r AS (SELECT id % 8 AS bucket, id, lsn, value,
          |        row_number() OVER (PARTITION BY id % 8
          |                           ORDER BY value DESC, id) AS rk
          |      FROM s2)
          |SELECT bucket, CAST(rk AS INT) AS rk, id, lsn,
          |  round(CAST(value::DECIMAL(18,4) AS DOUBLE), 4) AS value
          |FROM r WHERE rk <= 3 ORDER BY bucket, rk""".stripMargin)),

    // SCD Type-2 history materialization — the OTHER standard consumer
    // of a CDC feed (reference README.md:300-307 materializes latest-
    // wins; a warehouse dimension keeps every version): each non-delete
    // event opens a version at its LSN, the key's next event (update OR
    // delete) closes it, the open version is flagged current. ONE
    // window shuffle on the record key — lead(lsn) over the per-key
    // LSN order is the entire algorithm, so the plan is a single
    // exchange + sort regardless of corpus size, and at 100 TB the key
    // partitioning is the same one the upsert path already uses.
    // Delete events participate in the lead() (they close the prior
    // version) but emit no row themselves.
    GQuery(
      "q_cdc_scd2",
      (s, dir) => {
        val w = Window.partitionBy(col("id")).orderBy(col("lsn"))
        cdcLog(s, dir)
          .withColumn("valid_to_raw", lead(col("lsn"), 1).over(w))
          .filter(col("op") =!= "d")
          .select(col("id"), col("lsn").as("valid_from"),
            coalesce(col("valid_to_raw"), lit(-1L)).as("valid_to"),
            when(col("valid_to_raw").isNull, 1).otherwise(0).as("is_current"),
            dround(col("value").cast("decimal(18,4)")).as("value"))
          .orderBy(col("id"), col("valid_from"))
      },
      Some(
        """WITH log AS (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value
          |  FROM events),
          |v AS (
          |  SELECT id, lsn AS valid_from,
          |    lead(lsn) OVER (PARTITION BY id ORDER BY lsn) AS valid_to_raw,
          |    op, value
          |  FROM log)
          |SELECT id, valid_from, coalesce(valid_to_raw, -1) AS valid_to,
          |  CASE WHEN valid_to_raw IS NULL THEN 1 ELSE 0 END AS is_current,
          |  round(CAST(value AS DECIMAL(18,4))::DOUBLE, 4) AS value
          |FROM v WHERE op <> 'd'
          |ORDER BY id, valid_from""".stripMargin)),

    // File-group-level COW under the same latest-wins oracle: the log
    // replayed through hash-bucketed partial commits (only touched file
    // groups rewrite, clean buckets carry by manifest reference — the
    // Hudi record-key-index upsert granularity) must read back to the
    // identical one-shot collapse. The manifest-resolved multi-path
    // scan is the timed query; FileGroupsSpec pins the
    // only-dirty-buckets-rewrite property itself.
    GQuery(
      "q_cdc_filegroup_upsert",
      (s, dir) => {
        graft.cdc.FileGroups.read(s, fileGroupTable(s, dir)).get
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(latestWinsSql)),

    // SQL-SURFACE catalog read — the reference's end product is a
    // CATALOG-queryable table (Glue-synced, README.md:298-304), and
    // this is that experience on the file-group store: a DSv2
    // TableCatalog (sources/FileGroupCatalog) registered by config,
    // then plain `SELECT … FROM graft_cdc.employees` — same fixture,
    // same latest-wins oracle as the Scala-API read above, so the two
    // doors are pinned value-identical. Underneath it is Spark's own
    // ParquetScan over exactly the manifest-referenced files (column
    // pruning + filter pushdown native), record-key predicates prune
    // file groups from the manifest index (FileGroupCatalogSpec pins
    // the 1-bucket plan + `VERSION AS OF`), and the catalog is
    // read-only (writes stay on the crash-safe commit protocol).
    GQuery(
      "q_cdc_sql_read",
      (s, dir) => {
        registerCdcCatalog(s, fileGroupTable(s, dir).stripSuffix("/employees"))
        s.sql("SELECT id, lsn, op, value FROM graft_cdc.employees ORDER BY id")
      },
      Some(latestWinsSql)),

    // SQL-SURFACE MERGE — the write half of the catalog door: standard
    // `MERGE INTO` syntax on a graft_cdc table, lowered by the
    // GraftExtensions post-hoc analyzer rule onto the crash-safe
    // FileGroups.commit protocol (sources/FileGroupMerge.scala) — the
    // DSv2 write surface itself stays blocked, so every mutation still
    // rides the versioned manifest + atomic marker. The statement
    // exercises all three clauses (conditional DELETE, UPDATE,
    // conditional INSERT) against a source derived from events; the
    // DuckDB oracle replays the identical merge relationally over
    // base + src. Scale: ONE left-outer join of the batch-sized source
    // against the snapshot + a batch-sized cardinality guard, then
    // commit rewrites only the file groups the change batch touches —
    // the Hudi/Delta merge shape.
    GQuery(
      "q_cdc_sql_merge",
      (s, dir) => {
        registerCdcCatalog(s, mergeTableRoot(s, dir), "graft_cdcm")
        s.sql(
          s"""MERGE INTO graft_cdcm.employees t
             |USING (SELECT user_id + 7 AS id,
             |              CAST((SELECT max(event_id) + 1
             |                    FROM parquet.`$dir/events.parquet`) + user_id AS BIGINT) AS lsn,
             |              max(value) AS value
             |       FROM parquet.`$dir/events.parquet` GROUP BY user_id) s
             |ON t.id = s.id
             |WHEN MATCHED AND s.value < 0.5 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET value = s.value, lsn = s.lsn, op = 'u'
             |WHEN NOT MATCHED AND s.value >= 0.5 THEN
             |  INSERT (id, lsn, op, value) VALUES (s.id, s.lsn, 'c', s.value)
             |""".stripMargin)
        s.sql("SELECT id, lsn, value FROM graft_cdcm.employees ORDER BY id")
      },
      Some(
        """WITH base AS (
          |  SELECT id, lsn, op, value FROM (
          |    SELECT user_id AS id, event_id AS lsn,
          |      CASE WHEN event_id % 11 = 0 THEN 'd'
          |           WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |      value,
          |      row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |    FROM events) t
          |  WHERE rn = 1 AND op <> 'd'
          |), src AS (
          |  SELECT user_id + 7 AS id,
          |         CAST((SELECT max(event_id) + 1 FROM events) + user_id AS BIGINT) AS lsn,
          |         max(value) AS value
          |  FROM events GROUP BY user_id
          |)
          |SELECT id, lsn, value FROM (
          |  SELECT b.id, COALESCE(s.lsn, b.lsn) AS lsn, COALESCE(s.value, b.value) AS value
          |  FROM base b
          |  LEFT JOIN (SELECT * FROM src WHERE value >= 0.5) s ON b.id = s.id
          |  WHERE NOT EXISTS (SELECT 1 FROM src d WHERE d.value < 0.5 AND d.id = b.id)
          |  UNION ALL
          |  SELECT s2.id, s2.lsn, s2.value
          |  FROM src s2
          |  WHERE s2.value >= 0.5
          |    AND NOT EXISTS (SELECT 1 FROM base b2 WHERE b2.id = s2.id)
          |) ORDER BY id""".stripMargin)),

    // SQL-SURFACE UPDATE + DELETE — the rest of the DML triad on the
    // catalog door (same post-hoc lowering as MERGE, strictly simpler
    // batches): UPDATE's hit rows with assignments applied become an
    // upsert batch (ord ties break toward the batch), DELETE's hit
    // rows become op='d' CDC deletes; both land as crash-safe
    // versioned commits touching only the hit keys' file groups, and a
    // key-equality WHERE even builds its batch from a file-group-
    // pruned scan (the catalog scan builder's manifest cut). Both
    // statements are value-idempotent (SET from key-derived constants,
    // delete-of-deleted = empty batch), so the persisted fixture stays
    // oracle-stable across repeated runs; FileGroupMergeSpec pins op
    // semantics and the record-key-update rejection on a fresh table.
    GQuery(
      "q_cdc_sql_dml",
      (s, dir) => {
        registerCdcCatalog(s, dmlTableRoot(s, dir), "graft_cdcd")
        s.sql(
          """UPDATE graft_cdcd.employees
            |SET value = CAST(id AS DOUBLE) / 1000, op = 'u'
            |WHERE id % 10 = 3""".stripMargin)
        s.sql("DELETE FROM graft_cdcd.employees WHERE id % 13 = 0")
        s.sql("SELECT id, lsn, value FROM graft_cdcd.employees ORDER BY id")
      },
      Some(
        """SELECT id, lsn,
          |  CASE WHEN id % 10 = 3 THEN CAST(id AS DOUBLE) / 1000 ELSE value END AS value
          |FROM (
          |  SELECT id, lsn, op, value FROM (
          |    SELECT user_id AS id, event_id AS lsn,
          |      CASE WHEN event_id % 11 = 0 THEN 'd'
          |           WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |      value,
          |      row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |    FROM events) t
          |  WHERE rn = 1 AND op <> 'd'
          |) base
          |WHERE NOT (id % 13 = 0)
          |ORDER BY id""".stripMargin)),

    // SQL-SURFACE MAINTENANCE — the operations half of the catalog
    // door: Spark 4 DSv2 procedures (`CALL`, SPARK-44167) binding the
    // store's table services to SQL the way Hudi ships its CLI surface
    // as SQL procedures (sources/FileGroupProcedures.scala —
    // show_commits / create_savepoint / release_savepoint / rollback /
    // purge_keys, each a thin wrapper over the existing crash-safe
    // Scala service, so the two doors cannot diverge). The statement
    // sequence pins a version, ROLLS THE TABLE BACK to it (removing
    // the commit above — the value-bearing op: the snapshot returns to
    // the two-batch prefix), releases the pin, and reads the restored
    // state through the same catalog. Re-runs are a fixpoint (rollback
    // of the head removes nothing). All driver-side manifest/marker
    // metadata — nothing here scales with table size.
    GQuery(
      "q_cdc_sql_maintain",
      (s, dir) => {
        registerCdcCatalog(s, maintTableRoot(s, dir), "graft_cdct")
        s.sql("CALL graft_cdct.create_savepoint(table => 'employees', version => 1)")
        s.sql("CALL graft_cdct.rollback(table => 'employees', version => 1)")
        s.sql("CALL graft_cdct.release_savepoint(table => 'employees', version => 1)")
        s.sql("SELECT id, lsn, op, value FROM graft_cdct.employees ORDER BY id")
      },
      Some(
        """WITH cut AS (SELECT (4 * count(*)) // 5 AS c2 FROM events)
          |SELECT id, lsn, op, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events WHERE event_id < (SELECT c2 FROM cut)) t
          |WHERE rn = 1 AND op <> 'd' ORDER BY id""".stripMargin)),

    // SQL-SURFACE DDL — the lifecycle bookends on the catalog door
    // (round 17): DROP TABLE is a guarded recursive delete (only a
    // COMMITTED file-group table deletes; a typo'd name can never
    // remove unrelated data), and CREATE TABLE ... AS SELECT lowers to
    // the table's FIRST versioned commit (schema + stats/blooms +
    // #keys/#ord manifest headers through the same crash-safe protocol
    // as streaming ingest — no DSv2 staging write). The timed body
    // exercises BOTH: drop the previous run's table, CTAS the per-user
    // latest-event summary, read it back through the catalog. Scale:
    // CTAS cost = one pass over the query result (a first commit's
    // price); DROP is driver-side metadata + dir removal.
    GQuery(
      "q_cdc_sql_ddl",
      (s, dir) => {
        val root = cachedFixture(s"graft_fgddl_root_v1_${sfFingerprint(dir)}")(_ => ())
        registerCdcCatalog(s, root, "graft_cdcddl")
        s.sql("DROP TABLE IF EXISTS graft_cdcddl.snap")
        s.sql(
          s"""CREATE TABLE graft_cdcddl.snap TBLPROPERTIES('keys'='id', 'ord'='lsn')
             |AS SELECT user_id AS id, max(event_id) AS lsn, max(value) AS value
             |FROM parquet.`$dir/events.parquet` GROUP BY user_id""".stripMargin)
        s.sql("SELECT id, lsn, value FROM graft_cdcddl.snap ORDER BY id")
      },
      Some(
        """SELECT user_id AS id, max(event_id) AS lsn, max(value) AS value
          |FROM events GROUP BY user_id ORDER BY id""".stripMargin)),

    // SQL-SURFACE INCREMENTAL CHANGE FEED (round 18) — the Hudi-family
    // consumer shape through plain SQL: `FROM graft_table_changes(
    // 'graft_cdc.employees', v1, v2)` is a TABLE-VALUED function
    // (sources/TableChanges.scala, registered by GraftExtensions the
    // way Hudi ships hudi_table_changes and Delta ships table_changes)
    // returning the key-level diff of two RETAINED versions as a
    // DISTRIBUTED plan SQL composes over — the downstream "give me
    // what changed since my last pull" without a JVM or a full
    // re-read. Underneath: ChangeFeed.diff's ONE full-outer shuffle
    // join on the record key of the two manifest-resolved snapshots
    // (both sides file-group-bucketed on that key); an aged-out `from`
    // version fails loudly with the re-bootstrap hint, never a diff
    // against the wrong base. Versions 1→2 of the 3-commit lifecycle =
    // the lsn<4n/5 prefix diffed against the full collapse, which the
    // DuckDB oracle replays as window SQL + FULL OUTER JOIN.
    GQuery(
      "q_cdc_sql_changefeed",
      (s, dir) => {
        registerCdcCatalog(s, fileGroupTable(s, dir).stripSuffix("/employees"))
        s.sql(
          """SELECT id, change_op, before_lsn, after_lsn, before_value, after_value
            |FROM graft_table_changes('graft_cdc.employees', 1, 2) ORDER BY id""".stripMargin)
      },
      Some(
        """WITH log AS (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value FROM events),
          |s1 AS (SELECT id, lsn, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
          |  FROM log WHERE lsn < (SELECT count(*) * 4 // 5 FROM events)) t
          |  WHERE rn = 1 AND op <> 'd'),
          |s2 AS (SELECT id, lsn, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
          |  FROM log) t WHERE rn = 1 AND op <> 'd')
          |SELECT coalesce(s2.id, s1.id) AS id,
          |  CASE WHEN s1.lsn IS NULL THEN 'i'
          |       WHEN s2.lsn IS NULL THEN 'd' ELSE 'u' END AS change_op,
          |  s1.lsn AS before_lsn, s2.lsn AS after_lsn,
          |  s1.value AS before_value, s2.value AS after_value
          |FROM s1 FULL OUTER JOIN s2 ON s1.id = s2.id
          |WHERE s1.lsn IS NULL OR s2.lsn IS NULL OR s1.lsn <> s2.lsn
          |ORDER BY id""".stripMargin)),

    // SQL-SURFACE SCHEMA EVOLUTION (round 18) — `ALTER TABLE ... ADD
    // COLUMNS` lowered to a METADATA-ONLY schema-widening commit
    // (FileGroups.widenSchema through the catalog's alterTable): a new
    // version whose manifest carries the widened schema, every data
    // file carried forward by reference, the added column reading as
    // typed NULLs until data lands (the manifest-typed ParquetScan
    // null-fills missing parquet columns natively — zero data IO for
    // the DDL itself, the Delta/Iceberg metadata-evolution posture).
    // The body exercises the full lifecycle: CTAS → ALTER → UPDATE
    // backfilling HALF the rows through the widened column → read, so
    // the value gate pins both the null-fill of untouched rows and the
    // mixed-schema reconcile (buckets with and without the column in
    // one scan). DROP+recreate per run keeps it a fixpoint.
    GQuery(
      "q_cdc_sql_alter",
      (s, dir) => {
        val root = cachedFixture(s"graft_fgalter_root_v1_${sfFingerprint(dir)}")(_ => ())
        registerCdcCatalog(s, root, "graft_cdcalt")
        s.sql("DROP TABLE IF EXISTS graft_cdcalt.snap")
        s.sql(
          s"""CREATE TABLE graft_cdcalt.snap TBLPROPERTIES('keys'='id', 'ord'='lsn')
             |AS SELECT user_id AS id, max(event_id) AS lsn, max(value) AS value
             |FROM parquet.`$dir/events.parquet` GROUP BY user_id""".stripMargin)
        s.sql("ALTER TABLE graft_cdcalt.snap ADD COLUMNS (tier STRING)")
        s.sql(
          """UPDATE graft_cdcalt.snap
            |SET tier = CASE WHEN value > 0.5 THEN 'high' ELSE 'low' END
            |WHERE id % 2 = 0""".stripMargin)
        s.sql("SELECT id, lsn, value, tier FROM graft_cdcalt.snap ORDER BY id")
      },
      Some(
        """SELECT user_id AS id, max(event_id) AS lsn, max(value) AS value,
          |  CASE WHEN user_id % 2 = 0
          |       THEN (CASE WHEN max(value) > 0.5 THEN 'high' ELSE 'low' END)
          |       ELSE NULL END AS tier
          |FROM events GROUP BY user_id ORDER BY id""".stripMargin)),

    // POINT LOOKUP through the oracle gate: the record-key-index read
    // path (Hudi metadata-table / bloom-index serve shape) — each
    // probed key resolves to its hash bucket, [min,max] stats drop
    // buckets that can't hold it, and ONLY the surviving file groups
    // are scanned: at 100 TB the read is ~1 file group per probed key,
    // never the table (FileGroupsSpec pins the pruning itself; this
    // entry pins the VALUES — the pruned read must equal the full
    // latest-wins collapse restricted to the probes, including absent
    // and deleted keys returning nothing).
    GQuery(
      "q_cdc_point_lookup",
      (s, dir) => {
        graft.cdc.FileGroups.pointLookup(s, fileGroupTable(s, dir), Seq("id"),
            probes = (1L to 10L)).get
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT id, lsn, op, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |WHERE rn = 1 AND op <> 'd' AND id BETWEEN 1 AND 10 ORDER BY id""".stripMargin)),

    // STRING-KEY POINT LOOKUP through the oracle gate — the UUID-PK
    // Debezium shape on the generalized manifest index: probes are key
    // TUPLES cast to the committed type, pruning = hash bucket + key
    // bloom (no [lo,hi] stats for strings — bucket+bloom alone cut to
    // ~1 file group per probe, and the absent probe costs zero data
    // IO). Values must equal the latest-wins collapse restricted to
    // the probed string keys; FileGroupsSpec pins the pruning itself.
    GQuery(
      "q_cdc_lookup_string",
      (s, dir) => {
        val probes = (1L to 10L).map(i => Seq[Any](s"u$i")) :+ Seq[Any]("u-absent")
        graft.cdc.FileGroups.pointLookupTuples(s, fileGroupTableStr(s, dir), Seq("id"), probes).get
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT id, lsn, op, value FROM (
          |  SELECT concat('u', user_id) AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |WHERE rn = 1 AND op <> 'd'
          |  AND id IN ('u1','u2','u3','u4','u5','u6','u7','u8','u9','u10')
          |ORDER BY id""".stripMargin)),

    // STRING-KEY SQL READ — the same string-keyed table through the
    // DSv2 catalog door: a fully-literal string IN list reaches the
    // scan builder as UTF8String probes and prunes to the probed
    // buckets (FileGroupCatalogSpec pins the 1-path plan); the oracle
    // is the identical collapse, so the pruned SQL read and the Scala
    // tuple lookup above are pinned value-equal.
    GQuery(
      "q_cdc_sql_read_string",
      (s, dir) => {
        registerCdcCatalog(s, fileGroupTableStr(s, dir).stripSuffix("/employees"), "graft_cdcs")
        s.sql(
          """SELECT id, lsn, op, value FROM graft_cdcs.employees
            |WHERE id IN ('u1','u2','u3','u4','u5','u6','u7','u8','u9','u10')
            |ORDER BY id""".stripMargin)
      },
      Some(
        """SELECT id, lsn, op, value FROM (
          |  SELECT concat('u', user_id) AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |WHERE rn = 1 AND op <> 'd'
          |  AND id IN ('u1','u2','u3','u4','u5','u6','u7','u8','u9','u10')
          |ORDER BY id""".stripMargin)),

    // COMPOSITE-KEY SQL READ — the same (id, region) table through the
    // catalog door with EVERY key column equality-constrained: the
    // scan builder forms the 10×5 cross-product tuple probes (≤ the
    // 256 cap) and prunes file groups from the manifest index, keys
    // resolved from the #keys header (no catalog conf at all).
    // region IN (0..4) is a tautology under region = id % 5, so the
    // oracle is the collapse restricted to the probed ids — the
    // pruned read must lose nothing to the tuple cut.
    GQuery(
      "q_cdc_sql_read_composite",
      (s, dir) => {
        registerCdcCatalog(s, fileGroupTableComp(s, dir).stripSuffix("/orders"), "graft_cdcc")
        s.sql(
          """SELECT id, CAST(region AS BIGINT) AS region, lsn, op, value
            |FROM graft_cdcc.orders
            |WHERE id IN (1,2,3,4,5,6,7,8,9,10) AND region IN (0,1,2,3,4)
            |ORDER BY id""".stripMargin)
      },
      Some(
        """SELECT id, region, lsn, op, value FROM (
          |  SELECT user_id AS id, user_id % 5 AS region, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |WHERE rn = 1 AND op <> 'd' AND id BETWEEN 1 AND 10
          |ORDER BY id""".stripMargin)),

    // COMPOSITE-KEY POINT LOOKUP — record identity (id, region): the
    // index hashes and blooms the WHOLE tuple, so a probe prunes on
    // both halves at once, and a tuple with the wrong second half
    // returns nothing (the deliberate 11th probe below). Values equal
    // the collapse restricted to the 10 correct tuples; region rides
    // as BIGINT to match the oracle's arithmetic type.
    GQuery(
      "q_cdc_lookup_composite",
      (s, dir) => {
        val probes = (1L to 10L).map(i => Seq[Any](i, (i % 5).toInt)) :+
          Seq[Any](3L, ((3 + 1) % 5).toInt) // wrong-region tuple: no rows
        graft.cdc.FileGroups.pointLookupTuples(
            s, fileGroupTableComp(s, dir), Seq("id", "region"), probes).get
          .select(col("id"), col("region").cast("long").as("region"),
            col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT id, region, lsn, op, value FROM (
          |  SELECT user_id AS id, user_id % 5 AS region, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |WHERE rn = 1 AND op <> 'd' AND id BETWEEN 1 AND 10
          |ORDER BY id""".stripMargin)),

    // HARD PURGE through the oracle gate — right-to-be-forgotten on the
    // file-group table: purged keys must vanish from the CURRENT state
    // AND from every retained version (manifests, savepoints and
    // unreferenced data dirs dropped — a plain delete commit would let
    // time travel resurrect the rows). The rewrite touches only the
    // buckets whose stats+bloom admit a purged key; FileGroupsSpec pins
    // the history-is-gone half, this entry pins the surviving VALUES:
    // the post-purge snapshot equals the latest-wins collapse minus the
    // purged ids.
    GQuery(
      "q_cdc_purge",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_fgpurge_cache_v1_$sfKey") { root =>
          val log = cdcLog(s, dir)
          val Seq(c1, c2) = {
            val n = Tables.events(s, dir).count()
            Seq(n * 2 / 5, n * 4 / 5)
          }
          val t = root + "/table"
          graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") < c1), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
          graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c1 && col("lsn") < c2), 1L, Seq("id"), Seq("lsn"))
          graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= c2), 2L, Seq("id"), Seq("lsn"))
          graft.cdc.FileGroups.purgeKeys(s, t, Seq("id"), (1L to 5L), 3L)
          ()
        }
        graft.cdc.FileGroups.read(s, root + "/table").get
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT id, lsn, op, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |WHERE rn = 1 AND op <> 'd' AND id NOT BETWEEN 1 AND 5
          |ORDER BY id""".stripMargin)),

    // BLOOM-INDEX TAGGING through the oracle gate: the Hudi BLOOM-index
    // step (the reference DeltaStreamer's default hoodie.index.type)
    // every upsert batch pays — classify each incoming key update-vs-
    // insert BEFORE routing records to file groups. Per-file-group key
    // blooms + [min,max] stats in the manifest answer the negative
    // probes from index metadata alone (the five absent keys below cost
    // zero data-file reads — FileGroupsSpec pins that); only candidate
    // keys' groups are scanned to squeeze out bloom false positives, so
    // the tags are EXACT and the oracle is plain existence in the
    // latest-wins collapse. At 100 TB: a batch probing k keys touches
    // ≤ k file groups, never the table.
    GQuery(
      "q_cdc_bloom_index",
      (s, dir) => {
        val probes = (1L to 30L) ++ (1000001L to 1000005L)
        graft.cdc.FileGroups.tagKeys(s, fileGroupTable(s, dir), Seq("id"), probes).get
          .orderBy(col("id"))
      },
      Some(
        """WITH probes AS (
          |  SELECT range AS id FROM range(1, 31)
          |  UNION ALL SELECT range FROM range(1000001, 1000006)),
          |latest AS (SELECT id FROM (
          |  SELECT user_id AS id,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t WHERE rn = 1 AND op <> 'd')
          |SELECT p.id, CASE WHEN l.id IS NOT NULL THEN 'update' ELSE 'insert' END AS tag
          |FROM probes p LEFT JOIN latest l USING (id) ORDER BY id""".stripMargin)),

    // SCHEMA DRIFT (U6) through the oracle gate: the second half of the
    // log arrives with a NEW column (value2) the table never had;
    // upsert's unionByName(allowMissingColumns) reconciliation (Hudi
    // reconcile.schema, reference README.md:308) must land the widened
    // schema with NULLs for pre-drift rows — keys whose surviving
    // version predates the drift read NULL value2, keys updated after
    // it read the derived value, and the oracle reproduces exactly that
    // from the final per-key LSN. Same one-key-shuffle merge plan as
    // q_cdc_incremental.
    GQuery(
      "q_cdc_schema_drift",
      (s, dir) => {
        val log = cdcLog(s, dir)
        val mid = Tables.events(s, dir).count() / 2
        val s1 = CdcMerge.snapshot(log.filter(col("lsn") < mid), Seq("id"), Seq("lsn"))
        val batch2 = log.filter(col("lsn") >= mid)
          .withColumn("value2", dround(col("value").cast("decimal(18,4)") * 2))
        CdcMerge.upsert(s1, batch2, Seq("id"), Seq("lsn"))
          .select(col("id"), col("lsn"), col("op"),
            dround(col("value").cast("decimal(18,4)")).as("value"), col("value2"))
          .orderBy(col("id"))
      },
      Some(
        """WITH latest AS (SELECT id, lsn, op, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events) t
          |  WHERE rn = 1 AND op <> 'd'),
          |mid AS (SELECT count(*) // 2 AS m FROM events)
          |SELECT id, lsn, op,
          |  round(CAST(value AS DECIMAL(18,4))::DOUBLE, 4) AS value,
          |  CASE WHEN lsn >= mid.m
          |       THEN round((CAST(value AS DECIMAL(18,4)) * 2)::DOUBLE, 4)
          |       ELSE NULL END AS value2
          |FROM latest, mid ORDER BY id""".stripMargin)),

    // PARTIAL-COLUMN UPDATE merge (U-family; Hudi's
    // PartialUpdateAvroPayload, the DeltaStreamer payload for sources
    // that emit changed-columns-only patches): update ops carry ONE of
    // the two value columns (by lsn parity), NULL meaning "keep
    // existing" — the merge picks each column's latest non-null
    // setting independently, and a delete RESETS history (a later
    // patch rebuilds from nothing; pre-delete columns must not leak —
    // the case a naive latest-wins collapse gets wrong). One record-key
    // exchange end to end: the last-delete watermark is a window max
    // on the same key, the per-column picks are struct-max argmaxes.
    GQuery(
      "q_cdc_partial_update",
      (s, dir) => {
        val log = Tables.events(s, dir).select(
          col("user_id").as("id"),
          col("event_id").as("lsn"),
          when(pmod(col("event_id"), lit(11)) === 0, "d")
            .when(pmod(col("event_id"), lit(3)) === 0, "u")
            .otherwise("c").as("op"),
          when(pmod(col("event_id"), lit(11)) =!= 0 &&
               pmod(col("event_id"), lit(3)) === 0 &&
               pmod(col("event_id"), lit(2)) =!= 0, lit(null))
            .otherwise(col("value")).as("value"),
          when(pmod(col("event_id"), lit(11)) =!= 0 &&
               pmod(col("event_id"), lit(3)) === 0 &&
               pmod(col("event_id"), lit(2)) === 0, lit(null))
            .otherwise(col("event_type")).as("etype"))
        graft.cdc.CdcMerge.snapshotPartial(log, Seq("id"), "lsn",
            Seq("value", "etype"))
          .orderBy(col("id"))
      },
      Some("""WITH log AS (
             |  SELECT user_id AS id, event_id AS lsn,
             |    CASE WHEN event_id % 11 = 0 THEN 'd'
             |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
             |    CASE WHEN event_id % 11 <> 0 AND event_id % 3 = 0
             |              AND event_id % 2 <> 0
             |         THEN NULL ELSE value END AS value,
             |    CASE WHEN event_id % 11 <> 0 AND event_id % 3 = 0
             |              AND event_id % 2 = 0
             |         THEN NULL ELSE event_type END AS etype
             |  FROM events),
             |ld AS (SELECT id, max(lsn) AS dl FROM log WHERE op = 'd' GROUP BY id),
             |live AS (SELECT l.* FROM log l LEFT JOIN ld USING (id)
             |         WHERE dl IS NULL OR l.lsn > dl)
             |SELECT id, max(lsn) AS last_lsn,
             |  arg_max(value, lsn) FILTER (WHERE value IS NOT NULL) AS value,
             |  arg_max(etype, lsn) FILTER (WHERE etype IS NOT NULL) AS etype
             |FROM live GROUP BY id ORDER BY id""".stripMargin)),

    // TIME TRAVEL through the same oracle gate: read the file-group
    // table AS OF the retained prior version (commit 1 of the 3-commit
    // lifecycle = log prefix lsn < 4n/5). The manifest makes the read
    // exact — version 1's file list including clean buckets carried
    // from commit 0 — so the value check pins that a historical read
    // sees precisely the rows that version committed, not a re-merge.
    // Same one-window plan as any snapshot read; the manifest resolve
    // is driver-side metadata, independent of table bytes.
    GQuery(
      "q_cdc_timetravel",
      (s, dir) => {
        val t = fileGroupTable(s, dir)
        val cur = graft.cdc.FileGroups.committedId(s, t).get
        graft.cdc.FileGroups.readAt(s, t, cur - 1).get
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT id, lsn, op, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events
          |  WHERE event_id < (SELECT count(*) * 4 // 5 FROM events)) t
          |WHERE rn = 1 AND op <> 'd' ORDER BY id""".stripMargin)),

    // SAVEPOINT + RESTORE through the value gate (Hudi's `savepoint
    // create` / `savepoint rollback` CLI pair, the last table service
    // next to compaction/clustering/cleaning): the fixture drives a
    // full MOR lifecycle — commit 1 compacted to base v-early,
    // SAVEPOINTED, then two more append+compact cycles whose GC would
    // normally reap that base (the pin is what keeps it restorable),
    // then a markers-first rollback TO the savepointed version that
    // destroys everything above it including pending log deltas. What
    // verify value-checks: the restored table IS the log-prefix state —
    // byte-equal rows to replaying only lsn < 2n/5 — i.e. the pin
    // survived two GC passes and the rollback removed exactly the
    // later commits. Driver-side metadata ops only (markers +
    // listings); the timed read is one base scan.
    GQuery(
      "q_cdc_savepoint_restore",
      (s, dir) => {
        val t = savepointTable(s, dir)
        graft.cdc.MergeOnRead.readMerged(s, t, Seq("id"), Seq("lsn")).get
          .select(col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("id"))
      },
      Some(
        """SELECT id, lsn, op, value FROM (
          |  SELECT user_id AS id, event_id AS lsn,
          |    CASE WHEN event_id % 11 = 0 THEN 'd'
          |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
          |    value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          |  FROM events
          |  WHERE event_id < (SELECT count(*) * 2 // 5 FROM events)) t
          |WHERE rn = 1 AND op <> 'd' ORDER BY id""".stripMargin)),

    // Batch replay of the emulated Kafka topic through the full ingest
    // path (S1-S9 + U1-U3): seeded envelope generation → JSON-lines topic
    // files → parse → latest-wins snapshot. DuckDB-oracled since round
    // 10: the oracle replays the SAME landed topic files (read_json over
    // the fixture path — the engine builds the fixture before the
    // oracle runs) — parse the envelope, latest-wins per id by lsn,
    // apply deletes, project the post-image. An independent second
    // implementation of the whole ingest+merge path over the identical
    // wire bytes; the scalatest golden-snapshot equality stays too.
    GQuery(
      "stream_ingest_e2e",
      (s, dir) => {
        // the generator is fully seeded → the fixture is immutable; cache
        // it across invocations via [[cachedFixture]]. The version
        // component MUST be bumped whenever CdcGen's output changes, or
        // the cache serves stale fixtures — and the oracle SQL below
        // references the same versioned path, so bump BOTH together.
        val topicDir = cachedFixture("graft_e2e_cache_v1_200_3") { root =>
          CdcGen.writeTopicFiles(s, 200, root + "/topic", nBatches = 3)
        } + "/topic"
        Ingest.snapshotFromTopic(s, topicDir)
          .select(col("id"), col("full_name"), col("email"), col("department"),
            col("salary"), col("created_date"))
          .orderBy(col("id"))
      },
      Some("""WITH raw AS (
             |  SELECT value FROM read_json('/tmp/graft_e2e_cache_v1_200_3/topic/*.txt',
             |    format='newline_delimited', columns={'value': 'VARCHAR'})
             |),
             |ev AS (
             |  SELECT
             |    json_extract_string(value, '$.payload.op') AS op,
             |    CAST(json_extract(value, '$.payload.source.lsn') AS BIGINT) AS lsn,
             |    COALESCE(CAST(json_extract(value, '$.payload.after.id') AS INTEGER),
             |             CAST(json_extract(value, '$.payload.before.id') AS INTEGER)) AS id,
             |    json_extract_string(value, '$.payload.after.full_name') AS full_name,
             |    json_extract_string(value, '$.payload.after.email') AS email,
             |    json_extract_string(value, '$.payload.after.department') AS department,
             |    CAST(json_extract(value, '$.payload.after.salary') AS INTEGER) AS salary,
             |    CAST(json_extract(value, '$.payload.after.created_at') AS INTEGER) AS created_at
             |  FROM raw
             |),
             |latest AS (
             |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn FROM ev
             |)
             |SELECT id, full_name, email, department, salary,
             |       DATE '1970-01-01' + created_at AS created_date
             |FROM latest WHERE rn = 1 AND op <> 'd' ORDER BY id""".stripMargin)),

    // MULTI-TABLE ROUTED ingest e2e (the reference's actual shape:
    // README.md:193 subscribes the `debezium1.*` PREFIX, so one stream
    // carries every table of the schema): Ingest.runRouted fans one
    // checkpointed stream into per-table logs + versioned snapshots by
    // topic suffix. The emulated source is one-file-per-micro-batch,
    // so each route sees QUIET batches (files carrying only the other
    // table) — the empty-write rule's routed form runs for real: a
    // quiet table advances no snapshot version and writes no
    // schema-less poison dir. The oracle replays BOTH tables' landed
    // wire bytes independently (read_json over the same fixture files,
    // branch on the topic field, latest-wins per key by lsn, deletes
    // applied) and compares the union of the two normalized snapshots
    // — a second full implementation of the routed ingest+merge path.
    GQuery(
      "stream_route_e2e",
      (s, dir) => {
        import org.apache.spark.sql.types.StructType
        // sf-independent seeded fixture (the stream_ingest_e2e rule):
        // bump the version component together with the oracle's path
        // whenever CdcGen's output changes.
        val root = cachedFixture("graft_route_cache_v1_200_23") { root =>
          CdcGen.writeTopicFiles(s, 200, root + "/topic", nBatches = 3)
          CdcGen.writeDeptTopicFile(root + "/topic/departments.jsonl")
          val q = Ingest.runRouted(s, root + "/topic", root + "/out", root + "/ckpt", Map(
            "employees" -> Ingest.TableRoute(graft.cdc.Envelope.employeesEnvelope),
            "departments" -> Ingest.TableRoute(
              graft.cdc.Envelope.envelope(StructType.fromDDL("dept_id INT, name STRING")),
              keys = Seq("dept_id"))))
          try q.processAllAvailable() finally q.stop()
        }
        val emp = Ingest.readSnapshot(s, root + "/out/employees/snapshot").get
          .select(lit("employees").as("tbl"), col("id").cast("long").as("id"),
            col("full_name").as("name"))
        val dep = Ingest.readSnapshot(s, root + "/out/departments/snapshot").get
          .select(lit("departments").as("tbl"), col("dept_id").cast("long").as("id"),
            col("name"))
        dep.unionByName(emp).orderBy(col("tbl"), col("id"))
      },
      Some("""WITH raw AS (
             |  SELECT value, topic FROM read_json(
             |    ['/tmp/graft_route_cache_v1_200_23/topic/*.txt',
             |     '/tmp/graft_route_cache_v1_200_23/topic/*.jsonl'],
             |    format='newline_delimited', columns={'value': 'VARCHAR', 'topic': 'VARCHAR'})
             |),
             |eev AS (
             |  SELECT
             |    json_extract_string(value, '$.payload.op') AS op,
             |    CAST(json_extract(value, '$.payload.source.lsn') AS BIGINT) AS lsn,
             |    COALESCE(CAST(json_extract(value, '$.payload.after.id') AS BIGINT),
             |             CAST(json_extract(value, '$.payload.before.id') AS BIGINT)) AS id,
             |    json_extract_string(value, '$.payload.after.full_name') AS name
             |  FROM raw WHERE topic = 'debezium1.public.employees'
             |),
             |el AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn FROM eev),
             |emp AS (SELECT 'employees' AS tbl, id, name FROM el WHERE rn = 1 AND op <> 'd'),
             |dev AS (
             |  SELECT
             |    json_extract_string(value, '$.payload.op') AS op,
             |    CAST(json_extract(value, '$.payload.source.lsn') AS BIGINT) AS lsn,
             |    COALESCE(CAST(json_extract(value, '$.payload.after.dept_id') AS BIGINT),
             |             CAST(json_extract(value, '$.payload.before.dept_id') AS BIGINT)) AS id,
             |    json_extract_string(value, '$.payload.after.name') AS name
             |  FROM raw WHERE topic = 'debezium1.public.departments'
             |),
             |dl AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn FROM dev),
             |dep AS (SELECT 'departments' AS tbl, id, name FROM dl WHERE rn = 1 AND op <> 'd')
             |SELECT tbl, id, name FROM (SELECT * FROM dep UNION ALL SELECT * FROM emp) u
             |ORDER BY tbl, id""".stripMargin)),

    // STREAMING INGEST INTO THE FILE-GROUP STORE, READ BACK THROUGH SQL
    // (round 18) — the reference's actual DeltaStreamer semantic in one
    // composed path (README.md:348: a CONTINUOUS CDC stream maintaining
    // the upsert table; README.md:298-304: synced so downstream SQL can
    // query it): a checkpointed stream (FileGroups.run) parses each
    // Kafka-shaped micro-batch and commits it at FILE-GROUP granularity
    // — each trigger rewrites only the hash buckets its batch touches,
    // crash-replay exactly-once by batch id (FileGroupsSpec pins the
    // restart) — and the landed table resolves through the graft_cdc
    // DSv2 catalog like any warehouse table. Before this entry the
    // stream half (stream_ingest_e2e) and the table half
    // (q_cdc_filegroup_upsert, the SQL door) were each oracled but
    // never COMPOSED. The oracle replays the identical landed wire
    // bytes independently in DuckDB (read_json → envelope parse →
    // latest-wins by lsn → deletes applied). At 100 TB the per-trigger
    // cost is ∝ dirty-bucket bytes, never table bytes — the property
    // that makes continuous COW ingest viable; what bench times is the
    // SQL read of the maintained table.
    GQuery(
      "stream_filegroup_e2e",
      (s, dir) => {
        // seeded → immutable fixture (the stream_ingest_e2e cache rule:
        // bump the version component together with the oracle path
        // whenever CdcGen or the FileGroups write path changes)
        val root = cachedFixture("graft_fgstream_cache_v1_200_3") { root =>
          CdcGen.writeTopicFiles(s, 200, root + "/topic", nBatches = 3)
          val q = graft.cdc.FileGroups.run(s, root + "/topic",
            root + "/store/employees", root + "/ckpt")
          try q.processAllAvailable() finally q.stop()
        }
        registerCdcCatalog(s, root + "/store", "graft_cdcs")
        s.sql(
          """SELECT id, full_name, email, department, salary, created_date
            |FROM graft_cdcs.employees ORDER BY id""".stripMargin)
      },
      Some("""WITH raw AS (
             |  SELECT value FROM read_json('/tmp/graft_fgstream_cache_v1_200_3/topic/*.txt',
             |    format='newline_delimited', columns={'value': 'VARCHAR'})
             |),
             |ev AS (
             |  SELECT
             |    json_extract_string(value, '$.payload.op') AS op,
             |    CAST(json_extract(value, '$.payload.source.lsn') AS BIGINT) AS lsn,
             |    COALESCE(CAST(json_extract(value, '$.payload.after.id') AS INTEGER),
             |             CAST(json_extract(value, '$.payload.before.id') AS INTEGER)) AS id,
             |    json_extract_string(value, '$.payload.after.full_name') AS full_name,
             |    json_extract_string(value, '$.payload.after.email') AS email,
             |    json_extract_string(value, '$.payload.after.department') AS department,
             |    CAST(json_extract(value, '$.payload.after.salary') AS INTEGER) AS salary,
             |    CAST(json_extract(value, '$.payload.after.created_at') AS INTEGER) AS created_at
             |  FROM raw
             |),
             |latest AS (
             |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn FROM ev
             |)
             |SELECT id, full_name, email, department, salary,
             |       DATE '1970-01-01' + created_at AS created_date
             |FROM latest WHERE rn = 1 AND op <> 'd' ORDER BY id""".stripMargin)),

    // STREAMING near-dup ingest e2e: documents arrive in 3 micro-batches
    // (doc_id % 3 = arrival order); each batch dedups against the
    // survivors landed so far via the persisted LSH index and appends
    // its own survivors as an index delta (Streams.nearDupIngest — the
    // training-data ingest loop as a checkpointed Structured Streaming
    // pipeline). Unlike stream_ingest_e2e this IS DuckDB-oracled: the
    // oracle replays the sequential gate as chained survivor CTEs over
    // the same band-candidate + exact-Jaccard pair pipeline the other
    // dedup oracles use. The pipeline runs once per sf (cached fixture);
    // what verify hashes and bench times is the landed-corpus read.
    GQuery(
      "stream_dedup_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_sdedup_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir)
          LshIndex.buildEmpty(s, root + "/idx", nBuckets = 16)
          val src = root + "/src"
          docs.filter(pmod(col("doc_id"), lit(3)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.nearDupIngest(
            s.readStream.schema(docs.schema).parquet(src),
            root + "/idx", root + "/out", root + "/ckpt")
          try {
            q.processAllAvailable()
            for (i <- 1 to 2) {
              docs.filter(pmod(col("doc_id"), lit(3)) === i)
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        s.read.parquet(root + "/out")
          .select(col("doc_id"), col("_batch_id").cast("long").as("_batch_id"))
          .orderBy(col("doc_id"))
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
             |cand AS (SELECT DISTINCT a.doc_id AS cid, b.doc_id AS nid
             |         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id <> b.doc_id),
             |pairs AS (SELECT cid, nid FROM (
             |  SELECT cid, nid,
             |    floor(len(list_intersect(x.sh, y.sh))::DOUBLE /
             |          (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) * 10000 + 0.5) / 10000 AS jac
             |  FROM cand JOIN sh x ON x.doc_id = cid JOIN sh y ON y.doc_id = nid) z
             |  WHERE jac >= 0.5),
             |s0 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
             |s1 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id % 3 = 1
             |       AND NOT EXISTS (SELECT 1 FROM pairs p JOIN s0 ON p.cid = s0.doc_id
             |                       WHERE p.nid = d.doc_id)),
             |s01 AS (SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM s1),
             |s2 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id % 3 = 2
             |       AND NOT EXISTS (SELECT 1 FROM pairs p JOIN s01 ON p.cid = s01.doc_id
             |                       WHERE p.nid = d.doc_id))
             |SELECT doc_id, CAST(0 AS BIGINT) AS _batch_id FROM s0
             |UNION ALL SELECT doc_id, CAST(1 AS BIGINT) FROM s1
             |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) FROM s2
             |ORDER BY doc_id""".stripMargin)),

    // STREAMING sketch maintenance e2e: documents arrive in 3
    // micro-batches (doc_id % 3 = arrival order); each batch lands and
    // appends its OWN partial count-min sketch as a delta
    // (Streams.cmsIngest over the persisted graft.ops.CmsSketch store).
    // CMS union is cell-wise addition, so the delta-summed serve equals
    // the one-shot sketch of everything landed — which is exactly what
    // the oracle computes (the batching must be invisible in the
    // values; exactly-once by the delta marker is what makes it so).
    // Serve: exact top-10 corpus terms probed against the summed cells,
    // one-sided error surfaced as `overcount` (q_heavy_hitters_cms's
    // contract through the streaming loop).
    GQuery(
      "stream_cms_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_scms_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir)
          graft.ops.CmsSketch.buildEmpty(s, root + "/idx", d = 4, w = 512)
          val src = root + "/src"
          docs.filter(pmod(col("doc_id"), lit(3)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.cmsIngest(
            s.readStream.schema(docs.schema).parquet(src),
            root + "/idx", root + "/out", root + "/ckpt")
          try {
            q.processAllAvailable()
            for (i <- 1 to 2) {
              docs.filter(pmod(col("doc_id"), lit(3)) === i)
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        val toks = s.read.parquet(root + "/out")
          .select(explode(Text.tokens(col("text"))).as("term"))
          .filter(col("term") =!= "")
        val top10 = toks.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("term")).limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n_exact").desc, col("term"))))
        top10
          .join(graft.ops.CmsSketch.estimate(s, root + "/idx",
            top10.select(col("term"))), Seq("term"))
          .select(col("rk"), col("term"), col("n_exact"), col("est"),
            (col("est") - col("n_exact")).as("overcount"))
          .orderBy(col("rk"))
      },
      Some("""WITH t AS (
             |  SELECT term FROM (
             |    SELECT unnest(string_split(text, ' ')) AS term FROM documents) z
             |  WHERE term <> ''),
             |merged AS (
             |  SELECT r,
             |    ('0x' || substr(md5(r::VARCHAR || ':' || term), 1, 12))::BIGINT % 512 AS b,
             |    count(*)::BIGINT AS cell
             |  FROM t CROSS JOIN range(0, 4) rr(r) GROUP BY 1, 2),
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

    // STREAMING quantile-sketch maintenance e2e — the rank-statistics
    // member of the maintained-sketch loop (stream_cms_e2e is the
    // frequency member): events arrive in 3 micro-batches (event_id %
    // 3 = arrival order); each batch lands and appends its OWN
    // per-event-type bottom-k sample as a delta
    // (Streams.quantileIngest over graft.ops.QuantileSketch). The
    // bottom-k merge law makes the delta-merged serve multiset-EQUAL
    // to the one-shot sketch of everything landed (batching invisible
    // by construction, pinned in QuantileSketchSpec); this query
    // surfaces the q_quantile_sketch contract through the streaming
    // loop: per-scope exact median (DuckDB-replayable) + est_ok, the
    // sketch-median-within-5%-of-range claim as an in-engine boolean,
    // plus the ALL row estimated from the merged cross-scope sketch.
    GQuery(
      "stream_quantile_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_sqnt_cache_v1_$sfKey") { root =>
          val ev = Tables.events(s, dir)
          graft.ops.QuantileSketch.buildEmpty(s, root + "/idx", k = 4096)
          val src = root + "/src"
          ev.filter(pmod(col("event_id"), lit(3)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.quantileIngest(
            s.readStream.schema(ev.schema).parquet(src),
            root + "/idx", root + "/out", root + "/ckpt")
          try {
            q.processAllAvailable()
            for (i <- 1 to 2) {
              ev.filter(pmod(col("event_id"), lit(3)) === i)
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        val landed = s.read.parquet(root + "/out")
          .select(col("event_type").as("scope"), col("value").as("v"))
        val exact = landed.groupBy(col("scope"))
          .agg(expr("percentile(v, 0.5)").as("med"),
            (max(col("v")) - min(col("v"))).as("rng"))
        val flags = exact
          .join(graft.ops.QuantileSketch.quantile(s, root + "/idx", 0.5), "scope")
          .select(col("scope"), dround(col("med")).as("exact_med"),
            (abs(col("est") - col("med")) <= col("rng") * 0.05).as("est_ok"))
        // ALL: re-bottom-k of the merged sketch across scopes (the
        // merge law once more), judged against the global exact median
        val k = graft.ops.QuantileSketch.sampleSize(s, root + "/idx")
        val all = graft.ops.QuantileSketch.sketchRows(s, root + "/idx")
          .withColumn("rm", row_number().over(Window.orderBy(col("h"), col("v"))))
          .filter(col("rm") <= k)
          .agg(expr("percentile(v, 0.5)").as("est"))
          .crossJoin(landed.agg(expr("percentile(v, 0.5)").as("med"),
            (max(col("v")) - min(col("v"))).as("rng")))
          .select(lit("ALL").as("scope"), dround(col("med")).as("exact_med"),
            (abs(col("est") - col("med")) <= col("rng") * 0.05).as("est_ok"))
        flags.unionByName(all).orderBy(col("scope"))
      },
      Some("""SELECT event_type AS scope,
             |  round(CAST(median(value) AS DOUBLE), 4) AS exact_med, TRUE AS est_ok
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 'ALL', round(CAST(median(value) AS DOUBLE), 4), TRUE FROM events
             |ORDER BY scope""".stripMargin)),

    // STREAMING HLL-store maintenance e2e — the cardinality member
    // closing the maintained-sketch loop (stream_cms_e2e frequency,
    // stream_quantile_e2e rank statistics): events arrive in 3
    // micro-batches; each batch lands and appends its OWN
    // per-event-type HLL of the user ids as a delta
    // (Streams.hllIngest over graft.ops.HllStore). HLL union is
    // register-wise max — insertion is order-independent and
    // duplicate-insensitive — so the delta-unioned serve is BIT-EQUAL
    // to the one-shot sketch of everything landed (HllStoreSpec pins
    // estimate equality); this query surfaces the q_agg_hll_merge
    // contract through the streaming loop: per-scope exact distinct
    // users (DuckDB-replayable) + est_ok (estimate within 5% — 3σ of
    // lgK=12), plus the ALL row estimated from the cross-scope union.
    GQuery(
      "stream_hll_e2e",
      (s, dir) => {
        val root = hllStoreFixture(s, dir)
        val landed = s.read.parquet(root + "/out")
          .select(col("event_type").as("scope"), col("user_id").as("key"))
        def ok(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
          (abs(est - exact) <= exact.cast("double") * 0.05).as("est_ok")
        val exact = landed.groupBy(col("scope"))
          .agg(countDistinct(col("key")).as("exact_d"))
        val flags = exact
          .join(graft.ops.HllStore.estimate(s, root + "/idx"), "scope")
          .select(col("scope"), col("exact_d"), ok(col("est"), col("exact_d")))
        val all = graft.ops.HllStore.sketches(s, root + "/idx")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .crossJoin(landed.agg(countDistinct(col("key")).as("exact_d")))
          .select(lit("ALL").as("scope"), col("exact_d"), ok(col("est"), col("exact_d")))
        flags.unionByName(all).orderBy(col("scope"))
      },
      Some("""SELECT event_type AS scope,
             |  count(DISTINCT user_id) AS exact_d, TRUE AS est_ok
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 'ALL', count(DISTINCT user_id), TRUE FROM events
             |ORDER BY scope""".stripMargin)),

    // SERVED sketch intersection — q_agg_hll_intersect's overlap
    // recipe (inclusion–exclusion) answered from the PERSISTED,
    // STREAM-MAINTAINED store instead of in-query sketches: which
    // users both click AND purchase, estimated purely from the
    // HllStore deltas the stream_hll_e2e fixture appended batch by
    // batch. This is the production shape end-to-end — sketches
    // maintained incrementally at ingest time, audience-overlap
    // questions answered later from kilobytes with the raw events
    // never re-scanned on the serve path (the exact twins here are
    // GATE scaffolding over the landed rows). Union is register-wise
    // max over the two scopes' stored sketches; the I-E intersect
    // carries the same compounding-error caveat, in-range because
    // click∩purchase users dominate both segments at every sf.
    GQuery(
      "q_hll_intersect_served",
      (s, dir) => {
        val root = hllStoreFixture(s, dir)
        val sel = graft.ops.HllStore.sketches(s, root + "/idx")
          .filter(col("scope").isin("click", "purchase")).cache()
        def ok(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
          (abs(est - exact) <= exact.cast("double") * 0.05).as("est_ok")
        val landed = s.read.parquet(root + "/out")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type").as("p"), col("user_id").as("c")).distinct().cache()
        val exact = landed.groupBy(col("p")).agg(count(lit(1)).as("exact_d"))
        val flags = sel.join(exact, sel("scope") === exact("p"))
          .select(col("scope"), col("exact_d"),
            ok(hll_sketch_estimate(col("sk")), col("exact_d")))
        val est2 = sel.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_u"),
          sum(hll_sketch_estimate(col("sk"))).as("est_sum"))
        val exU = landed.agg(countDistinct(col("c")).as("ex_u"))
        val exI = landed.groupBy(col("c")).agg(count(lit(1)).as("k"))
          .filter(col("k") === 2).agg(count(lit(1)).as("ex_i"))
        val unionRow = est2.crossJoin(exU).select(
          lit("UNION").as("scope"), col("ex_u").as("exact_d"), ok(col("est_u"), col("ex_u")))
        val interRow = est2.crossJoin(exI).select(
          lit("INTERSECT").as("scope"), col("ex_i").as("exact_d"),
          ok(col("est_sum") - col("est_u"), col("ex_i")))
        flags.unionByName(unionRow).unionByName(interRow).orderBy(col("scope"))
      },
      Some("""WITH po AS (SELECT DISTINCT event_type AS p, user_id AS c
             |           FROM events WHERE event_type IN ('click', 'purchase'))
             |SELECT p AS scope, count(*)::BIGINT AS exact_d, TRUE AS est_ok FROM po GROUP BY p
             |UNION ALL
             |SELECT 'UNION', count(DISTINCT c), TRUE FROM po
             |UNION ALL
             |SELECT 'INTERSECT', count(*), TRUE FROM (
             |  SELECT c FROM po GROUP BY c HAVING count(*) = 2) z
             |ORDER BY scope""".stripMargin)),

    // STREAMING windowed-aggregation e2e — Streams.tumblingAgg run as a
    // real checkpointed query with WATERMARK SEMANTICS ON THE ORACLE
    // PATH: events arrive in two event-time-ordered files, except the
    // first hour's rows, which are withheld and replayed in file 2 —
    // by then the watermark (maxA − 10 min ≈ 15 days ahead) has long
    // passed their window, so Structured Streaming drops them, and the
    // DuckDB oracle drops exactly the same rows with a WHERE clause.
    // Two sentinel rows 2 h past the corpus (filtered from the output
    // by event_type) advance the watermark past every real window and
    // trigger the final Append-mode emission; their own window never
    // finalizes, so they can't leak. Values aggregate as DECIMAL(18,4)
    // inside the streaming state so the sum is order-independent.
    // State at 100 TB = open windows × keys, not rows; the fixture
    // builds once per sf and the timed query is the landed-result read.
    GQuery(
      "stream_agg_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        // v3: fixture now builds on the RocksDB state store (the
        // production provider for unbounded-cardinality window state)
        val root = cachedFixture(s"graft_sagg_cache_v3_$sfKey") { root =>
          val ev = Tables.events(s, dir)
            .select(col("ts"), col("event_type"),
              col("value").cast("decimal(18,4)").as("value"))
          // the kept-row boundary is derived IN-ENGINE with the same
          // date_trunc the DuckDB oracle uses (epoch-millis flooring
          // would drift from date_trunc in any non-whole-hour session
          // timezone); every harness pins the session tz to UTC, which
          // also aligns window()'s epoch-based buckets with the
          // oracle's date_trunc('hour') groups
          val b0 = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"),
            expr("date_trunc('hour', min(ts)) + INTERVAL 1 HOUR").as("h1")).collect()(0)
          val (mn, mx, hourOne) =
            (b0.getTimestamp(0), b0.getTimestamp(1), b0.getTimestamp(2))
          val mid = new java.sql.Timestamp((mn.getTime + mx.getTime) / 2)
          val src = root + "/src"
          // file A: event-time order, first hour withheld
          ev.filter(col("ts") >= lit(hourOne) && col("ts") < lit(mid))
            .coalesce(1).write.mode("append").parquet(src)
          graft.streaming.Streams.withRocksDbState(s) {
            val q = graft.streaming.Streams.tumblingAgg(
                s.readStream.schema(ev.schema).parquet(src), "ts", "event_type")
              .writeStream.format("parquet")
              .option("path", root + "/out")
              .option("checkpointLocation", root + "/ckpt")
              .outputMode("append").start()
            try {
              q.processAllAvailable()
              // file B: the rest + the late first-hour replay (dropped)
              ev.filter(col("ts") >= lit(mid) || col("ts") < lit(hourOne))
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
              // two sentinel batches flush every real window
              val sentinelTs = new java.sql.Timestamp(mx.getTime + 7200000L)
              for (_ <- 1 to 2) {
                s.range(1).select(
                    lit(sentinelTs).as("ts"),
                    lit("zz_sentinel").as("event_type"),
                    lit(0).cast("decimal(18,4)").as("value"))
                  .coalesce(1).write.mode("append").parquet(src)
                q.processAllAvailable()
              }
            } finally q.stop()
          }
          dropSinkLog(root + "/out")
        }
        s.read.parquet(root + "/out")
          .filter(col("event_type") =!= "zz_sentinel")
          .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("n"),
            dround(col("total")).as("total"))
          .orderBy(col("win_start"), col("event_type"))
      },
      Some(
        """WITH bounds AS (SELECT min(ts) AS mn FROM events),
          |kept AS (SELECT e.* FROM events e, bounds b
          |         WHERE e.ts >= date_trunc('hour', b.mn) + INTERVAL 1 HOUR)
          |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
          |  event_type, count(*) AS n,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
          |FROM kept GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // STREAMING sessionization e2e — Streams.sessionize (the
    // flatMapGroupsWithState event-time state machine) run as a real
    // checkpointed stream over the event log in two time-ordered
    // files, value-checked against the SAME gaps-and-islands SQL that
    // oracles q_win_session: every closed session's (user, n_events,
    // start, end) must equal the batch computation row for row. Two
    // sentinel batches (user_id −1, 2 h past the corpus) push the
    // watermark beyond every open session's close point and give the
    // event-time timeouts a batch to fire in — the Append-mode flush
    // for arbitrary-stateful operators. Session numbering is
    // reconstructed on read as row_number over session start, which is
    // exactly the batch numbering because sessions of one user cannot
    // overlap. State per user = open session + pending buffer, never
    // stream history; the timed query is the landed-result read.
    GQuery(
      "stream_session_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        // v2: fixture now builds on the RocksDB state store (per-user
        // session state is the unbounded-cardinality case it exists for)
        val root = cachedFixture(s"graft_sess_cache_v2_$sfKey") { root =>
          val ev = Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("value"))
          val Array(mn, mx) = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
            .toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
          val mid = new java.sql.Timestamp((mn.getTime + mx.getTime) / 2)
          val src = root + "/src"
          ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
          graft.streaming.Streams.withRocksDbState(s) {
            val q = graft.streaming.Streams.sessionize(
                s.readStream.schema(ev.schema).parquet(src), gapMs = 1800000L)
              .toDF()
              .writeStream.format("parquet")
              .option("path", root + "/out")
              .option("checkpointLocation", root + "/ckpt")
              .outputMode("append").start()
            try {
              q.processAllAvailable()
              ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
              val sentinelTs = new java.sql.Timestamp(mx.getTime + 7200000L)
              for (_ <- 1 to 2) {
                s.range(1).select(
                    lit(-1L).as("user_id"),
                    lit(sentinelTs).as("ts"),
                    lit(0.0).as("value"))
                  .coalesce(1).write.mode("append").parquet(src)
                q.processAllAvailable()
              }
            } finally q.stop()
          }
          dropSinkLog(root + "/out")
        }
        val w = Window.partitionBy(col("key")).orderBy(col("startUs"))
        s.read.parquet(root + "/out")
          .filter(col("key") >= 0)
          .withColumn("session_id", row_number().over(w).cast("long"))
          .select(col("key").as("user_id"), col("session_id"),
            col("n").as("n_events"),
            date_format(timestamp_micros(col("startUs")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
            date_format(timestamp_micros(col("endUs")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), n AS (
             |  SELECT *, CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end
             |FROM n GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // STREAMING sessionization on Spark 4's transformWithState — the
    // SAME event replay, gap rule, sentinel flush, and gaps-and-islands
    // oracle as stream_session_e2e, but the stateful operator is the
    // successor API (typed ValueState + explicit event-time timers,
    // Streams.SessionProcessor) instead of flatMapGroupsWithState.
    // Both drive the one foldSessions fold, so this entry pins at
    // ORACLE level that the API migration path changes nothing — a
    // consumer can move operator by operator. Requires the RocksDB
    // store (multi-column-family); the fixture builds under it like
    // its sibling.
    GQuery(
      "stream_session_tws_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_sesstws_cache_v1_$sfKey") { root =>
          val ev = Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("value"))
          val Array(mn, mx) = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
            .toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
          val mid = new java.sql.Timestamp((mn.getTime + mx.getTime) / 2)
          val src = root + "/src"
          ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
          graft.streaming.Streams.withRocksDbState(s) {
            val q = graft.streaming.Streams.sessionizeTws(
                s.readStream.schema(ev.schema).parquet(src), gapMs = 1800000L)
              .toDF()
              .writeStream.format("parquet")
              .option("path", root + "/out")
              .option("checkpointLocation", root + "/ckpt")
              .outputMode("append").start()
            try {
              q.processAllAvailable()
              ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
              val sentinelTs = new java.sql.Timestamp(mx.getTime + 7200000L)
              for (_ <- 1 to 2) {
                s.range(1).select(
                    lit(-1L).as("user_id"),
                    lit(sentinelTs).as("ts"),
                    lit(0.0).as("value"))
                  .coalesce(1).write.mode("append").parquet(src)
                q.processAllAvailable()
              }
            } finally q.stop()
          }
          dropSinkLog(root + "/out")
        }
        val w = Window.partitionBy(col("key")).orderBy(col("startUs"))
        s.read.parquet(root + "/out")
          .filter(col("key") >= 0)
          .withColumn("session_id", row_number().over(w).cast("long"))
          .select(col("key").as("user_id"), col("session_id"),
            col("n").as("n_events"),
            date_format(timestamp_micros(col("startUs")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
            date_format(timestamp_micros(col("endUs")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), n AS (
             |  SELECT *, CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end
             |FROM n GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // STREAM-STREAM interval join e2e — Streams.intervalJoin (purchase
    // joined to the clicks in the preceding hour, both sides unbounded)
    // as a real checkpointed query over two file-stream sources reading
    // the same time-ordered event files. Inner joins emit a pair the
    // moment the later side arrives, so completeness needs no sentinel
    // flush; the watermarks exist purely to BOUND STATE — click state
    // evicts at wm − 1 h, which the ordered arrival provably never
    // needs again (any future purchase has p_ts ≥ wm). The DuckDB
    // oracle is the batch interval join verbatim.
    GQuery(
      "stream_join_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        // v2: fixture now builds on the RocksDB state store (click
        // state across the join window is the cardinality that pressures
        // executor heap at real scale)
        val root = cachedFixture(s"graft_sjoin_cache_v2_$sfKey") { root =>
          val ev = Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
          val Array(mn, mx) = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
            .toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
          val mid = new java.sql.Timestamp((mn.getTime + mx.getTime) / 2)
          val src = root + "/src"
          ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
          def side(t: String) =
            s.readStream.schema(ev.schema).parquet(src).filter(col("event_type") === t)
          graft.streaming.Streams.withRocksDbState(s) {
            val q = graft.streaming.Streams.intervalJoin(
                side("purchase"), side("click"), windowMs = 3600000L)
              .writeStream.format("parquet")
              .option("path", root + "/out")
              .option("checkpointLocation", root + "/ckpt")
              .outputMode("append").start()
            try {
              q.processAllAvailable()
              ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            } finally q.stop()
          }
          dropSinkLog(root + "/out")
        }
        s.read.parquet(root + "/out")
          .select(col("user_id"), col("p_id"), col("c_id"),
            date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_time"),
            date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("c_time"))
          .orderBy(col("p_id"), col("c_id"))
      },
      Some(
        """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id,
          |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_time,
          |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS c_time
          |FROM events p JOIN events c
          |  ON p.user_id = c.user_id
          | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
          |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          |ORDER BY p_id, c_id""".stripMargin)),

    // STREAM-STREAM LEFT OUTER interval join e2e — Streams.
    // intervalJoinOuter as a real checkpointed query over the same
    // two-file event replay as stream_join_e2e. What the outer variant
    // adds over the inner: the NULL-PAD PATH IS WATERMARK-DRIVEN — a
    // purchase with no click in its preceding hour can only emit
    // (null-padded) once the click watermark has passed its whole
    // band, so unmatched rows surface a trigger later than inner
    // pairs, and the tail of the corpus needs the watermark pushed
    // past it to flush at all. Two sentinel batches (user_id −1, one
    // purchase + one click each, 2 h past the corpus) do that push and
    // give the flush a batch to land in; they join only each other and
    // are filtered from the output by key sign. The DuckDB oracle is
    // the batch LEFT JOIN verbatim — every purchase appears exactly
    // once per matching click or once null-padded, which also pins
    // that the stream emits NO spurious null-pads for matched rows.
    GQuery(
      "stream_join_outer_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_sjoinout_cache_v1_$sfKey") { root =>
          val ev = Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
          val Array(mn, mx) = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
            .toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
          val mid = new java.sql.Timestamp((mn.getTime + mx.getTime) / 2)
          val src = root + "/src"
          ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
          def side(t: String) =
            s.readStream.schema(ev.schema).parquet(src).filter(col("event_type") === t)
          graft.streaming.Streams.withRocksDbState(s) {
            val q = graft.streaming.Streams.intervalJoinOuter(
                side("purchase"), side("click"), windowMs = 3600000L)
              .writeStream.format("parquet")
              .option("path", root + "/out")
              .option("checkpointLocation", root + "/ckpt")
              .outputMode("append").start()
            try {
              q.processAllAvailable()
              ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
              val sentinelTs = new java.sql.Timestamp(mx.getTime + 7200000L)
              for (i <- 1 to 2) {
                s.range(1).select(
                    lit(-i.toLong).as("event_id"),
                    lit(-1L).as("user_id"),
                    lit(sentinelTs).as("ts"),
                    lit("purchase").as("event_type"))
                  .union(s.range(1).select(
                    lit(-100L - i).as("event_id"),
                    lit(-1L).as("user_id"),
                    lit(sentinelTs).as("ts"),
                    lit("click").as("event_type")))
                  .coalesce(1).write.mode("append").parquet(src)
                q.processAllAvailable()
              }
            } finally q.stop()
          }
          dropSinkLog(root + "/out")
        }
        s.read.parquet(root + "/out")
          .filter(col("user_id") >= 0)
          .select(col("user_id"), col("p_id"), col("c_id"),
            date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_time"),
            date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("c_time"))
          .orderBy(col("p_id"), col("c_id"))
      },
      Some(
        """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id,
          |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_time,
          |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS c_time
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON p.user_id = c.user_id
          | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
          |ORDER BY p_id, c_id""".stripMargin)),

    // STREAM-STATIC enrich e2e — Streams.enrich as a real checkpointed
    // query: the document stream left-joins a BATCH dimension (per-
    // language mean n_chars over the full corpus) that is re-read per
    // micro-batch; the dim derives from the corpus itself, so the
    // DuckDB oracle replays both sides. Stateless: the static side
    // broadcasts, no watermark, each row enriched exactly once — the
    // standard CDC-dimension-enrichment shape (reference README.md
    // syncs tables to Glue for exactly this kind of consumer). Docs
    // stream in two files; flags compare against the GLOBAL mean both
    // times because the dim is computed from the batch table, not the
    // stream — the point of stream-static over stream-stream.
    GQuery(
      "stream_enrich_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_senrich_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir)
          // integer sum → double division: both engines divide the same
          // exact integers, so the mean is bitwise-identical (no decimal
          // division/rounding rules in play)
          val dim = docs.groupBy(col("lang"))
            .agg((sum(col("n_chars")).cast("double") / count(lit(1))).as("lang_mean"))
          val src = root + "/src"
          docs.filter(pmod(col("doc_id"), lit(2)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.enrich(
              s.readStream.schema(docs.schema).parquet(src), dim, "lang")
            .select(col("doc_id"), col("lang"), col("n_chars"), col("lang_mean"),
              (col("n_chars") > col("lang_mean")).as("above_mean"))
            .writeStream.format("parquet")
            .option("path", root + "/out")
            .option("checkpointLocation", root + "/ckpt")
            .outputMode("append").start()
          try {
            q.processAllAvailable()
            docs.filter(pmod(col("doc_id"), lit(2)) === 1)
              .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
          } finally q.stop()
          dropSinkLog(root + "/out")
        }
        s.read.parquet(root + "/out")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            dround(col("lang_mean")).as("lang_mean"), col("above_mean"))
          .orderBy(col("doc_id"))
      },
      Some(
        """WITH dim AS (
          |  SELECT lang, CAST(sum(n_chars) AS DOUBLE) / count(*) AS lang_mean
          |  FROM documents GROUP BY 1)
          |SELECT d.doc_id, d.lang, d.n_chars,
          |  round(CAST(dim.lang_mean AS DOUBLE), 4) AS lang_mean,
          |  d.n_chars > dim.lang_mean AS above_mean
          |FROM documents d LEFT JOIN dim ON d.lang = dim.lang
          |ORDER BY d.doc_id""".stripMargin)),

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
          val pairs = ngramPairs(s, dir).select(col("id_a"), col("id_b")).cache()
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

    // STATE-STORE INTROSPECTION (the Spark 4 `statestore` data source,
    // SPARK-45511): a running-aggregation stream's OPERATOR STATE read
    // back as a queryable DataFrame — the debugging/audit surface every
    // production streaming deployment needs (what does the state hold
    // RIGHT NOW, without stopping the query or trusting its sink). The
    // fixture runs an update-mode per-type running count+sum over two
    // micro-batches (no watermark → no eviction, state IS the full
    // aggregate); the reader then loads checkpoint state directly —
    // key/value structs of the aggregation buffer (count, sum, isEmpty)
    // per shuffle partition. The oracle is the whole point: state after
    // the last commit must equal the one-shot batch aggregate, proving
    // exactly-once maintenance through restarts and batch boundaries.
    // At scale the source reads state files partition-parallel — no
    // driver collect, no stream interruption.
    GQuery(
      "stream_state_read_e2e",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("ts"), col("event_type"), col("value").cast("decimal(18,4)").as("value"))
        def runStream(root: String): Unit = {
          val q = s.readStream.schema(ev.schema).parquet(root + "/src")
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
            .writeStream.format("noop").outputMode("update")
            .option("checkpointLocation", root + "/ckpt").start()
          try q.processAllAvailable() finally q.stop()
        }
        // Built IN PLACE (not via cachedFixture's temp-dir + rename): the
        // checkpoint's file-source log records source files by ABSOLUTE
        // path, so a post-build rename would break every later resume
        // with "Wrong basePath".
        val sfKey = sfFingerprint(dir)
        val rootDir = new java.io.File("/tmp", s"graft_sstate_cache_v2_$sfKey")
        val marker = new java.io.File(rootDir, "_DONE")
        val root = rootDir.getAbsolutePath
        if (!marker.exists()) {
          if (rootDir.exists()) rmTree(rootDir) // stale partial build
          rootDir.mkdirs()
          val b = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).collect()(0)
          val mid = new java.sql.Timestamp(
            (b.getTimestamp(0).getTime + b.getTimestamp(1).getTime) / 2)
          val src = root + "/src"
          ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
          runStream(root)
          ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
          runStream(root)
          marker.createNewFile()
        }
        // Resume the checkpointed query as a NO-OP (no new source files →
        // no batch): state is untouched, but the restart instantiates the
        // session's StateStoreCoordinator RPC endpoint, which the
        // statestore reader requires and which only streaming queries
        // create — a fresh session reading a warm cached fixture would
        // otherwise fail with RpcEndpointNotFoundException. Also a free
        // restart-recovery exercise: the reader below must see state
        // identical through the stop/resume cycle.
        runStream(root)
        s.read.format("statestore").option("path", root + "/ckpt").load()
          .select(col("key.event_type").as("event_type"),
            col("value.count").as("n"),
            round(col("value.sum").cast("double"), 4).as("sv"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*)::BIGINT AS n,
             |  round(CAST(sum(value::DECIMAL(18,4)) AS DOUBLE), 4) AS sv
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // STREAMING duplicate-cluster maintenance — q_dedup_cluster_incr's
    // streaming twin and stream_dedup_e2e's clustering companion: docs
    // land in three micro-batches, and each batch absorbs into the
    // PERSISTED assignment (ops/ClusterStore) through the condensed
    // label graph — batch-sized merge work, versioned-snapshot commit,
    // exactly-once by the delta marker, crash-replay pinned in
    // StreamsSpec. An edge fires exactly once: on the batch where its
    // later endpoint lands. The pair table stands in for the online
    // LSH-probe feed (stream_dedup_e2e demonstrates that half). The
    // oracle is the full-recompute recursive CTE — maintained state
    // after the last batch must be indistinguishable from batch CC.
    GQuery(
      "stream_cluster_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_scluster_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir)
          ngramPairs(s, dir).select(col("id_a"), col("id_b"))
            .write.parquet(root + "/pairs")
          graft.ops.ClusterStore.buildEmpty(s, root + "/store")
          val src = root + "/src"
          docs.filter(pmod(col("doc_id"), lit(3)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.clusterIngest(
            s.readStream.schema(docs.schema).parquet(src),
            root + "/pairs", root + "/store", root + "/ckpt")
          try {
            q.processAllAvailable()
            for (i <- 1 to 2) {
              docs.filter(pmod(col("doc_id"), lit(3)) === i)
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        graft.ops.ClusterStore.read(s, root + "/store")
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

    // STREAMING sequence-pattern matching — q_event_pattern's streaming
    // twin (the Flink-CEP role next to stream_session_e2e's
    // sessionization): per-user CLICK+ PURCHASE detection where an
    // event folds into the automaton only once the watermark passes it
    // (adjacency is an order property — same pending-buffer discipline
    // as sessionize), matches append-only and final. Two event-time
    // halves + the sentinel flush; the oracle is the BATCH islands SQL
    // verbatim — the stream must be indistinguishable from batch
    // MATCH_RECOGNIZE over the same corpus.
    GQuery(
      "stream_pattern_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_spat_cache_v1_$sfKey") { root =>
          val ev = Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          val Array(mn, mx) = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
            .toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
          val mid = new java.sql.Timestamp((mn.getTime + mx.getTime) / 2)
          val src = root + "/src"
          ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.patternMatch(
              s.readStream.schema(ev.schema).parquet(src))
            .toDF()
            .writeStream.format("parquet")
            .option("path", root + "/out")
            .option("checkpointLocation", root + "/ckpt")
            .outputMode("append").start()
          try {
            q.processAllAvailable()
            ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            val sentinelTs = new java.sql.Timestamp(mx.getTime + 7200000L)
            for (_ <- 1 to 2) {
              s.range(1).select(
                  lit(-1L).as("user_id"),
                  lit(sentinelTs).as("ts"),
                  lit(-1L).as("event_id"),
                  lit("noop").as("event_type"))
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            }
          } finally q.stop()
          dropSinkLog(root + "/out")
        }
        s.read.parquet(root + "/out")
          .filter(col("key") >= 0)
          .select(col("key").as("user_id"),
            date_format(timestamp_micros(col("startUs")),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("match_start"),
            date_format(timestamp_micros(col("purchaseUs")),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            col("nClicks").as("n_clicks"))
          .orderBy(col("user_id"), col("match_start"), col("purchase_ts"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS isl
             |  FROM events),
             |o AS (
             |  SELECT user_id, ts, event_id, event_type, isl,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             |    lag(isl) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_isl
             |  FROM r),
             |islands AS (
             |  SELECT user_id AS i_user, isl AS i_isl, count(*) AS n_clicks,
             |    min(ts) AS start_ts
             |  FROM o WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT o.user_id,
             |  strftime(islands.start_ts, '%Y-%m-%d %H:%M:%S.%f') AS match_start,
             |  strftime(o.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
             |  n_clicks
             |FROM o JOIN islands
             |  ON o.user_id = i_user AND o.prev_isl = i_isl
             |WHERE o.event_type = 'purchase' AND o.prev_type = 'click'
             |ORDER BY o.user_id, match_start, purchase_ts""".stripMargin)),

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

    // SEMANTIC dedup (the SemDeDup shape, Abbas et al. 2023): partition
    // the embedding space with the coarse quantizer (narrow
    // centroid-literal assignment — zero shuffles), generate cosine
    // near-dup pairs ONLY within clusters (ONE shuffle on the cluster
    // key — the all-pairs cut that makes semantic dedup feasible at
    // corpus scale; sf0.1 measured: in-cluster pairs ≈ corpus²/k), then
    // connected components → every vector labeled with its semantic
    // group representative (component min — the copy a curation pass
    // keeps). Centroids here are the deterministic first-8 init so the
    // full pipeline is oracle-replayable bit-for-bit; the PRODUCTION
    // path is Vectors.semanticGroups(emb, id, vec, thr, k =
    // Vectors.semanticK(n), iters = 3) — same plan shape with a
    // k-means-TRAINED quantizer and k scaled ∝ n, which is what keeps
    // the in-cluster pair bound ≈ n·target/2 linear at corpus scale
    // (OpsSpec gates that training reduces candidate pairs; SCALE.md
    // tabulates pair count vs k).
    // MATRYOSHKA two-stage ANN (MRL, Kusupati et al. NeurIPS'22 — the
    // prefix-dimension serving pattern modern embedding models train
    // for): stage 1 ranks on the FIRST 8 of 64 dims (an 8× cheaper
    // scan — with MRL training the prefix is itself a valid coarse
    // embedding), stage 2 re-ranks only the top-100 survivors on the
    // full vector. Same scale discipline as the PQ/RP rerank family:
    // the query batch broadcasts, the corpus streams its PREFIX slices
    // once (the full 64-dim column never rides the candidate shuffle),
    // the per-query top-100 cut is the row_number-filter shape Spark
    // executes as WindowGroupLimit (map-side partials before the one
    // exchange), and only survivors fetch full vectors by join.
    GQuery(
      "q_sim_mrl",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
        val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), slice(col("embedding"), 1, 8).as("qp"),
            col("embedding").as("qv"))
        val pref = emb.select(col("vec_id"), slice(col("v"), 1, 8).as("p"))
          .withColumn("pn", Vectors.norm(col("p")))
        val wC = Window.partitionBy(col("q_id")).orderBy(col("ps").desc, col("vec_id"))
        val cand = pref
          .join(broadcast(queries.select(col("q_id"), col("qp"))
            .withColumn("qpn", Vectors.norm(col("qp")))), col("vec_id") =!= col("q_id"))
          .withColumn("ps", Vectors.cosine(col("p"), col("qp"), col("pn"), col("qpn")))
          .withColumn("rn", row_number().over(wC)).filter(col("rn") <= 100)
          .select(col("q_id"), col("vec_id"))
        val wF = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        cand.join(emb.withColumn("nrm", Vectors.norm(col("v"))), "vec_id")
          .join(broadcast(queries.select(col("q_id"), col("qv"))
            .withColumn("qn", Vectors.norm(col("qv")))), "q_id")
          .withColumn("cos", Vectors.cosine(col("v"), col("qv"), col("nrm"), col("qn")))
          .withColumn("rk", row_number().over(wF)).filter(col("rk") <= 5)
          .select(col("q_id"), col("rk").cast("int").as("rk"),
            col("vec_id").as("nn_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("q_id"), col("rk"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |p AS (SELECT vec_id, e[1:8] AS pe FROM v),
             |q AS (SELECT vec_id AS q_id, pe AS qp FROM p WHERE vec_id < 8),
             |qf AS (SELECT vec_id AS q_id, e AS qv FROM v WHERE vec_id < 8),
             |cand AS (SELECT q_id, vec_id FROM (
             |  SELECT q.q_id, p.vec_id,
             |    row_number() OVER (PARTITION BY q.q_id
             |      ORDER BY list_cosine_similarity(p.pe, q.qp) DESC, p.vec_id) AS rn
             |  FROM p JOIN q ON p.vec_id <> q.q_id) z WHERE rn <= 100)
             |SELECT q_id, rk::INT AS rk, vec_id AS nn_id, round(c, 4) AS cos FROM (
             |  SELECT c2.q_id, c2.vec_id, list_cosine_similarity(v.e, qf.qv) AS c,
             |    row_number() OVER (PARTITION BY c2.q_id
             |      ORDER BY list_cosine_similarity(v.e, qf.qv) DESC, c2.vec_id) AS rk
             |  FROM cand c2 JOIN v USING (vec_id) JOIN qf USING (q_id)) w
             |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin)),

    // VECTOR-MATH function surface — the declarative (functions-not-
    // UDFs) vector ops every embedding pipeline composes: dot, L2/L1/
    // L∞ norms, dimensionality, and a normalized component — all
    // higher-order-function expressions (zip_with/aggregate/transform/
    // array_max) plus the FloatDot codegen kernel, no UDF anywhere;
    // narrow per-row work, one scan, nothing shuffled before the
    // presentation sort. L∞ via array_max is deliberately
    // order-independent; the sequential-fold sums match DuckDB's
    // list kernels (the q_sim_topk-proven pairing).
    GQuery(
      "q_vector_funcs",
      (s, dir) => {
        val v = col("embedding")
        Tables.embeddings(s, dir).filter(col("vec_id") < 100)
          .select(col("vec_id"),
            size(v).as("dim"),
            round(Vectors.dot(v, v), 4).as("dot_self"),
            round(Vectors.norm(v), 4).as("l2"),
            round(expr("aggregate(embedding, 0D, (a, x) -> a + abs(CAST(x AS DOUBLE)))"), 4).as("l1"),
            round(expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"), 4).as("linf"),
            round(v.getItem(0).cast("double") / Vectors.norm(v), 4).as("u0"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 100)
             |SELECT vec_id, len(e)::INT AS dim,
             |  round(list_dot_product(e, e), 4) AS dot_self,
             |  round(sqrt(list_dot_product(e, e)), 4) AS l2,
             |  round(list_reduce(list_transform(e, x -> abs(x)), (a, x) -> a + x), 4) AS l1,
             |  round(list_max(list_transform(e, x -> abs(x))), 4) AS linf,
             |  round(e[1] / sqrt(list_dot_product(e, e)), 4) AS u0
             |FROM v ORDER BY vec_id""".stripMargin)),

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

    // ------------------------------------------------ similarity search
    // Brute-force exact cosine top-k for a bounded query set (vec_id ≤
    // 50) against the full corpus — the correctness baseline. Sides
    // matter at scale: the ≤51 QUERY rows are broadcast and the CORPUS
    // is streamed (the discipline every later similarity query follows,
    // e.g. q_sim_mrl) — the original inverted form broadcast the corpus,
    // a multi-GB ship to every task at 100× data. Per-query top-5 via
    // row_number ≤ 5, which Spark plans as WindowGroupLimit: each
    // corpus partition keeps only its local top-5 per query before the
    // single query-key exchange, so the shuffle carries ≤ 5·|queries|
    // rows per partition regardless of corpus size. Scale path beyond
    // exact: the IVF/PQ ladder below; the oracle stays on this exact
    // form (SURVEY.md §7.5).
    GQuery(
      "q_sim_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").as("v"))
        val corpus = fanout(emb)
          .select(col("vec_id").as("nn_id"), col("v").as("v2"))
          .withColumn("nrm2", Vectors.norm(col("v2")))
        val queries = emb.filter(col("vec_id") <= 50)
          .withColumn("nrm", Vectors.norm(col("v")))
        val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
        corpus.join(broadcast(queries), col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, round(c, 4) AS cos FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    list_cosine_similarity(a.e, b.e) AS c,
             |    row_number() OVER (PARTITION BY a.vec_id
             |      ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rn
             |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
             |  WHERE a.vec_id <= 50) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // IVF-style ANN — the declared scale path for similarity search:
    // assign every vector to its nearest centroid, then search only
    // within the query's own cluster (nprobe=1). The centroids are
    // INDEX METADATA (k vectors, driver-sized even at k=thousands — the
    // same bounded-collect rule as IvfIndex's probed-cluster list), so
    // the assignment is a NARROW per-row argmax over centroid literals:
    // greatest() over (cosine, -c_id) structs, FloatDot inside
    // whole-stage codegen, zero joins and zero shuffles. The only wide
    // exchange left is the real one — co-partitioning by cluster key
    // for the in-cluster top-k. (Previously a join + row_number window
    // partitioned by vec_id: a full-corpus shuffle that existed only to
    // pick a per-row maximum.) At real scale centroids come from
    // k-means and nprobe grows — the plan shape (narrow assign →
    // co-partition by cluster → in-cluster top-k) is exactly this one.
    GQuery(
      "q_sim_ivf",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
        // driver-side norm replays FloatDot's fold exactly (sequential
        // left-to-right sum of float→double products), so the literal
        // path is bit-identical to the previous join's column math
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val cv = r.getSeq[Float](1)
            val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
            (r.getLong(0), cv, cnrm)
          }.sortBy(_._1).toSeq
        // argmax by (cosine desc, c_id asc): struct compares cosine
        // first; the negated id makes greatest() break ties to the
        // LOWEST centroid id, matching the window's ORDER BY
        val scored = cents.map { case (cid, cv, cnrm) =>
          struct(
            (Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("c"),
            lit(-cid).as("nid"))
        }
        val assigned = emb
          .withColumn("cluster", -greatest(scored: _*).getField("nid"))
          .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
        val queries = assigned.filter(col("vec_id") <= 50)
          .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
        val corpus = assigned.select(col("vec_id").as("nn_id"),
          col("v").as("v2"), col("nrm").as("nrm2"), col("cluster"))
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
        queries.join(corpus, Seq("cluster"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, round(cc, 4) AS cos FROM (
             |  SELECT q.vec_id, x.vec_id AS nn_id,
             |    list_cosine_similarity(q.e, x.e) AS cc,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |  FROM assigned q JOIN assigned x
             |    ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |  WHERE q.vec_id <= 50) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin)),

    // RETRIEVAL EVALUATION as a first-class op — the measurement pass
    // every ANN deployment runs (and what QueriesSpec's recall gates do
    // in test code, promoted to the oracled surface): the 1-probe IVF
    // serve evaluated per query against the exact brute-force top-5.
    // Output is ALL-INTEGER (n_served, hits = |served ∩ exact@5|,
    // first_rank = the served rank of the exact NEAREST neighbor, 0 if
    // the cluster cut lost it), so recall@5 / MRR aggregate downstream
    // without any float leaving the engine. Both sides reuse the exact
    // cosine machinery the hash gate already pins (q_sim_topk /
    // q_sim_ivf), so the eval itself replays bit-exactly. Scale: the
    // exact side is the expensive leg (corpus broadcast per query — the
    // eval set is small by design, this is an OFFLINE measurement op);
    // the serve side is the one-cluster-key exchange.
    GQuery(
      "q_ann_eval",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val cv = r.getSeq[Float](1)
            val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
            (r.getLong(0), cv, cnrm)
          }.sortBy(_._1).toSeq
        val scored = cents.map { case (cid, cv, cnrm) =>
          struct(
            (Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("c"),
            lit(-cid).as("nid"))
        }
        // cache: one assignment pass feeds the serve leg, the exact leg,
        // and the query slice (the q_text_search multi-consumer rule)
        val assigned = emb
          .withColumn("cluster", -greatest(scored: _*).getField("nid"))
          .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
          .cache()
        val queries = assigned.filter(col("vec_id") <= 50)
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
        // served: 1-probe IVF top-5 (the q_sim_ivf plan at k=5)
        val served = queries
          .join(assigned.select(col("vec_id").as("nn_id"), col("v").as("v2"),
            col("nrm").as("nrm2"), col("cluster")), Seq("cluster"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"))
        // exact: brute-force top-5 over the full corpus (q_sim_topk plan)
        val exact = queries
          .join(broadcast(emb.select(col("vec_id").as("nn_id"), col("v").as("v2"),
            col("nrm").as("nrm2"))), col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"))
        val base = served.groupBy(col("vec_id")).agg(count(lit(1)).as("n_served"))
        val hits = served
          .join(exact.select(col("vec_id"), col("nn_id")), Seq("vec_id", "nn_id"))
          .groupBy(col("vec_id")).agg(count(lit(1)).as("hits"))
        val fr = served
          .join(exact.filter(col("rn") === 1).select(col("vec_id"), col("nn_id")),
            Seq("vec_id", "nn_id"))
          .groupBy(col("vec_id")).agg(min(col("rn")).as("first_rank"))
        base
          .join(hits, Seq("vec_id"), "left")
          .join(fr, Seq("vec_id"), "left")
          .select(col("vec_id"), col("n_served").cast("long").as("n_served"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            coalesce(col("first_rank"), lit(0)).cast("int").as("first_rank"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |served AS (
             |  SELECT vec_id, rn, nn_id FROM (
             |    SELECT q.vec_id, x.vec_id AS nn_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |    FROM assigned q JOIN assigned x
             |      ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |    WHERE q.vec_id <= 50) t WHERE rn <= 5),
             |exact AS (
             |  SELECT vec_id, rn, nn_id FROM (
             |    SELECT q.vec_id, x.vec_id AS nn_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |    FROM assigned q JOIN v x ON q.vec_id <> x.vec_id
             |    WHERE q.vec_id <= 50) t WHERE rn <= 5),
             |base AS (SELECT vec_id, count(*)::BIGINT AS n_served FROM served GROUP BY vec_id),
             |hits AS (SELECT s.vec_id, count(*)::BIGINT AS hits
             |         FROM served s JOIN exact e ON s.vec_id = e.vec_id AND s.nn_id = e.nn_id
             |         GROUP BY s.vec_id),
             |fr AS (SELECT s.vec_id, min(s.rn) AS first_rank
             |       FROM served s JOIN exact e ON s.vec_id = e.vec_id AND s.nn_id = e.nn_id
             |       WHERE e.rn = 1 GROUP BY s.vec_id)
             |SELECT b.vec_id, b.n_served,
             |  coalesce(h.hits, 0)::BIGINT AS hits,
             |  coalesce(f.first_rank, 0)::INT AS first_rank
             |FROM base b LEFT JOIN hits h ON b.vec_id = h.vec_id
             |LEFT JOIN fr f ON b.vec_id = f.vec_id
             |ORDER BY b.vec_id""".stripMargin)),

    // The SAME ANN search served from the PERSISTED IVF index
    // (ops/IvfIndex): built once per sf (cached fixture — train at
    // iters=0 so the centroids are the deterministic first-8 init and
    // the oracle can replay them; a trained quantizer's float means are
    // not portably replayable), then every invocation reads centroids +
    // only the probed cluster partitions from the committed layout.
    // What verify value-checks here is the full build/serve split —
    // parquet round-trip, partition pruning, delta-union read path —
    // against the identical DuckDB semantics as q_sim_ivf (centroids
    // vec_id < 8 = the first-8-ids init).
    GQuery(
      "q_sim_ivf_served",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val idxDir = cachedFixture(s"graft_ivfq_cache_v1_$sfKey") { root =>
          IvfIndex.build(s, root + "/idx", fanout(Tables.embeddings(s, dir)),
            "vec_id", "embedding", k = 8, iters = 0)
        } + "/idx"
        IvfIndex.topK(s, idxDir, Tables.embeddings(s, dir).filter(col("vec_id") <= 50),
            "vec_id", "embedding", k = 3, nprobe = 1)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, round(cc, 4) AS cos FROM (
             |  SELECT q.vec_id, x.vec_id AS nn_id,
             |    list_cosine_similarity(q.e, x.e) AS cc,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |  FROM assigned q JOIN assigned x
             |    ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |  WHERE q.vec_id <= 50) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin)),

    // Cross-corpus ANN JOIN — the embedding-decontamination shape: every
    // held-out "eval" vector (vec_id < 100) against the disjoint "train"
    // corpus (vec_id >= 100), reporting ALL train neighbors above a
    // cosine threshold (threshold semantics, not top-k: contamination
    // wants every hit, and a plain similarity join is what record
    // linkage / semantic retrieval-vs-corpus audits run). Both sides go
    // through the NARROW centroid-literal assignment; the corpus lives
    // in its 1 nearest cluster while each query MULTI-PROBES its 3
    // nearest (the recall dial at a cluster boundary — a corpus vector
    // filed on the other side of the boundary is still found; nprobe=3
    // over the untrained first-8 quantizer measures ~0.6 recall at
    // sf0.01 vs 0.48 at nprobe=2, gated in QueriesSpec). The only
    // wide exchange is the cluster-key co-partition join; in-cluster
    // work is pairs-within-cluster, never |eval|×|train|. A (q, nn)
    // pair can appear at most once — the corpus side owns exactly one
    // cluster — so no distinct is needed.
    GQuery(
      "q_knn_join",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        Vectors.annJoin(emb.filter(col("vec_id") < 100),
            fanout(emb.filter(col("vec_id") >= 100)),
            "vec_id", "embedding", cents, nprobe = 3, threshold = 0.3)
          .orderBy(col("vec_id"), col("nn_id"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |corpus AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c WHERE a.vec_id >= 100) z WHERE rn = 1),
             |queries AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c WHERE a.vec_id < 100) z WHERE rn <= 3)
             |SELECT q.vec_id, x.vec_id AS nn_id,
             |  round(list_cosine_similarity(q.e, x.e), 4) AS cos
             |FROM queries q JOIN corpus x ON q.cluster = x.cluster
             |WHERE list_cosine_similarity(q.e, x.e) > 0.3
             |ORDER BY q.vec_id, nn_id""".stripMargin)),

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

    // STREAMING decontamination e2e — Streams.decontaminatedIngest as a
    // real checkpointed query: the eval-shingle bloom sketch is built
    // once batch-side, then the training stream drops contaminated docs
    // with a stateless scan predicate (no state, no shuffle, no
    // sentinel needed). The landed corpus must equal the batch
    // NOT-EXISTS answer — the oracle is the set complement of
    // q_decontaminate_bloom's, so the stream gate and the batch gate
    // are pinned to the same exact-overlap semantics.
    GQuery(
      "stream_decon_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_sdecon_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir)
          val bf = fanout(docs).filter(pmod(col("doc_id"), lit(10)) === 0)
            .select(explode(array_distinct(
              Text.shingles(Text.tokens(col("text")), 5))).as("g"))
            .agg(graft.functions.Bloom.agg(col("g"), 1L << 17, 1L << 24).as("bf"))
            .collect()(0).getAs[Array[Byte]](0)
          val src = root + "/src"
          val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          train.filter(pmod(col("doc_id"), lit(2)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.decontaminatedIngest(
            s.readStream.schema(docs.schema).parquet(src), bf,
            root + "/out", root + "/ckpt")
          try {
            q.processAllAvailable()
            train.filter(pmod(col("doc_id"), lit(2)) === 1)
              .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
          } finally q.stop()
          dropSinkLog(root + "/out")
        }
        s.read.parquet(root + "/out")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |posts AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
             |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS g
             |  FROM t WHERE len(toks) >= 5),
             |ev AS (SELECT DISTINCT g FROM posts WHERE doc_id % 10 = 0)
             |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
             |WHERE d.doc_id % 10 <> 0 AND NOT EXISTS (
             |  SELECT 1 FROM posts p JOIN ev ON p.g = ev.g WHERE p.doc_id = d.doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

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
        val bf = shingled.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(explode(col("sh")).as("g"))
          .agg(graft.functions.Bloom.agg(col("g"), 1L << 17, 1L << 24).as("bf"))
          .collect()(0).getAs[Array[Byte]](0)
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

    // Rolling-hash fingerprint: min of character-level polynomial
    // rolling hashes (winnowing-lite). Narrow map; the per-window sums
    // avoid per-step modular reduction so both engines compute the
    // identical int64 values (Text.rollingHashes).
    GQuery(
      "q_fingerprint_rolling",
      (s, dir) => {
        fanout(Tables.documents(s, dir))
          .withColumn("h", Text.rollingHashes(col("text"), 8))
          .select(col("doc_id"), array_min(col("h")).as("min_hash"),
            size(col("h")).as("n_windows"))
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

    // HYBRID RETRIEVAL by RECIPROCAL RANK FUSION (Cormack et al.
    // SIGIR'09 — the standard fusion rule production search runs over
    // its lexical and vector legs): the BM25 top-50 (q_text_search's
    // exact pipeline) and the cosine top-50 for a query vector fuse by
    // rrf = Σ 1/(60 + rank), a rank-only formula deliberately immune to
    // the two legs' incomparable score scales. Both legs keep their own
    // scale discipline (corpus never broadcast on the vector leg —
    // query rides as the broadcast literal; global top-50 cuts are
    // map-side TakeOrdered partials); the fusion join then touches 50+50
    // ROWS, not the corpus — fusion cost is rank-list-sized at any
    // corpus scale. Ranks are ints, 1/(60+r) is one IEEE division each,
    // the two-term sum is fixed-order, floor-scaled at 1e-6 — exact
    // across engines; a doc missing from a leg contributes 0 (the
    // standard RRF convention), exercised through the full-outer join.
    GQuery(
      "q_hybrid_rrf",
      (s, dir) => rrfFusedTop10(s, dir),
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
             |vr AS (SELECT vec_id AS doc_id, (row_number() OVER (ORDER BY c DESC, vec_id))::INT AS r_v FROM vs)
             |SELECT doc_id, r_t, r_v,
             |  floor((coalesce(1::DOUBLE / (r_t + 60), 0) + coalesce(1::DOUBLE / (r_v + 60), 0))
             |        * 1000000 + 0.5) / 1000000 AS rrf
             |FROM tr FULL OUTER JOIN vr USING (doc_id)
             |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

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

    // STREAMING text-index ingest e2e: documents arrive in 3
    // micro-batches (doc_id % 3 = arrival order); the inverted index
    // is built on batch 0 and batches 1-2 append as postings deltas
    // through the checkpointed streaming loop (Streams.textIngest),
    // never re-tokenizing what already landed. What verify
    // value-checks is the END-STATE SERVE: BM25 top-10 over the
    // base+delta union equals the full-corpus computation — freshness
    // without re-scan.
    GQuery(
      "stream_text_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_stext_cache_v1_$sfKey") { root =>
          val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
          graft.ops.TextIndex.build(s, root + "/idx",
            docs.filter(pmod(col("doc_id"), lit(3)) === 0))
          val src = root + "/src"
          docs.filter(pmod(col("doc_id"), lit(3)) === 1)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.textIngest(
            s.readStream.schema(docs.schema).parquet(src),
            root + "/idx", root + "/out", root + "/ckpt")
          try {
            q.processAllAvailable()
            docs.filter(pmod(col("doc_id"), lit(3)) === 2)
              .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
          } finally q.stop()
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

    // --------------------------------------- quantized similarity (SQ8)
    // Int8 scalar-quantized ANN — the memory-bandwidth scale path for
    // similarity serving: embeddings are squashed to one byte per
    // dimension and top-k runs on exact INTEGER dot products of the
    // codes. At
    // 100 TB the win is the working set: a 64-dim corpus drops from
    // 256 B to 64 B per vector, so 4x more index fits in executor
    // page cache and the brute scan is 4x less bandwidth-bound; the
    // integer dot also sidesteps float-summation order entirely — the
    // scores are bit-identical across engines and partitionings, which
    // is why this variant carries a full value oracle where the float
    // paths need round(…, 4). The grid is SYMMETRIC on the unit sphere:
    // vectors are L2-normalized, then code = floor(vn * 127) in
    // [-127, 127] -- centered on zero, so the integer code dot is a
    // rank-faithful surrogate for cosine. (An offset grid like
    // floor((x - min) * s) is NOT: the additive offset term dominates
    // the ranking, which the QueriesSpec recall gate catches as
    // overlap@5 = 0.) Normalization + quantization are a narrow
    // per-row map with no corpus statistics at all (no collect, no
    // extra pass); the norm is an explicit LEFT FOLD on both sides
    // (aggregate with 0D seed / list_reduce) so both engines add in
    // the same order -- bit-equal doubles in, bit-equal codes out.
    // Top-k is the same broadcast-corpus + per-query window as
    // q_sim_topk (at real scale: IVF cluster co-partition first, SQ8
    // codes inside each cluster, byte-packed binary column).
    // Quantized-vs-exact recall (overlap@5 vs q_sim_topk) is gated in
    // QueriesSpec.
    GQuery(
      "q_sim_quantized",
      (s, dir) => {
        // Vectors.norm (codegen'd FloatDot) folds the same left-to-right
        // float→double products as the composed aggregate — bit-equal
        // norms, so the grid codes and the oracle are unchanged
        val q = Tables.embeddings(s, dir)
          .withColumn("nrm", Vectors.norm(col("embedding")))
          .select(col("vec_id"),
            Vectors.sq8(col("embedding"), col("nrm")).as("q"))
        val corpus = broadcast(q.select(col("vec_id").as("nn_id"), col("q").as("q2")))
        val w = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
        fanout(q.filter(col("vec_id") <= 20))
          .join(corpus, col("vec_id") =!= col("nn_id"))
          .withColumn("score", Vectors.longDot(col("q"), col("q2")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0) AS BIGINT)) AS q
             |  FROM (SELECT vec_id, embedding,
             |          sqrt(list_reduce(list_transform(embedding, y -> CAST(y AS DOUBLE) * y),
             |                           (a, y) -> a + y)) AS nrm
             |        FROM embeddings) t),
             |s AS (
             |  SELECT a.vec_id, c.vec_id AS nn_id,
             |    list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * c.q[i]))::BIGINT AS score
             |  FROM qv a JOIN qv c ON a.vec_id <> c.vec_id
             |  WHERE a.vec_id <= 20)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM s) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // RANDOM-PROJECTION ANN (Johnson–Lindenstrauss) — the remaining
    // member of the embedding-compression family (SQ8 grid, PQ
    // codebooks, 1-bit hamming, PCA): a deterministic md5-derived ±1
    // projection (Vectors.rpMatrix — per-cell hashing keeps the rows
    // independent, which IS the JL guarantee; see the matrix scaladoc
    // for the measured failure of cheap arithmetic rules) folds the
    // 64-dim SQ8 codes to 32 exact-integer coordinates via one
    // codegen'd LongDot per output dim (narrow, no shuffle).
    // Candidate generation streams the REDUCED corpus (32 longs/vec —
    // half the SQ8 scan bandwidth, the JL memory-bandwidth dividend)
    // against the BROADCAST query batch — the corpus is never
    // broadcast (the q_sim_pq lesson), and the per-query top-100 cut
    // is WindowGroupLimit-partial: each partition forwards ≤
    // 100·|queries| rows, so the one exchange is survivor-sized, not
    // corpus-sized. Survivors alone (broadcast as keys) fetch full
    // codes for the exact integer re-rank. Fully deterministic
    // pipeline → full value oracle, approximation and all; the
    // recall dial (dims 16→0.72, 32→0.85 overlap@5 at cut 100,
    // sf0.01) is gated in QueriesSpec.
    GQuery(
      "q_sim_rp",
      (s, dir) => {
        val mat = Vectors.rpMatrix(32, 64)
        val q = Tables.embeddings(s, dir)
          .withColumn("nrm", Vectors.norm(col("embedding")))
          .select(col("vec_id"), Vectors.sq8(col("embedding"), col("nrm")).as("qc"))
        val rp = q.select(col("vec_id"), Vectors.rpProject(col("qc"), mat).as("p"))
        val rpQueries = broadcast(rp.filter(col("vec_id") <= 20))
        val wRp = Window.partitionBy(col("vec_id")).orderBy(col("rp_score").desc, col("nn_id"))
        val surv = fanout(rp.select(col("vec_id").as("nn_id"), col("p").as("p2")))
          .join(rpQueries, col("vec_id") =!= col("nn_id"))
          .withColumn("rp_score", Vectors.longDot(col("p"), col("p2")))
          .withColumn("rn_c", row_number().over(wRp))
          .filter(col("rn_c") <= 100)
          .select(col("vec_id"), col("nn_id"))
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
        broadcast(surv)
          .join(q.select(col("vec_id").as("nn_id"), col("qc").as("qc2")), "nn_id")
          .join(broadcast(q.filter(col("vec_id") <= 20)), "vec_id")
          .withColumn("score", Vectors.longDot(col("qc"), col("qc2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0) AS BIGINT)) AS qc
             |  FROM (SELECT vec_id, embedding,
             |          sqrt(list_reduce(list_transform(embedding, y -> CAST(y AS DOUBLE) * y),
             |                           (a, y) -> a + y)) AS nrm
             |        FROM embeddings) t),
             |mat AS (
             |  SELECT i.i AS i, j.j AS j,
             |    CASE WHEN ascii(substr(md5('rp:' || i.i || ':' || j.j), 1, 1)) % 2 = 0
             |         THEN 1 ELSE -1 END AS s
             |  FROM range(0, 32) i(i) CROSS JOIN range(0, 64) j(j)),
             |rp AS (
             |  SELECT q.vec_id, m.i, sum(q.qc[m.j + 1] * m.s)::BIGINT AS p
             |  FROM qv q CROSS JOIN mat m GROUP BY 1, 2),
             |rps AS (
             |  SELECT a.vec_id, b.vec_id AS nn_id, sum(a.p * b.p)::BIGINT AS rp_score
             |  FROM rp a JOIN rp b ON a.i = b.i AND a.vec_id <> b.vec_id
             |  WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |surv AS (
             |  SELECT vec_id, nn_id FROM (
             |    SELECT vec_id, nn_id,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY rp_score DESC, nn_id) AS rn_c
             |    FROM rps) t WHERE rn_c <= 100),
             |ex AS (
             |  SELECT c.vec_id, c.nn_id,
             |    list_sum(list_transform(range(1, 65), k -> a.qc[k] * b.qc[k]))::BIGINT AS score
             |  FROM surv c JOIN qv a ON a.vec_id = c.vec_id JOIN qv b ON b.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM ex) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // ---------------------------------------------- streaming as-of
    // The plan-tier as-of operator on the STREAMING ingest path: each
    // purchase micro-batch is enriched with its latest at-or-before
    // click per user via AsOfJoin inside foreachBatch (the batch DF is
    // a plain DataFrame, so the custom strategy applies unchanged —
    // and with the click dim under the broadcast threshold the batch
    // plan is the no-shuffle BroadcastAsOfJoinExec: a narrow enrich
    // pass per batch, the stream-side latest-state-join shape).
    // Exactly-once by the Ingest discipline: output partitioned by
    // _batch_id with dynamic partition overwrite, so a replayed batch
    // rewrites its own partition instead of duplicating. Two
    // micro-batches split the purchase log; the oracle is the SAME
    // whole-log as-of SQL as q_join_asof — batching must not change a
    // per-row enrich.
    GQuery(
      "stream_asof_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        // null user_id filtered up front: the native operator groups
        // null keys (window semantics) while the equi-join oracle never
        // matches them — filtering makes query and oracle agree by
        // construction, not by fixture accident
        val root = cachedFixture(s"graft_sasof_cache_v2_$sfKey") { root =>
          val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
          val purch = ev.filter(col("event_type") === "purchase")
            .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
          val clicks = ev.filter(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts").as("c_ts"))
          val src = root + "/src"
          purch.filter(pmod(col("p_id"), lit(2)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val q = s.readStream.schema(purch.schema).parquet(src)
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
              graft.plans.AsOfJoin.asof(batch, clicks,
                  Seq("user_id"), Seq("c_user"), "p_ts", "c_ts", Seq("click_id"))
                .withColumn("_batch_id", lit(id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id").parquet(root + "/out")
            }
            .option("checkpointLocation", root + "/ckpt")
            .start()
          try {
            q.processAllAvailable()
            purch.filter(pmod(col("p_id"), lit(2)) === 1)
              .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
          } finally q.stop()
        }
        s.read.parquet(root + "/out")
          .select(col("p_id"), col("user_id"),
            date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_time"),
            col("click_id"),
            date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_time"))
          .orderBy(col("p_id"))
      },
      Some("""SELECT p_id, user_id, p_time, click_id, click_time FROM (
             |  SELECT p.event_id AS p_id, p.user_id,
             |         strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_time,
             |         c.event_id AS click_id,
             |         strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_time,
             |         row_number() OVER (PARTITION BY p.event_id
             |                            ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
             |  FROM (SELECT * FROM events
             |        WHERE event_type='purchase' AND user_id IS NOT NULL) p
             |  LEFT JOIN (SELECT * FROM events
             |        WHERE event_type='click' AND user_id IS NOT NULL) c
             |    ON p.user_id = c.user_id AND c.ts <= p.ts) t
             |WHERE rn = 1 ORDER BY p_id""".stripMargin)),

    // --------------------------------- IVF + SQ8 combined (the real
    // serving plan): coarse IVF quantizer prunes the corpus to the
    // query's own cluster, then the in-cluster candidates are scored on
    // int8 codes — the two scale levers composed exactly as a
    // production ANN index stores them (cluster-partitioned code
    // lists): the cluster cut bounds CANDIDATES (corpus/k per probe),
    // the codes bound BYTES per candidate (64 B vs 256 B) and make the
    // in-cluster scores integer-exact. Assignment is the proven
    // q_sim_ivf narrow centroid-literal argmax (no shuffle); codes are
    // the proven q_sim_quantized unit-sphere grid; the only wide
    // exchange is the cluster-key co-partition. Full value oracle:
    // DuckDB replays the assignment AND the integer dots bit-exactly.
    GQuery(
      "q_sim_ivf_sq",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
          .withColumn("qc", Vectors.sq8(col("v"), col("nrm")))
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val cv = r.getSeq[Float](1)
            val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
            (r.getLong(0), cv, cnrm)
          }.sortBy(_._1).toSeq
        val scored = cents.map { case (cid, cv, cnrm) =>
          struct(
            (Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("c"),
            lit(-cid).as("nid"))
        }
        val assigned = emb
          .withColumn("cluster", -greatest(scored: _*).getField("nid"))
          .select(col("vec_id"), col("qc"), col("cluster"))
        val queries = assigned.filter(col("vec_id") <= 50)
        val corpus = assigned.select(col("vec_id").as("nn_id"),
          col("qc").as("qc2"), col("cluster"))
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
        queries.join(corpus, Seq("cluster"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("score", Vectors.longDot(col("qc"), col("qc2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (
             |  SELECT vec_id, list_transform(e,
             |    x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |  FROM (SELECT vec_id, e,
             |          sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |        FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |assigned AS (
             |  SELECT a.vec_id, q.qc, cluster FROM (
             |    SELECT vec_id, c_id AS cluster FROM (
             |      SELECT a.vec_id, c.c_id,
             |        row_number() OVER (PARTITION BY a.vec_id
             |          ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |      FROM v a CROSS JOIN cent c) z WHERE rn = 1) a
             |  JOIN qv q ON q.vec_id = a.vec_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT q.vec_id, x.vec_id AS nn_id,
             |    list_sum(list_transform(range(1, len(q.qc) + 1),
             |      i -> q.qc[i] * x.qc[i]))::BIGINT AS score,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_sum(list_transform(range(1, len(q.qc) + 1),
             |        i -> q.qc[i] * x.qc[i])) DESC, x.vec_id) AS rn
             |  FROM assigned q JOIN assigned x
             |    ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |  WHERE q.vec_id <= 50) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin)),

    // ------------------------------------- product-quantized ANN (PQ)
    // The third compression rung of the ANN family (float32 256 B →
    // SQ8 64 B → PQ 16 codes ≈ 16 B/vector): split the SQ8 code into
    // 16 four-dim subspaces, quantize each to one of 32 sampled
    // codewords (first-32-by-id init — the deterministic IVF centroid
    // rule), and search in the FAISS refine shape: ADC (exact query
    // code · reconstructed codeword concat) prunes the corpus to the
    // top-50 candidates per query, and only those 50 rows evaluate the
    // exact-SQ8 re-rank dot. All-integer end to end, so the oracle
    // replays assignment, ADC, and re-rank bit-exactly; codeword count
    // and re-rank depth R are the recall dials (measured on this
    // fixture: overlap@5 vs exact = 0.61 at R=10, 0.895 at R=50 —
    // gated ≥ 0.8 in QueriesSpec beside the SQ8 gate). At 100 TB the
    // ADC scan touches 16 B/vector of code-list pages and the refine
    // fetches 64 B for 50·queries rows — the candidate-generation /
    // refine cost split every production PQ server runs.
    GQuery(
      "q_sim_pq",
      (s, dir) => {
        Vectors.pqSearch(Tables.embeddings(s, dir), "vec_id", "embedding",
            m = 16, ncw = 32, queryPred = col("vec_id") <= 20, candR = 50, k = 5)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a JOIN recon r ON a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // ----------------------------------------- binary (1-bit) ANN (BQ)
    // The LAST rung of the compression ladder (float32 256 B → SQ8
    // 64 B → PQ ~16 B → binary 8 B/vector): sign-bit codes packed into
    // two 32-bit words, HAMMING-ranked (bit_count ∘ xor — all integer,
    // ties to the lowest id) to candR candidates, exact-SQ8 re-rank on
    // the survivors. The standard billion-vector first-pass filter —
    // the hamming scan touches 8 B/vector, the memory-bandwidth floor.
    // Same scale-safe shape as q_sim_pq (queries broadcast, map-side
    // scoring over unmoved corpus splits, two-stage union-bound
    // candidate cut, survivor-only code fetch); recall vs the exact
    // float top-5 is measured and gated in QueriesSpec next to the
    // SQ8/PQ gates. Fully integer after packing → full value oracle.
    GQuery(
      "q_sim_binary",
      (s, dir) => {
        Vectors.binarySearch(Tables.embeddings(s, dir), "vec_id", "embedding",
            queryPred = col("vec_id") <= 20, candR = 50, k = 5)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |bits AS (SELECT vec_id,
             |    list_sum(list_transform(range(1, 33),
             |      j -> CASE WHEN e[j] > 0 THEN 1::BIGINT << (j - 1) ELSE 0 END))::BIGINT AS w0,
             |    list_sum(list_transform(range(33, 65),
             |      j -> CASE WHEN e[j] > 0 THEN 1::BIGINT << (j - 33) ELSE 0 END))::BIGINT AS w1
             |  FROM v),
             |ham AS (SELECT q.vec_id, c.vec_id AS nn_id,
             |    (bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)))::BIGINT AS ham
             |  FROM bits q JOIN bits c ON q.vec_id <> c.vec_id
             |  WHERE q.vec_id <= 20),
             |cand AS (SELECT vec_id, nn_id FROM (
             |    SELECT vec_id, nn_id,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY ham, nn_id) AS rn_c
             |    FROM ham) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // DISTRIBUTED PCA (power iteration) — the embedding-compression /
    // whitening stage of a training pipeline, decomposed the way 100 TB
    // forces: (1) ONE narrow pass materializes the corpus Gram matrix
    // over SQ8-quantized codes — a double per-row generate into dims²
    // cells with map-side partial aggregation, so only dims² longs per
    // partition ever cross the wire and the collected matrix is
    // METADATA (4096 longs), never data; (2) the dominant eigenvector
    // comes from Vectors.powerIterate — 3 rounds of exact-INTEGER
    // w = G·v with an integer rescale (sign-split div by a precomputed
    // scalar; trunc-vs-floor on negatives differs between engines), so
    // no float ever enters and the oracle replays training bit-for-bit
    // (the q_bpe_train rule applied to linear algebra); (3) the corpus
    // projects onto the eigen-direction through the codegen'd LongDot
    // against the 64-int literal — narrow, exact. Output: top-10 docs
    // by principal-component score.
    GQuery(
      "q_embed_pca",
      (s, dir) => {
        val q = Tables.embeddings(s, dir)
          .withColumn("nrm", Vectors.norm(col("embedding")))
          .select(col("vec_id"), Vectors.sq8(col("embedding"), col("nrm")).as("qc"))
          .cache() // feeds the Gram pass and the projection
        val g = q
          .select(col("qc"), posexplode(col("qc")).as(Seq("i", "qi")))
          .select(col("i"), col("qi"), posexplode(col("qc")).as(Seq("j", "qj")))
          .groupBy(col("i"), col("j")).agg(sum(col("qi") * col("qj")).as("g"))
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        val dims = g.keys.map(_._1).max + 1
        val v = Vectors.powerIterate(g, dims, iters = 3)
        q.select(col("vec_id"),
            graft.functions.LongDot(col("qc"), typedLit(v.toSeq)).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(10)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |idx AS (SELECT i FROM range(1, 65) r(i)),
             |g AS (SELECT a.i AS i, b.i AS j, sum(q.qc[a.i] * q.qc[b.i])::BIGINT AS g
             |      FROM qv q CROSS JOIN idx a CROSS JOIN idx b GROUP BY 1, 2),
             |w1 AS (SELECT i, sum(g)::BIGINT AS w FROM g GROUP BY i),
             |d1 AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w1),
             |v1 AS (SELECT i, CASE WHEN w >= 0 THEN w // d ELSE -((-w) // d) END AS v FROM w1, d1),
             |w2 AS (SELECT g.i, sum(g.g * v1.v)::BIGINT AS w FROM g JOIN v1 ON v1.i = g.j GROUP BY 1),
             |d2 AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w2),
             |v2 AS (SELECT i, CASE WHEN w >= 0 THEN w // d ELSE -((-w) // d) END AS v FROM w2, d2),
             |w3 AS (SELECT g.i, sum(g.g * v2.v)::BIGINT AS w FROM g JOIN v2 ON v2.i = g.j GROUP BY 1),
             |d3 AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w3),
             |v3 AS (SELECT i, CASE WHEN w >= 0 THEN w // d ELSE -((-w) // d) END AS v FROM w3, d3),
             |sc AS (SELECT q.vec_id, sum(q.qc[v3.i] * v3.v)::BIGINT AS score
             |       FROM qv q CROSS JOIN v3 GROUP BY 1)
             |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)),

    // ------------------------------- IVF ∘ PQ composed serving (ANN)
    // The production serving plan, fully composed — the FAISS
    // `IVFPQ,Refine` shape that q_sim_ivf_sq and q_sim_pq each built
    // half of: the coarse quantizer (q_sim_ivf's narrow centroid-
    // literal argmax over the 9 seed centroids vec_id ≤ 8 — the
    // q_sim_ivf/q_sim_ivf_sq convention; the SERVED twin below uses
    // kmeans' first-8 init, vec_id < 8) files every vector in
    // ONE cluster and cuts each query's candidates to its own cluster
    // BEFORE any per-candidate work; ADC (query SQ8 code · PQ-
    // reconstructed codeword concat, 16×32 codebook) ranks the
    // in-cluster code list to 50 survivors; only those evaluate the
    // exact-SQ8 re-rank dot. What this composition retires vs q_sim_pq:
    // the whole-corpus BROADCAST (the build side outgrows executors at
    // scale) and the per-query GLOBAL window over all corpus rows —
    // replaced by the cluster-key co-partition join, the plan's ONLY
    // wide exchange. Per-query touched bytes at 100 TB: (corpus/k)·16
    // code bytes for ADC + 50·64 B for refine; the corpus shuffles
    // once at index build, never per query. All-integer after the
    // coarse assign → full value oracle, bit-exact tie-breaks. nprobe
    // and candR are the two recall dials (gated in QueriesSpec vs the
    // float ground truth beside the SQ8/PQ gates).
    GQuery(
      "q_sim_ivf_pq",
      (s, dir) => {
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        Vectors.ivfPqSearch(Tables.embeddings(s, dir), "vec_id", "embedding",
            cents, m = 16, ncw = 32, queryPred = col("vec_id") <= 20,
            nprobe = 1, candR = 50, k = 5)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |asg AS (SELECT vec_id, c_id AS cluster FROM (
             |          SELECT a.vec_id, c.c_id,
             |            row_number() OVER (PARTITION BY a.vec_id
             |              ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |          FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a
             |        JOIN asg qa ON qa.vec_id = a.vec_id
             |        JOIN asg ra ON ra.cluster = qa.cluster
             |        JOIN recon r ON r.vec_id = ra.vec_id AND a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // The SAME composed IVF∘PQ search served from the PERSISTED index
    // (ops/IvfPqIndex): built once per sf (cached fixture — k=8
    // centroids at iters=0 = the deterministic first-8-BY-ID init, so
    // the oracle replays them as vec_id < 8; 16×32 codebook from the
    // first-32-by-id SQ8 codes, same rule as q_sim_pq), then every
    // invocation reads centroids + codebook metadata and ONLY the
    // probed cluster partitions of the two stored tiers: the m-byte
    // PQ code lists for the ADC cut (reconstructed at serve time from
    // codes + codebook literals — the index ships codes, never
    // reconstructions) and the exact-SQ8 refine tier for the candR
    // survivors. What verify value-checks beyond q_sim_ivf_pq: the
    // full build/serve lifecycle — parquet round-trip of centroids/
    // codebook/codes, two-tier partition pruning, delta-union read
    // path — against the identical all-integer DuckDB semantics.
    GQuery(
      "q_sim_ivf_pq_served",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val idxDir = cachedFixture(s"graft_ivfpq_cache_v1_$sfKey") { root =>
          IvfPqIndex.build(s, root + "/idx", fanout(Tables.embeddings(s, dir)),
            "vec_id", "embedding", k = 8, iters = 0, m = 16, ncw = 32)
        } + "/idx"
        IvfPqIndex.topK(s, idxDir,
            Tables.embeddings(s, dir).filter(col("vec_id") <= 20),
            "vec_id", "embedding", k = 5, nprobe = 1, candR = 50)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |asg AS (SELECT vec_id, c_id AS cluster FROM (
             |          SELECT a.vec_id, c.c_id,
             |            row_number() OVER (PARTITION BY a.vec_id
             |              ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |          FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a
             |        JOIN asg qa ON qa.vec_id = a.vec_id
             |        JOIN asg ra ON ra.cluster = qa.cluster
             |        JOIN recon r ON r.vec_id = ra.vec_id AND a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // STREAMING ANN-index ingest e2e: embeddings arrive in 3
    // micro-batches (vec_id % 3 = arrival order); the IVF∘PQ index is
    // built on batch 0 (its FIXED geometry: first-8-of-base centroids,
    // first-32-of-base codebook — both oracle-replayable because base
    // membership is a vec_id predicate) and batches 1–2 append as
    // encode-only deltas through the checkpointed streaming loop
    // (Streams.annIngest), never re-reading or re-encoding what
    // already landed. What verify value-checks is the END-STATE SERVE:
    // top-5 over the base+delta union under the base-trained
    // artifacts, against the same all-integer DuckDB pipeline as
    // q_sim_ivf_pq with the cent/cw CTEs sampled from the base subset.
    // The pipeline runs once per sf (cached fixture); what bench times
    // is the steady-state serve.
    GQuery(
      "stream_ann_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_sann_cache_v1_$sfKey") { root =>
          val emb = Tables.embeddings(s, dir)
          IvfPqIndex.build(s, root + "/idx",
            emb.filter(pmod(col("vec_id"), lit(3)) === 0),
            "vec_id", "embedding", k = 8, iters = 0, m = 16, ncw = 32)
          val src = root + "/src"
          emb.filter(pmod(col("vec_id"), lit(3)) === 1)
            .coalesce(1).write.mode("append").parquet(src)
          val q = graft.streaming.Streams.annIngest(
            s.readStream.schema(emb.schema).parquet(src),
            root + "/idx", root + "/out", root + "/ckpt")
          try {
            q.processAllAvailable()
            emb.filter(pmod(col("vec_id"), lit(3)) === 2)
              .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
          } finally q.stop()
        }
        IvfPqIndex.topK(s, root + "/idx",
            Tables.embeddings(s, dir).filter(col("vec_id") <= 20),
            "vec_id", "embedding", k = 5, nprobe = 1, candR = 50)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v
             |         WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT 8),
             |asg AS (SELECT vec_id, c_id AS cluster FROM (
             |          SELECT a.vec_id, c.c_id,
             |            row_number() OVER (PARTITION BY a.vec_id
             |              ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |          FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a
             |        JOIN asg qa ON qa.vec_id = a.vec_id
             |        JOIN asg ra ON ra.cluster = qa.cluster
             |        JOIN recon r ON r.vec_id = ra.vec_id AND a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

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
             |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin)),

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
             |ORDER BY v.doc_id""".stripMargin)),

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
