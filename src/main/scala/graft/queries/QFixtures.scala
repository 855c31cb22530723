package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** Shared fixtures and oracle fragments for the Extensions family files
  * (split from the monolithic Extensions.scala in round 18): the
  * deterministic CDC log and its latest-wins DuckDB twin, the cached
  * table-lifecycle fixtures (MOR / savepoint / file-group / mutable SQL
  * warehouses), the /tmp build-once fixture cache protocol, and the
  * shared SQL/plan helpers. Visibility is package-scoped: these are
  * query-registry plumbing, not public API.
  */
private[queries] object QFixtures {

  val dround = (c: org.apache.spark.sql.Column) => round(c.cast("double"), 4)

  /** Shared DuckDB replay of ops/Bpe.train(iters = 3): word-frequency
    * vocabulary v0, then 3 unrolled merge iterations vK-1 --(pair stats
    * pK, lexicographic argmax mK, greedy leftmost merge)--> vK. The
    * greedy rule mirrors Bpe.mergeOnce exactly: islands of consecutive
    * match positions, keep even offsets, drop the consumed right symbol.
    * Used by both q_bpe_train (trajectory + final symbols) and
    * q_bpe_encode (v3 as the segmentation table). */
  lazy val bpeTrainCtes: String = {
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
  def fanout(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
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
  def ngramPairCounts(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
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

  def ngramPairs(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    ngramPairCounts(s, dir)
      // floor-half-up: see Text.jaccard — power-of-two unions tie at
      // the 4th decimal where engine round() rules diverge
      .withColumn("jac", floor(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) * 10000 + 0.5) / 10000)
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jac"))

  /** DuckDB twin of [[ngramPairs]] as a CTE chain ending in `pairs`
    * (id_a, id_b, jac) — spliced into both dedup oracles so the pair
    * semantics are defined once on each side. */
  val ngramPairSql =
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
  def cdcLog(s: org.apache.spark.sql.SparkSession, dir: String) =
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
  val latestWinsSql =
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
  val textSearchServedSql =
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
  def morTable(s: org.apache.spark.sql.SparkSession, dir: String,
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
  def savepointTable(s: org.apache.spark.sql.SparkSession, dir: String): String = {
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
  def fileGroupTable(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val sfKey = sfFingerprint(dir)
    // v2: commit() writes per-bucket key blooms into the manifest (the
    // bloom-index tagging path needs them; v1 caches predate the field)
    // v3: the table dir is named like a catalog table ("employees") so
    // the same fixture serves q_cdc_sql_read's DSv2 catalog root
    // v4: commit() writes the #ordhi ceiling header (r19) — a stale
    // pre-header cache would silently route q_cdc_read_incremental
    // through the subquery fallback instead of the metadata threshold
    cachedFixture(s"graft_fg_cache_v4_$sfKey") { root =>
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
  def fileGroupTableStr(s: org.apache.spark.sql.SparkSession, dir: String): String = {
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
  def fileGroupTableComp(s: org.apache.spark.sql.SparkSession, dir: String): String = {
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
  def registerCdcCatalog(s: org.apache.spark.sql.SparkSession, root: String,
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
  def mutableCdcRoot(s: org.apache.spark.sql.SparkSession, dir: String,
                             cacheName: String): String =
    cachedFixture(s"${cacheName}_${sfFingerprint(dir)}") { root =>
      graft.cdc.FileGroups.commit(s, root + "/employees", cdcLog(s, dir),
        0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    }

  // v2: the merge source's lsn base changed from a hardcoded 2000000
  // to max(event_id)+1 — fixtures mutated under the old base hold
  // higher lsns than the new formula assigns, which the ord-regression
  // guard now (correctly) refuses
  def mergeTableRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
    mutableCdcRoot(s, dir, "graft_fg_merge_cache_v2")

  def dmlTableRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
    mutableCdcRoot(s, dir, "graft_fg_dml_cache_v1")

  /** q_cdc_sql_maintain's own warehouse (the procedures mutate
    * versions/markers — same isolation rationale as [[mergeTableRoot]]):
    * the three-batch lifecycle of [[fileGroupTable]], so the
    * post-rollback state is the deterministic `lsn < c2` prefix. After
    * the build, two-version GC retains {v1, v2}; the query's rollback
    * lands the table at v1 and stays there (re-runs: the savepoint
    * re-pins, the rollback removes nothing) — a fixpoint like the other
    * mutable SQL fixtures. */
  def maintTableRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
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
  def morRead(s: org.apache.spark.sql.SparkSession, dir: String,
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
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  /** The streaming sink's _spark_metadata log records absolute
    * part-file paths into the pre-rename fixture build dir; a landed
    * fixture is a plain read-only parquet dir once its stream stops,
    * so every stream-fixture builder drops the log and lets reads
    * list files directly. */
  def dropSinkLog(outDir: String): Unit =
    rmTree(new java.io.File(outDir, "_spark_metadata"))

  /** Cache-key component for testdata-derived fixtures: the sf dir's
    * basename plus a fingerprint of its parquet files' (name, size,
    * mtime). A driver-side fixture regeneration changes the fingerprint
    * and so invalidates every cached fixture built from the old data —
    * without this, r12's testdata regen left /tmp caches built from the
    * previous encoding serving stale streaming-e2e results. */
  def sfFingerprint(dir: String): String = {
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
  def rrfFusedTop10(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
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
  def hllStoreFixture(s: org.apache.spark.sql.SparkSession, dir: String): String = {
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

  def cachedFixture(name: String)(build: String => Unit): String = {
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
}
