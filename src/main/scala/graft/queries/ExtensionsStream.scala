package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** Streaming end-to-end family: checkpointed ingest/route/store paths and
  * the maintained-sketch / state / join / session pipelines, each oracled.
  *
  * One family file of the [[Extensions]] registry (split round 18 —
  * the single 6k-line file had become the review bottleneck). Blocks
  * are verbatim moves; shared fixtures/oracle helpers live in
  * [[QFixtures]]. Every query keeps its DuckDB oracle and scale note.
  */
private[queries] object ExtensionsStream {

  import QFixtures._

  def queries: Seq[GQuery] = Seq(

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
        val root = cachedFixture("graft_fgstream_cache_v2_200_3") { root =>
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
             |  SELECT value FROM read_json('/tmp/graft_fgstream_cache_v2_200_3/topic/*.txt',
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

    // STREAMING INCREMENTAL READ OF THE FILE-GROUP STORE (round 20) —
    // the continuous consumer the reference's pipeline exists to feed
    // (README.md:298-307; Hudi's incremental streaming read / Delta's
    // readStream): `spark.readStream.format("graft-cdc")` over a
    // committed table, offsets = table VERSIONS, each micro-batch =
    // the batch door's bounded startingVersion cut between consecutive
    // offsets (sources/IncrementalStreamSource.scala — same #ordhi
    // threshold, same changed-file-group cut, so the stream and batch
    // doors cannot diverge; IncrementalStreamSpec pins the equivalence
    // plus checkpoint recovery and the aged-out-base loud error). The
    // lifecycle here: three commits, a stream from version 0 lands
    // batch b0 = changed-in-(v0,v2], a FOURTH commit arrives while the
    // stream runs and lands as b1 = changed-in-(v2,v3]. The DuckDB twin
    // replays both cuts as window SQL over the same change log (state
    // at the target version, rows above the base version's ord
    // ceiling). Scale: per trigger = TWO manifest reads + a scan of
    // only the changed file groups with the ord predicate pushed —
    // O(changed buckets) per batch at any table size or timeline
    // length. What bench times is the landed-batches read.
    GQuery(
      "stream_incr_read_e2e",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val root = cachedFixture(s"graft_incrstream_cache_v1_$sfKey") { root =>
          val log = cdcLog(s, dir)
          val n = Tables.events(s, dir).count()
          val (q1, q2, q3) = (n / 4, n / 2, 3 * n / 4)
          val t = root + "/store/employees"
          graft.cdc.FileGroups.setRetention(s, t, 8)
          graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") < q1),
            0L, Seq("id"), Seq("lsn"), nBuckets = 8)
          graft.cdc.FileGroups.commit(s, t,
            log.filter(col("lsn") >= q1 && col("lsn") < q2), 1L, Seq("id"), Seq("lsn"))
          graft.cdc.FileGroups.commit(s, t,
            log.filter(col("lsn") >= q2 && col("lsn") < q3), 2L, Seq("id"), Seq("lsn"))
          val q = s.readStream.format("graft-cdc").option("startingVersion", 0).load(t)
            .writeStream.option("checkpointLocation", root + "/ckpt")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
              graft.ops.DeltaProtocol.writeBatchPartition(
                b.select(col("id"), col("lsn"), col("op"), col("value")),
                id, root + "/landed")
              ()
            }
            .start()
          try {
            q.processAllAvailable() // b0: (v0 -> v2]
            graft.cdc.FileGroups.commit(s, t, log.filter(col("lsn") >= q3),
              3L, Seq("id"), Seq("lsn"))
            q.processAllAvailable() // b1: (v2 -> v3]
          } finally q.stop()
        }
        s.read.parquet(root + "/landed")
          .select(concat(lit("b"), col("_batch_id").cast("string")).as("phase"),
            col("id"), col("lsn"), col("op"), col("value"))
          .orderBy(col("phase"), col("id"))
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM events),
             |ev AS (SELECT user_id AS id, event_id AS lsn,
             |  CASE WHEN event_id % 11 = 0 THEN 'd'
             |       WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
             |  value FROM events),
             |cuts AS (SELECT n // 4 AS q1, n // 2 AS q2, (3 * n) // 4 AS q3 FROM n),
             |thr0 AS (SELECT max(lsn) AS t FROM ev, cuts WHERE lsn < q1),
             |thr2 AS (SELECT max(lsn) AS t FROM ev, cuts WHERE lsn < q3),
             |state2 AS (SELECT id, lsn, op, value FROM (
             |  SELECT e.*, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
             |  FROM ev e, cuts WHERE lsn < q3) z WHERE rn = 1 AND op <> 'd'),
             |state3 AS (SELECT id, lsn, op, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
             |  FROM ev) z WHERE rn = 1 AND op <> 'd'),
             |b0 AS (SELECT 'b0' AS phase, id, lsn, op, value FROM state2
             |       WHERE lsn > (SELECT t FROM thr0)),
             |b1 AS (SELECT 'b1' AS phase, id, lsn, op, value FROM state3
             |       WHERE lsn > (SELECT t FROM thr2))
             |SELECT phase, id, lsn, op, value FROM (
             |  SELECT * FROM b0 UNION ALL SELECT * FROM b1) u
             |ORDER BY phase, id""".stripMargin))
  )
}
