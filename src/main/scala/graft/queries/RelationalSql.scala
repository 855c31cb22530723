package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import RelCommon._

/** the Spark-4 SQL surface, late aggregate additions and plan-shape queries — split from Relational.scala (round 18) purely for review
  * ergonomics; the registry, ids and oracles are unchanged. */
private[queries] object RelationalSql {

  def queries: Seq[GQuery] = Seq(

    // Spark 4 SQL PIPE syntax (SPARK-49555, `|>`): the linear query
    // dialect — each |> stage consumes the previous relation, so a
    // join→filter→aggregate→having→topk pipeline reads top-to-bottom
    // in execution order. The parser lowers pipes to the SAME logical
    // plan as the nested ANSI form (the oracle below IS that form), so
    // every Catalyst optimization — pushdown through the join, the
    // broadcast pick, partial aggregation — applies unchanged; the
    // post-AGGREGATE |> WHERE lands as HAVING. Surface twin of
    // q_sql_udf/q_json_variant's Spark 4 coverage.
    GQuery(
      "q_sql_pipe",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("gq_pipe_orders")
        Tables.customer(s, dir).createOrReplaceTempView("gq_pipe_customer")
        s.sql(
          """FROM gq_pipe_orders
            ||> JOIN gq_pipe_customer ON o_custkey = c_custkey
            ||> WHERE o_orderdate >= DATE '1997-01-01'
            ||> AGGREGATE count(*) AS n_orders,
            |     round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
            |   GROUP BY c_mktsegment
            ||> WHERE n_orders > 10
            ||> ORDER BY revenue DESC, c_mktsegment
            ||> LIMIT 3""".stripMargin)
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderdate >= DATE '1997-01-01'
             |GROUP BY c_mktsegment
             |HAVING count(*) > 10
             |ORDER BY revenue DESC, c_mktsegment
             |LIMIT 3""".stripMargin)),

    // Spark 4 string COLLATION (SPARK-46830): case-insensitive
    // semantics declared IN THE TYPE, not smeared over the query as
    // lower() calls — the collated GROUP BY and the collated predicate
    // both run on the original bytes (one pass, no derived column),
    // and `variants` counts the distinct BINARY forms inside each
    // case-insensitive group (= 2 here, the proof that collation
    // merged keys lower() would have had to rewrite). min(pri) is the
    // binary-least representative (uppercase sorts first in ASCII) —
    // deterministic output from a case-mixed key. The oracle plays the
    // same query the pre-collation way: lower() everywhere.
    GQuery(
      "q_str_collation",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("gq_coll_orders")
        s.sql(
          """SELECT min(pri) AS priority, count(*) AS n,
            |  count(DISTINCT pri) AS variants,
            |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
            |FROM (SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
            |             ELSE o_orderpriority END AS pri, o_totalprice
            |      FROM gq_coll_orders)
            |WHERE NOT pri COLLATE UTF8_LCASE = '5-LOW'
            |GROUP BY pri COLLATE UTF8_LCASE
            |ORDER BY priority""".stripMargin)
      },
      Some("""WITH m AS (
             |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
             |         ELSE o_orderpriority END AS pri, o_totalprice
             |  FROM orders)
             |SELECT min(pri) AS priority, count(*) AS n,
             |  count(DISTINCT pri) AS variants,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
             |FROM m WHERE lower(pri) <> '5-low'
             |GROUP BY lower(pri)
             |ORDER BY priority""".stripMargin)),

    // Spark 4 RECURSIVE CTE (SPARK-24497, landed in 4.0) — iterative
    // computation declared IN SQL: a hierarchy walk over the implicit
    // customer forest (parent = key div 10), descending from the root
    // and aggregating per depth. The engine executes the recursion as
    // repeated joins of the frontier against the base relation — each
    // level is ONE distributed join whose frontier is level-sized, and
    // the DEPTH (≈ log10 of keys) is independent of corpus size: at
    // 100 TB the recursion is ~8 rounds of narrow joins, not a deep
    // sequential chain. The oracle runs the same WITH RECURSIVE in
    // DuckDB (`div` ↔ `//` is the only dialect delta).
    GQuery(
      "q_recursive_cte",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("gq_rec_customer")
        s.sql(
          """WITH RECURSIVE walk(k, depth) AS (
            |  SELECT CAST(0 AS BIGINT), 0
            |  UNION ALL
            |  SELECT c.c_custkey, w.depth + 1
            |  FROM gq_rec_customer c JOIN walk w ON c.c_custkey div 10 = w.k
            |  WHERE c.c_custkey > 0)
            |SELECT w.depth, count(*) AS n,
            |  round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS bal
            |FROM walk w JOIN gq_rec_customer c ON c.c_custkey = w.k
            |GROUP BY w.depth ORDER BY w.depth""".stripMargin)
      },
      Some("""WITH RECURSIVE walk(k, depth) AS (
             |  SELECT CAST(0 AS BIGINT), 0
             |  UNION ALL
             |  SELECT c.c_custkey, w.depth + 1
             |  FROM customer c JOIN walk w ON c.c_custkey // 10 = w.k
             |  WHERE c.c_custkey > 0)
             |SELECT w.depth, count(*) AS n,
             |  round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(19,4))) AS DOUBLE), 4) AS bal
             |FROM walk w JOIN customer c ON c.c_custkey = w.k
             |GROUP BY w.depth ORDER BY w.depth""".stripMargin)),

    // Correlated LATERAL join (Spark 4 `JOIN LATERAL`) — the top-N-per-
    // group pattern written the declarative way: for each customer, the
    // lateral subquery picks their 2 highest-value orders. Catalyst
    // DECORRELATES the per-row LIMIT into WindowGroupLimit (map-side
    // top-k partials BEFORE the exchange, then the rank filter) + one
    // hash join — never a nested loop over customers × orders, which is
    // what a naive lateral executor would do and what the plan pin in
    // QueriesSpec rules out. At 100 TB: one orders exchange carrying
    // ≤ 2 rows per customer out of the group limit, one broadcast of
    // the customer keys.
    GQuery(
      "q_join_lateral",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("gq_lat_customer")
        Tables.orders(s, dir).createOrReplaceTempView("gq_lat_orders")
        s.sql(
          """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
            |FROM gq_lat_customer c JOIN LATERAL (
            |  SELECT o_orderkey, o_totalprice FROM gq_lat_orders
            |  WHERE o_custkey = c.c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
            |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
             |FROM customer c CROSS JOIN LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  WHERE o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
             |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)),

    // EXECUTE IMMEDIATE (SPARK-44776) + session VARIABLES (SPARK-46908)
    // — parameterized dynamic SQL, engine-side: the query text carries
    // a `?` placeholder and the value binds through USING from a
    // declared session variable, so dynamic construction never string-
    // concatenates values into SQL (the injection-unsafe alternative)
    // and the parameterized text stays plan-cacheable by shape. The
    // executed statement plans through Catalyst exactly as its static
    // form — pushdown, partial agg, everything — which is what the
    // oracle pins: dynamic-with-binding ≡ the resolved static query.
    GQuery(
      "q_sql_exec_immediate",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("gq_ei_orders")
        s.sql("DECLARE OR REPLACE VARIABLE gq_ei_cut DOUBLE")
        s.sql("SET VAR gq_ei_cut = 150000.0")
        s.sql("""EXECUTE IMMEDIATE
                |  'SELECT o_orderpriority, count(*) AS n,
                |     round(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double), 4) AS tot
                |   FROM gq_ei_orders WHERE o_totalprice > ? GROUP BY 1 ORDER BY 1'
                |  USING gq_ei_cut""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*)::BIGINT AS n,
             |  round(CAST(sum(o_totalprice::DECIMAL(18,4)) AS DOUBLE), 4) AS tot
             |FROM orders WHERE o_totalprice > 150000.0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Spark 4 SQL SCRIPTING (SPARK-48338): procedural control flow —
    // DECLARE / WHILE / SET compound statements — executed ENGINE-side
    // with each iteration's statement planned by Catalyst as usual (the
    // script is orchestration, the work stays distributed; the loop
    // count here is a fixed stratum constant, never data-sized). The
    // script accumulates residue-weighted counts over five strata; the
    // oracle computes the same total in one declarative pass — scripted
    // iteration must agree with the set-based form.
    GQuery(
      "q_sql_script",
      (s, dir) => {
        s.conf.set("spark.sql.scripting.enabled", "true")
        Tables.events(s, dir).createOrReplaceTempView("gq_script_events")
        s.sql(
          """BEGIN
            |  DECLARE k INT DEFAULT 0;
            |  DECLARE acc BIGINT DEFAULT 0;
            |  WHILE k < 5 DO
            |    SET acc = acc + (k + 1) * (SELECT count(*)
            |      FROM gq_script_events WHERE user_id % 5 = k);
            |    SET k = k + 1;
            |  END WHILE;
            |  SELECT 5 AS n_strata, acc AS weighted_total;
            |END""".stripMargin)
      },
      Some("""SELECT 5 AS n_strata,
             |  sum(user_id % 5 + 1)::BIGINT AS weighted_total
             |FROM events""".stripMargin)),

    // Time-INTERVAL range frame — the window surface q_win_range_frame
    // (numeric RANGE) doesn't cover: a trailing 3-hour frame over the
    // hourly series, where frame membership is event-TIME distance, not
    // row adjacency (a gap hour shrinks the frame; ROWS BETWEEN 3
    // PRECEDING would silently bridge it — the monitoring-window bug).
    // Runs on the hourly AGGREGATE (grid-sized), so the corpus is
    // scanned once into the group-by and the interval frame never sees
    // raw events; one event_type×hour exchange shared by the agg and
    // the window.
    GQuery(
      "q_win_range_interval",
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("gq_rint_events")
        s.sql(
          """SELECT event_type, date_format(h, 'yyyy-MM-dd HH:mm:ss') AS hour,
            |  n, n3h,
            |  round(CAST(v3h AS DOUBLE), 4) AS v3h
            |FROM (
            |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
            |    sum(count(*)) OVER w AS n3h,
            |    sum(sum(CAST(value AS DECIMAL(18,4)))) OVER w AS v3h
            |  FROM gq_rint_events
            |  GROUP BY 1, 2
            |  WINDOW w AS (PARTITION BY event_type ORDER BY date_trunc('hour', ts)
            |    RANGE BETWEEN INTERVAL 3 HOURS PRECEDING AND CURRENT ROW))
            |ORDER BY event_type, hour""".stripMargin)
      },
      Some("""SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
             |  n, n3h::BIGINT AS n3h,
             |  round(CAST(v3h AS DOUBLE), 4) AS v3h
             |FROM (
             |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
             |    sum(count(*)) OVER w AS n3h,
             |    sum(sum(CAST(value AS DECIMAL(18,4)))) OVER w AS v3h
             |  FROM events
             |  GROUP BY 1, 2
             |  WINDOW w AS (PARTITION BY event_type ORDER BY date_trunc('hour', ts)
             |    RANGE BETWEEN INTERVAL 3 HOURS PRECEDING AND CURRENT ROW)) z
             |ORDER BY event_type, hour""".stripMargin)),

    // IGNORE NULLS navigation (lag / last_value / first_value /
    // nth_value with null skipping — SQL:2016 <null treatment>): the
    // carry-forward-last-SIGNIFICANT-reading shape. A CASE gate nulls
    // out small orders, then per customer in (date, orderkey) order:
    // the most recent big order so far (last_value IGNORE NULLS — the
    // LOCF primitive q_ts_fill builds on, here as declared SQL
    // surface), the PREVIOUS big order excluding self (lag IGNORE
    // NULLS — respects-nulls lag would return NULL whenever the
    // physically-previous row is small), and the first/second big
    // orders in history (first_value / nth_value 2). One narrow
    // window over a high-cardinality customer partition — no
    // degenerate partition at any scale; the pushed o_custkey
    // predicate bounds the output.
    GQuery(
      "q_win_ignore_nulls",
      (s, dir) => {
        val big = when(dec(col("o_totalprice")) > 150000, dec(col("o_totalprice")))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 500)
          .withColumn("big", big)
          .select(col("o_custkey"), col("o_orderkey"),
            dround(last(col("big"), ignoreNulls = true).over(cum)).as("last_big"),
            dround(lag(col("big"), 1, null, ignoreNulls = true).over(w)).as("prev_big"),
            dround(first(col("big"), ignoreNulls = true).over(cum)).as("first_big"),
            dround(nth_value(col("big"), 2, ignoreNulls = true).over(cum)).as("second_big"))
          // r21 (guide §1): materialize once before the presentation
          // sort (see q_win_rank)
          .localCheckpoint()
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""WITH g AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |    CASE WHEN o_totalprice > 150000 THEN o_totalprice::DECIMAL(18,4) END AS big
             |  FROM orders WHERE o_custkey <= 500)
             |SELECT o_custkey, o_orderkey,
             |  round(CAST(last_value(big IGNORE NULLS) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS last_big,
             |  round(CAST(lag(big, 1 IGNORE NULLS) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 4) AS prev_big,
             |  round(CAST(first_value(big IGNORE NULLS) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS first_big,
             |  round(CAST(nth_value(big, 2 IGNORE NULLS) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS second_big
             |FROM g ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Boolean-aggregate surface (count_if / bool_and / bool_or — the
    // assertion aggregates data-quality rules compile to): conditional
    // count without a CASE scaffold, universal and existential column
    // claims per group. All three are plain partial-aggregable
    // functions — one scan, one exchange, map-side combine; the oracle
    // spells count_if as the CASE sum (engine-neutral) and keeps the
    // bool aggregates verbatim.
    GQuery(
      "q_agg_bool",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(expr("count_if(l_quantity > 45)").as("n_heavy"),
            expr("bool_and(l_quantity > 0)").as("all_pos"),
            expr("bool_or(l_discount > 0.09)").as("any_deep_disc"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)::BIGINT AS n_heavy,
             |  bool_and(l_quantity > 0) AS all_pos,
             |  bool_or(l_discount > 0.09) AS any_deep_disc
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ARGMAX surface (max_by / min_by — SQL:2023 "greatest row by"):
    // the who-not-how-much aggregate every leaderboard and
    // latest-record query compiles to, without the self-join or window
    // detour. Determinism is the spec here: max_by on a tied ordering
    // key is engine-arbitrary, so the ordering key PACKS the tiebreak
    // into one exact integer — balance cents × 1e8 + custkey (both
    // engines compute it bit-identically from the DECIMAL view). Plain
    // partial-aggregable pair-carrying aggregates: one scan, one
    // exchange, map-side combine, one 25-row result.
    GQuery(
      "q_agg_argmax",
      (s, dir) => {
        val ordKey = (dec(col("c_acctbal")) * 100).cast("long") * lit(100000000L) + col("c_custkey")
        Tables.customer(s, dir)
          .groupBy(col("c_nationkey"))
          .agg(
            max_by(col("c_name"), ordKey).as("richest"),
            min_by(col("c_name"), ordKey).as("poorest"),
            dround(max(dec(col("c_acctbal")))).as("max_bal"),
            dround(min(dec(col("c_acctbal")))).as("min_bal"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey,
             |  arg_max(c_name, (c_acctbal::DECIMAL(18,4) * 100)::BIGINT * 100000000 + c_custkey) AS richest,
             |  arg_min(c_name, (c_acctbal::DECIMAL(18,4) * 100)::BIGINT * 100000000 + c_custkey) AS poorest,
             |  round(CAST(max(c_acctbal::DECIMAL(18,4)) AS DOUBLE), 4) AS max_bal,
             |  round(CAST(min(c_acctbal::DECIMAL(18,4)) AS DOUBLE), 4) AS min_bal
             |FROM customer GROUP BY 1 ORDER BY c_nationkey""".stripMargin)),

    // BITWISE aggregates (bit_and / bit_or / bit_xor + a bit_count
    // fold) — the flag-mask collapse: "which permission bits hold
    // across the whole group" (bit_and), "which capabilities appear
    // anywhere" (bit_or), and the xor parity/checksum fold that
    // incremental-maintenance schemes use (xor is its own inverse, so
    // a retracted row xors back out). All four are commutative,
    // associative single-word partials — each partition collapses to
    // one 32-byte row per group before the exchange.
    GQuery(
      "q_agg_bitwise",
      (s, dir) => {
        val key = col("l_orderkey").cast("long")
        Tables.lineitem(s, dir)
          .groupBy(col("l_linestatus"))
          .agg(
            bit_and(key).as("key_and"),
            bit_or(key).as("key_or"),
            bit_xor(key).as("key_xor"),
            sum(bit_count(key).cast("long")).as("popcount"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |  bit_and(l_orderkey::BIGINT) AS key_and,
             |  bit_or(l_orderkey::BIGINT) AS key_or,
             |  bit_xor(l_orderkey::BIGINT) AS key_xor,
             |  sum(bit_count(l_orderkey::BIGINT))::BIGINT AS popcount
             |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // MULTI-DISTINCT aggregation (several COUNT(DISTINCT x) over
    // DIFFERENT columns in one pass): Catalyst plans this via EXPAND —
    // each input row fans to one row per distinct dimension (plus one
    // for the plain aggregates), the first aggregate dedups on
    // (group, gid, value) map-side, the second folds the counts. The
    // scale contract to know: the exchange carries ~k× the row count
    // (dedup'd per partition first), but it is still ONE scan and two
    // exchanges however many distinct dimensions ride along — vs k
    // separate passes; when k× hurts at 100 TB, the HLL rows
    // (q_agg_approx_distinct / q_agg_hll_merge) are the documented
    // cheap exit.
    GQuery(
      "q_agg_multi_distinct",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("d_ord"),
            countDistinct(col("l_suppkey")).as("d_supp"),
            countDistinct(col("l_shipdate")).as("d_ship"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_orderkey) AS d_ord,
             |  count(DISTINCT l_suppkey) AS d_supp,
             |  count(DISTINCT l_shipdate) AS d_ship,
             |  count(*)::BIGINT AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // TYPED-AGGREGATOR top-k (functions/TopKAgg.scala — the
    // Dataset-typed custom-aggregation surface, registered through
    // functions.udaf): exact per-group top-3 lineitems by price. The
    // point vs the rank-window formulation (q_topk): a window must
    // shuffle EVERY row to its group's partition before ranking;
    // WindowGroupLimit recovers map-side partials only for the exact
    // row_number-filter shape. As an Aggregator the cut is partial by
    // construction — each partition folds to a ≤3-entry sorted buffer
    // per group (ObjectHashAggregate partial → merge), so the exchange
    // carries groups × k entries per partition whatever the row count.
    // Determinism: the ordering key packs price cents × 1e8 + orderkey
    // (exact integers both engines reproduce); duplicate rows tie to
    // identical output either side of the cut.
    GQuery(
      "q_agg_topk_typed",
      (s, dir) => {
        val topk = udaf(new graft.functions.TopKAgg(3),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.TopKEntry]())
        val cents = (dec(col("l_extendedprice")) * 100).cast("long")
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"),
            (cents * lit(100000000L) + col("l_orderkey")).as("ord"),
            col("l_orderkey").cast("long").as("id"))
          .groupBy(col("l_returnflag"))
          .agg(topk(col("ord"), col("id")).as("top"))
          .select(col("l_returnflag"), posexplode(col("top")))
          .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rk"),
            col("col.id").as("l_orderkey"),
            ((col("col.ord") - col("col.id")) / lit(100000000L)).cast("long").as("price_cents"))
          .orderBy(col("l_returnflag"), col("rk"))
      },
      Some("""SELECT l_returnflag, rk::INT AS rk, l_orderkey, price_cents FROM (
             |  SELECT l_returnflag, l_orderkey::BIGINT AS l_orderkey,
             |    (l_extendedprice::DECIMAL(18,4) * 100)::BIGINT AS price_cents,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY (l_extendedprice::DECIMAL(18,4) * 100)::BIGINT * 100000000 + l_orderkey DESC) AS rk
             |  FROM lineitem) z
             |WHERE rk <= 3 ORDER BY l_returnflag, rk""".stripMargin)),

    // OBSERVED METRICS (Dataset.observe / the CollectMetrics logical
    // node + the batch Observation handle): data-quality metrics
    // collected as a SIDE-EFFECT of the pass the pipeline was already
    // running — an AggregatingAccumulator rides each task, so row
    // counts, violation counts and exact control totals cost ZERO
    // extra scans, shuffles, or actions (the Deequ/audit-log
    // alternative re-reads the table once per metric set; at 100 TB
    // that is the whole difference). The query gates lineitem through
    // a discount filter — the metrics describe the UNGATED input while
    // the action that drives them is the gated pipeline's own count;
    // the one-row result carries both, and the oracle recomputes all
    // four declaratively from the table.
    GQuery(
      "q_observe_metrics",
      (s, dir) => {
        import s.implicits._
        val obs = org.apache.spark.sql.Observation()
        val gated = Tables.lineitem(s, dir)
          .observe(obs,
            count(lit(1)).as("rows_in"),
            expr("count_if(l_quantity > 45)").as("heavy_in"),
            sum(dec(col("l_extendedprice"))).as("rev_in"))
          .filter(col("l_discount") > 0.02)
        val kept = gated.count() // the pipeline's own action drives the metrics
        val m = obs.get
        val revIn = java.math.BigDecimal
          .valueOf(m("rev_in").asInstanceOf[java.math.BigDecimal].doubleValue)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
        Seq((m("rows_in").asInstanceOf[Long], m("heavy_in").asInstanceOf[Long], revIn, kept))
          .toDF("rows_in", "heavy_in", "rev_in", "rows_kept")
      },
      Some("""SELECT count(*)::BIGINT AS rows_in,
             |  sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)::BIGINT AS heavy_in,
             |  round(CAST(sum(l_extendedprice::DECIMAL(18,4)) AS DOUBLE), 4) AS rev_in,
             |  sum(CASE WHEN l_discount > 0.02 THEN 1 ELSE 0 END)::BIGINT AS rows_kept
             |FROM lineitem""".stripMargin)),

    // EQUI-WIDTH HISTOGRAM (the Deequ Histogram analyzer / the
    // optimizer-statistics building block): o_totalprice bucketed into
    // 20 fixed-width bins over a declared [0, 600000) domain, with the
    // overflow clamp into the last bin (the rule every histogram build
    // needs pinned — silently dropping out-of-domain rows corrupts
    // selectivity estimates). Bucketing is integer floor arithmetic on
    // the DECIMAL view (portable bit-for-bit; width_bucket's edge rules
    // differ across engines, so the explicit floor IS the spec), and
    // the whole histogram is one scan + one 20-key aggregate with
    // map-side partials — the cheapest possible shape at any scale.
    GQuery(
      "q_agg_histogram",
      (s, dir) => {
        val w = 30000
        val bkt = least(floor(dec(col("o_totalprice")) / w), lit(19)).cast("int")
        Tables.orders(s, dir)
          .groupBy(bkt.as("bucket"))
          .agg(count(lit(1)).as("n"),
            dround(min(dec(col("o_totalprice")))).as("lo"),
            dround(max(dec(col("o_totalprice")))).as("hi"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT CAST(least(floor(CAST(o_totalprice AS DECIMAL(18,4)) / 30000), 19) AS INT) AS bucket,
             |  count(*) AS n,
             |  round(CAST(min(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS lo,
             |  round(CAST(max(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS hi
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // CORRELATION / REGRESSION profiling (the Deequ Correlation
    // analyzer + the SQL regr_slope/regr_intercept surface) — per-group
    // Pearson r and the least-squares line from ONE aggregate pass of
    // exact decimal sums (n, Σx, Σy, Σxy, Σx², Σy²). The engine's
    // built-in corr() streams doubles whose accumulation ORDER differs
    // between engines (and between runs at different parallelism) —
    // here every sum is order-independent DECIMAL arithmetic, cast to
    // double once, and the closed-form double math is written
    // IDENTICALLY on both sides: same exact inputs, same IEEE ops,
    // same bits — no ε gate needed. One scan, one shuffle, partial
    // aggregation map-side; at 100 TB this is the cheapest possible
    // shape for a pairwise statistic.
    GQuery(
      "q_stats_corr",
      (s, dir) => {
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
            sum(x * y).cast("double").as("sxy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"))
          .withColumn("n", col("n_rows").cast("double"))
          .withColumn("cov_n", col("n") * col("sxy") - col("sx") * col("sy"))
          .withColumn("varx_n", col("n") * col("sxx") - col("sx") * col("sx"))
          .withColumn("vary_n", col("n") * col("syy") - col("sy") * col("sy"))
          .withColumn("slope", col("cov_n") / col("varx_n"))
          .select(col("l_returnflag"), col("n_rows"),
            round(col("cov_n") / sqrt(col("varx_n") * col("vary_n")), 6).as("corr_qp"),
            round(col("slope"), 6).as("slope"),
            round((col("sy") - col("slope") * col("sx")) / col("n"), 6).as("intercept"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH g AS (
             |  SELECT l_returnflag, count(*) AS n_rows,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY 1),
             |d AS (
             |  SELECT l_returnflag, n_rows, CAST(n_rows AS DOUBLE) AS n,
             |    sx, sy, sxy, sxx, syy,
             |    CAST(n_rows AS DOUBLE) * sxy - sx * sy AS cov_n,
             |    CAST(n_rows AS DOUBLE) * sxx - sx * sx AS varx_n,
             |    CAST(n_rows AS DOUBLE) * syy - sy * sy AS vary_n
             |  FROM g)
             |SELECT l_returnflag, n_rows,
             |  round(cov_n / sqrt(varx_n * vary_n), 6) AS corr_qp,
             |  round(cov_n / varx_n, 6) AS slope,
             |  round((sy - (cov_n / varx_n) * sx) / n, 6) AS intercept
             |FROM d ORDER BY l_returnflag""".stripMargin)),

    // SEQUENCE PATTERN MATCHING (MATCH_RECOGNIZE / Flink CEP's core):
    // per-user pattern `CLICK+ PURCHASE` over the event-time order —
    // each match reports the maximal run of consecutive clicks
    // immediately preceding a purchase. Expressed as gaps-and-islands:
    // islands of consecutive same-type rows come from the classic
    // rn − rn_by_type difference, a purchase row matches when its
    // PREVIOUS row is a click, and the matched island's (size, start)
    // are the CLICK+ greedy-quantifier stats. Every window shares the
    // ONE user_id partition exchange; the island aggregate and the
    // match join both run on that same key — at 100 TB this is one
    // shuffle of the events, then narrow per-user work. (event_id
    // breaks ts ties for a total order — the lineitem sort lesson.)
    GQuery(
      "q_event_pattern",
      (s, dir) => {
        val wU = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wUT = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        // island stats ride a THIRD window over (user, type, island) —
        // every row carries its whole island's (size, start), so the
        // purchase row reads its predecessor's island stats via lag and
        // the match needs NO island join and NO cache: one scan, one
        // user_id exchange, three sorts. (The first draft aggregated
        // islands and joined back — measured 4.6x superlinear at the
        // 10x probe from the cache materialization + join exchanges.)
        val wIsl = Window.partitionBy(col("user_id"), col("event_type"), col("isl"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("isl", row_number().over(wU) - row_number().over(wUT))
          .withColumn("n_isl", count(lit(1)).over(wIsl))
          .withColumn("start_isl", min(col("ts")).over(wIsl))
          .withColumn("prev_type", lag(col("event_type"), 1).over(wU))
          .withColumn("prev_n", lag(col("n_isl"), 1).over(wU))
          .withColumn("prev_start", lag(col("start_isl"), 1).over(wU))
          .filter(col("event_type") === "purchase" && col("prev_type") === "click")
          .select(col("user_id"), fmtTs(col("prev_start")).as("match_start"),
            fmtTs(col("ts")).as("purchase_ts"), col("prev_n").as("n_clicks"))
          // r21 (guide §1): materialize the match-sized result once —
          // the orderBy's range sampling otherwise re-runs all four
          // window passes between the reused exchange and the sort
          .localCheckpoint()
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

    // Generator / lateral-view surface: posexplode with ordinal.
    GQuery(
      "q_posexplode",
      (s, dir) => {
        Tables.documents(s, dir)
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(col("pos") < 5)
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, least(len(toks), 5) + 1),
             |           i -> {'pos': i - 1, 'tok': toks[i]})) AS u
             |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
             |        FROM documents WHERE doc_id < 50) t) z
             |ORDER BY doc_id, pos""".stripMargin))
  )
}
