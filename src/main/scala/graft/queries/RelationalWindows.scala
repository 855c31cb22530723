package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import RelCommon._

/** windows, sessions, event analytics and time series — split from Relational.scala (round 18) purely for review
  * ergonomics; the registry, ids and oracles are unchanged. */
private[queries] object RelationalWindows {

  def queries: Seq[GQuery] = Seq(

    // ------------------------------------------------------------- windows
    // Partitioned by suppkey (high cardinality) — at 100 TB this is one
    // shuffle into ~|suppliers| balanced partitions, never a 3-partition
    // skew monster like partitioning by returnflag would be.
    GQuery(
      "q_win_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("nt", ntile(4).over(w))
          .filter(col("rn") <= 10)
          // r21 (guide §1): materialize once before the presentation
          // sort — the orderBy's range sampling otherwise re-runs the
          // window compute between the reused exchange and the sort
          .localCheckpoint()
          .orderBy(col("l_suppkey"), col("rn"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |  CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
             |  CAST(drnk AS INT) AS drnk, CAST(nt AS INT) AS nt
             |FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |    row_number() OVER w AS rn, rank() OVER w AS rnk,
             |    dense_rank() OVER w AS drnk, ntile(4) OVER w AS nt
             |  FROM lineitem
             |  WINDOW w AS (PARTITION BY l_suppkey
             |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)) t
             |WHERE rn <= 10 ORDER BY l_suppkey, rn""".stripMargin)),

    GQuery(
      "q_win_analytic",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("first_price", first(col("o_totalprice")).over(wf))
          .withColumn("last_price", last(col("o_totalprice")).over(wf))
          .withColumn("running_total", dround(sum(dec(col("o_totalprice"))).over(wf)))
          .select(col("o_custkey"), col("o_orderkey"), fmtD(col("o_orderdate")).as("odate"),
            col("o_totalprice"), col("prev_price"), col("next_price"),
            col("first_price"), col("last_price"), col("running_total"))
          // r21 (guide §1): materialize once before the presentation
          // sort — the orderBy's range sampling otherwise re-runs the
          // window compute between the reused exchange and the sort
          .localCheckpoint()
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price,
             |  first_value(o_totalprice) OVER wf AS first_price,
             |  last_value(o_totalprice) OVER wf AS last_price,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER wf AS DOUBLE), 4) AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // NAVIGATION / distribution window functions: nth_value over the
    // running frame, percent_rank and cume_dist over the full
    // partition. The rank ratios are divisions of identical small
    // integers on both engines, so the doubles are bitwise-equal with
    // no rounding step. Same one-exchange window plan as
    // q_win_analytic.
    GQuery(
      "q_win_navigation",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(wf))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .select(col("o_custkey"), col("o_orderkey"), fmtD(col("o_orderdate")).as("odate"),
            col("o_totalprice"), col("third_price"), col("pct_rank"), col("cume"))
          // r21 (guide §1): materialize once before the presentation
          // sort (see q_win_rank)
          .localCheckpoint()
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
             |  o_totalprice,
             |  nth_value(o_totalprice, 3) OVER wf AS third_price,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // RANGE frame over epoch seconds: 1-hour trailing window per user.
    GQuery(
      "q_win_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
          .rangeBetween(-3600, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("ts_sec", unix_timestamp(col("ts")))
          .withColumn("mov_sum", sum(dec(col("value"))).over(w))
          .withColumn("mov_n", count(lit(1)).over(w))
          // floor-half-up, not round(): mov_n is a small int (often 2^k),
          // so the average's decimal expansion can terminate EXACTLY on a
          // .xxxx5 — where Spark's round (shortest-repr HALF_UP) and
          // DuckDB's (binary) disagree. floor(x·10⁴+½) pins the tie rule
          // on the bitwise-identical doubles.
          .select(col("event_id"), col("user_id"),
            dround(col("mov_sum")).as("mov_sum"), col("mov_n"),
            (floor(col("mov_sum").cast("double") / col("mov_n") * 10000 + 0.5) / 10000).as("mov_avg"))
          // r21 (guide §1): materialize once before the presentation
          // sort — the orderBy's range sampling otherwise re-runs the
          // window compute between the reused exchange and the sort
          .localCheckpoint()
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  round(CAST(mov_sum AS DOUBLE), 4) AS mov_sum, mov_n,
             |  floor(CAST(mov_sum AS DOUBLE) / mov_n * 10000 + 0.5) / 10000 AS mov_avg
             |FROM (
             |  SELECT event_id, user_id,
             |    sum(CAST(value AS DECIMAL(18,4))) OVER w AS mov_sum,
             |    count(*) OVER w AS mov_n
             |  FROM (SELECT *, CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec FROM events)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             |               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)) t
             |ORDER BY event_id""".stripMargin)),

    // Tumbling event-time window via window() — the batch-checkable analog
    // of the streaming windowed aggregation (SURVEY.md §2.3 note).
    GQuery(
      "q_win_tumbling",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dround(sum(dec(col("value")))).as("total"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"), col("n"), col("total"))
          .orderBy(col("hour_start"), col("event_type"))
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             |  event_type, count(*) AS n,
             |  ${OD.format("sum(CAST(value AS DECIMAL(18,4)))")} AS total
             |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)),

    // Sliding event-time window (1h window, 30m slide) — each event
    // lands in exactly 2 windows; the batch-checkable analog of the
    // streaming sliding aggregation (graft.streaming.Streams.slidingAgg).
    // Window starts computed arithmetically from epoch seconds so both
    // engines share the alignment by construction.
    GQuery(
      "q_win_sliding",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("n"))
          .orderBy(col("win_start"), col("event_type"))
      },
      Some("""SELECT strftime(to_timestamp(s), '%Y-%m-%d %H:%M:%S') AS win_start,
             |  event_type, count(*) AS n
             |FROM (
             |  SELECT event_type,
             |    unnest([CAST(floor(date_part('epoch', ts) / 1800) * 1800 AS BIGINT),
             |            CAST(floor(date_part('epoch', ts) / 1800) * 1800 - 1800 AS BIGINT)]) AS s
             |  FROM events) t
             |GROUP BY s, event_type ORDER BY win_start, event_type""".stripMargin)),

    // Gap-based SESSION windows, batch form — the third window family
    // (after tumbling/sliding) and the batch-checkable analog of the
    // streaming flatMapGroupsWithState sessionization
    // (graft.streaming.Streams.sessionize): a new session starts when a
    // user is quiet > 30 min. The classic two-window linear plan: lag to
    // flag session starts, running sum to number sessions, then one
    // aggregation — ONE shuffle on user_id, O(n log n) per user, no
    // gap self-join. Micro-second epoch arithmetic so both engines
    // share tie/threshold behavior exactly.
    GQuery(
      "q_win_session",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_sess", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            fmtTs(min(col("ts"))).as("sess_start"),
            fmtTs(max(col("ts"))).as("sess_end"),
            dround(sum(dec(col("value")))).as("total"))
          // r21 (guide §1): materialize once before the presentation
          // sort — the orderBy's range sampling otherwise re-runs the
          // window compute between the reused exchange and the sort
          .localCheckpoint()
          .orderBy(col("user_id"), col("session_id"))
      },
      Some(s"""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
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
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
             |  ${OD.format("sum(CAST(value AS DECIMAL(18,4)))")} AS total
             |FROM n GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // The NATIVE session-window operator over the same oracle:
    // groupBy(session_window(ts, gap)) is Spark's built-in
    // SessionWindow aggregation (state-store-ready, the streaming
    // sessionization primitive) — here value-pinned against the
    // identical gaps-and-islands SQL as q_win_session. Tie rule:
    // session_window splits at gap ≥ 30 min, the manual window at
    // > 30 min; the testdata has no exact 30-minute gap (verified at
    // both SFs), so the two operators are value-identical and a drift
    // in EITHER fails the shared oracle. Same one-exchange plan, but
    // the merge happens inside the aggregate instead of two windows.
    GQuery(
      "q_win_session_native",
      (s, dir) => {
        val byStart = Window.partitionBy(col("user_id")).orderBy(col("w.start"))
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
            fmtTs(min(col("ts"))).as("sess_start"),
            fmtTs(max(col("ts"))).as("sess_end"),
            dround(sum(dec(col("value")))).as("total"))
          .withColumn("session_id", row_number().over(byStart).cast("long"))
          .select(col("user_id"), col("session_id"), col("n_events"),
            col("sess_start"), col("sess_end"), col("total"))
          // r21 (guide §1): materialize once before the presentation
          // sort — the orderBy's range sampling otherwise re-runs the
          // window compute between the reused exchange and the sort
          .localCheckpoint()
          .orderBy(col("user_id"), col("session_id"))
      },
      Some(s"""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
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
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
             |  ${OD.format("sum(CAST(value AS DECIMAL(18,4)))")} AS total
             |FROM n GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // FUNNEL analysis — the ordered-sequence composite every event
    // warehouse runs: signup → click (within 48 h) → purchase (within
    // 48 h of the click), each step's timestamp = earliest qualifying
    // event strictly after the previous step. SINGLE-SCAN formulation:
    // one pushdown-pruned pass over events, ONE user_id shuffle into a
    // conditional aggregate that collects each user's candidate click/
    // purchase times, then the sequential step logic runs as codegen'd
    // array expressions (filter + array_min) on the aggregated row —
    // no joins, no re-scan, no matter how many steps the funnel grows.
    // (The previous 3-scan/3-join formulation read the 100 TB event log
    // three times for the same answer.) Map-side partial collect keeps
    // the shuffle at one (user, candidate-times) row per user per
    // mapper; per-user state stays in its partition. Window arithmetic
    // in integer microseconds so both engines share the 48-hour
    // boundary exactly.
    GQuery(
      "q_funnel",
      (s, dir) => {
        val win48h = 172800000000L
        Tables.events(s, dir)
          .filter(col("event_type").isin("signup", "click", "purchase"))
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup", col("ts"))).as("t1"),
            collect_list(when(col("event_type") === "click", unix_micros(col("ts")))).as("clicks"),
            collect_list(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("purchases"))
          .filter(col("t1").isNotNull)
          .withColumn("t2u", array_min(filter(col("clicks"), c =>
            c > unix_micros(col("t1")) && c - unix_micros(col("t1")) <= win48h)))
          // a null t2u nulls the lambda predicate → empty array → null t3u
          .withColumn("t3u", array_min(filter(col("purchases"), p =>
            p > col("t2u") && p - col("t2u") <= win48h)))
          .select(col("user_id"),
            when(col("t3u").isNotNull, 3).when(col("t2u").isNotNull, 2)
              .otherwise(1).as("stage"),
            fmtTs(col("t1")).as("t_signup"),
            fmtTs(timestamp_micros(col("t2u"))).as("t_click"),
            fmtTs(timestamp_micros(col("t3u"))).as("t_purchase"))
          .orderBy(col("user_id"))
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |            WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2
             |       FROM events e JOIN s1 ON e.user_id = s1.user_id
             |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > epoch_us(s1.t1)
             |         AND epoch_us(e.ts) - epoch_us(s1.t1) <= 172800000000 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t3
             |       FROM events e JOIN s2 ON e.user_id = s2.user_id
             |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > epoch_us(s2.t2)
             |         AND epoch_us(e.ts) - epoch_us(s2.t2) <= 172800000000 GROUP BY 1)
             |SELECT s1.user_id,
             |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
             |  strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS t_signup,
             |  strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS t_click,
             |  strftime(t3, '%Y-%m-%d %H:%M:%S.%f') AS t_purchase
             |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
             |        LEFT JOIN s3 ON s1.user_id = s3.user_id
             |ORDER BY s1.user_id""".stripMargin)),

    // EVENT TRANSITION matrix — the per-user next-event Markov counts
    // (the input to journey/flow diagrams and simple next-action
    // models): lead() over each user's event-time order, then a
    // (from, to)-pair count. One key exchange for the window + one
    // 25-cell aggregate; the output is |event_types|² regardless of
    // corpus size.
    GQuery(
      "q_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("next_type"))
      },
      Some("""WITH o AS (SELECT user_id, event_type,
             |             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |           FROM events)
             |SELECT event_type, next_type, count(*) AS n
             |FROM o WHERE next_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY event_type, next_type""".stripMargin)),

    // COHORT RETENTION matrix — signup-week cohorts × week offsets of
    // high-value purchase activity: the canonical triangle every
    // growth dashboard draws. Week alignment via date_trunc (Monday
    // start in both engines) and offsets as exact day/7 integers, so
    // the bucketing can't drift. SINGLE-SCAN formulation (same shape as
    // q_funnel): one pushdown-pruned events pass, ONE user_id shuffle
    // collecting each user's cohort week + distinct active-week set
    // (collect_set dedups in the aggregate — the explicit `distinct`
    // shuffle of the join formulation disappears), explode, then a
    // cohort-sized aggregate. Shuffles carry (user, week-set) rows and
    // the output is weeks² regardless of corpus size.
    GQuery(
      "q_retention_cohort",
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("event_type") === "signup" ||
            (col("event_type") === "purchase" && col("value") > 150))
          .groupBy(col("user_id"))
          .agg(
            date_trunc("week", min(when(col("event_type") === "signup", col("ts")))).as("cw"),
            collect_set(when(col("event_type") === "purchase",
              date_trunc("week", col("ts")))).as("pws"))
          .filter(col("cw").isNotNull)
          .select(col("cw"), explode(col("pws")).as("pw"))
          .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            (datediff(col("pw"), col("cw")) / 7).cast("long").as("wk"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy(col("cohort_week"), col("wk"))
      },
      Some("""WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
             |           FROM events WHERE event_type = 'signup' GROUP BY 1),
             |a AS (SELECT DISTINCT e.user_id, f.cw,
             |        CAST(date_diff('week', f.cw, date_trunc('week', e.ts)) AS BIGINT) AS wk
             |      FROM events e JOIN f ON e.user_id = f.user_id
             |      WHERE e.event_type = 'purchase' AND e.value > 150)
             |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, wk, count(*) AS n_active
             |FROM a GROUP BY 1, 2 ORDER BY cohort_week, wk""".stripMargin)),

    // TIME-SERIES GAP FILL + LOCF — dimension densification (the
    // GAP_FILL/densify operator warehouses ship): the sparse per-type
    // hourly average is projected onto the COMPLETE hour grid (a
    // generated sequence over the corpus time span crossed with the
    // type dimension — both sides derived, nothing scanned twice), and
    // missing hours carry the last observed value forward via
    // last(v, ignoreNulls) over the per-type hour order. Grid size is
    // span × |types| — independent of event count, so at 100 TB the
    // grid build is a rounding error next to the one events scan-agg;
    // the LOCF window partitions on the type key (grid-sized input,
    // never raw events). Hours before a type's first observation stay
    // null — LOCF, not interpolation; the oracle replays the identical
    // IGNORE NULLS window.
    GQuery(
      "q_ts_fill",
      (s, dir) => {
        // ONE corpus scan: the hourly aggregate is cached (grid-sized)
        // and the span and type dimension both DERIVE from it — min/max
        // of the aggregated hours equals min/max of the raw timestamps
        // at hour grain, so events is never re-read for metadata.
        // EXACT-INTEGER average (round 20 — the sf0.1 sweep caught a
        // half-ULP boundary: double avg associates differently per
        // engine, and one hour's mean sat exactly on a .xxxx5 edge):
        // `value` is 2-decimal by fixture contract, so the mean in
        // cents is the exact rational S/n and round-half-up to 4
        // decimals is the INTEGER floor((200*S + n) / (2*n)) — bigint
        // arithmetic both engines compute identically at any sf.
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(expr("(200 * sum(cast(round(value * 100, 0) as bigint)) + count(*)) div " +
            "(2 * count(*))").as("v4"))
          .select(col("event_type"), col("h"), (col("v4") / 10000.0).as("v"))
          .localCheckpoint()
        val grid = hourly.agg(min(col("h")).as("h_lo"), max(col("h")).as("h_hi"))
          .select(explode(expr("sequence(h_lo, h_hi, interval 1 hour)")).as("h"))
          .crossJoin(hourly.select(col("event_type")).distinct())
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"), col("v").isNull.as("is_gap"),
            last(col("v"), ignoreNulls = true).over(w).as("filled"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h,
             |    CAST((200 * sum(CAST(round(value * 100) AS BIGINT)) + count(*))
             |         // (2 * count(*)) AS DOUBLE) / 10000 AS v
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT t.event_type, g.h
             |  FROM (SELECT DISTINCT event_type FROM events) t
             |  CROSS JOIN (SELECT unnest(generate_series(
             |      (SELECT date_trunc('hour', min(ts)) FROM events),
             |      (SELECT date_trunc('hour', max(ts)) FROM events),
             |      INTERVAL 1 HOUR)) AS h) g)
             |SELECT grid.event_type, grid.h, hourly.v IS NULL AS is_gap,
             |  last_value(hourly.v IGNORE NULLS) OVER (
             |    PARTITION BY grid.event_type ORDER BY grid.h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             |FROM grid LEFT JOIN hourly
             |  ON hourly.event_type = grid.event_type AND hourly.h = grid.h
             |ORDER BY grid.event_type, grid.h""".stripMargin)),

    // RUNNING DISTINCT (cumulative distinct users per hour — the DAU/
    // "users to date" growth curve): Spark does not support DISTINCT
    // aggregates inside windows, so this row IS the standard rewrite —
    // per (type, user) FIRST-hour aggregate, new-user counts per hour,
    // and an O(1)-state running sum over the hourly grid; the oracle
    // cross-validates against DuckDB's NATIVE count(DISTINCT) OVER
    // (engines that support the direct form must agree with the
    // rewrite). Scale: the only corpus-sized exchange is the
    // (type, user) aggregate; the window runs on grid-sized rows with
    // constant state — the direct distinct-window form, where
    // supported, holds per-partition distinct SETS instead (memory ∝
    // users seen), which is exactly why the rewrite is the 100 TB
    // form.
    GQuery(
      "q_win_running_distinct",
      (s, dir) => {
        val f = Tables.events(s, dir)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("user_id"))
        val hourly = f.groupBy(col("event_type"), col("h"))
          .agg(countDistinct(col("user_id")).as("active"))
        val firstHour = f.groupBy(col("event_type"), col("user_id")).agg(min(col("h")).as("h"))
        val newu = firstHour.groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("nu"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        hourly.join(newu, Seq("event_type", "h"), "left")
          .withColumn("cum", sum(coalesce(col("nu"), lit(0L))).over(w))
          .select(col("event_type"), col("h"), col("active"), col("cum"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH raw AS (SELECT event_type, date_trunc('hour', ts) AS h, user_id FROM events),
             |w AS (SELECT event_type, h,
             |        count(DISTINCT user_id) OVER (PARTITION BY event_type, h) AS active,
             |        count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY h
             |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM raw)
             |SELECT DISTINCT event_type, h, active, cum FROM w
             |ORDER BY event_type, h""".stripMargin)),

    // SWEEP-LINE interval concurrency (peak concurrent sessions — the
    // capacity-planning question): each event occupies [ts, ts+1h);
    // the classic answer is the sweep — +1/−1 boundary deltas, NETTED
    // per instant (same-instant end-before-start convention becomes a
    // group-by, making the timeline total-ordered and the running sum
    // deterministic), then a cumulative sum whose maximum IS peak
    // concurrency. NO self-join — the naive interval-overlap join is
    // O(n²) per type; the sweep is one union + one keyed agg + a
    // running sum. The running sum itself is TWO-LEVEL (the
    // q_pack_shards discipline): per-day partial sums inside
    // (type, day) partitions, day offsets cumulated on the tiny
    // (type × day) table and broadcast back — no per-type partition
    // ever holds more than a day of boundaries, so a 100 TB year of
    // events never funnels one type's full timeline through one task.
    GQuery(
      "q_ts_sweepline",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("ts"))
        val deltas = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("dl"))
          .unionByName(ev.select(col("event_type"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("t"), lit(-1L).as("dl")))
        // net and conc are each consumed twice (the in-day window + the
        // day-offset agg; the max agg + the argmax filter) — cache both
        // so the corpus is scanned once for the union, not once per
        // consumer (8 scans → 2 in PLANS.md before this)
        val net = deltas.groupBy(col("event_type"), col("t")).agg(sum(col("dl")).as("net"))
          .withColumn("day", date_trunc("day", col("t"))).localCheckpoint()
        val wDay = Window.partitionBy(col("event_type"), col("day")).orderBy(col("t"))
        val inDay = net.withColumn("run_in", sum(col("net")).over(wDay))
        val wOff = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = net.groupBy(col("event_type"), col("day")).agg(sum(col("net")).as("dtot"))
          .withColumn("off", coalesce(sum(col("dtot")).over(wOff), lit(0L)))
          .select(col("event_type"), col("day"), col("off"))
        val conc = inDay.join(broadcast(offs), Seq("event_type", "day"))
          .withColumn("conc", col("off") + col("run_in")).localCheckpoint()
        val mx = conc.groupBy(col("event_type")).agg(max(col("conc")).as("max_conc"))
        conc.join(mx, "event_type").filter(col("conc") === col("max_conc"))
          .groupBy(col("event_type"), col("max_conc")).agg(min(col("t")).as("at_t"))
          .select(col("event_type"), col("max_conc"), col("at_t"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type, ts AS t, 1::BIGINT AS dl FROM events
             |           UNION ALL
             |           SELECT event_type, ts + INTERVAL 1 HOUR, -1 FROM events),
             |net AS (SELECT event_type, t, sum(dl)::BIGINT AS net FROM d GROUP BY 1, 2),
             |r AS (SELECT event_type, t,
             |        (sum(net) OVER (PARTITION BY event_type ORDER BY t))::BIGINT AS conc FROM net),
             |m AS (SELECT event_type, max(conc)::BIGINT AS max_conc FROM r GROUP BY 1)
             |SELECT r.event_type, m.max_conc, min(r.t) AS at_t
             |FROM r JOIN m ON r.event_type = m.event_type AND r.conc = m.max_conc
             |GROUP BY 1, 2 ORDER BY r.event_type""".stripMargin)),

    // EWMA smoothing — the monitoring-dashboard smoother next to
    // q_ts_fill (gaps) and q_ts_anomaly (outliers): a 5-point
    // exponentially-weighted moving average (α = 1/2 → weights
    // 16/8/4/2/1) over the per-type hourly totals, with the warm-up
    // edge handled by RENORMALIZING over the weights actually present
    // (the standard adjusted-EWMA rule — zero-padding would bias the
    // first hours toward 0). All-exact arithmetic: decimal hourly sums,
    // integer weights, one double division at the end — both engines
    // reproduce it bit-for-bit, no ε. Plan: one events scan-agg to the
    // grid-sized hourly table, one event_type exchange shared by the
    // agg and the lag window; the window is 5 physical lags, O(1) state
    // per row however long the series grows.
    GQuery(
      "q_ts_ewma",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(dec(col("value"))).as("v"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        val lags = (1 to 4).map(k => lag(col("v"), k).over(w))
        val wts = Seq(8, 4, 2, 1)
        val num = col("v") * 16 +
          lags.zip(wts).map { case (l, k) => coalesce(l * k, lit(0)) }.reduce(_ + _)
        val den = lit(16) +
          lags.zip(wts).map { case (l, k) => when(l.isNull, 0).otherwise(k) }.reduce(_ + _)
        hourly.select(col("event_type"), col("h"), dround(col("v")).as("v"),
            round(num.cast("double") / den, 4).as("ewma"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h,
             |    sum(value::DECIMAL(18,4)) AS v
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT event_type, h, v,
             |    lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
             |    lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4
             |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h))
             |SELECT event_type, h, round(CAST(v AS DOUBLE), 4) AS v,
             |  round(CAST(v * 16 + coalesce(l1 * 8, 0) + coalesce(l2 * 4, 0)
             |             + coalesce(l3 * 2, 0) + coalesce(l4 * 1, 0) AS DOUBLE)
             |    / (16 + CASE WHEN l1 IS NULL THEN 0 ELSE 8 END
             |        + CASE WHEN l2 IS NULL THEN 0 ELSE 4 END
             |        + CASE WHEN l3 IS NULL THEN 0 ELSE 2 END
             |        + CASE WHEN l4 IS NULL THEN 0 ELSE 1 END), 4) AS ewma
             |FROM l ORDER BY event_type, h""".stripMargin)),

    // TIME-SERIES ANOMALY DETECTION — robust monitoring over the
    // densified hourly series (the q_ts_fill grid feeding the
    // q_quality_outliers statistic): per-type hourly event counts are
    // ZERO-FILLED onto the complete hour grid first — a silent outage
    // hour is an anomaly precisely because it has no rows, so
    // detection over only-observed hours would miss the most important
    // case — then flagged where |n − median| > 2·MAD. Medians/MADs of
    // integer counts are ints or exact .5 halves (binary-exact across
    // engines — no ε). Plan: one events scan-agg, the generated grid
    // join, two grid-sized per-type stat aggregates broadcast back;
    // the corpus is scanned once, everything after is grid-sized.
    GQuery(
      "q_ts_anomaly",
      (s, dir) => {
        // ONE corpus scan (the q_ts_fill rule): hourly counts cached,
        // span/types/grid/filled all derive from that grid-sized cache
        // — the med and mad stat passes and the final flag pass re-read
        // the CACHE, never events.
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n_raw"))
          .cache()
        val grid = hourly.agg(min(col("h")).as("h_lo"), max(col("h")).as("h_hi"))
          .select(explode(expr("sequence(h_lo, h_hi, interval 1 hour)")).as("h"))
          .crossJoin(hourly.select(col("event_type")).distinct())
        val filled = grid.join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"),
            coalesce(col("n_raw"), lit(0L)).as("n"))
          .cache()
        val med = filled.groupBy(col("event_type"))
          .agg(expr("percentile(n, 0.5)").as("med"))
        val mad = filled.join(broadcast(med), "event_type")
          .groupBy(col("event_type"), col("med"))
          .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
        filled.join(broadcast(mad), "event_type")
          .filter(abs(col("n") - col("med")) > lit(2) * col("mad"))
          .select(col("event_type"), col("h"), col("n"), col("med"), col("mad"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS n_raw
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT t.event_type, g.h
             |  FROM (SELECT DISTINCT event_type FROM events) t
             |  CROSS JOIN (SELECT unnest(generate_series(
             |      (SELECT date_trunc('hour', min(ts)) FROM events),
             |      (SELECT date_trunc('hour', max(ts)) FROM events),
             |      INTERVAL 1 HOUR)) AS h) g),
             |filled AS (
             |  SELECT grid.event_type, grid.h, coalesce(hourly.n_raw, 0)::BIGINT AS n
             |  FROM grid LEFT JOIN hourly
             |    ON hourly.event_type = grid.event_type AND hourly.h = grid.h),
             |med AS (SELECT event_type, median(n) AS med FROM filled GROUP BY 1),
             |mad AS (SELECT f.event_type, m.med, median(abs(f.n - m.med)) AS mad
             |        FROM filled f JOIN med m USING (event_type) GROUP BY 1, 2)
             |SELECT f.event_type, f.h, f.n, mad.med, mad.mad
             |FROM filled f JOIN mad USING (event_type)
             |WHERE abs(f.n - mad.med) > 2 * mad.mad
             |ORDER BY f.event_type, f.h""".stripMargin))
  )
}
