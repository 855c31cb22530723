package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import RelCommon._

/** sort/limit, set ops, scalar/JSON/array functions, subqueries, reshape — split from Relational.scala (round 18) purely for review
  * ergonomics; the registry, ids and oracles are unchanged. */
private[queries] object RelationalFuncs {

  def queries: Seq[GQuery] = Seq(

    // ---------------------------------------------------------- sort/limit
    // Global top-N: Spark plans TakeOrderedAndProject — each partition
    // keeps N rows, driver merges; no full sort at any scale.
    GQuery(
      "q_sort_limit",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    GQuery(
      "q_topk",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // ------------------------------------------------------------- set ops
    GQuery(
      "q_set_union",
      (s, dir) => {
        val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"), lit("building").as("src"))
        val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"), lit("finished").as("src"))
        a.unionByName(b).distinct().orderBy(col("custkey"), col("src"))
      },
      Some("""SELECT DISTINCT * FROM (
             |  SELECT c_custkey AS custkey, 'building' AS src FROM customer WHERE c_mktsegment='BUILDING'
             |  UNION ALL
             |  SELECT o_custkey AS custkey, 'finished' AS src FROM orders WHERE o_orderstatus='F') t
             |ORDER BY custkey, src""".stripMargin)),

    GQuery(
      "q_set_union_all",
      (s, dir) => {
        val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"), lit("building").as("src"))
        val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"), lit("finished").as("src"))
        a.unionByName(b).groupBy(col("custkey"), col("src"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("custkey"), col("src"))
      },
      Some("""SELECT custkey, src, count(*) AS n FROM (
             |  SELECT c_custkey AS custkey, 'building' AS src FROM customer WHERE c_mktsegment='BUILDING'
             |  UNION ALL
             |  SELECT o_custkey AS custkey, 'finished' AS src FROM orders WHERE o_orderstatus='F') t
             |GROUP BY custkey, src ORDER BY custkey, src""".stripMargin)),

    GQuery(
      "q_set_intersect",
      (s, dir) => {
        val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        a.intersect(b).orderBy(col("custkey"))
      },
      Some("""SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment='BUILDING'
             |INTERSECT
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
             |ORDER BY custkey""".stripMargin)),

    GQuery(
      "q_set_except",
      (s, dir) => {
        val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        a.except(b).orderBy(col("custkey"))
      },
      Some("""SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment='BUILDING'
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
             |ORDER BY custkey""".stripMargin)),

    // MULTISET set ops — INTERSECT ALL / EXCEPT ALL keep duplicate
    // counts (min / left-minus-right multiplicities), which the distinct
    // variants above erase. Catalyst plans both as a single
    // count-aggregate + generate (no join): one shuffle on the full row.
    // Ordering key includes a per-row sequence so the output is total.
    GQuery(
      "q_set_intersect_all",
      (s, dir) => {
        val a = Tables.orders(s, dir).filter(col("o_orderstatus") =!= "P")
          .select(col("o_custkey").as("custkey"))
        val b = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("custkey"))
        val w = Window.partitionBy(col("custkey")).orderBy(col("custkey"))
        a.intersectAll(b)
          .withColumn("seq", row_number().over(w))
          .orderBy(col("custkey"), col("seq"))
      },
      Some("""SELECT custkey, CAST(row_number() OVER (PARTITION BY custkey ORDER BY custkey) AS INT) AS seq
             |FROM (
             |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus <> 'P'
             |  INTERSECT ALL
             |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000) t
             |ORDER BY custkey, seq""".stripMargin)),

    GQuery(
      "q_set_except_all",
      (s, dir) => {
        val a = Tables.orders(s, dir).filter(col("o_orderstatus") =!= "P")
          .select(col("o_custkey").as("custkey"))
        val b = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("custkey"))
        val w = Window.partitionBy(col("custkey")).orderBy(col("custkey"))
        a.exceptAll(b)
          .withColumn("seq", row_number().over(w))
          .orderBy(col("custkey"), col("seq"))
      },
      Some("""SELECT custkey, CAST(row_number() OVER (PARTITION BY custkey ORDER BY custkey) AS INT) AS seq
             |FROM (
             |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus <> 'P'
             |  EXCEPT ALL
             |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000) t
             |ORDER BY custkey, seq""".stripMargin)),

    // ----------------------------------------------------------- functions
    GQuery(
      "q_str_funcs",
      (s, dir) => {
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            concat_ws("|", upper(col("p_brand")), lower(col("p_type"))).as("tag"),
            substring(col("p_name"), 1, 5).as("head5"),
            trim(col("p_name")).as("trimmed"),
            element_at(split(col("p_name"), " "), 1).as("first_word"),
            regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_alpha"),
            expr("replace(p_name, 'a', '#')").as("replaced"),
            length(col("p_name")).as("name_len"),
            lpad(col("p_brand"), 12, "*").as("padded"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  upper(p_brand) || '|' || lower(p_type) AS tag,
             |  substr(p_name, 1, 5) AS head5,
             |  trim(p_name) AS trimmed,
             |  string_split(p_name, ' ')[1] AS first_word,
             |  regexp_extract(p_name, '([a-z]+)', 1) AS first_alpha,
             |  replace(p_name, 'a', '#') AS replaced,
             |  CAST(length(p_name) AS INT) AS name_len,
             |  lpad(p_brand, 12, '*') AS padded
             |FROM part ORDER BY p_partkey""".stripMargin)),

    GQuery(
      "q_date_funcs",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            quarter(col("o_orderdate")).as("qtr"),
            fmtD(date_trunc("month", col("o_orderdate"))).as("month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
            fmtD(date_add(col("o_orderdate"), 30)).as("plus30"),
            fmtD(last_day(col("o_orderdate"))).as("eom"))
          // r21 (guide §1): materialize once before the presentation
          // sort — no exchange below it, so the sampler otherwise
          // re-runs the whole scan+projection
          .localCheckpoint()
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS yr,
             |  CAST(month(o_orderdate) AS INT) AS mo,
             |  CAST(day(o_orderdate) AS INT) AS dom,
             |  CAST(quarter(o_orderdate) AS INT) AS qtr,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
             |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
             |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // TRY_ functions (try_divide / try_cast / try_add / try_element_at
    // — the error-SAFE expression surface under ANSI mode): at 100 TB
    // one poisoned row must not kill a 10-hour job, and pre-filtering
    // every possible failure is both unwritable and a second pass; the
    // try_ family turns the row-local failure into NULL inside the same
    // codegen'd projection (zero plan change, zero extra scan). Covers
    // the four failure classes: integer division by zero, unparseable
    // string cast, bigint overflow, and out-of-bounds collection
    // access. The oracle replays each with explicit guards (CASE /
    // TRY_CAST / HUGEINT intermediate / native NULL indexing) — the
    // NULL-on-failure semantics, not the error, is the spec.
    GQuery(
      "q_func_try",
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(col("o_orderkey") <= 200)
          .select(col("o_orderkey"),
            round(expr("try_divide(cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint), o_orderkey % 4)").cast("double"), 4).as("ratio"),
            expr("try_cast(o_orderpriority AS INT)").as("pri_full"),
            expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pri_code"),
            expr("try_add(9223372036854775800L, o_orderkey)").as("near_max"),
            expr("try_element_at(split(o_orderpriority, '-'), 2)").as("seg2"),
            expr("try_element_at(split(o_orderpriority, '-'), 3)").as("seg3"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 4 = 0 THEN NULL
             |       ELSE round(CAST((o_totalprice::DECIMAL(18,4) * 100)::BIGINT AS DOUBLE)
             |                  / (o_orderkey % 4), 4) END AS ratio,
             |  TRY_CAST(o_orderpriority AS INTEGER) AS pri_full,
             |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_code,
             |  CASE WHEN o_orderkey <= 7
             |       THEN (9223372036854775800::HUGEINT + o_orderkey)::BIGINT END AS near_max,
             |  string_split(o_orderpriority, '-')[2] AS seg2,
             |  string_split(o_orderpriority, '-')[3] AS seg3
             |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin)),

    GQuery(
      "q_math_funcs",
      (s, dir) => {
        // r21 (guide §2.3/§1): only the SORT-KEY expressions are
        // computed below the global orderBy (range sampling evaluates
        // the sort's whole input, so everything below runs twice);
        // the five non-key projections (rounded/floored/ceiled/
        // price_ln/key_mod) moved ABOVE the sort — one evaluation,
        // and the range exchange carries 7 columns instead of 11.
        // Same expressions, same output columns, same total order.
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
            abs(col("l_discount") - 0.05).cast("double").as("absdiff"),
            round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
            round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
            signum(col("l_discount") - 0.04).cast("int").as("disc_sign"))
          // (key, linenumber) is non-unique: (price_sqrt, qty_sq, absdiff,
          // disc_sign) pins (extendedprice, quantity, discount) so the
          // sort is total up to fully-identical output rows.
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_sqrt"),
            col("qty_sq"), col("absdiff"), col("disc_sign"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 1).as("rounded"),
            floor(col("l_extendedprice")).cast("long").as("floored"),
            ceil(col("l_extendedprice")).cast("long").as("ceiled"),
            col("absdiff"), col("qty_sq"), col("price_sqrt"),
            round(log(col("l_extendedprice") + 1), 4).as("price_ln"),
            pmod(col("l_orderkey"), lit(7)).as("key_mod"),
            col("disc_sign"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice, 1) AS rounded,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS floored,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
             |  abs(l_discount - 0.05) AS absdiff,
             |  round(pow(l_quantity, 2), 4) AS qty_sq,
             |  round(sqrt(l_extendedprice), 4) AS price_sqrt,
             |  round(ln(l_extendedprice + 1), 4) AS price_ln,
             |  ((l_orderkey % 7) + 7) % 7 AS key_mod,
             |  CAST(sign(l_discount - 0.04) AS INT) AS disc_sign
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, price_sqrt, qty_sq, absdiff, disc_sign""".stripMargin)),

    GQuery(
      "q_array_map_funcs",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("tokens", split(col("text"), " "))
          .select(
            col("doc_id"),
            size(col("tokens")).as("n_tokens"),
            array_contains(col("tokens"), "spark").as("has_spark"),
            array_join(slice(sort_array(col("tokens")), 1, 3), ",").as("top3"),
            size(expr("filter(tokens, t -> length(t) > 4)")).as("n_long"),
            expr("aggregate(tokens, 0, (acc, t) -> acc + length(t))").as("sum_len"),
            element_at(map(lit("n"), size(col("tokens"))), "n").as("m_n"),
            array_join(expr("map_keys(map('a', 1, 'b', 2))"), ",").as("mkeys"))
          // r21 (guide §1): materialize once before the presentation
          // sort — no exchange below it, so the sampler otherwise
          // re-runs the whole scan+projection
          .localCheckpoint()
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS top3,
             |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INT) AS n_long,
             |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS INT) AS sum_len,
             |  CAST(len(string_split(text, ' ')) AS INT) AS m_n,
             |  'a,b' AS mkeys
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Map construction + higher-order map functions (map_from_entries,
    // map_filter, map_zip_with surfaces; result projected to plain
    // columns for a portable oracle).
    GQuery(
      "q_map_funcs",
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(col("o_orderkey") < 500)
          .withColumn("m", map(
            lit("price"), col("o_totalprice"),
            lit("double_price"), col("o_totalprice") * 2))
          .select(col("o_orderkey"),
            element_at(col("m"), "price").as("price"),
            element_at(expr("map_filter(m, (k, v) -> v > 100000)"), "price").as("big_price"),
            size(expr("map_filter(m, (k, v) -> v > 100000)")).as("n_big"),
            array_join(sort_array(map_keys(col("m"))), ",").as("keys"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice AS price,
             |  CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS big_price,
             |  (CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END
             |   + CASE WHEN o_totalprice * 2 > 100000 THEN 1 ELSE 0 END)::INT AS n_big,
             |  'double_price,price' AS keys
             |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // JSON surface — the reference's core parsing capability
    // (README.md:179-185) applied to the events.props JSON column.
    GQuery(
      "q_json_funcs",
      (s, dir) => {
        // r21 (guide §2.3/§1): sort FIRST on the base key, project the
        // three JSON parses AFTER — a global orderBy range-partitions
        // by sampling its INPUT, so a projection under the sort ran
        // the parses twice (sample pass + real pass) and shipped the
        // parsed columns through the exchange; event_id is unique, so
        // sort-then-project is order-identical. Plan diff: the
        // exchange carries (event_id, props) only and every JSON
        // expression sits ABOVE the Sort (one evaluation).
        Tables.events(s, dir)
          .select(col("event_id"), col("props"))
          .orderBy(col("event_id"))
          .withColumn("k1", get_json_object(col("props"), "$.k").cast("int"))
          .withColumn("parsed", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
          .select(
            col("event_id"),
            col("k1"),
            col("parsed.k").as("k2"),
            json_tuple(col("props"), "k").as("k3_raw"),
            to_json(struct(col("event_id").as("id"))).as("j"))
          .withColumn("k3", col("k3_raw").cast("int")).drop("k3_raw")
      },
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k1,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k2,
             |  '{"id":' || event_id || '}' AS j,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k3
             |FROM events ORDER BY event_id""".stripMargin)),

    // Spark 4 VARIANT — the engine-native semi-structured type (open
    // binary encoding, type-preserving, no schema declared up front):
    // props parses ONCE into a variant, then typed path extraction
    // (`variant_get`) feeds ordinary aggregates, and a missing path is
    // NULL (counted per group to pin that rule). At 100 TB this is the
    // schema-on-read contract for heterogeneous event payloads — the
    // variant parse is a narrow codegen'd projection; the aggregate is
    // the same 5-group hash agg as any other. The DuckDB oracle
    // replays through its own JSON path functions — two engines, two
    // semi-structured stacks, one answer.
    GQuery(
      "q_json_variant",
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("v", parse_json(col("props")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("variant_get(v, '$.k', 'bigint')")).as("sum_k"),
            min(expr("variant_get(v, '$.k', 'bigint')")).as("min_k"),
            max(expr("variant_get(v, '$.k', 'bigint')")).as("max_k"),
            sum(when(expr("variant_get(v, '$.missing', 'string')").isNull, 1)
              .otherwise(0)).as("n_missing"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             |  CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (no per-row re-execution at any scale).
    GQuery(
      "q_subquery_scalar",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("gq_orders_sub")
        s.sql(
          """SELECT o_orderkey, round(CAST(o_totalprice AS DOUBLE), 2) AS price
            |FROM gq_orders_sub o
            |WHERE o_totalprice > 2 * (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            |                          FROM gq_orders_sub WHERE o_custkey = o.o_custkey)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, round(CAST(o_totalprice AS DOUBLE), 2) AS price
             |FROM orders o
             |WHERE o_totalprice > 2 * (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             |                          FROM orders WHERE o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // Correlated EXISTS / NOT EXISTS — the other half of subquery
    // decorrelation (q_subquery_scalar covers scalar subqueries):
    // Catalyst's RewritePredicateSubquery turns both predicates into
    // left-semi / left-anti joins on o_custkey, so the physical plan is
    // two hash joins — no per-row subquery execution anywhere. Customers
    // with at least one finished order but no open high-value order.
    GQuery(
      "q_subquery_exists",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("gq_cust_ex")
        Tables.orders(s, dir).createOrReplaceTempView("gq_orders_ex")
        s.sql(
          """SELECT c_custkey, c_mktsegment
            |FROM gq_cust_ex c
            |WHERE EXISTS (SELECT 1 FROM gq_orders_ex o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
            |  AND NOT EXISTS (SELECT 1 FROM gq_orders_ex o
            |                  WHERE o.o_custkey = c.c_custkey
            |                    AND o.o_orderstatus = 'O' AND o.o_totalprice > 300000)
            |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderstatus = 'O' AND o.o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // Pivot as conditional aggregation (the portable formulation — the
    // groupBy().pivot() API compiles to exactly this plan).
    GQuery(
      "q_pivot",
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(
            count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
            count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
            count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
            dround(sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice"))))).as("total_f"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus='F' THEN 1 END) AS n_f,
             |  count(CASE WHEN o_orderstatus='O' THEN 1 END) AS n_o,
             |  count(CASE WHEN o_orderstatus='P' THEN 1 END) AS n_p,
             |  round(CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS total_f
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Unpivot/melt: wide metric columns to (metric, val) rows — the
    // inverse of q_pivot, as the portable stack() generator (the
    // DataFrame unpivot API compiles to the same Expand node). Narrow
    // per-row expansion, no shuffle; output ORDER BY includes val so
    // fully-duplicate source rows order deterministically.
    GQuery(
      "q_unpivot",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") >= 48)
          .selectExpr("l_orderkey", "l_linenumber",
            """stack(3, 'quantity', CAST(l_quantity AS DOUBLE),
              |         'extendedprice', l_extendedprice,
              |         'discount', l_discount) AS (metric, val)""".stripMargin)
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("val"))
      },
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
             |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity::DOUBLE AS val
             |    FROM lineitem WHERE l_quantity >= 48
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
             |    FROM lineitem WHERE l_quantity >= 48
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
             |    FROM lineitem WHERE l_quantity >= 48) u
             |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin)),

    // ntile quantile bucketing per returnflag. The filter keeps window
    // partitions bounded here; at scale ntile = floor((rank*n)/N) over
    // the global rank, so the skew-safe path is q_win_percentile's
    // bucketed-rank decomposition, not a wider sort. Window order is
    // total (5-column tie-break) so bucket assignment is deterministic;
    // the output ORDER BY ends in bucket so fully-duplicate rows
    // (assigned adjacent buckets) order deterministically too.
    GQuery(
      "q_win_ntile",
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"))
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") === 50)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice"), ntile(8).over(w).as("bucket"))
          .orderBy(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
            col("l_linenumber"), col("bucket"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
             |  CAST(ntile(8) OVER (PARTITION BY l_returnflag
             |    ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS INTEGER) AS bucket
             |FROM lineitem WHERE l_quantity = 50
             |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber, bucket""".stripMargin)),

    // Distribution window functions (percent_rank/cume_dist) per
    // o_orderpriority — 5 distinct values, so a plain Window
    // partitioned by priority would sort n/5 rows in each of 5
    // reducers: the exact skew monster the q_win_rank comment warns
    // about. Scale-safe two-pass plan instead: because the window
    // order ends in the unique o_orderkey there are no peers, so
    // percent_rank = (rank-1)/(N-1) and cume_dist = rank/N with
    // rank = global row number. Compute that rank distributively:
    // bucket prices into monotone ranges (any monotone bucketing is
    // correct — offsets and within-bucket ranks sum to the same
    // global rank), aggregate counts per (priority, bucket) [tiny],
    // prefix-sum offsets + per-priority totals over the aggregate,
    // broadcast back, and row_number within (priority, bucket) —
    // every sorted partition is now a bounded price range, never n/5.
    // The divisions reproduce the engines' own percent_rank/cume_dist
    // arithmetic bit-for-bit (integer-valued doubles < 2^53).
    GQuery(
      "q_win_percentile",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .withColumn("bkt", floor(col("o_totalprice") / 1000).cast("int"))
        val wOff = Window.partitionBy(col("o_orderpriority")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wTot = Window.partitionBy(col("o_orderpriority"))
        val offsets = base.groupBy(col("o_orderpriority"), col("bkt"))
          .agg(count(lit(1)).as("c"))
          .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
          .withColumn("n_part", sum(col("c")).over(wTot))
          .select(col("o_orderpriority"), col("bkt"), col("off"), col("n_part"))
        val wIn = Window.partitionBy(col("o_orderpriority"), col("bkt"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        base.join(broadcast(offsets), Seq("o_orderpriority", "bkt"))
          .withColumn("rn", col("off") + row_number().over(wIn))
          .withColumn("pr", round(when(col("n_part") > 1,
            (col("rn") - 1).cast("double") / (col("n_part") - 1).cast("double"))
            .otherwise(lit(0.0)), 6))
          .withColumn("cd", round(col("rn").cast("double") / col("n_part").cast("double"), 6))
          .filter(col("pr") >= 0.99)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            col("pr"), col("cd"))
          // r21 (guide §1): materialize once before the presentation
          // sort — the orderBy's range sampling otherwise re-runs the
          // window compute between the reused exchange and the sort
          .localCheckpoint()
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice, pr, cd FROM (
             |  SELECT o_orderkey, o_orderpriority, o_totalprice,
             |    round(percent_rank() OVER w, 6) AS pr,
             |    round(cume_dist() OVER w, 6) AS cd
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_totalprice, o_orderkey)) t
             |WHERE pr >= 0.99 ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    GQuery(
      "q_case_when",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") > 300000, "big")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("small").as("bucket"),
            coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_or_pending"),
            when(col("o_orderpriority").isNull, lit("none")).otherwise(col("o_orderpriority")).as("prio"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 300000 THEN 'big'
             |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
             |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
             |  CASE WHEN o_orderpriority IS NULL THEN 'none' ELSE o_orderpriority END AS prio
             |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
