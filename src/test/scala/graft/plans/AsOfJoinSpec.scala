package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the plan-tier as-of operator: semantics on BOTH physical paths
  * (inclusive ties, last-wins tie-break, left-outer null extension,
  * key isolation, bounded-lag tolerance), value-equality with the
  * composed union-window formulation on real events data, and the
  * cost-based physical contract — merge exec with exactly one exchange
  * + one sort per side above the threshold, broadcast exec with NO
  * exchange and NO sort under it. */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  /** Pin the physical path: the strategy is cost-based (broadcast under
    * the threshold), so merge-path assertions must disable broadcast. */
  private def withThreshold[A](v: String)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  test("semantics on both paths: inclusive ties, last-wins, null extension, key isolation") {
    import spark.implicits._
    val purch = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L), (4L, 30L, 50L))
      .toDF("p_id", "user_id", "p_ts")
    val clicks = Seq(
      (100L, 10L, 90L), (101L, 10L, 100L), // tie at ts=100: 101 wins (inclusive <=)
      (102L, 10L, 150L),
      (103L, 20L, 149L),
      (105L, 20L, 149L),                   // equal (key, ts): higher tie column wins
      (104L, 40L, 1L))                     // key with no left rows: never surfaces
      .toDF("click_id", "c_user", "c_ts")
    for (thr <- Seq("-1", "10MB")) withThreshold(thr) { // merge, then broadcast
      val out = AsOfJoin.asof(purch, clicks,
          Seq("user_id"), Seq("c_user"), "p_ts", "c_ts", Seq("click_id"))
        .select($"p_id", $"click_id").as[(Long, Option[Long])].collect().toMap
      assert(out == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> Some(105L), 4L -> None),
        s"threshold=$thr")
    }
  }

  test("allowExactMatches=false: strict inequality on both paths; equal-ts rights stay live for later lefts") {
    import spark.implicits._
    val purch = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L))
      .toDF("p_id", "user_id", "p_ts")
    val clicks = Seq(
      (100L, 10L, 90L), (101L, 10L, 100L), // ts=100 equals left 1: excluded strictly
      (102L, 10L, 200L),                   // equals left 2: excluded, 101 matches
      (103L, 20L, 150L))                   // equals left 3: no earlier click → null
      .toDF("click_id", "c_user", "c_ts")
    for (thr <- Seq("-1", "10MB")) withThreshold(thr) { // merge, then broadcast
      val out = AsOfJoin.asof(purch, clicks,
          Seq("user_id"), Seq("c_user"), "p_ts", "c_ts", Seq("click_id"),
          allowExactMatches = false)
        .select($"p_id", $"click_id").as[(Long, Option[Long])].collect().toMap
      assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None),
        s"threshold=$thr")
    }
  }

  test("column resolution: case-insensitive by default, honors spark.sql.caseSensitive, throws on ambiguity") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("p_id", "user_id", "p_ts")
    val r = Seq((100L, 10L, 90L)).toDF("click_id", "c_user", "c_ts")
    // default conf is case-insensitive: mixed-case names resolve
    val out = AsOfJoin.asof(l, r, Seq("USER_ID"), Seq("C_User"), "P_TS", "c_ts")
      .select($"p_id", $"click_id").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L)))
    // with caseSensitive=true the same lookup must fail
    spark.conf.set("spark.sql.caseSensitive", "true")
    try intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("USER_ID"), Seq("c_user"), "p_ts", "c_ts")
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
    // duplicate names that differ only by case are ambiguous when insensitive
    val dup = l.select(col("*"), lit(5L).as("P_TS"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(dup, r, Seq("user_id"), Seq("c_user"), "p_ts", "c_ts")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("tolerance: bounded lag drops stale candidates, keeps fresh ones") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("p_id", "user_id", "p_ts")
    val r = Seq((100L, 10L, 95L), (101L, 10L, 150L)).toDF("click_id", "c_user", "c_ts")
    for (thr <- Seq("-1", "10MB")) withThreshold(thr) { // merge, then broadcast
      val out = AsOfJoin.asof(l, r, Seq("user_id"), Seq("c_user"), "p_ts", "c_ts",
          Seq("click_id"), tolerance = Some(10L))
        .select($"p_id", $"click_id").as[(Long, Option[Long])].collect().toMap
      // left@100: candidate click@95, lag 5 <= 10 → match; left@200:
      // latest candidate click@150, lag 50 > 10 → no match (and the
      // single-candidate check is complete: older rights are staler)
      assert(out == Map(1L -> Some(100L), 2L -> None), s"threshold=$thr")
    }
  }

  test("physical contract: cost-based merge vs broadcast selection") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong, (i % 7).toLong, i.toLong * 10)).toDF("id", "k", "ts")
    val r = (1 to 300).map(i => (i.toLong + 1000, (i % 7).toLong, i.toLong * 3)).toDF("rid", "rk", "rts")
    withThreshold("-1") { // broadcast disabled → co-partitioned merge
      val plan = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "ts", "rts", Seq("rid"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("AsOfMergeJoin"), plan)
      assert(plan.split("\n").count(_.contains("Exchange hashpartitioning")) == 2, plan)
      assert(plan.split("\n").count(_.contains("Sort ")) == 2, plan)
    }
    withThreshold("10MB") { // small right → broadcast: NO exchange, NO sort
      val plan = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "ts", "rts", Seq("rid"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastAsOfJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(!plan.contains("Sort "), plan)
    }
  }

  test("value-equality with the composed union-window form on events (sf0.01)") {
    import spark.implicits._
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.01")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // composed reference: the q_join_asof union-window formulation
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = ev
      .withColumn("click_id", last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("click_id"))
      .as[(Long, Option[Long])].collect().toMap
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    for (thr <- Seq("-1", "10MB")) withThreshold(thr) { // merge, then broadcast
      val native = AsOfJoin.asof(purch, clicks,
          Seq("user_id"), Seq("c_user"), "p_ts", "c_ts", Seq("click_id"))
        .select($"p_id", $"click_id").as[(Long, Option[Long])].collect().toMap
      assert(native.nonEmpty)
      assert(native == composed, s"threshold=$thr")
    }
  }

  test("randomized equivalence: both paths match a brute-force reference on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // duplicate keys, duplicate timestamps, keys present on only one
      // side — the degenerate shapes a merge implementation gets wrong
      val l = Seq.fill(200)((rnd.nextInt(1000).toLong,
        rnd.nextInt(12).toLong, rnd.nextInt(50).toLong))
        .zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) }
        .toDF("p_id", "user_id", "p_ts")
      val r = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(50).toLong))
        .zipWithIndex.map { case ((k, t), i) => (i.toLong + 10000, k, t) }
        .toDF("click_id", "c_user", "c_ts")
      // brute-force reference: per left row, max (ts, id) right with
      // key match and ts <= leftTs (< in strict mode)
      val rRows = r.as[(Long, Long, Long)].collect()
      for (exact <- Seq(true, false)) {
        val expect = l.as[(Long, Long, Long)].collect().map { case (pid, k, t) =>
          val cands = rRows.filter(c => c._2 == k && (if (exact) c._3 <= t else c._3 < t))
          pid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy(c => (c._3, c._1))._1))
        }.toMap
        for (thr <- Seq("-1", "10MB")) withThreshold(thr) {
          val got = AsOfJoin.asof(l, r, Seq("user_id"), Seq("c_user"),
              "p_ts", "c_ts", Seq("click_id"), allowExactMatches = exact)
            .select($"p_id", $"click_id").as[(Long, Option[Long])].collect().toMap
          assert(got == expect, s"trial=$trial threshold=$thr exact=$exact")
        }
      }
    }
  }

  test("skew shape: one hot key streams in O(n+m), no pair expansion") {
    import spark.implicits._
    // 5k lefts and 5k rights on ONE key: the range-join form would
    // materialize ~12.5M pairs before dedup; the merge emits exactly
    // 5k rows and holds one buffered right row at a time
    val l = (1 to 5000).map(i => (i.toLong, 1L, i.toLong * 2)).toDF("id", "k", "ts")
    val r = (1 to 5000).map(i => (i.toLong + 10000, 1L, i.toLong * 2 + 1)).toDF("rid", "rk", "rts")
    val out = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "ts", "rts", Seq("rid"))
    // left i sits at ts=2i; rights sit at odd rts=2j+1, so the latest
    // right at-or-before left i is j = i-1 (rid = 10000 + i - 1), and
    // left 1 precedes every right
    val got = out.select($"id", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got.size == 5000)
    assert(got(1L).isEmpty)
    assert(got(5000L).contains(10000L + 4999L))
    assert(got(2500L).contains(10000L + 2499L))
  }
}
