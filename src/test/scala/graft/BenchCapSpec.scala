package graft

/** The live half of the round-21 stall cap (task 1a — the pure cap
  * arithmetic is pinned in BenchSpec): [[Bench.runCapped]] must abort a
  * stalled action near the cap via job-group cancellation, report it as
  * a capped sample (never a timing), and leave the session healthy for
  * the next run — the whole point is that one stall costs ONE sample,
  * not 199 queries' warm budget (the BENCH_r20 failure). */
class BenchCapSpec extends SparkSpec {

  test("runCapped aborts a stalled run near the cap; fast runs and the session are untouched") {
    // fast action well under the cap → a normal Right
    val fast = Bench.runCapped(spark, "fast", Some(30.0)) {
      spark.range(1000).write.format("noop").mode("overwrite").save()
    }
    assert(fast.isRight)

    // a simulated single-query stall: every task sleeps for a minute;
    // the 2 s cap must cancel the job group and return within seconds
    val t0 = System.nanoTime()
    val slow = Bench.runCapped(spark, "slow", Some(2.0)) {
      import org.apache.spark.sql.functions._
      val sleepy = udf((x: Long) => { Thread.sleep(60000L); x })
      spark.range(8).repartition(8).select(sleepy(col("id")).as("v"))
        .write.format("noop").mode("overwrite").save()
    }
    val tookS = (System.nanoTime() - t0) / 1e9
    slow match {
      case Left(msg) => assert(msg.startsWith("capped:"), msg)
      case Right(_) => fail("a 60 s stall under a 2 s cap must be capped")
    }
    assert(tookS < 30.0, s"cancellation took ${tookS}s — the watchdog is not bounding stalls")

    // the session survives: the NEXT run schedules and completes
    assert(spark.range(10).count() == 10)

    // no cap (a new query's first cold run: no evidence) → never aborted
    val uncapped = Bench.runCapped(spark, "uncapped", None) {
      spark.range(100).write.format("noop").mode("overwrite").save()
    }
    assert(uncapped.isRight)
  }
}
