package graft.cdc

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The cross-process FS lock provider: mutual exclusion, TTL steal,
  * live-holder timeout, token-guarded release, and the opt-in commit
  * integration (FS lock outside the JVM table lock — the documented
  * lock order). */
class ProcessLockSpec extends SparkSpec {

  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  test("withLock serializes contenders: no concurrent critical sections, no lost updates") {
    val dir = tmpDir("graft_plock") + "/t"
    val inCritical = new java.util.concurrent.atomic.AtomicInteger
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    var counter = 0L // deliberately unsynchronized — the lock must protect it
    def worker(): Thread = new Thread(() => {
      try {
        (1 to 8).foreach { _ =>
          ProcessLock.withLock(spark, dir, ttlMs = 10000, waitMs = 20000) {
            assert(inCritical.incrementAndGet() == 1, "two holders inside the lock")
            val v = counter
            Thread.sleep(3)
            counter = v + 1
            inCritical.decrementAndGet()
          }
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    val ts = Seq(worker(), worker(), worker())
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(failures.isEmpty, failures.toString)
    assert(counter == 24L, s"lost updates: $counter")
    // released: nothing left behind
    assert(!fs.exists(new Path(s"$dir/_LOCK")) && !fs.exists(new Path(s"$dir/_LOCK.owner")))
  }

  test("an expired lock is stolen; a live (fresh-heartbeat) lock times out loudly") {
    val dir = tmpDir("graft_plock2") + "/t"
    fs.mkdirs(new Path(dir))
    // a dead holder: lock file whose mtime is a full TTL ago
    fs.createNewFile(new Path(s"$dir/_LOCK"))
    fs.setTimes(new Path(s"$dir/_LOCK"), System.currentTimeMillis() - 5000, -1)
    var ran = false
    ProcessLock.withLock(spark, dir, ttlMs = 1000, waitMs = 2000) { ran = true }
    assert(ran, "expired lock must be stolen")
    assert(!fs.exists(new Path(s"$dir/_LOCK")))

    // a LIVE holder: fresh mtime — acquisition must fail loudly, fast
    fs.createNewFile(new Path(s"$dir/_LOCK"))
    fs.setTimes(new Path(s"$dir/_LOCK"), System.currentTimeMillis(), -1)
    val ex = intercept[IllegalStateException] {
      ProcessLock.withLock(spark, dir, ttlMs = 60000, waitMs = 300) { fail("must not run") }
    }
    assert(ex.getMessage.contains("could not acquire"), ex.getMessage)
    fs.delete(new Path(s"$dir/_LOCK"), false)
  }

  test("a lock stolen mid-hold is surfaced loudly, never a silent release of the new holder") {
    val dir = tmpDir("graft_plock3") + "/t"
    val ex = intercept[IllegalStateException] {
      ProcessLock.withLock(spark, dir, ttlMs = 60000, waitMs = 1000) {
        // simulate a thief: overwrite the owner sidecar with its token
        val out = fs.create(new Path(s"$dir/_LOCK.owner"), true)
        try out.write("thief-token".getBytes("UTF-8")) finally out.close()
      }
    }
    assert(ex.getMessage.contains("stolen"), ex.getMessage)
    // the (new holder's) lock file was NOT deleted by the loser
    assert(fs.exists(new Path(s"$dir/_LOCK")))
    fs.delete(new Path(s"$dir/_LOCK"), false)
    fs.delete(new Path(s"$dir/_LOCK.owner"), false)
  }

  test("opt-in commit integration: conf on takes and releases the FS lock around commits") {
    val dir = tmpDir("graft_plock4") + "/t"
    spark.conf.set(ProcessLock.EnabledConf, "true")
    try {
      val batch = Seq((1L, 10L, "c", 1.0), (2L, 11L, "c", 2.0)).toDF("id", "lsn", "op", "value")
      assert(FileGroups.commit(spark, dir, batch, 0L, Seq("id"), Seq("lsn"), nBuckets = 4).nonEmpty)
      // streaming path holds the FS lock OUTSIDE the JVM lock (the
      // documented order) — a direct stream-batch commit must work too
      val batch2 = Seq((1L, 12L, "u", 3.0)).toDF("id", "lsn", "op", "value")
      assert(FileGroups.commitStreamBatch(spark, dir, batch2, 0L, Seq("id"), Seq("lsn")).nonEmpty)
      assert(!fs.exists(new Path(s"$dir/_LOCK")), "lock must release after commit")
      val got = FileGroups.read(spark, dir).get
        .select($"id", $"lsn").orderBy($"id").as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 12L), (2L, 11L)))
      // a foreign live lock makes the commit fail loudly instead of racing
      fs.createNewFile(new Path(s"$dir/_LOCK"))
      fs.setTimes(new Path(s"$dir/_LOCK"), System.currentTimeMillis(), -1)
      spark.conf.set(ProcessLock.WaitConf, "300")
      val ex = intercept[IllegalStateException] {
        FileGroups.commit(spark, dir, batch2, 5L, Seq("id"), Seq("lsn"))
      }
      assert(ex.getMessage.contains("could not acquire"), ex.getMessage)
    } finally {
      spark.conf.unset(ProcessLock.EnabledConf)
      spark.conf.unset(ProcessLock.WaitConf)
    }
  }

  test("conf on: every FS-locked maintenance op runs without nested-acquire deadlock") {
    val dir = tmpDir("graft_plock5") + "/t"
    spark.conf.set(ProcessLock.EnabledConf, "true")
    try {
      def batch(lsn: Long) =
        Seq((1L, lsn, "c", 1.0), (2L, lsn, "c", 2.0)).toDF("id", "lsn", "op", "value")
      FileGroups.setRetention(spark, dir, 4) // the public, separately-locked door
      (0L to 3L).foreach(v => FileGroups.commit(spark, dir, batch(10 + v), v, Seq("id"), Seq("lsn"), 4))
      // clean sets the policy INSIDE its own FS-locked scope (the
      // setRetentionInner path — a nested public setRetention would
      // deadlock on the non-reentrant lock)
      assert(FileGroups.clean(spark, dir, Some(3)) == Seq(0L))
      assert(Savepoints.savepoint(spark, dir, 2L))
      assert(Savepoints.rollback(spark, dir, 2L) == Seq(3L))
      Savepoints.release(spark, dir, 2L)
      // purge takes the FS lock around its rewrite + forget
      assert(FileGroups.purgeKeyTuples(spark, dir, Seq("id"), Seq(Seq(1L)), 10L).nonEmpty)
      assert(FileGroups.read(spark, dir).get.select($"id").as[Long].collect().toSeq == Seq(2L))
      assert(!fs.exists(new Path(s"$dir/_LOCK")), "all locks released")
    } finally spark.conf.unset(ProcessLock.EnabledConf)
  }
}
