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

  test("orphaned rename-asides are GC'd at acquisition; absent-at-release is not reported stolen") {
    // r20 advice (low): a crash between releaseByToken's rename and its
    // delete orphaned `_LOCK.release.<token>` forever (no path ever
    // cleaned them), and a persistently-missing lock at release was
    // reported as "stolen" — conflating out-of-band cleanup with theft.
    val dir = tmpDir("graft_plock11") + "/t"
    fs.mkdirs(new Path(dir))
    def plant(name: String): Path = {
      val p = new Path(s"$dir/$name")
      val out = fs.create(p, true); out.write("dead".getBytes("UTF-8")); out.close()
      fs.setTimes(p, System.currentTimeMillis() - 10000, -1)
      p
    }
    val a1 = plant("_LOCK.release.dead-releaser")
    val a2 = plant("_LOCK.stale.dead-stealer")
    // a FRESH aside must survive (a live verifier's microsecond window)
    val fresh = new Path(s"$dir/_LOCK.release.live-releaser")
    val out = fs.create(fresh, true); out.write("live".getBytes("UTF-8")); out.close()
    ProcessLock.withLock(spark, dir, ttlMs = 500, waitMs = 5000)(())
    assert(!fs.exists(a1) && !fs.exists(a2), "TTL-aged asides must be GC'd on acquire")
    assert(fs.exists(fresh), "a fresh aside must never be raced")
    fs.delete(fresh, false)

    // absent-at-release: deleted out-of-band while held → the error
    // names ABSENCE, not theft
    val err = intercept[IllegalStateException] {
      ProcessLock.withLock(spark, dir, ttlMs = 500, waitMs = 5000) {
        fs.delete(new Path(s"$dir/_LOCK"), false)
      }
    }
    assert(err.getMessage.contains("ALREADY ABSENT"), err.getMessage)
    assert(!err.getMessage.contains("stolen"), err.getMessage)
  }

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
        // simulate a thief: replace the lock file with one carrying
        // ITS token (the token lives IN the lock since round 19)
        val out = fs.create(new Path(s"$dir/_LOCK"), true)
        try out.write("thief-token".getBytes("UTF-8")) finally out.close()
      }
    }
    assert(ex.getMessage.contains("stolen"), ex.getMessage)
    // the (new holder's) lock file was NOT deleted by the loser
    assert(fs.exists(new Path(s"$dir/_LOCK")))
    fs.delete(new Path(s"$dir/_LOCK"), false)
  }

  test("steal vs fresh acquirer: no spurious stolen-lock error, ever (the r18 sidecar race)") {
    // r18 kept the owner token in a _LOCK.owner sidecar; a stealer's
    // post-rename sidecar delete could destroy a FRESH acquirer's token
    // and its release then threw a spurious 'stolen' error. With the
    // token inside the lock file the stealer only ever touches the file
    // its own rename moved. Stress the exact interleaving: an EXPIRED
    // lock on the table, then contenders racing — some steal, some
    // acquire fresh after a release — must all succeed with zero
    // stolen-lock errors across every iteration.
    val dir = tmpDir("graft_plock6") + "/t"
    fs.mkdirs(new Path(dir))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (1 to 25).foreach { _ =>
      // a dead pre-r19 holder: expired lock + legacy token sidecar
      fs.createNewFile(new Path(s"$dir/_LOCK"))
      val out = fs.create(new Path(s"$dir/_LOCK.owner"), true)
      try out.write("dead-holder".getBytes("UTF-8")) finally out.close()
      fs.setTimes(new Path(s"$dir/_LOCK"), System.currentTimeMillis() - 10000, -1)
      val ts = (1 to 3).map { _ =>
        new Thread(() => {
          try ProcessLock.withLock(spark, dir, ttlMs = 2000, waitMs = 20000)(Thread.sleep(1))
          catch { case t: Throwable => failures.add(t) }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(failures.isEmpty, {
        val sw = new java.io.StringWriter
        failures.forEach(t => t.printStackTrace(new java.io.PrintWriter(sw)))
        sw.toString
      })
      // fully released, and the dead holder's legacy sidecar is gone too
      assert(!fs.exists(new Path(s"$dir/_LOCK")))
      assert(!fs.exists(new Path(s"$dir/_LOCK.owner")))
    }
  }

  test("release vs steal + fresh acquire: zero lost fresh locks (r20 compare-and-delete)") {
    // The r19-verdict window: release was read-then-delete — between
    // ownedByUs reading our token and fs.delete, a stealer completing
    // rename-aside + cleanup plus a third party's fresh acquire could
    // have the NEW lock deleted by the old holder's release. r20
    // releases by rename-aside + token verify (releaseByToken), the
    // same discipline the stealer uses. Stress the schedule: a paused
    // holder's EXPIRED lock on disk; one thread steals-and-works
    // through withLock (the fresh acquirer), another fires the paused
    // holder's release at a jittered moment. The fresh acquirer must
    // NEVER lose its lock (zero failures, including spurious 'stolen'
    // at its own release), and the stale release must return true only
    // when it really deleted its own lock.
    val dir = tmpDir("graft_plock10") + "/t"
    fs.mkdirs(new Path(dir))
    val rnd = new scala.util.Random(7)
    (1 to 30).foreach { i =>
      val staleToken = s"paused-holder-$i"
      val out = fs.create(new Path(s"$dir/_LOCK"), true)
      try out.write(staleToken.getBytes("UTF-8")) finally out.close()
      fs.setTimes(new Path(s"$dir/_LOCK"), System.currentTimeMillis() - 10000, -1)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val staleReleased = new java.util.concurrent.atomic.AtomicBoolean
      val fresh = new Thread(() => {
        try ProcessLock.withLock(spark, dir, ttlMs = 500, waitMs = 20000)(Thread.sleep(1))
        catch { case t: Throwable => failures.add(t) }
      })
      val releaser = new Thread(() => {
        try {
          Thread.sleep(rnd.nextInt(120).toLong) // jitter into the steal/acquire window
          staleReleased.set(
            ProcessLock.releaseByToken(fs, dir, staleToken) == ProcessLock.Released)
        } catch { case t: Throwable => failures.add(t) }
      })
      fresh.start(); releaser.start()
      fresh.join(60000); releaser.join(60000)
      assert(failures.isEmpty, {
        val sw = new java.io.StringWriter
        failures.forEach(t => t.printStackTrace(new java.io.PrintWriter(sw)))
        s"iteration $i (staleReleased=${staleReleased.get}): $sw"
      })
      // the fresh holder always finished and released — nothing left
      val left = fs.listStatus(new Path(dir)).map(_.getPath.getName)
        .filter(_.startsWith("_LOCK"))
      assert(left.isEmpty, s"iteration $i leftover lock artifacts: ${left.mkString(",")}")
    }
  }

  test("heartbeat keeps a long-running holder's lock fresh past the TTL") {
    val dir = tmpDir("graft_plock7") + "/t"
    val contended = new java.util.concurrent.atomic.AtomicReference[Throwable]
    ProcessLock.withLock(spark, dir, ttlMs = 400, waitMs = 1000) {
      Thread.sleep(900) // two TTLs: only the heartbeat keeps it alive
      // a contender must see a LIVE lock (fresh mtime) and time out —
      // never steal a heartbeating holder's lock mid-hold
      val t = new Thread(() => {
        try ProcessLock.withLock(spark, dir, ttlMs = 400, waitMs = 200) {
          contended.set(new IllegalStateException("contender acquired a live holder's lock"))
        } catch { case _: IllegalStateException => () /* expected timeout */ }
      })
      t.start(); t.join(30000)
    }
    assert(contended.get() == null, String.valueOf(contended.get()))
    assert(!fs.exists(new Path(s"$dir/_LOCK")))
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
      // ALTER (widenSchema) is a mutating commit too — FS-locked since
      // r19 (it was the one uncovered mutator), same no-deadlock rule
      val v = FileGroups.widenSchema(spark, dir,
        Seq(org.apache.spark.sql.types.StructField("tier",
          org.apache.spark.sql.types.StringType, nullable = true)))
      assert(v == FileGroups.committedId(spark, dir).get)
      assert(FileGroups.read(spark, dir).get.columns.contains("tier"))
      assert(!fs.exists(new Path(s"$dir/_LOCK")), "all locks released")
    } finally spark.conf.unset(ProcessLock.EnabledConf)
  }

  test("conf on: the MOR and snapshot layouts run their lifecycles without deadlock") {
    // round 19 extended the FS lock beyond the file-group store:
    // MergeOnRead.logAppend/compact, Clustering.cluster and the
    // Ingest snapshot commit all wrap withFsLockIfEnabled — the smoke
    // pins that none of them nest-acquires (the lock is not
    // reentrant) and that the lock is released after every op
    val root = tmpDir("graft_plock_mor")
    val dir = s"$root/t"
    import spark.implicits._
    spark.conf.set(ProcessLock.EnabledConf, "true")
    try {
      def batch(lsn: Long) =
        Seq((1L, lsn, "c", 1.0), (2L, lsn, "c", 2.0)).toDF("id", "lsn", "op", "value")
      MergeOnRead.logAppend(spark, dir, batch(10), 0L)
      MergeOnRead.logAppend(spark, dir, batch(11), 1L)
      assert(MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) == Some(1L))
      graft.cdc.Clustering.cluster(spark, dir,
        Seq(org.apache.spark.sql.functions.col("id")), files = 2)
      MergeOnRead.logAppend(spark, dir, batch(12), 2L)
      val got = MergeOnRead.readMerged(spark, dir, Seq("id"), Seq("lsn")).get
        .select($"id", $"lsn").orderBy($"id").as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 12L), (2L, 12L)), got.toString)
      assert(!fs.exists(new Path(s"$dir/_LOCK")), "all locks released")

      // the versioned-snapshot commit path (Ingest.run's foreachBatch
      // leg) under the same conf: a bounded streaming run must land
      // its snapshot and release the lock
      val topic = s"$root/topic"
      CdcGen.writeTopicFiles(spark, n = 20, topic, nBatches = 1)
      val q = Ingest.run(spark, topic, s"$root/log", s"$root/ckpt",
        snapshotDir = Some(s"$root/snap"))
      try q.processAllAvailable() finally q.stop()
      assert(Ingest.readSnapshot(spark, s"$root/snap").get.count() > 0)
      assert(!fs.exists(new Path(s"$root/snap/_LOCK")), "snapshot lock released")
    } finally spark.conf.unset(ProcessLock.EnabledConf)
  }

  test("locked ALTERs racing locked commits: every version consistent, no clobbered manifest") {
    // The r18 verdict race: widenSchema wrote the head+1 manifest
    // BEFORE its marker create, and was the one mutating commit NOT
    // under the FS lock — a concurrent ALTER could overwrite a racing
    // winner's just-committed manifest. With fsLock ON both paths now
    // serialize end to end: a live commit thread races a live ALTER
    // thread and the result must be a linear history — all columns
    // added exactly once, the final snapshot the latest-wins collapse
    // of every batch, and the head's manifest fully readable.
    val dir = tmpDir("graft_plock9") + "/t"
    import spark.implicits._
    spark.conf.set(ProcessLock.EnabledConf, "true")
    spark.conf.set(ProcessLock.WaitConf, "60000")
    try {
      FileGroups.commit(spark, dir,
        Seq((1L, 1L, "c", 1.0)).toDF("id", "lsn", "op", "value"),
        0L, Seq("id"), Seq("lsn"), nBuckets = 2)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val committer = new Thread(() => {
        try (1 to 4).foreach { i =>
          val b = Seq((i.toLong, 100L + i, "u", i.toDouble)).toDF("id", "lsn", "op", "value")
          FileGroups.commitStreamBatch(spark, dir, b, 100L + i, Seq("id"), Seq("lsn"))
        } catch { case t: Throwable => failures.add(t) }
      })
      val alterer = new Thread(() => {
        try (1 to 3).foreach { i =>
          FileGroups.widenSchema(spark, dir,
            Seq(org.apache.spark.sql.types.StructField(s"extra_$i",
              org.apache.spark.sql.types.StringType, nullable = true)))
        } catch { case t: Throwable => failures.add(t) }
      })
      committer.start(); alterer.start()
      committer.join(120000); alterer.join(120000)
      assert(failures.isEmpty, failures.toString)
      val head = FileGroups.read(spark, dir).get
      assert(Seq("extra_1", "extra_2", "extra_3").forall(head.columns.contains),
        head.columns.mkString(","))
      val got = head.select($"id", $"lsn").orderBy($"id").as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L)), got.toString)
      assert(!fs.exists(new Path(s"$dir/_LOCK")), "all locks released")
    } finally {
      spark.conf.unset(ProcessLock.EnabledConf)
      spark.conf.unset(ProcessLock.WaitConf)
    }
  }
}
