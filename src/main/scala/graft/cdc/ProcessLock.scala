package graft.cdc

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-process table lock — the Hudi FileSystemBasedLockProvider
  * role for the file-group store: the in-process table lock
  * ([[FileGroups.withTableLock]]) already makes same-JVM writers
  * exactly-one-winner, and the `_COMMIT_` marker's atomic create
  * DETECTS a cross-process race after the fact; this provider lets
  * operators PREVENT that race when more than one process must write
  * one table (two DeltaStream jobs, a stream plus a batch backfill).
  *
  * Protocol, built only on operations the commit markers already rely
  * on (atomic `createNewFile`, atomic `rename`):
  *
  *  - ACQUIRE: atomically create `_LOCK` in the table dir, then write
  *    the owner token to the `_LOCK.owner` sidecar. Contenders retry
  *    until `waitMs`, then fail loudly.
  *  - HOLD: a daemon heartbeat touches `_LOCK`'s mtime every
  *    `ttlMs / 3`, so a lock is stealable only when its holder has
  *    made no progress for a full TTL (crashed, or paused longer than
  *    the TTL — the documented FS-lock-provider caveat, same as
  *    Hudi's: a process paused past the TTL can lose the lock while
  *    believing it holds it; the `_COMMIT_` marker still detects the
  *    resulting race at publish).
  *  - STEAL: an expired `_LOCK` is atomically RENAMED aside (only one
  *    stealer's rename can succeed — never two writers deleting and
  *    both "winning"), cleaned up, and acquisition proceeds through
  *    the normal create race.
  *  - RELEASE: only the owner releases — the sidecar token must match;
  *    a mismatch means the lock was stolen mid-hold, surfaced loudly
  *    instead of silently deleting the new holder's lock.
  *
  * Opt-in (the Hudi posture: no lock provider by default):
  * `spark.conf.set("spark.graft.cdc.fsLock", "true")` makes every
  * [[FileGroups.commitOutcome]] / streaming commit take this lock
  * around its head-check → publish window;
  * `spark.graft.cdc.fsLock.ttlMs` / `.waitMs` tune the windows.
  * Cost per commit when enabled: two driver-side FS creates + one
  * delete — nothing that scales with data.
  */
object ProcessLock {

  /** Conf keys ([[FileGroups.commitOutcome]] reads them). */
  val EnabledConf = "spark.graft.cdc.fsLock"
  val TtlConf = "spark.graft.cdc.fsLock.ttlMs"
  val WaitConf = "spark.graft.cdc.fsLock.waitMs"

  private def fsOf(spark: SparkSession, dir: String) =
    graft.ops.DeltaProtocol.fsOf(spark, dir)

  private def lockPath(dir: String) = new Path(s"$dir/_LOCK")
  private def ownerPath(dir: String) = new Path(s"$dir/_LOCK.owner")

  /** Atomic exclusive create. Hadoop's `FileSystem.createNewFile` is
    * only atomic where the underlying store makes create-exclusive
    * atomic (HDFS); on the LOCAL filesystem it is exists-then-create —
    * two contenders (threads or PROCESSES on one POSIX mount) can both
    * "win". For file:// we go through NIO's `Files.createFile`
    * (O_CREAT|O_EXCL — atomic at the kernel), everything else trusts
    * the store's createNewFile contract, the same dependency the
    * `_COMMIT_` marker protocol already declares. */
  private def tryCreateAtomic(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    if (fs.getScheme == "file") {
      try { java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath)); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false // parent raced away
      }
    } else fs.createNewFile(p)

  /** Run `f` holding the table's cross-process FS lock. Throws (never
    * silently proceeds) when the lock cannot be acquired within
    * `waitMs` against a live (heartbeating) holder. */
  def withLock[T](sess: SparkSession, dir: String,
                  ttlMs: Long = 60000L, waitMs: Long = 30000L)(f: => T): T = {
    require(ttlMs > 0 && waitMs >= 0, s"ttlMs must be > 0 and waitMs >= 0")
    val fs = fsOf(sess, dir)
    if (!fs.exists(new Path(dir))) fs.mkdirs(new Path(dir))
    val token = UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs

    var acquired = false
    while (!acquired) {
      if (tryCreateAtomic(fs, lockPath(dir))) {
        // owner sidecar is informational + release guard; a crash
        // between the create and this write leaves a token-less lock
        // that ages out through the TTL like any dead holder's
        val out = fs.create(ownerPath(dir), true)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        acquired = true
      } else {
        val mtime = try fs.getFileStatus(lockPath(dir)).getModificationTime
          catch { case _: java.io.FileNotFoundException => -1L } // released just now — retry
        if (mtime >= 0 && System.currentTimeMillis() - mtime > ttlMs) {
          // expired: steal by ATOMIC RENAME — exactly one stealer can
          // move it, so two contenders can never both clear the way
          // and tread on each other's fresh lock (the delete race)
          val aside = new Path(s"$dir/_LOCK.stale.$token")
          if (fs.rename(lockPath(dir), aside)) {
            fs.delete(aside, false)
            fs.delete(ownerPath(dir), false)
          }
          // loop: re-race the create
        } else if (System.currentTimeMillis() > deadline) {
          throw new IllegalStateException(
            s"could not acquire the cross-process lock at $dir within ${waitMs}ms — " +
              "another live writer holds it (its heartbeat is fresh); serialize the " +
              "writers or raise spark.graft.cdc.fsLock.waitMs")
        } else Thread.sleep(math.min(200L, math.max(10L, ttlMs / 20)))
      }
    }

    // heartbeat while held: a long merge must not age out mid-commit
    val beat = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(1L, ttlMs / 3))
          fs.setTimes(lockPath(dir), System.currentTimeMillis(), -1L)
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-$dir")
    beat.setDaemon(true)
    beat.start()

    var failure: Throwable = null
    val result = try f catch { case t: Throwable => failure = t; null.asInstanceOf[T] }
    beat.interrupt()
    // token-guarded release: if OUR lock was stolen (paused past the
    // TTL), the sidecar now names the new holder — deleting would
    // strip a live writer's lock, so fail loudly instead (the commit
    // marker has already detected any actual data race by this point).
    // A stolen-lock error never MASKS f's own failure — it attaches as
    // a suppressed exception.
    val ownedByUs = try {
      val in = fs.open(ownerPath(dir))
      val cur = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      cur == token
    } catch { case _: java.io.IOException => false }
    if (ownedByUs) {
      fs.delete(lockPath(dir), false)
      fs.delete(ownerPath(dir), false)
    } else {
      val stolen = new IllegalStateException(
        s"cross-process lock at $dir was stolen while held (holder paused past the " +
          "TTL?) — this writer's work may have raced the new holder; check the " +
          "table's commit timeline before retrying")
      if (failure != null) failure.addSuppressed(stolen) else throw stolen
    }
    if (failure != null) throw failure
    result
  }
}
