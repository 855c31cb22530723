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
  * on (atomic exclusive create, atomic `rename`):
  *
  *  - ACQUIRE: atomically create `_LOCK` in the table dir WITH the
  *    owner token as its content — lock and token land in one atomic
  *    create, so no observer can ever see a lock whose ownership
  *    metadata belongs to a different holder (round 18 kept the token
  *    in a `_LOCK.owner` sidecar; a stealer's post-rename sidecar
  *    delete could then destroy a FRESH acquirer's token and make its
  *    release spuriously report "stolen" — the r18-verdict race).
  *    Contenders retry until `waitMs`, then fail loudly.
  *  - HOLD: a daemon heartbeat touches `_LOCK`'s mtime every
  *    `ttlMs / 3`, so a lock is stealable only when its holder has
  *    made no progress for a full TTL (crashed, or paused longer than
  *    the TTL — the documented FS-lock-provider caveat, same as
  *    Hudi's: a process paused past the TTL can lose the lock while
  *    believing it holds it; the `_COMMIT_` marker still detects the
  *    resulting race at publish). A transient FS error inside the
  *    heartbeat must not kill the thread — the beat retries next
  *    cycle; only interruption (release) ends it.
  *  - STEAL: a contender that observes the SAME expired (mtime, token)
  *    twice, a confirmation dwell apart, takes the short-lived
  *    `_LOCK.steal` mutex (exclusive create; a crashed stealer's
  *    mutex ages out through the same TTL), RE-OBSERVES under it, and
  *    only then atomically RENAMES the expired `_LOCK` aside. The
  *    renamed-aside file is verified by token — if the rename caught a
  *    FRESH holder's lock (a paused holder's late release plus a new
  *    acquire inside the same microseconds), it is restored with an
  *    exclusive move, never a clobbering rename. Acquisition then
  *    proceeds through the normal create race. The stealer touches
  *    ONLY the file its own rename moved — never a path a fresh
  *    acquirer may have just created.
  *  - RELEASE: only the owner releases — the token inside `_LOCK`
  *    must match; a mismatch means the lock was stolen mid-hold,
  *    surfaced loudly instead of silently deleting the new holder's
  *    lock. The check retries briefly so a transient rename-aside
  *    window (restored within microseconds by a verifying stealer)
  *    is never misreported as theft.
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
  private def stealMutexPath(dir: String) = new Path(s"$dir/_LOCK.steal")
  // r18's token sidecar — no longer written; a dead pre-r19 holder's
  // leftover is cleaned up on steal (see the legacy note there)
  private def legacyOwnerPath(dir: String) = new Path(s"$dir/_LOCK.owner")

  /** Atomic exclusive create WITH content (the owner token) in one
    * operation. Hadoop's create-exclusive is only atomic where the
    * underlying store makes it so (HDFS `create(p, overwrite=false)`);
    * on the LOCAL filesystem it is exists-then-create — two contenders
    * (threads or PROCESSES on one POSIX mount) can both "win". For
    * file:// we go through NIO's `Files.write(CREATE_NEW)`
    * (O_CREAT|O_EXCL — atomic at the kernel), everything else trusts
    * the store's exclusive-create contract, the same dependency the
    * `_COMMIT_` marker protocol already declares. A crash between the
    * exclusive open and the content landing leaves a token-less lock
    * that ages out through the TTL like any dead holder's. */
  private def tryCreateAtomic(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                              token: String): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(p.toUri.getPath),
          token.getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false // parent raced away
      }
    } else {
      try {
        val out = fs.create(p, false) // exclusive: throws if p exists
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.FileNotFoundException => false // parent raced away
      }
    }

  /** Exclusive restore: move a wrongly-renamed LIVE lock back to the
    * lock path WITHOUT clobbering a contender that acquired in the
    * meantime. POSIX `rename(2)` (and so Hadoop's local-FS rename)
    * silently REPLACES an existing destination — restoring through it
    * would overwrite a fresh holder's lock with an already-dead one
    * (found by the r19 steal-race stress test). For file:// NIO's
    * `Files.move` without REPLACE_EXISTING fails atomically when the
    * destination exists; HDFS-like stores' rename is no-replace by
    * contract already. */
  private def tryRestoreExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                  aside: Path, lock: Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.move(java.nio.file.Paths.get(aside.toUri.getPath),
          java.nio.file.Paths.get(lock.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false
      }
    } else {
      try fs.rename(aside, lock)
      catch { case _: java.io.IOException => false }
    }

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

    // a steal needs the SAME expired (mtime, token) observed twice,
    // a dwell apart: one stale observation must never trigger a
    // rename — the lock could have been stolen and re-acquired by a
    // FRESH holder in between (the double-observe shrinks the stale
    // window from "since my last loop pass" to "since microseconds
    // ago"; the verify-after-rename below catches even that)
    val confirmDwellMs = math.min(200L, math.max(20L, ttlMs / 10))
    var firstExpired: Option[(Long, String, Long)] = None // (mtime, token, seenAt)

    var acquired = false
    while (!acquired) {
      if (tryCreateAtomic(fs, lockPath(dir), token)) {
        acquired = true
      } else {
        // observe the holder: (mtime, token) in one pass — the token
        // identifies WHICH holder we saw expired, so the steal below
        // can verify it moved that holder's lock and no other's
        val (mtime, seenToken) = try {
          val st = fs.getFileStatus(lockPath(dir))
          val in = fs.open(lockPath(dir))
          val tok = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          (st.getModificationTime, tok)
        } catch { case _: java.io.IOException => (-1L, "") } // released just now — retry
        val expiredNow = mtime >= 0 && System.currentTimeMillis() - mtime > ttlMs
        val confirmed = expiredNow && firstExpired.exists { case (m, t, at) =>
          m == mtime && t == seenToken &&
            System.currentTimeMillis() - at >= confirmDwellMs
        }
        if (expiredNow && !confirmed) {
          // first (or changed) expired sighting: start/restart the
          // confirmation dwell — a live holder's heartbeat or a
          // steal-and-reacquire changes (mtime, token) and resets it
          if (!firstExpired.exists { case (m, t, _) => m == mtime && t == seenToken })
            firstExpired = Some((mtime, seenToken, System.currentTimeMillis()))
          Thread.sleep(confirmDwellMs)
        } else if (confirmed) {
          firstExpired = None
          // STEALERS ARE SERIALIZED through a short-lived `_STEAL`
          // mutex (plain exclusive create; critical section is a few
          // FS metadata ops, no heartbeat needed — a crashed stealer's
          // mutex ages out through the same TTL). Without it, several
          // contenders whose confirmation dwells ran in lockstep all
          // "confirm" the same dead lock and cascade: the first steals
          // and re-acquires, the second renames the FIRST's fresh lock
          // aside, a third creates inside the aside gap, the restore
          // fails — a healthy writer robbed (the r19 stress test hit
          // exactly this thundering-herd weave).
          val mutex = stealMutexPath(dir)
          if (tryCreateAtomic(fs, mutex, token)) {
            try {
              // RE-OBSERVE inside the mutex: only this fresh view
              // authorizes the rename — the pre-mutex confirmation
              // could be stale by a full steal-and-reacquire
              val fresh = try {
                val st = fs.getFileStatus(lockPath(dir))
                val in = fs.open(lockPath(dir))
                val tok = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
                Some((st.getModificationTime, tok))
              } catch { case _: java.io.IOException => None }
              val stillExpired = fresh.exists { case (m, t) =>
                t == seenToken && System.currentTimeMillis() - m > ttlMs
              }
              if (stillExpired) {
                // a pre-r19 holder's token SIDECAR goes first, WHILE
                // the expired lock still blocks every fresh
                // acquisition — it can only belong to the dead holder
                // (the current protocol writes none), so removing it
                // can never strip a live writer's token (the r18
                // post-rename delete could)
                fs.delete(legacyOwnerPath(dir), false)
                // steal by ATOMIC RENAME — moves the specific file, so
                // the verify below can inspect WHAT was taken. The
                // rename can still race the dead holder's own late
                // release: Hadoop's local rename falls back to copy
                // and throws FNF when the source vanishes mid-call —
                // treated as "nothing to steal", never a failure.
                val aside = new Path(s"$dir/_LOCK.stale.$token")
                val moved = try fs.rename(lockPath(dir), aside)
                  catch { case _: java.io.FileNotFoundException => false }
                if (moved) {
                  // VERIFY-AFTER-STEAL (the residual observe→rename
                  // TOCTOU: a paused holder's late release plus a
                  // fresh acquire inside the same microseconds): a
                  // token other than the one observed expired means a
                  // LIVE lock was moved — restore it, exclusively
                  // (POSIX rename would overwrite a newer acquirer).
                  val asideToken = try {
                    val in = fs.open(aside)
                    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                    finally in.close()
                  } catch { case _: java.io.IOException => seenToken }
                  if (asideToken == seenToken) fs.delete(aside, false) // the dead holder's
                  else if (!tryRestoreExclusive(fs, aside, lockPath(dir))) {
                    // restore lost a create race: the wronged holder
                    // fails LOUDLY at release (token mismatch), the
                    // same detection the commit marker backs — clear
                    // the aside so it cannot shadow future steals
                    fs.delete(aside, false)
                  }
                }
              }
            } finally fs.delete(mutex, false)
          } else {
            // another stealer holds the mutex — or a crashed one left
            // it behind: expire it the same way as the lock itself
            val stale = try
              System.currentTimeMillis() - fs.getFileStatus(mutex).getModificationTime > ttlMs
            catch { case _: java.io.IOException => false }
            if (stale) fs.delete(mutex, false)
            Thread.sleep(math.min(50L, math.max(5L, ttlMs / 100)))
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

    // heartbeat while held: a long merge must not age out mid-commit.
    // IOException is caught INSIDE the loop — a transient FS error
    // (blip on a network mount, NFS hiccup) must cost one missed beat,
    // not kill the thread and silently let a LIVE holder's lock age
    // out and be stolen mid-hold (the r18 advice finding). With beats
    // at ttl/3, one holder survives two consecutive failed touches.
    val beat = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(1L, ttlMs / 3))
          try fs.setTimes(lockPath(dir), System.currentTimeMillis(), -1L)
          catch { case _: java.io.IOException => () } // retry next beat
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-$dir")
    beat.setDaemon(true)
    beat.start()

    var failure: Throwable = null
    val result = try f catch { case t: Throwable => failure = t; null.asInstanceOf[T] }
    beat.interrupt()
    // token-guarded release: if OUR lock was stolen (paused past the
    // TTL), the lock file now CARRIES the new holder's token —
    // deleting would strip a live writer's lock, so fail loudly
    // instead (the commit marker has already detected any actual data
    // race by this point). RETRIED briefly before declaring theft: a
    // contender's wrongful rename-aside is restored within
    // microseconds by its verify-after-steal — a release landing
    // inside that aside window must see the restored lock, not a
    // missing one (a REAL steal is stable across every retry and
    // still fails loudly). A stolen-lock error never MASKS f's own
    // failure — it attaches as a suppressed exception.
    def ownedByUs: Boolean = try {
      val in = fs.open(lockPath(dir))
      val cur = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      cur == token
    } catch { case _: java.io.IOException => false }
    val released = (1 to 5).exists { attempt =>
      if (ownedByUs) { fs.delete(lockPath(dir), false); true }
      else { if (attempt < 5) Thread.sleep(100L); false }
    }
    if (!released) {
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
