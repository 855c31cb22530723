package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Savepoint pins survive every GC site; rollback restores an exact
  * prior state with markers deleted before data. */
class SavepointSpec extends SparkSpec {

  import spark.implicits._

  private def batch(rows: (Long, Long, String, Double)*) =
    rows.toDF("id", "lsn", "op", "value")

  test("savepointed base survives MOR compaction GC; release makes it fodder") {
    val dir = tmpDir("graft_sp") + "/t"
    MergeOnRead.logAppend(spark, dir, batch((1L, 10L, "c", 1.0), (2L, 11L, "c", 2.0)), 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v0
    assert(Savepoints.savepoint(spark, dir, 0L))
    assert(!Savepoints.savepoint(spark, dir, 99L)) // never committed

    MergeOnRead.logAppend(spark, dir, batch((1L, 20L, "u", 1.5)), 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v1
    MergeOnRead.logAppend(spark, dir, batch((2L, 30L, "u", 2.5)), 2L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v2: GC would drop v0

    // v0 still time-travel readable, and diffable against the head
    assert(Ingest.snapshotVersions(spark, dir) == Seq(0L, 1L, 2L))
    val v0 = Ingest.readSnapshotAt(spark, dir, 0L).get
      .select($"id", $"value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(v0 == Seq((1L, 1.0), (2L, 2.0)))
    val feed = ChangeFeed.betweenVersions(spark, dir, 0L, 2L, Seq("id"), "lsn", Seq("value")).get
    assert(feed.count() == 2) // both keys updated since the savepoint

    Savepoints.release(spark, dir, 0L)
    MergeOnRead.logAppend(spark, dir, batch((1L, 40L, "u", 1.9)), 3L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v3: now v0 goes
    assert(!Ingest.snapshotVersions(spark, dir).contains(0L))
  }

  test("rollback removes newer commits AND pending deltas; table reads at the target") {
    val dir = tmpDir("graft_sp2") + "/t"
    MergeOnRead.logAppend(spark, dir, batch((1L, 10L, "c", 1.0)), 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v0
    MergeOnRead.logAppend(spark, dir, batch((1L, 20L, "u", 9.9)), 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v1
    MergeOnRead.logAppend(spark, dir, batch((2L, 30L, "c", 2.0)), 2L) // pending delta

    assert(Savepoints.rollback(spark, dir, 0L) == Seq(1L))
    assert(MergeOnRead.deltaIds(spark, dir).isEmpty) // pending delta rolled back too
    val got = MergeOnRead.readMerged(spark, dir, Seq("id"), Seq("lsn")).get
      .select($"id", $"lsn", $"value").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 1.0)))
    // idempotent-ish: rolling back to the head removes nothing
    assert(Savepoints.rollback(spark, dir, 0L).isEmpty)
  }

  test("rollback refuses to destroy a savepointed version until it is released") {
    val dir = tmpDir("graft_sp4") + "/t"
    MergeOnRead.logAppend(spark, dir, batch((1L, 10L, "c", 1.0)), 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v0
    MergeOnRead.logAppend(spark, dir, batch((1L, 20L, "u", 9.9)), 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v1
    assert(Savepoints.savepoint(spark, dir, 1L))
    // the pin outranks restore: Hudi's guard, run loudly
    intercept[IllegalArgumentException] { Savepoints.rollback(spark, dir, 0L) }
    assert(Ingest.snapshotVersions(spark, dir) == Seq(0L, 1L)) // nothing destroyed
    Savepoints.release(spark, dir, 1L)
    assert(Savepoints.rollback(spark, dir, 0L) == Seq(1L))
  }

  test("rollback to a never-committed version is empty even when newer savepoints exist") {
    // regression pin for the guard ORDER: the savepoint check must only
    // fire for rollbacks that would actually destroy versions — a
    // nonsense toId returns empty, it doesn't trip the pin refusal
    val dir = tmpDir("graft_sp5") + "/t"
    MergeOnRead.logAppend(spark, dir, batch((1L, 10L, "c", 1.0)), 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v0
    MergeOnRead.logAppend(spark, dir, batch((1L, 20L, "u", 9.9)), 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn")) // v1
    assert(Savepoints.savepoint(spark, dir, 1L))
    assert(Savepoints.rollback(spark, dir, 99L).isEmpty) // no throw, no effect
    assert(Ingest.snapshotVersions(spark, dir) == Seq(0L, 1L))
    // the pin still outranks a REAL restore until released
    intercept[IllegalArgumentException] { Savepoints.rollback(spark, dir, 0L) }
    Savepoints.release(spark, dir, 1L)
    assert(Savepoints.rollback(spark, dir, 0L) == Seq(1L))
  }

  test("file-group table: savepointed manifest + its referenced files survive; rollback restores") {
    val dir = tmpDir("graft_sp3") + "/t"
    FileGroups.commit(spark, dir, batch((1L, 10L, "c", 1.0), (2L, 11L, "c", 2.0)), 0L,
      Seq("id"), Seq("lsn"), nBuckets = 4)
    assert(Savepoints.savepoint(spark, dir, 0L))
    FileGroups.commit(spark, dir, batch((1L, 20L, "u", 1.5)), 1L, Seq("id"), Seq("lsn"))
    FileGroups.commit(spark, dir, batch((2L, 30L, "u", 2.5)), 2L, Seq("id"), Seq("lsn"))

    // time travel to the savepointed manifest (its clean buckets still
    // reference v0 data files, which GC must have kept alive)
    val at0 = FileGroups.readAt(spark, dir, 0L).get
      .select($"id", $"value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(at0 == Seq((1L, 1.0), (2L, 2.0)))

    assert(Savepoints.rollback(spark, dir, 1L) == Seq(2L))
    val head = FileGroups.read(spark, dir).get
      .select($"id", $"value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(head == Seq((1L, 1.5), (2L, 2.0)))
  }
}
