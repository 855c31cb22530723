package graft.cdc

import graft.SparkSpec

/** MERGE_ON_READ table service: streaming log-append ingest, read-time
  * merge over base + pending logs, periodic compaction — asserted
  * equivalent to the COW path and to the generator's golden snapshot.
  */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "full_name", "department", "salary")
      .as[(Int, String, String, Int)].collect().sortBy(_._1).toSeq

  test("MOR streaming ingest: golden snapshot, pending logs, compaction, replay") {
    val root = tmpDir("graft_mor")
    CdcGen.writeTopicFiles(spark, n = 80, s"$root/topic", nBatches = 3)

    // compactEvery=2 over 3 micro-batches: compaction fires after batch
    // id 1, so batch 2 stays a pending log — the read path must merge it
    val q = MergeOnRead.run(spark, s"$root/topic", s"$root/mor", s"$root/ckpt", compactEvery = 2)
    q.processAllAvailable(); q.stop()

    assert(Ingest.committedBatch(spark, s"$root/mor").contains(1L)) // base from compaction
    assert(MergeOnRead.deltaIds(spark, s"$root/mor") == Seq(2L))    // batch 2 pending

    val merged = MergeOnRead.readMerged(spark, s"$root/mor", Seq("id"), Seq("lsn")).get
    assert(merged.count() == 80 - 11) // minus multiples of 7
    assert(canon(merged) == canon(CdcGen.expectedSnapshot(spark, 80)))

    // base alone (the read-optimized view) is STALE relative to merged —
    // that's the MOR contract: pending logs only appear via readMerged
    val baseOnly = Ingest.readSnapshot(spark, s"$root/mor").get
    assert(baseOnly.count() >= merged.count()) // deletes in batch 2 not yet applied

    // explicit compaction folds the pending log and empties the queue
    val newBase = MergeOnRead.compact(spark, s"$root/mor", Seq("id"), Seq("lsn"))
    assert(newBase.contains(2L))
    assert(MergeOnRead.deltaIds(spark, s"$root/mor").isEmpty)
    assert(canon(Ingest.readSnapshot(spark, s"$root/mor").get) ==
      canon(CdcGen.expectedSnapshot(spark, 80)))
    // nothing pending → compaction is a no-op
    assert(MergeOnRead.compact(spark, s"$root/mor", Seq("id"), Seq("lsn")).isEmpty)

    // replay over the SAME checkpoint: no state change (exactly-once)
    val q2 = MergeOnRead.run(spark, s"$root/topic", s"$root/mor", s"$root/ckpt", compactEvery = 2)
    q2.processAllAvailable(); q2.stop()
    assert(Ingest.committedBatch(spark, s"$root/mor").contains(2L))
    assert(MergeOnRead.deltaIds(spark, s"$root/mor").isEmpty)
  }

  test("MOR == COW: identical final state from the same topic") {
    val root = tmpDir("graft_morcow")
    CdcGen.writeTopicFiles(spark, n = 50, s"$root/topic", nBatches = 2)

    val qc = Ingest.run(spark, s"$root/topic", s"$root/log", s"$root/ckpt_cow",
      snapshotDir = Some(s"$root/cow"))
    qc.processAllAvailable(); qc.stop()
    val qm = MergeOnRead.run(spark, s"$root/topic", s"$root/mor", s"$root/ckpt_mor",
      compactEvery = 100) // never compacts: pure log-merge read path
    qm.processAllAvailable(); qm.stop()

    val cow = Ingest.readSnapshot(spark, s"$root/cow").get
    val mor = MergeOnRead.readMerged(spark, s"$root/mor", Seq("id"), Seq("lsn")).get
    assert(canon(mor) == canon(cow))
    // with no compaction ever run, ALL state lives in the logs
    assert(Ingest.committedBatch(spark, s"$root/mor").isEmpty)
    assert(MergeOnRead.deltaIds(spark, s"$root/mor").size == 2)
  }

  test("inline clustering: compacted base comes out clustered, state unchanged") {
    val root = tmpDir("graft_morclu")
    CdcGen.writeTopicFiles(spark, n = 80, s"$root/topic", nBatches = 3)
    // compaction fires after batch 1 and inline clustering rewrites the
    // fresh base; batch 2 stays a pending log on top of the clustered base
    val q = MergeOnRead.run(spark, s"$root/topic", s"$root/mor", s"$root/ckpt",
      compactEvery = 2, clusterBy = Seq("id"), clusterFiles = 2)
    q.processAllAvailable(); q.stop()
    assert(Clustering.clusteredId(spark, s"$root/mor").contains(1L))
    assert(Clustering.baseDir(spark, s"$root/mor").get.endsWith("/c1"))
    // merged view over clustered base + pending log == golden
    val merged = MergeOnRead.readMerged(spark, s"$root/mor", Seq("id"), Seq("lsn")).get
    assert(canon(merged) == canon(CdcGen.expectedSnapshot(spark, 80)))
  }

  test("logAppend is idempotent by marker and skips base-covered batches") {
    val root = tmpDir("graft_morappend")
    val rows = Seq((1, 10L, "c", 100)).toDF("id", "lsn", "op", "salary")
    MergeOnRead.logAppend(spark, s"$root/t", rows, 0L)
    MergeOnRead.logAppend(spark, s"$root/t", rows.withColumn("salary",
      org.apache.spark.sql.functions.lit(999)), 0L) // replay: ignored
    assert(spark.read.parquet(s"$root/t/log/d0").select("salary").as[Int].head() == 100)
    MergeOnRead.compact(spark, s"$root/t", Seq("id"), Seq("lsn"))
    MergeOnRead.logAppend(spark, s"$root/t", rows, 0L) // covered by base: ignored
    assert(MergeOnRead.deltaIds(spark, s"$root/t").isEmpty)
  }
}
