package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §7.2 minimum end-to-end slice, on the REAL streaming path:
  * seeded CDC topic files → checkpointed Structured Streaming ingest →
  * versioned COW snapshot — then a second run over the same checkpoint
  * proving replay idempotence (exactly-once), and a golden-snapshot
  * equality check against CdcGen.expectedSnapshot.
  */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest e2e: golden snapshot + checkpoint replay idempotence") {
    val root = tmpDir("graft_stream")
    val topic = s"$root/topic"; val log = s"$root/log"
    val ckpt = s"$root/ckpt"; val snapDir = s"$root/snap"

    CdcGen.writeTopicFiles(spark, n = 100, topic, nBatches = 3)

    val q1 = Ingest.run(spark, topic, log, ckpt, snapshotDir = Some(snapDir))
    q1.processAllAvailable(); q1.stop()

    val snap = Ingest.readSnapshot(spark, snapDir).get
    val expected = CdcGen.expectedSnapshot(spark, 100)
    // 100 ids minus multiples of 7 (deleted) = 86 rows
    assert(snap.count() == 86)
    val got = snap.select("id", "full_name", "email", "department", "salary")
      .as[(Int, String, String, String, Int)].collect().sortBy(_._1).toSeq
    val want = expected.select("id", "full_name", "email", "department", "salary")
      .as[(Int, String, String, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == want)

    // event log is partitioned by batch and complete
    val logged = spark.read.parquet(log)
    assert(logged.count() == 100 + 33 + 14) // inserts + updates (id%3) + deletes (id%7)
    assert(logged.select("_batch_id").distinct().count() >= 1)

    // replay: a fresh query over the SAME checkpoint must not change state
    val before = Ingest.committedBatch(spark, snapDir)
    val q2 = Ingest.run(spark, topic, log, ckpt, snapshotDir = Some(snapDir))
    q2.processAllAvailable(); q2.stop()
    assert(Ingest.committedBatch(spark, snapDir) == before)
    assert(Ingest.readSnapshot(spark, snapDir).get.count() == 86)
  }

  test("U5: snapshot written with hive-style key partitioning") {
    val root = tmpDir("graft_part")
    CdcGen.writeTopicFiles(spark, n = 50, s"$root/topic", nBatches = 1)
    val q = Ingest.run(spark, s"$root/topic", s"$root/log", s"$root/ckpt",
      snapshotDir = Some(s"$root/snap"), snapshotPartitionBy = Seq("department"))
    q.processAllAvailable(); q.stop()
    val ver = Ingest.committedBatch(spark, s"$root/snap").get
    val dirs = new java.io.File(s"$root/snap/v$ver").listFiles().map(_.getName)
      .filter(_.startsWith("department=")).sorted.toSeq
    assert(dirs == Seq("department=HR", "department=IT", "department=Marketing", "department=Sales"))
    // partition pruning works through the layout
    val it = Ingest.readSnapshot(spark, s"$root/snap").get.filter($"department" === "IT")
    assert(it.count() > 0)
  }

  test("batch replay twin (U8 earliest): snapshotFromTopic equals golden") {
    val root = tmpDir("graft_batch")
    CdcGen.writeTopicFiles(spark, n = 50, s"$root/topic", nBatches = 2)
    val snap = Ingest.snapshotFromTopic(spark, s"$root/topic")
    assert(snap.count() == 50 - 7) // minus multiples of 7
    val want = CdcGen.expectedSnapshot(spark, 50).select("id", "salary")
      .as[(Int, Int)].collect().sortBy(_._1).toSeq
    val got = snap.select("id", "salary").as[(Int, Int)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("kafka-shaped source schema is byte-compatible with the connector") {
    val root = tmpDir("graft_schema")
    CdcGen.writeTopicFiles(spark, n = 10, s"$root/topic", nBatches = 1)
    val df = Ingest.readTopicBatch(spark, s"$root/topic")
    // names + types must match the connector contract (nullability of
    // literal-derived columns is a Spark artifact, not part of it)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      Envelope.kafkaRecord.map(f => (f.name, f.dataType)))
    // topic include filter (S2): a non-matching pattern yields nothing
    assert(Ingest.readTopicBatch(spark, s"$root/topic", "other\\..*").count() == 0)
  }
}
