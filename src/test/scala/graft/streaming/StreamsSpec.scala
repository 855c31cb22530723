package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time streaming semantics over MemoryStream: window emission on
  * watermark advance, late-data drop, dedup state eviction, session
  * timeout. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("tumbling window agg emits closed windows, drops late data") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val agg = Streams.tumblingAgg(
      in.toDF().toDF("ts", "user_id", "value"), "ts", "user_id",
      window_ = "10 minutes", delay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    try {
      in.addData((ts(1), 1L, 2.0), (ts(3), 1L, 3.0), (ts(11), 1L, 1.0))
      q.processAllAvailable() // watermark now 11-5=6min: window [0,10) still open? closes at wm>=10
      in.addData((ts(20), 1L, 1.0)) // wm -> 15: closes [0,10) and [10,20)
      q.processAllAvailable()
      in.addData((ts(2), 1L, 99.0)) // LATE beyond watermark: dropped
      in.addData((ts(40), 1L, 1.0)) // push wm to close [20,30)
      q.processAllAvailable()
      val rows = spark.table("tumb")
        .select(col("win_start").cast("long"), col("n"), col("total"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toList
      // [0,10): 2 rows total 5.0 (the late 99.0 NOT included); [10,20): 1 row
      assert(rows.take(2) == List((0L, 2L, 5.0), (600L, 1L, 1.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: re-arrivals inside horizon dropped") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val dd = Streams.dedupWithinWatermark(
      in.toDF().toDF("ts", "event_key", "value"), "ts", "10 minutes", "event_key")
    val q = dd.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData((ts(1), 100L, 1.0), (ts(2), 100L, 2.0), (ts(3), 200L, 1.0))
      q.processAllAvailable()
      in.addData((ts(4), 100L, 3.0)) // dup within horizon
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2) // keys 100, 200 once each
    } finally q.stop()
  }

  test("CDC stream composes with watermarked dedup (at-least-once -> effectively-once)") {
    import graft.cdc.{CdcGen, Ingest}
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_dedup").toString
    CdcGen.writeTopicFiles(spark, n = 30, s"$root/topic", nBatches = 2)
    // duplicate a topic file to simulate at-least-once redelivery
    val dirF = new java.io.File(s"$root/topic")
    val src = dirF.listFiles().filter(_.getName.endsWith(".txt")).head
    java.nio.file.Files.copy(src.toPath, new java.io.File(dirF, "redelivered.txt").toPath)

    val parsed = Ingest.extractPostImage(Ingest.readTopicStream(spark, s"$root/topic"))
    val deduped = Streams.dedupWithinWatermark(
      parsed.withColumn("ev_ts", timestamp_millis(col("ts_ms"))), "ev_ts", "1 hour", "id", "lsn")
    val q = deduped.writeStream.format("memory").queryName("cdc_dedup")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("cdc_dedup").count()
      // 30 inserts + 10 updates + 4 deletes = 44 unique (id, lsn) events,
      // despite one whole segment being delivered twice
      assert(n == 44, s"got $n")
    } finally q.stop()
  }

  test("sessionize: inactivity gap closes session with aggregates") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val sess = Streams.sessionize(
      in.toDF().toDF("user_id", "ts", "value"), gapMs = 5 * 60000L, delay = "0 seconds")
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      in.addData((7L, ts(1), 1.0), (7L, ts(2), 2.0))
      q.processAllAvailable()
      // advance watermark far beyond 2min + 5min gap -> session times out
      in.addData((8L, ts(60), 1.0))
      q.processAllAvailable()
      in.addData((8L, ts(120), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess").as[Streams.SessionAgg].collect().toList
      assert(rows.exists(r => r.key == 7L && r.n == 2 && r.total == 3.0))
    } finally q.stop()
  }
}
