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

  test("nearDupIngest: each batch dedups against landed survivors; restart is a no-op") {
    import graft.ops.{LshIndex, Text}
    val root = tmpDir("graft_sdedup")
    val (idx, out, ck, src) = (root + "/idx", root + "/out", root + "/ckpt", root + "/src")
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val slice = (0 to 2).map(i => docs.filter(pmod($"doc_id", lit(3)) === i))

    // driver-side reference: near-dup (corpus, new) pairs via the direct
    // band join (the LshIndexSpec equivalence form), replayed batch by
    // batch against the accumulated SURVIVOR corpus
    def dupsAgainst(corpus: org.apache.spark.sql.DataFrame,
                    batch: org.apache.spark.sql.DataFrame): Set[Long] =
      LshIndex.bands(batch).select($"doc_id".as("new_id"), $"sh".as("shb"), $"band")
        .join(LshIndex.bands(corpus).select($"sh".as("sha"), $"band"), Seq("band"))
        .filter(Text.jaccard($"sha", $"shb") >= 0.5)
        .select($"new_id").distinct().as[Long].collect().toSet
    val surv0 = slice(0)
    val dup1 = dupsAgainst(surv0, slice(1))
    val surv1 = slice(1).filter(!$"doc_id".isin(dup1.toSeq: _*))
    val dup2 = dupsAgainst(surv0.unionByName(surv1), slice(2))
    val surv2 = slice(2).filter(!$"doc_id".isin(dup2.toSeq: _*))
    assert(dup1.nonEmpty || dup2.nonEmpty, "fixture must drop at least one cross-batch dup")
    val expected = (surv0.select($"doc_id").as[Long].collect().map(_ -> 0L) ++
      surv1.select($"doc_id").as[Long].collect().map(_ -> 1L) ++
      surv2.select($"doc_id").as[Long].collect().map(_ -> 2L)).toSet

    LshIndex.buildEmpty(spark, idx, nBuckets = 16)
    slice(0).coalesce(1).write.mode("append").parquet(src) // batch 0 ready pre-start
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = Streams.nearDupIngest(stream, idx, out, ck)
    try {
      q.processAllAvailable()
      slice(1).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      slice(2).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).select($"doc_id", $"_batch_id".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected, s"landed corpus diverged from the sequential reference")
    assert(LshIndex.deltaIds(spark, idx) == Seq(0L, 1L, 2L))

    // restart on the same checkpoint with no new files: nothing replays,
    // nothing lands twice, the index gains no delta
    val q2 = Streams.nearDupIngest(spark.readStream.schema(docs.schema).parquet(src),
      idx, out, ck)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == got.size)
    assert(LshIndex.deltaIds(spark, idx) == Seq(0L, 1L, 2L))
  }

  test("clusterBatch: incremental assignment equals full recompute; crash replay converges") {
    import graft.ops.{ClusterStore, Components}
    val root = tmpDir("graft_scluster_crash")
    val (pairsDir, store) = (root + "/pairs", root + "/store")
    // 9 nodes arriving by id % 3; edges chosen so batch 1 bridges two
    // batch-0-era components and batch 2's node 2 becomes its merged
    // component's NEW minimum (the relabel-everything case)
    val edges = Seq((3L, 6L), (3L, 4L), (1L, 7L), (2L, 4L), (0L, 8L), (5L, 8L))
    edges.toDF("id_a", "id_b").write.parquet(pairsDir)
    val nodes = (0L until 9L).toDF("doc_id")

    ClusterStore.buildEmpty(spark, store)
    for (k <- 0 to 2)
      assert(Streams.clusterBatch(nodes.filter(pmod($"doc_id", lit(3)) === k), k.toLong, pairsDir, store))
    val got = ClusterStore.read(spark, store).as[(Long, Long)].collect().toSet
    val full = Components.connectedComponents(
        nodes.select($"doc_id".as("id")), edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toSet
    assert(got == full, "incremental maintenance diverged from full recompute")
    assert(got.find(_._1 == 3L).get._2 == 2L,
      "batch-2 node 2 must have become component {2,3,4,6}'s new minimum")

    // committed batch replayed → full no-op
    assert(!Streams.clusterBatch(nodes.filter(pmod($"doc_id", lit(3)) === 2), 2L, pairsDir, store))

    // crash between the snapshot write and the marker: version 2 never
    // committed; the replay recomputes an IDENTICAL snapshot off the
    // unchanged version 1
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store/_DELTA_2"), false)
    assert(ClusterStore.deltaIds(spark, store) == Seq(0L, 1L))
    assert(Streams.clusterBatch(nodes.filter(pmod($"doc_id", lit(3)) === 2), 2L, pairsDir, store),
      "replay must re-commit the crashed batch")
    assert(ClusterStore.read(spark, store).as[(Long, Long)].collect().toSet == got,
      "crash replay diverged from the committed state")
  }

  test("clusterBatch: a pair landing AFTER both endpoints' batches still merges (late-pair sweep)") {
    import graft.ops.ClusterStore
    val root = tmpDir("graft_scluster_late")
    val (pairsDir, store) = (root + "/pairs", root + "/store")
    // nodes 0..3 land across batches 0 and 1 with NO pairs in the feed
    Seq.empty[(Long, Long)].toDF("id_a", "id_b").write.parquet(pairsDir)
    ClusterStore.buildEmpty(spark, store)
    assert(Streams.clusterBatch(Seq(0L, 1L).toDF("doc_id"), 0L, pairsDir, store))
    assert(Streams.clusterBatch(Seq(2L, 3L).toDF("doc_id"), 1L, pairsDir, store))
    assert(ClusterStore.read(spark, store).select($"lab").distinct().count() == 4)
    // the probe's (1,2) pair arrives ONLY NOW — after both endpoints
    // committed; no future batch contains either endpoint
    Seq((1L, 2L)).toDF("id_a", "id_b").write.mode("append").parquet(pairsDir)
    // the next batch (unrelated node) must sweep the late pair in
    assert(Streams.clusterBatch(Seq(9L).toDF("doc_id"), 2L, pairsDir, store))
    val got = ClusterStore.read(spark, store).as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L), s"late pair never merged: $got")
    assert(got(0L) != got(1L) && got(3L) != got(2L))
    // an EMPTY batch also flushes late pairs
    Seq((0L, 3L)).toDF("id_a", "id_b").write.mode("append").parquet(pairsDir)
    assert(Streams.clusterBatch(Seq.empty[Long].toDF("doc_id"), 3L, pairsDir, store))
    val got2 = ClusterStore.read(spark, store).as[(Long, Long)].collect().toMap
    assert(got2(0L) == got2(3L), s"empty batch did not flush the late pair: $got2")
  }

  test("ClusterStore rejects an out-of-order append id instead of committing an invisible batch") {
    import graft.ops.ClusterStore
    val store = tmpDir("graft_scluster_order") + "/store"
    ClusterStore.buildEmpty(spark, store)
    ClusterStore.append(spark, store, Seq(0L, 1L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), 7L)
    // snapshots chain by id and read() serves the max — an id at/below
    // the committed max would build from the LATER state, commit, and
    // never be served (silent permanent loss)
    val ex = intercept[IllegalArgumentException] {
      ClusterStore.append(spark, store, Seq(2L).toDF("id"),
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), 3L)
    }
    assert(ex.getMessage.contains("not above"), ex.getMessage)
    assert(ClusterStore.deltaIds(spark, store) == Seq(7L))
  }

  test("foldPattern holds an event at EXACTLY the watermark until the watermark passes it") {
    // an equal-ts sibling is still admissible in a later trigger, and
    // the CLICK+ PURCHASE automaton is order-sensitive: folding the
    // ts==wm purchase now, then receiving its equal-ts click later,
    // would break the (ts, event_id) total order the batch query folds in
    val wm = 1000L
    val purchaseAtWm = Seq((wm, 2L, "purchase"))
    val clickAtWm = Seq((wm, 1L, "click"))
    val s0 = Streams.PatBufState(Seq.empty, "", 0L, 0L)
    // trigger 1: the purchase sits AT the watermark — must stay pending
    val (m1, s1, _) = Streams.foldPattern(5L, s0, purchaseAtWm, wm)
    assert(m1.isEmpty && s1.pending == purchaseAtWm)
    // trigger 2: the equal-ts click arrives (not late: ts >= wm);
    // trigger 3: the watermark passes — both fold in (ts, event_id)
    // order, click before purchase, and the match emits
    val (m2, s2, _) = Streams.foldPattern(5L, s1, clickAtWm, wm)
    assert(m2.isEmpty && s2.pending.toSet == (purchaseAtWm ++ clickAtWm).toSet)
    val (m3, s3, _) = Streams.foldPattern(5L, s2, Seq.empty, wm + 1)
    assert(m3 == Seq(Streams.PatternMatch(5L, wm, wm, 1L)), m3.toString)
    assert(s3.pending.isEmpty)
  }

  test("dedupBatch crash protocol: replay after any partial state converges to the committed state") {
    import graft.ops.LshIndex
    val root = tmpDir("graft_sdedup_crash")
    val (idx, out) = (root + "/idx", root + "/out")
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val b0 = docs.filter(pmod($"doc_id", lit(3)) === 0)
    val b1 = docs.filter(pmod($"doc_id", lit(3)) === 1)

    LshIndex.buildEmpty(spark, idx, nBuckets = 16)
    assert(Streams.dedupBatch(b0, 0L, idx, out))
    assert(Streams.dedupBatch(b1, 1L, idx, out))
    val committed = spark.read.parquet(out)
      .select($"doc_id", $"_batch_id".cast("long")).as[(Long, Long)].collect().toSet

    // committed batch replayed → full no-op, state unchanged
    assert(!Streams.dedupBatch(b1, 1L, idx, out))
    assert(spark.read.parquet(out).count() == committed.size)

    // crash between the survivors write and the marker: batch 1's delta
    // never committed (marker + dir gone), its survivors partition left
    // behind. The replay must recompute IDENTICAL survivors (the index
    // is back to the pre-batch state) and land the marker.
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_DELTA_1"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/bands_d1"), true)
    assert(LshIndex.deltaIds(spark, idx) == Seq(0L))
    assert(Streams.dedupBatch(b1, 1L, idx, out), "replay must re-commit the crashed batch")
    val replayed = spark.read.parquet(out)
      .select($"doc_id", $"_batch_id".cast("long")).as[(Long, Long)].collect().toSet
    assert(replayed == committed, "crash replay diverged from the committed state")
    assert(LshIndex.deltaIds(spark, idx) == Seq(0L, 1L))
  }

  test("annBatch crash protocol: replay converges; served results include delta vectors") {
    import graft.ops.IvfPqIndex
    val root = tmpDir("graft_sann_crash")
    val (idx, out) = (root + "/idx", root + "/out")
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(pmod($"vec_id", lit(3)) === 0)
    val b1 = emb.filter(pmod($"vec_id", lit(3)) === 1)

    IvfPqIndex.build(spark, idx, base, "vec_id", "embedding",
      k = 4, iters = 0, m = 16, ncw = 16)
    assert(Streams.annBatch(b1, 1L, idx, out))
    // committed batch replayed → full no-op
    assert(!Streams.annBatch(b1, 1L, idx, out))
    assert(IvfPqIndex.deltaIds(spark, idx) == Seq(1L))

    val committed = IvfPqIndex.topK(spark, idx, emb.filter($"vec_id" <= 20),
        "vec_id", "embedding", k = 3, nprobe = 2, candR = 30)
      .select($"vec_id", $"rn", $"nn_id", $"score")
      .as[(Long, Int, Long, Long)].collect().toSet

    // the delta actually serves: some appended vector appears as a
    // neighbor (bit-exact served ≡ in-memory equality is OpsSpec's
    // job, where build and search share one corpus and codebook; here
    // the invariant is end-to-end delta VISIBILITY through the
    // streaming transaction)
    val deltaIds1 = b1.select($"vec_id").as[Long].collect().toSet
    assert(committed.exists(r => deltaIds1.contains(r._3)),
      "no delta vector ever served as a neighbor")

    // crash between the landed write and the marker: delta dirs + marker
    // gone, out partition left behind — replay must re-commit
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_DELTA_1"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/codes_d1"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/refine_d1"), true)
    assert(IvfPqIndex.deltaIds(spark, idx).isEmpty)
    assert(Streams.annBatch(b1, 1L, idx, out), "replay must re-commit the crashed batch")
    val replayed = IvfPqIndex.topK(spark, idx, emb.filter($"vec_id" <= 20),
        "vec_id", "embedding", k = 3, nprobe = 2, candR = 30)
      .select($"vec_id", $"rn", $"nn_id", $"score")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(replayed == committed, "crash replay diverged from the committed state")
  }

  test("stream-static enrich: broadcast dimension join, no watermark state") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Timestamp, Long, Double)]
    val out = Streams.enrich(in.toDF().toDF("ts", "user_id", "value"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((ts(1), 1L, 2.0), (ts(2), 2L, 3.0), (ts(3), 9L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select($"user_id", $"tier").as[(Long, Option[String])].collect().sortBy(_._1).toList
      // left join: unknown dimension keys pass through with null tier
      assert(rows == List((1L, Some("gold")), (2L, Some("silver")), (9L, None)))
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
    val root = tmpDir("graft_cdc_dedup")
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

  /** Streaming/batch family tie: Streams.sessionize must produce the
    * exact sessions of the batch q_win_session query
    * (Relational.scala q_win_session: lag-gap > 30 min starts a new
    * session) on the same input. Real sf0.001 events ride a
    * MemoryStream in three time-ordered micro-batches, so sessions
    * split both WITHIN a batch (the sort+fold path) and ACROSS batches
    * (the state-timeout path). */
  test("patternMatch == one-pass CLICK+ PURCHASE fold on the events table") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    def us(t: Timestamp): Long = (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    val fixture = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)].collect()
    // reference: per user in total (µs, event_id) order, one clean pass
    // of the automaton — the streaming op must match it regardless of
    // how arrival is sliced across micro-batches
    val expected = fixture.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var (pt, rs, rn) = ("", 0L, 0L)
      for ((_, t, eid, tp) <- rows.sortBy(r => (us(r._2), r._3))) {
        val tu = us(t)
        if (tp == "click") { if (pt == "click") rn += 1L else { rs = tu; rn = 1L } }
        else if (tp == "purchase" && pt == "click") out += ((u, rs, tu, rn))
        pt = tp
      }
      out
    }.sortBy(r => (r._1, r._2, r._3)).toList

    val sorted = fixture.sortBy(r => us(r._2))
    val slices = sorted.grouped(math.max(1, sorted.length / 3 + 1)).toList
    val lastMs = sorted.last._2.getTime

    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val pat = Streams.patternMatch(
      in.toDF().toDF("user_id", "ts", "event_id", "event_type"), delay = "0 seconds")
    val q = pat.writeStream.format("memory").queryName("pat_eq")
      .outputMode("append").start()
    try {
      slices.foreach { s => in.addData(s.toSeq); q.processAllAvailable() }
      // sentinel rounds flush the pending buffer past the last event
      in.addData((-1L, new Timestamp(lastMs + 3600000L), -1L, "noop"))
      q.processAllAvailable()
      in.addData((-1L, new Timestamp(lastMs + 7200000L), -1L, "noop"))
      q.processAllAvailable()
      val streamed = spark.table("pat_eq").as[Streams.PatternMatch].collect()
        .filter(_.key >= 0).map(r => (r.key, r.startUs, r.purchaseUs, r.nClicks))
        .sortBy(r => (r._1, r._2, r._3)).toList
      assert(streamed == expected,
        s"streamed ${streamed.length} matches vs expected ${expected.length}")
    } finally q.stop()
  }

  test("sessionize == batch q_win_session sessions on the events table") {
    import org.apache.spark.sql.expressions.Window
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val gapUs = 1800000000L // 30 min, same literal as q_win_session

    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = graft.tables.Tables.events(spark, dir)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess", when(col("gap_us").isNull || col("gap_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n"), min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"), sum(col("value")).as("total"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"), col("total"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toList

    val fixture = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val slices = fixture.grouped(math.max(1, fixture.length / 3 + 1)).toList
    val lastMs = fixture.last._2.getTime

    val in = MemoryStream[(Long, Timestamp, Double)]
    val sess = Streams.sessionize(
      in.toDF().toDF("user_id", "ts", "value"), gapMs = gapUs / 1000L, delay = "0 seconds")
    val q = sess.writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    try {
      slices.foreach { s => in.addData(s.toSeq); q.processAllAvailable() }
      // sentinel events push the watermark past every open session's
      // gap; two rounds so the timeout batch itself runs
      in.addData((-1L, new Timestamp(lastMs + gapUs / 1000L + 60000L), 0.0))
      q.processAllAvailable()
      in.addData((-1L, new Timestamp(lastMs + 2 * (gapUs / 1000L) + 120000L), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_eq").as[Streams.SessionAgg].collect()
        .filter(_.key >= 0).map(r => (r.key, r.startUs, r.endUs, r.n, r.total))
        .sortBy(r => (r._1, r._2)).toList
      assert(streamed.length == batch.length,
        s"session count: streamed ${streamed.length} vs batch ${batch.length}")
      streamed.zip(batch).foreach { case (s, b) =>
        assert((s._1, s._2, s._3, s._4) == (b._1, b._2, b._3, b._4),
          s"session identity mismatch: $s vs $b")
        // both sides sum doubles, in different orders — allow fp slack
        assert(math.abs(s._5 - b._5) <= 1e-9 * math.max(1.0, math.abs(b._5)),
          s"total mismatch: $s vs $b")
      }
    } finally q.stop()
  }

  /** Streaming/batch family tie for joins: the watermarked
    * stream-stream interval join must produce exactly the batch range
    * join's pairs on the same input. Real sf0.001 events ride two
    * MemoryStreams (clicks and purchases) in interleaved time-ordered
    * micro-batches; the long delay keeps state alive for the whole
    * fixture so the set equality is exact. */
  test("intervalJoin == batch range join on the events table") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val winMs = 3600000L // 1 hour attribution window

    val ev = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val bp = ev.filter(col("event_type") === "purchase")
    val bc = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val batch = bp.join(bc, col("user_id") === col("cu") &&
        col("c_ts") <= col("ts") &&
        col("c_ts") >= col("ts") - expr(s"INTERVAL $winMs MILLISECONDS"))
      .select(col("event_id").as("p_id"), col("c_id"))
      .as[(Long, Long)].collect().sorted.toList
    assert(batch.nonEmpty)

    def slices(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime)
      .grouped(200).toList
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val joined = Streams.intervalJoin(
      pIn.toDF().toDF("user_id", "ts", "event_id"),
      cIn.toDF().toDF("user_id", "ts", "event_id"),
      windowMs = winMs, delay = "365 days")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      // interleave the two sides' micro-batches to exercise buffering
      // in both directions (a click can arrive before OR after the
      // purchase it attributes to)
      val (ps, cs) = (slices("purchase"), slices("click"))
      for (i <- 0 until math.max(ps.length, cs.length)) {
        if (i < cs.length) cIn.addData(cs(i).toSeq)
        if (i < ps.length) pIn.addData(ps(i).toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("ivj").select(col("p_id"), col("c_id"))
        .as[(Long, Long)].collect().sorted.toList
      assert(streamed == batch,
        s"pair sets differ: streamed ${streamed.length} vs batch ${batch.length}")
    } finally q.stop()
  }

  test("intervalJoinOuter == batch LEFT range join; no spurious null-pads") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val winMs = 3600000L

    val ev = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val bp = ev.filter(col("event_type") === "purchase")
    val bc = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val batch = bp.join(bc, col("user_id") === col("cu") &&
        col("c_ts") <= col("ts") &&
        col("c_ts") >= col("ts") - expr(s"INTERVAL $winMs MILLISECONDS"), "left")
      .select(col("event_id").as("p_id"), col("c_id"))
      .as[(Long, Option[Long])].collect().sorted.toList
    assert(batch.exists(_._2.isEmpty), "fixture should have unmatched purchases")
    assert(batch.exists(_._2.nonEmpty), "fixture should have matched purchases")

    // event-time-ordered feed on both sides (cross-side skew stays
    // inside one slice-pair), watermark delay sized to cover it; a
    // final sentinel far past the corpus flushes the tail null-pads
    def slices(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime)
      .grouped(200).toList
    val maxTs = ev.agg(max(col("ts"))).as[Timestamp].head()
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val joined = Streams.intervalJoinOuter(
      pIn.toDF().toDF("user_id", "ts", "event_id"),
      cIn.toDF().toDF("user_id", "ts", "event_id"),
      windowMs = winMs, delay = "2 days")
    val q = joined.writeStream.format("memory").queryName("ivjo")
      .outputMode("append").start()
    try {
      val (ps, cs) = (slices("purchase"), slices("click"))
      for (i <- 0 until math.max(ps.length, cs.length)) {
        if (i < cs.length) cIn.addData(cs(i).toSeq)
        if (i < ps.length) pIn.addData(ps(i).toSeq)
        q.processAllAvailable()
      }
      val sentinel = new Timestamp(maxTs.getTime + 5L * 86400000L)
      for (_ <- 1 to 2) {
        pIn.addData((-1L, sentinel, -1L))
        cIn.addData((-1L, sentinel, -2L))
        q.processAllAvailable()
      }
      val streamed = spark.table("ivjo").filter(col("user_id") >= 0)
        .select(col("p_id"), col("c_id"))
        .as[(Long, Option[Long])].collect().sorted.toList
      assert(streamed == batch,
        s"left-join rows differ: streamed ${streamed.length} vs batch ${batch.length}")
    } finally q.stop()
  }

  test("sessionizeTws == sessionize: both stateful APIs return identical sessions") {
    // the transformWithState port must be bit-identical to the
    // flatMapGroupsWithState original on the same feed — both drive
    // foldSessions, so totals (folded in the same order) compare with
    // ==, not a tolerance
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val gapMs = 1800000L

    val fixture = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val slices = fixture.grouped(math.max(1, fixture.length / 3 + 1)).toList
    val lastMs = fixture.last._2.getTime

    def runThrough(name: String,
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[Streams.SessionAgg]) = {
      val in = MemoryStream[(Long, Timestamp, Double)]
      val q = mk(in.toDF().toDF("user_id", "ts", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        slices.foreach { s => in.addData(s.toSeq); q.processAllAvailable() }
        in.addData((-1L, new Timestamp(lastMs + gapMs + 60000L), 0.0))
        q.processAllAvailable()
        in.addData((-1L, new Timestamp(lastMs + 2 * gapMs + 120000L), 0.0))
        q.processAllAvailable()
        spark.table(name).as[Streams.SessionAgg].collect()
          .filter(_.key >= 0).sortBy(r => (r.key, r.startUs)).toList
      } finally q.stop()
    }

    val viaFmgws = runThrough("sess_api_a",
      df => Streams.sessionize(df, gapMs = gapMs, delay = "0 seconds"))
    // transformWithState needs a multi-column-family store → RocksDB
    val viaTws = Streams.withRocksDbState(spark) {
      runThrough("sess_api_b",
        df => Streams.sessionizeTws(df, gapMs = gapMs, delay = "0 seconds"))
    }
    assert(viaTws.nonEmpty && viaTws == viaFmgws,
      s"APIs diverged: tws ${viaTws.length} rows vs fmgws ${viaFmgws.length}")
  }

  test("sessionizeTws: checkpoint restart mid-stream loses nothing, duplicates nothing") {
    // the production recovery claim: kill the query between micro-batches,
    // start a NEW query on the same checkpoint (RocksDB state snapshot +
    // registered timers restored), and the landed sessions must equal the
    // batch answer exactly — no lost open session, no double emission
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val gapMs = 1800000L
    Streams.withRocksDbState(spark) {
      val ev = graft.tables.Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("value"))
      val Array(mn, mx) = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
        .toSeq.map(_.asInstanceOf[Timestamp]).toArray
      val mid = new Timestamp((mn.getTime + mx.getTime) / 2)
      val root = tmpDir("graft_tws_restart")
      val src = root + "/src"
      def start() = Streams.sessionizeTws(
          spark.readStream.schema(ev.schema).parquet(src), gapMs = gapMs)
        .toDF()
        .writeStream.format("parquet")
        .option("path", root + "/out")
        .option("checkpointLocation", root + "/ckpt")
        .outputMode("append").start()

      ev.filter(col("ts") < lit(mid)).coalesce(1).write.mode("append").parquet(src)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop() // planned "crash"

      ev.filter(col("ts") >= lit(mid)).coalesce(1).write.mode("append").parquet(src)
      val q2 = start() // recovery: state + timers from the checkpoint
      try {
        q2.processAllAvailable()
        val sentinelTs = new Timestamp(mx.getTime + 7200000L)
        for (_ <- 1 to 2) {
          spark.range(1).select(lit(-1L).as("user_id"),
              lit(sentinelTs).as("ts"), lit(0.0).as("value"))
            .coalesce(1).write.mode("append").parquet(src)
          q2.processAllAvailable()
        }
      } finally q2.stop()

      val got = spark.read.parquet(root + "/out").filter(col("key") >= 0)
        .select(col("key"), col("startUs"), col("endUs"), col("n"))
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val batch = graft.tables.Tables.events(spark, dir)
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess", when(col("gap_us").isNull || col("gap_us") > gapMs * 1000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("s"), col("e"), col("n"))
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
      assert(got == batch,
        s"restart diverged from batch: got ${got.length} sessions vs ${batch.length}")
    }
  }

  test("sessionize: out-of-order arrival across batches still splits on the gap") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    // gap 3 min, watermark 10 min: an event at 10:00 arrives first, then
    // 9:55 arrives in a LATER batch (inside the watermark). Event-time
    // order has a 5 min > 3 min quiet gap — batch semantics demand TWO
    // single-event sessions; an eager fold would merge them into one.
    val sess = Streams.sessionize(
      in.toDF().toDF("user_id", "ts", "value"), gapMs = 3 * 60000L, delay = "10 minutes")
    val q = sess.writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      in.addData((5L, ts(60), 1.0))
      q.processAllAvailable()
      in.addData((5L, ts(55), 2.0)) // out of order, within watermark
      q.processAllAvailable()
      // advance the watermark far past both sessions' gap horizons
      in.addData((9L, ts(300), 0.0))
      q.processAllAvailable()
      in.addData((9L, ts(600), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_ooo").as[Streams.SessionAgg].collect()
        .filter(_.key == 5L).sortBy(_.startUs).toList
      assert(rows.map(r => (r.n, r.total, r.startUs, r.endUs)) ==
        List((1L, 2.0, 55L * 60000000L, 55L * 60000000L),
             (1L, 1.0, 60L * 60000000L, 60L * 60000000L)),
        s"expected two single-event sessions, got $rows")
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
