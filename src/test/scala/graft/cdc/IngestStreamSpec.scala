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

  test("DLQ: poison records are quarantined with source coordinates, never crash or vanish") {
    val root = tmpDir("graft_dlq")
    val topic = s"$root/topic"
    CdcGen.writeTopicFiles(spark, n = 50, topic, nBatches = 1)
    val cleanCount = Ingest.snapshotFromTopic(spark, topic).count()
    // poison the topic: one non-JSON value, one JSON without payload.op,
    // arriving as a NEW topic file (appending in place would invalidate
    // the session's FileStatusCache — and new records arrive as new
    // files in this emulation anyway)
    val ts = "2024-01-01T00:00:00.000Z"
    val poison = Seq(
      s"""{"topic":"debezium1.public.employees","partition":0,"offset":90001,"timestamp":"$ts","value":"this is not json"}""",
      s"""{"topic":"debezium1.public.employees","partition":0,"offset":90002,"timestamp":"$ts","value":"{\\"hello\\":1}"}""")
    java.nio.file.Files.write(
      new java.io.File(topic, "part-99999-poison.txt").toPath,
      (poison.mkString("\n") + "\n").getBytes)

    val raw = Ingest.readTopicBatch(spark, topic)
    val total = raw.count()
    val (good, dlq) = Ingest.withDeadLetters(raw)
    // partition is exact: nothing dropped, nothing duplicated
    assert(good.count() + dlq.count() == total)
    assert(dlq.count() == 2)
    // the quarantined rows keep replay coordinates + raw payload
    val rows = dlq.select("offset", "raw").as[(Long, String)].collect().sortBy(_._1)
    assert(rows(0) == (90001L, "this is not json"))
    assert(rows(1)._2.contains("hello"))
    // the good half still merges to exactly the clean-topic snapshot
    val snapGood = CdcMerge.snapshot(
      Ingest.extractPostImage(good), Seq("id"), Seq("lsn"))
    assert(snapGood.count() == cleanCount)

    // and the REAL streaming path with dlqDir wired: poison lands in
    // the DLQ parquet, the materialized snapshot matches the clean one
    val q = Ingest.run(spark, topic, s"$root/log", s"$root/ckpt",
      snapshotDir = Some(s"$root/snap"), dlqDir = Some(s"$root/dlq"))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(s"$root/dlq").count() == 2)
    assert(Ingest.readSnapshot(spark, s"$root/snap").get.count() == cleanCount)
  }

  test("dynamic inference: an all-poison first batch neither crashes nor poisons the schema cache") {
    val root = tmpDir("graft_stream_poison")
    val topic = s"$root/topic"; val log = s"$root/log"
    val ckpt = s"$root/ckpt"; val dlq = s"$root/dlq"; val snap = s"$root/snap"
    // batch 0: every value is unparseable garbage — inference yields an
    // envelope with NO payload image. Pre-fix, that schema was cached
    // and parse() threw on it forever: checkpoint replay re-delivered
    // the same batch, re-inferred the same schema, permanent crash loop
    // (DLQ or not, since the throw preceded row projection).
    new java.io.File(topic).mkdirs()
    val w = new java.io.PrintWriter(s"$topic/part-000-poison.json")
    (1 to 3).foreach(i => w.println(
      s"""{"value":"not json $i","topic":"debezium1.public.employees","partition":0,"offset":$i,"timestamp":"2026-01-01T00:00:0$i.000Z"}"""))
    w.close()
    Thread.sleep(1100) // distinct mtime: the poison file must trigger first
    CdcGen.writeTopicFiles(spark, n = 20, topic, nBatches = 1)
    val q = Ingest.run(spark, topic, log, ckpt, snapshotDir = Some(snap),
      declared = None, dlqDir = Some(dlq))
    q.processAllAvailable(); q.stop()
    // the poison batch was quarantined WHOLE and the next batch
    // re-inferred a usable schema — the stream self-healed
    assert(spark.read.parquet(dlq).count() == 3)
    val got = Ingest.readSnapshot(spark, snap).get
    val want = CdcGen.expectedSnapshot(spark, 20)
    assert(got.count() == want.count())
    // and the BATCH path with a declared schema simply drops the poison
    // rows (op is null) instead of materializing phantom all-null rows
    val batchSnap = Ingest.snapshotFromTopic(spark, topic)
    assert(batchSnap.count() == want.count())
    assert(batchSnap.filter(col("id").isNull || col("op").isNull).count() == 0)
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

  test("multi-table routing: one stream, per-table snapshots") {
    import org.apache.spark.sql.types._
    val root = tmpDir("graft_multi")
    // employees topic files from the generator
    CdcGen.writeTopicFiles(spark, n = 30, s"$root/in", nBatches = 1)
    // a second table's events, hand-written on the departments topic
    def dep(op: String, id: Int, lsn: Long, name: String): String = {
      val row = s"""{"dept_id":$id,"name":"$name"}"""
      val before = if (op == "d") row else "null"
      val after = if (op == "d") "null" else row
      val value = s"""{"payload":{"before":$before,"after":$after,"source":{"lsn":$lsn,"table":"departments"},"op":"$op","ts_ms":$lsn}}"""
      val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"value":"$esc","topic":"debezium1.public.departments","partition":0,"offset":$lsn,"timestamp":"2023-05-25T00:00:0${lsn % 10}.000Z"}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/in/departments.jsonl"),
      Seq(dep("c", 1, 1, "Eng"), dep("c", 2, 2, "Ops"),
        dep("u", 1, 3, "Engineering"), dep("d", 2, 4, "Ops")).mkString("\n"))

    val depRow = StructType(Seq(StructField("dept_id", IntegerType), StructField("name", StringType)))
    val q = Ingest.runRouted(spark, s"$root/in", s"$root/out", s"$root/ckpt", Map(
      "employees" -> Ingest.TableRoute(Envelope.employeesEnvelope),
      "departments" -> Ingest.TableRoute(Envelope.envelope(depRow), keys = Seq("dept_id"))))
    q.processAllAvailable(); q.stop()

    val emp = Ingest.readSnapshot(spark, s"$root/out/employees/snapshot").get
    assert(emp.count() == 30 - 4) // minus multiples of 7
    val deps = Ingest.readSnapshot(spark, s"$root/out/departments/snapshot").get
    assert(deps.select("dept_id", "name").as[(Int, String)].collect().toSet ==
      Set((1, "Engineering"))) // dept 2 deleted, dept 1 renamed
  }

  test("routed quiet table: no rows in the first batches never poisons its log or snapshot") {
    import org.apache.spark.sql.types._
    val root = tmpDir("graft_quiet")
    // batch 0 carries ONLY employee events; the declared departments
    // route stays quiet — a zero-row write would leave schema-less
    // log/snapshot dirs that crash the stream the moment departments
    // data finally arrives (the empty-write rule, routed-table form)
    CdcGen.writeTopicFiles(spark, n = 20, s"$root/in", nBatches = 1)
    val depRow = StructType(Seq(StructField("dept_id", IntegerType), StructField("name", StringType)))
    val routes = Map(
      "employees" -> Ingest.TableRoute(Envelope.employeesEnvelope),
      "departments" -> Ingest.TableRoute(Envelope.envelope(depRow), keys = Seq("dept_id")))
    val q = Ingest.runRouted(spark, s"$root/in", s"$root/out", s"$root/ckpt", routes)
    q.processAllAvailable()
    // quiet table: no snapshot yet (no version advanced), no poison
    assert(Ingest.readSnapshot(spark, s"$root/out/departments/snapshot").isEmpty)
    assert(Ingest.readSnapshot(spark, s"$root/out/employees/snapshot").get.count() > 0)
    // departments data arrives in a later batch — the stream must
    // ingest it cleanly (this is the step a poisoned dir would crash)
    def dep(op: String, id: Int, lsn: Long, name: String): String = {
      val row = s"""{"dept_id":$id,"name":"$name"}"""
      val value = s"""{"payload":{"before":null,"after":$row,"source":{"lsn":$lsn,"table":"departments"},"op":"$op","ts_ms":$lsn}}"""
      val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"value":"$esc","topic":"debezium1.public.departments","partition":0,"offset":$lsn,"timestamp":"2023-05-25T00:00:0${lsn % 10}.000Z"}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/in/departments.jsonl"),
      Seq(dep("c", 1, 1, "Eng"), dep("c", 2, 2, "Ops")).mkString("\n"))
    q.processAllAvailable(); q.stop()
    val deps = Ingest.readSnapshot(spark, s"$root/out/departments/snapshot").get
    assert(deps.select("dept_id", "name").as[(Int, String)].collect().toSet ==
      Set((1, "Eng"), (2, "Ops")))
  }

  test("routed COMPOSITE-key delete recovers every key column from before") {
    import org.apache.spark.sql.types._
    val root = tmpDir("graft_ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    // (tenant, id) composite merge key; the delete for (b, 1) must not
    // touch the live (a, 1) row — a partially-recovered key would
    // group both under (null-ish, 1) and drop the wrong row
    def ev(op: String, tenant: String, id: Int, lsn: Long, v: Int): String = {
      val row = s"""{"tenant":"$tenant","id":$id,"v":$v}"""
      val before = if (op == "d") row else "null"
      val after = if (op == "d") "null" else row
      val value = s"""{"payload":{"before":$before,"after":$after,"source":{"lsn":$lsn,"table":"accounts"},"op":"$op","ts_ms":$lsn}}"""
      val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"value":"$esc","topic":"debezium1.public.accounts","partition":0,"offset":$lsn,"timestamp":"2023-05-25T00:00:0${lsn % 10}.000Z"}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/in/accounts.jsonl"),
      Seq(ev("c", "a", 1, 1, 10), ev("c", "b", 1, 2, 20),
        ev("u", "a", 1, 3, 11), ev("d", "b", 1, 4, 0)).mkString("\n"))
    val row = StructType(Seq(StructField("tenant", StringType),
      StructField("id", IntegerType), StructField("v", IntegerType)))
    val q = Ingest.runRouted(spark, s"$root/in", s"$root/out", s"$root/ckpt", Map(
      "accounts" -> Ingest.TableRoute(Envelope.envelope(row), keys = Seq("tenant", "id"))))
    q.processAllAvailable(); q.stop()
    val got = Ingest.readSnapshot(spark, s"$root/out/accounts/snapshot").get
      .select("tenant", "id", "v").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 11))) // (b,1) deleted; (a,1) updated, alive
  }

  test("time travel: retained versions readable by batch id") {
    val root = tmpDir("graft_tt")
    CdcGen.writeTopicFiles(spark, n = 40, s"$root/topic", nBatches = 3)
    val q = Ingest.run(spark, s"$root/topic", s"$root/log", s"$root/ckpt",
      snapshotDir = Some(s"$root/snap"))
    q.processAllAvailable(); q.stop()
    val versions = Ingest.snapshotVersions(spark, s"$root/snap")
    assert(versions.size == 2) // GC keeps current + one prior
    val prev = Ingest.readSnapshotAt(spark, s"$root/snap", versions.head).get
    val cur = Ingest.readSnapshotAt(spark, s"$root/snap", versions.last).get
    assert(prev.count() <= cur.count() + 10) // both readable, sane sizes
    assert(Ingest.readSnapshotAt(spark, s"$root/snap", 9999L).isEmpty)
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

  test("S15 Avro wire format: avro-decoded snapshot equals the JSON-path snapshot") {
    val root = tmpDir("graft_avro")
    CdcGen.writeTopicFiles(spark, n = 60, s"$root/json", nBatches = 2)
    CdcGen.writeTopicAvroFiles(spark, n = 60, s"$root/avro", nBatches = 2)

    val jsonSnap = Ingest.snapshotFromTopic(spark, s"$root/json")
    val avroSnap = Ingest.snapshotFromAvroTopic(spark, s"$root/avro",
      CdcGen.avroWriterSchemaJson(spark))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "full_name", "email", "phone", "department", "salary", "op", "lsn")
        .as[(Int, String, String, String, String, Int, String, Long)]
        .collect().sortBy(_._1).toSeq
    assert(avroSnap.count() == 60 - 8) // minus multiples of 7
    assert(canon(avroSnap) == canon(jsonSnap))

    // the decoded value really is plain JSON: the raw decode parses with
    // the SAME declared envelope schema as the JSON wire format
    val decoded = Ingest.decodeAvroValues(
      Ingest.readTopicBatch(spark, s"$root/avro", valueBase64 = true),
      CdcGen.avroWriterSchemaJson(spark))
      .select(from_json($"value".cast("string"), Envelope.employeesEnvelope).as("j"))
    assert(decoded.filter($"j.payload.op".isNull).count() == 0)
  }

  test("S15 streaming DLQ under avro formats: a poison frame is quarantined, never wedges the stream") {
    // The r20 advice (medium) finding: the ValueFormat decode runs on
    // the kafka-shaped stream BEFORE the foreachBatch DLQ split, so a
    // throwing decode failed the micro-batch before the split could
    // run — the checkpoint never advanced and every restart re-failed
    // on the same record (a permanent wedge even with graft.dlq.dir
    // set). The streaming formats now decode LENIENTLY: a frame/decode
    // failure yields a diagnostic JSON (error + base64 raw bytes) that
    // the split quarantines like any other poison.
    val root = tmpDir("graft_avro_dlq")
    val topic = s"$root/topic"
    CdcGen.writeTopicAvroFiles(spark, n = 40, topic, nBatches = 1, schemaId = Some(7))
    val registry = Map(7 -> CdcGen.avroWriterSchemaJson(spark))
    val cleanCount = Ingest.snapshotFromConfluentTopic(spark, topic, registry).count()

    // poison: unframed garbage bytes (no magic 0 header), base64-wrapped
    // like every binary value on the file transport
    val garbage = java.util.Base64.getEncoder.encodeToString(
      "definitely not a confluent frame".getBytes("UTF-8"))
    val ts = "2024-01-01T00:00:00.000Z"
    java.nio.file.Files.write(
      new java.io.File(topic, "part-99999-poison.txt").toPath,
      (s"""{"topic":"debezium1.public.employees","partition":0,"offset":90001,""" +
        s""""timestamp":"$ts","value":"$garbage"}""" + "\n").getBytes)

    // the REAL streaming path: the stream must COMPLETE (no wedge),
    // quarantine exactly the poison row with its bytes recoverable,
    // and land the clean snapshot
    val q = Ingest.run(spark, topic, s"$root/log", s"$root/ckpt",
      snapshotDir = Some(s"$root/snap"), dlqDir = Some(s"$root/dlq"),
      valueFormat = Ingest.ConfluentAvroValues(registry))
    q.processAllAvailable(); q.stop()
    val dlqRows = spark.read.parquet(s"$root/dlq")
    assert(dlqRows.count() == 1)
    val raw = dlqRows.select("raw").as[String].head()
    assert(raw.contains("_graft_decode_error"), s"diagnostic missing: $raw")
    assert(raw.contains(garbage), "raw bytes must be recoverable (base64) from the DLQ row")
    assert(Ingest.readSnapshot(spark, s"$root/snap").get.count() == cleanCount)

    // the single-writer-schema Avro format takes the same lenient door
    val topic2 = s"$root/topic2"
    CdcGen.writeTopicAvroFiles(spark, n = 20, topic2, nBatches = 1)
    val cleanCount2 = Ingest.snapshotFromAvroTopic(spark, topic2,
      CdcGen.avroWriterSchemaJson(spark)).count() // before the poison lands
    java.nio.file.Files.write(
      new java.io.File(topic2, "part-99999-poison.txt").toPath,
      (s"""{"topic":"debezium1.public.employees","partition":0,"offset":90002,""" +
        s""""timestamp":"$ts","value":"$garbage"}""" + "\n").getBytes)
    val q2 = Ingest.run(spark, topic2, s"$root/log2", s"$root/ckpt2",
      snapshotDir = Some(s"$root/snap2"), dlqDir = Some(s"$root/dlq2"),
      valueFormat = Ingest.AvroValues(CdcGen.avroWriterSchemaJson(spark)))
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$root/dlq2").count() == 1)
    assert(Ingest.readSnapshot(spark, s"$root/snap2").get.count() == cleanCount2)
  }

  test("S15 Confluent frame: header-framed values decode via registry to the JSON-path snapshot") {
    val root = tmpDir("graft_confluent")
    CdcGen.writeTopicFiles(spark, n = 60, s"$root/json", nBatches = 2)
    CdcGen.writeTopicAvroFiles(spark, n = 60, s"$root/framed", nBatches = 2, schemaId = Some(7))
    val registry = Map(7 -> CdcGen.avroWriterSchemaJson(spark))

    val jsonSnap = Ingest.snapshotFromTopic(spark, s"$root/json")
    val framedSnap = Ingest.snapshotFromConfluentTopic(spark, s"$root/framed", registry)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "full_name", "email", "phone", "department", "salary", "op", "lsn")
        .as[(Int, String, String, String, String, Int, String, Long)]
        .collect().sortBy(_._1).toSeq
    assert(canon(framedSnap) == canon(jsonSnap))

    // frame errors fail loudly, not as silent nulls: unframed payload
    // (wrong magic) and an id missing from the registry both throw
    CdcGen.writeTopicAvroFiles(spark, n = 5, s"$root/unframed", nBatches = 1)
    val unframed = intercept[org.apache.spark.SparkException] {
      Ingest.decodeConfluentAvroValues(
        Ingest.readTopicBatch(spark, s"$root/unframed", valueBase64 = true), registry)
        .select("value").collect()
    }
    assert(unframed.getMessage.contains("Confluent-framed") ||
      Option(unframed.getCause).exists(_.getMessage.contains("Confluent-framed")))
    val unknownId = intercept[org.apache.spark.SparkException] {
      Ingest.decodeConfluentAvroValues(
        Ingest.readTopicBatch(spark, s"$root/framed", valueBase64 = true),
        registry = Map(9 -> CdcGen.avroWriterSchemaJson(spark)))
        .select("value").collect()
    }
    assert(unknownId.getMessage.contains("not in registry") ||
      Option(unknownId.getCause).exists(_.getMessage.contains("not in registry")))
  }

  test("S15+U6 schema evolution: two live writer ids on one topic decode to a reconciled view") {
    // The evolution case the per-id reader cache exists for: inserts
    // framed under writer id 1, updates/deletes under id 2 whose schema
    // gained a nullable int `bonus`. Decoding against the reconciled
    // (drifted) declared envelope must (a) agree with the plain-JSON
    // wire path on every common column and (b) carry `bonus` exactly
    // where the surviving row was written by the NEW writer — U6's
    // missing-column-is-null rule through from_json.
    val root = tmpDir("graft_evolve")
    val registry = CdcGen.writeTopicAvroEvolvedFiles(spark, n = 60, s"$root/topic", id1 = 1, id2 = 2)
    assert(registry(1) != registry(2), "drifted writer schema must differ")
    val driftedRow = org.apache.spark.sql.types.StructType(
      Envelope.employees.fields :+
        org.apache.spark.sql.types.StructField("bonus", org.apache.spark.sql.types.IntegerType))
    val snap = Ingest.snapshotFromConfluentTopic(spark, s"$root/topic", registry,
      Envelope.envelope(driftedRow))

    CdcGen.writeTopicFiles(spark, n = 60, s"$root/json", nBatches = 2)
    val jsonSnap = Ingest.snapshotFromTopic(spark, s"$root/json")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "full_name", "email", "phone", "department", "salary", "op", "lsn")
        .as[(Int, String, String, String, String, Int, String, Long)]
        .collect().sortBy(_._1).toSeq
    assert(canon(snap) == canon(jsonSnap))

    // survivors: latest event for id%3==0 is an update (new writer,
    // bonus = salary/10); everyone else still carries the id-1 insert
    // (bonus null)
    val bonuses = snap.select($"id", $"salary", $"bonus")
      .as[(Int, Int, Option[Int])].collect().toSeq
    assert(bonuses.nonEmpty)
    bonuses.foreach { case (id, salary, bonus) =>
      if (id % 3 == 0) assert(bonus.contains(salary / 10), s"id $id: expected bonus, got $bonus")
      else assert(bonus.isEmpty, s"id $id: old-writer row must have null bonus, got $bonus")
    }
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
