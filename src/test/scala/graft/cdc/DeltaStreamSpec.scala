package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The config-driven runner: one options map must wire the SAME
  * composed path as the Scala API (FileGroups.run → commitStreamBatch
  * → the DSv2 catalog), and typo'd / missing configuration must fail
  * loudly instead of pinning a wrong default. */
class DeltaStreamSpec extends SparkSpec {

  import spark.implicits._

  test("an options map runs the stream, syncs the catalog, and lands the Scala path's exact table") {
    val root = tmpDir("graft_dstream")
    CdcGen.writeTopicFiles(spark, n = 80, s"$root/topic", nBatches = 2)

    val q = DeltaStream.run(spark, Map(
      DeltaStream.TableName -> "employees",
      DeltaStream.TargetPath -> s"$root/store",
      DeltaStream.SourceDir -> s"$root/topic",
      DeltaStream.CheckpointLocation -> s"$root/ckpt",
      DeltaStream.RecordKeyField -> "id",
      DeltaStream.PrecombineField -> "lsn",
      DeltaStream.Buckets -> "8",
      DeltaStream.Retain -> "3",
      DeltaStream.SyncCatalog -> "graft_dstest"))
    try q.processAllAvailable() finally q.stop()

    // the retention policy landed before the first commit
    assert(FileGroups.retention(spark, s"$root/store/employees") == 3)

    // the synced catalog serves the table the moment the run lands
    val viaSql = spark.sql(
      "SELECT id, lsn, full_name, salary FROM graft_dstest.employees ORDER BY id")
      .collect().toSeq
    assert(viaSql.nonEmpty)

    // byte-equal to the Scala door on the landed table...
    val viaScala = FileGroups.read(spark, s"$root/store/employees").get
      .select($"id", $"lsn", $"full_name", $"salary").orderBy($"id").collect().toSeq
    assert(viaSql == viaScala)

    // ...and to a DIRECT FileGroups.run of the same topic (the runner
    // adds configuration, never semantics)
    val q2 = FileGroups.run(spark, s"$root/topic", s"$root/direct/employees",
      s"$root/ckpt2", keys = Seq("id"), ord = Seq("lsn"), nBuckets = 8)
    try q2.processAllAvailable() finally q2.stop()
    val direct = FileGroups.read(spark, s"$root/direct/employees").get
      .select($"id", $"lsn", $"full_name", $"salary").orderBy($"id").collect().toSeq
    assert(viaSql == direct)

    // restart with the same options: nothing new to read, state unchanged
    val head = FileGroups.committedId(spark, s"$root/store/employees")
    val q3 = DeltaStream.run(spark, Map(
      DeltaStream.TableName -> "employees",
      DeltaStream.TargetPath -> s"$root/store",
      DeltaStream.SourceDir -> s"$root/topic",
      DeltaStream.CheckpointLocation -> s"$root/ckpt"))
    try q3.processAllAvailable() finally q3.stop()
    assert(FileGroups.committedId(spark, s"$root/store/employees") == head)
  }

  test("typo'd, missing and malformed options fail loudly before any stream starts") {
    val root = tmpDir("graft_dstream_bad")
    val good = Map(
      DeltaStream.TableName -> "employees",
      DeltaStream.TargetPath -> s"$root/store",
      DeltaStream.SourceDir -> s"$root/topic",
      DeltaStream.CheckpointLocation -> s"$root/ckpt")

    // a typo'd key name would silently pin the DEFAULT record key
    val typo = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good + ("graft.recordkey.fields" -> "id"))
    }
    assert(typo.getMessage.contains("graft.recordkey.fields"), typo.getMessage)

    val missing = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good - DeltaStream.CheckpointLocation)
    }
    assert(missing.getMessage.contains(DeltaStream.CheckpointLocation), missing.getMessage)

    val badBuckets = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good + (DeltaStream.Buckets -> "zero"))
    }
    assert(badBuckets.getMessage.contains("positive integer"), badBuckets.getMessage)

    // non-identifier names would break at READ time (nested dir /
    // conf sub-key) — they must break here instead
    val slash = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good + (DeltaStream.TableName -> "a/b"))
    }
    assert(slash.getMessage.contains("plain identifier"), slash.getMessage)
    val dotted = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good + (DeltaStream.SyncCatalog -> "a.b"))
    }
    assert(dotted.getMessage.contains("plain identifier"), dotted.getMessage)
    val badRetain = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good + (DeltaStream.Retain -> "two"))
    }
    assert(badRetain.getMessage.contains("graft.retain"), badRetain.getMessage)
    val lowRetain = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, good + (DeltaStream.Retain -> "1"))
    }
    assert(lowRetain.getMessage.contains("retention must be >= 2"), lowRetain.getMessage)
    // nothing was created by the failed runs
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/store")))
  }

  test("a declared source schema DDL drives a non-default envelope through the runner") {
    val root = tmpDir("graft_dstream_ddl")
    // a departments-shaped topic (Kafka-wrapper records, hand-written):
    // different row columns than the default employees envelope
    def ev(op: String, id: Int, lsn: Long, name: String): String = {
      val row = s"""{"id":$id,"dept_name":"$name"}"""
      val value =
        s"""{"payload":{"before":null,"after":$row,"source":{"lsn":$lsn},"op":"$op","ts_ms":$lsn}}"""
      val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"value":"$esc","topic":"debezium1.public.departments","partition":0,""" +
        s""""offset":$lsn,"timestamp":"2023-05-25T00:00:0${lsn % 10}.000Z"}"""
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/topic"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/topic/seg0.jsonl"),
      Seq(ev("c", 1, 10, "eng"), ev("c", 2, 11, "ops"), ev("u", 1, 12, "research"))
        .mkString("\n"))

    val q = DeltaStream.run(spark, Map(
      DeltaStream.TableName -> "departments",
      DeltaStream.TargetPath -> s"$root/store",
      DeltaStream.SourceDir -> s"$root/topic",
      DeltaStream.CheckpointLocation -> s"$root/ckpt",
      DeltaStream.SourceSchemaDdl -> "id INT, dept_name STRING"))
    try q.processAllAvailable() finally q.stop()

    val got = FileGroups.read(spark, s"$root/store/departments").get
      .select($"id", $"dept_name").orderBy($"id").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "research"), (2, "ops")))
  }

  test("DLQ option: poison quarantined with coordinates, table byte-equal to the Scala path") {
    val root = tmpDir("graft_dstream_dlq")
    CdcGen.writeTopicFiles(spark, n = 60, s"$root/topic", nBatches = 1)
    // poison the topic the same two ways as the Ingest DLQ spec: a
    // non-JSON value and a JSON without payload.op
    val ts = "2024-01-01T00:00:00.000Z"
    val poison = Seq(
      s"""{"topic":"debezium1.public.employees","partition":0,"offset":90001,"timestamp":"$ts","value":"this is not json"}""",
      s"""{"topic":"debezium1.public.employees","partition":0,"offset":90002,"timestamp":"$ts","value":"{\\"hello\\":1}"}""")
    java.nio.file.Files.write(
      new java.io.File(s"$root/topic", "part-99999-poison.txt").toPath,
      (poison.mkString("\n") + "\n").getBytes)

    val q = DeltaStream.run(spark, Map(
      DeltaStream.TableName -> "employees",
      DeltaStream.TargetPath -> s"$root/store",
      DeltaStream.SourceDir -> s"$root/topic",
      DeltaStream.CheckpointLocation -> s"$root/ckpt",
      DeltaStream.DlqDir -> s"$root/dlq"))
    try q.processAllAvailable() finally q.stop()

    // the poison rows landed in the DLQ with replay coordinates
    val dlq = spark.read.parquet(s"$root/dlq")
      .select($"offset", $"raw").as[(Long, String)].collect().sortBy(_._1)
    assert(dlq.length == 2 && dlq(0) == (90001L, "this is not json"), dlq.toSeq.toString)

    // the landed table is byte-equal to the direct Scala path over the
    // SAME poisoned topic (the options map adds configuration, never
    // semantics — with or without a DLQ the good half merges the same)
    val q2 = FileGroups.run(spark, s"$root/topic", s"$root/direct", s"$root/ckpt2",
      dlqDir = Some(s"$root/dlq2"))
    try q2.processAllAvailable() finally q2.stop()
    val viaOptions = FileGroups.read(spark, s"$root/store/employees").get
      .select($"id", $"lsn", $"full_name", $"salary").orderBy($"id").collect().toSeq
    val direct = FileGroups.read(spark, s"$root/direct").get
      .select($"id", $"lsn", $"full_name", $"salary").orderBy($"id").collect().toSeq
    assert(viaOptions == direct && viaOptions.nonEmpty)
  }

  test("routed mode: one options map lands both tables, equal to the direct runRouted path") {
    import org.apache.spark.sql.types._
    val root = tmpDir("graft_dstream_routed")
    CdcGen.writeTopicFiles(spark, n = 30, s"$root/in", nBatches = 1)
    CdcGen.writeDeptTopicFile(s"$root/in/departments.jsonl")

    val q = DeltaStream.run(spark, Map(
      DeltaStream.Mode -> "routed",
      DeltaStream.Tables -> "employees,departments",
      DeltaStream.TargetPath -> s"$root/out",
      DeltaStream.SourceDir -> s"$root/in",
      DeltaStream.CheckpointLocation -> s"$root/ckpt",
      "graft.table.departments.recordkey.field" -> "dept_id",
      "graft.table.departments.schema.ddl" -> "dept_id INT, name STRING"))
    try q.processAllAvailable() finally q.stop()

    // both tables materialized under their own snapshot dirs
    val emp = Ingest.readSnapshot(spark, s"$root/out/employees/snapshot").get
      .select($"id", $"lsn").orderBy($"id").collect().toSeq
    val deps = Ingest.readSnapshot(spark, s"$root/out/departments/snapshot").get
      .select($"dept_id", $"name").orderBy($"dept_id").collect().toSeq
    assert(emp.nonEmpty && deps.nonEmpty)

    // byte-equal to the direct Scala runRouted over the same topic dir
    val depRow = StructType(Seq(StructField("dept_id", IntegerType), StructField("name", StringType)))
    val q2 = Ingest.runRouted(spark, s"$root/in", s"$root/direct", s"$root/ckpt2", Map(
      "employees" -> Ingest.TableRoute(Envelope.employeesEnvelope),
      "departments" -> Ingest.TableRoute(Envelope.envelope(depRow), keys = Seq("dept_id"))))
    try q2.processAllAvailable() finally q2.stop()
    assert(emp == Ingest.readSnapshot(spark, s"$root/direct/employees/snapshot").get
      .select($"id", $"lsn").orderBy($"id").collect().toSeq)
    assert(deps == Ingest.readSnapshot(spark, s"$root/direct/departments/snapshot").get
      .select($"dept_id", $"name").orderBy($"dept_id").collect().toSeq)
  }

  test("routed DLQ: poison quarantined once before routing, both tables land clean") {
    val root = tmpDir("graft_dstream_rdlq")
    CdcGen.writeTopicFiles(spark, n = 20, s"$root/in", nBatches = 1)
    CdcGen.writeDeptTopicFile(s"$root/in/departments.jsonl")
    // poison on BOTH topics: the pre-routing split must quarantine
    // each with its own coordinates (the per-table parse guard would
    // have silently dropped them)
    val ts = "2024-01-01T00:00:00.000Z"
    val poison = Seq(
      s"""{"topic":"debezium1.public.employees","partition":0,"offset":90001,"timestamp":"$ts","value":"not json"}""",
      s"""{"topic":"debezium1.public.departments","partition":0,"offset":90002,"timestamp":"$ts","value":"{\\"no_op\\":1}"}""")
    java.nio.file.Files.write(
      new java.io.File(s"$root/in", "part-99999-poison.txt").toPath,
      (poison.mkString("\n") + "\n").getBytes)

    val q = DeltaStream.run(spark, Map(
      DeltaStream.Mode -> "routed",
      DeltaStream.Tables -> "employees,departments",
      DeltaStream.TargetPath -> s"$root/out",
      DeltaStream.SourceDir -> s"$root/in",
      DeltaStream.CheckpointLocation -> s"$root/ckpt",
      DeltaStream.DlqDir -> s"$root/dlq",
      "graft.table.departments.recordkey.field" -> "dept_id",
      "graft.table.departments.schema.ddl" -> "dept_id INT, name STRING"))
    try q.processAllAvailable() finally q.stop()

    val dlq = spark.read.parquet(s"$root/dlq")
      .select($"topic", $"offset").as[(String, Long)].collect().toSet
    assert(dlq == Set(("debezium1.public.employees", 90001L),
      ("debezium1.public.departments", 90002L)), dlq.toString)
    // both tables still materialize their clean halves
    assert(Ingest.readSnapshot(spark, s"$root/out/employees/snapshot").get.count() > 0)
    val deps = Ingest.readSnapshot(spark, s"$root/out/departments/snapshot").get
    assert(deps.count() > 0 && deps.columns.contains("dept_id"))
  }

  test("mode-aware validation: wrong-mode, typo'd per-table and unknown-mode options fail loudly") {
    val root = tmpDir("graft_dstream_modebad")
    val routedGood = Map(
      DeltaStream.Mode -> "routed",
      DeltaStream.Tables -> "employees",
      DeltaStream.TargetPath -> s"$root/out",
      DeltaStream.SourceDir -> s"$root/in",
      DeltaStream.CheckpointLocation -> s"$root/ckpt")

    val badMode = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, routedGood + (DeltaStream.Mode -> "streaming"))
    }
    assert(badMode.getMessage.contains("unknown DeltaStream mode"), badMode.getMessage)

    // a filegroup-only option on a routed run would claim a catalog the
    // snapshot layout cannot serve — rejected, not ignored
    val wrongMode = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, routedGood + (DeltaStream.SyncCatalog -> "graft_cdc"))
    }
    assert(wrongMode.getMessage.contains(DeltaStream.SyncCatalog), wrongMode.getMessage)

    // routed without a table list has nothing to route
    val noTables = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, routedGood - DeltaStream.Tables)
    }
    assert(noTables.getMessage.contains(DeltaStream.Tables), noTables.getMessage)

    // per-table keys validate against the declared tables AND suffixes
    val typoTable = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, routedGood + ("graft.table.employes.schema.ddl" -> "id INT"))
    }
    assert(typoTable.getMessage.contains("graft.table.employes.schema.ddl"), typoTable.getMessage)
    val typoSuffix = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, routedGood + ("graft.table.employees.schema" -> "id INT"))
    }
    assert(typoSuffix.getMessage.contains("graft.table.employees.schema"), typoSuffix.getMessage)

    // a routed-only option on a filegroup run is equally loud
    val fgGood = Map(
      DeltaStream.TableName -> "employees",
      DeltaStream.TargetPath -> s"$root/out2",
      DeltaStream.SourceDir -> s"$root/in",
      DeltaStream.CheckpointLocation -> s"$root/ckpt2")
    val routedOnFg = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fgGood + (DeltaStream.TopicPattern -> "debezium1.*"))
    }
    assert(routedOnFg.getMessage.contains(DeltaStream.TopicPattern), routedOnFg.getMessage)

    // nothing was created by any failed run
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/out")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/out2")))
  }

  test("graft.value.format=avro / confluent-avro: the Avro topic twins land the JSON path's exact table") {
    // the reference's path-2 job (Confluent Avro values) through the
    // options map alone: the same change log on three wire formats must
    // land three byte-equal tables — decode is the ONLY difference
    val root = tmpDir("graft_dstream_avro")
    CdcGen.writeTopicFiles(spark, n = 60, s"$root/topic_json", nBatches = 2)
    CdcGen.writeTopicAvroFiles(spark, n = 60, s"$root/topic_avro", nBatches = 2)
    CdcGen.writeTopicAvroFiles(spark, n = 60, s"$root/topic_conf", nBatches = 2,
      schemaId = Some(7))
    val writerSchema = CdcGen.avroWriterSchemaJson(spark)

    def land(table: String, topic: String, extra: Map[String, String]): Seq[org.apache.spark.sql.Row] = {
      val q = DeltaStream.run(spark, Map(
        DeltaStream.TableName -> table,
        DeltaStream.TargetPath -> s"$root/store",
        DeltaStream.SourceDir -> topic,
        DeltaStream.CheckpointLocation -> s"$root/ckpt_$table") ++ extra)
      try q.processAllAvailable() finally q.stop()
      FileGroups.read(spark, s"$root/store/$table").get
        .orderBy($"id").collect().toSeq
    }

    val viaJson = land("emp_json", s"$root/topic_json", Map.empty)
    val viaAvro = land("emp_avro", s"$root/topic_avro", Map(
      DeltaStream.ValueFormat -> "avro",
      DeltaStream.AvroSchemaJson -> writerSchema))
    val viaConfluent = land("emp_conf", s"$root/topic_conf", Map(
      DeltaStream.ValueFormat -> "confluent-avro",
      s"${DeltaStream.AvroSchemaIdPrefix}7" -> writerSchema))
    assert(viaJson.nonEmpty && viaAvro == viaJson, "avro wire != json wire")
    assert(viaConfluent == viaJson, "confluent wire != json wire")
  }

  test("wire-format option cross-validation fails loudly in both modes") {
    val root = tmpDir("graft_dstream_avrobad")
    val fg = Map(
      DeltaStream.TableName -> "employees",
      DeltaStream.TargetPath -> s"$root/out",
      DeltaStream.SourceDir -> s"$root/in",
      DeltaStream.CheckpointLocation -> s"$root/ckpt")

    // format=avro without the writer schema
    val noSchema = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fg + (DeltaStream.ValueFormat -> "avro"))
    }
    assert(noSchema.getMessage.contains(DeltaStream.AvroSchemaJson), noSchema.getMessage)
    // a schema under the DEFAULT json format evidences a misconfigured
    // format — rejected, never silently ignored
    val schemaOnJson = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fg + (DeltaStream.AvroSchemaJson -> "{}"))
    }
    assert(schemaOnJson.getMessage.contains("json"), schemaOnJson.getMessage)
    // confluent-avro needs at least one registry entry
    val noRegistry = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fg + (DeltaStream.ValueFormat -> "confluent-avro"))
    }
    assert(noRegistry.getMessage.contains("registry"), noRegistry.getMessage)
    // per-id entries under plain avro (the single-schema format)
    val idsOnAvro = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fg + (DeltaStream.ValueFormat -> "avro",
        DeltaStream.AvroSchemaJson -> "{}",
        s"${DeltaStream.AvroSchemaIdPrefix}1" -> "{}"))
    }
    assert(idsOnAvro.getMessage.contains("confluent-avro"), idsOnAvro.getMessage)
    // a non-integer id suffix is a typo'd option name
    val badId = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fg + (DeltaStream.ValueFormat -> "confluent-avro",
        s"${DeltaStream.AvroSchemaIdPrefix}one" -> "{}"))
    }
    assert(badId.getMessage.contains("unknown DeltaStream option"), badId.getMessage)
    // unknown format name
    val badFmt = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, fg + (DeltaStream.ValueFormat -> "protobuf"))
    }
    assert(badFmt.getMessage.contains("protobuf"), badFmt.getMessage)
    // the routed mode validates the same surface
    val routed = Map(
      DeltaStream.Mode -> "routed",
      DeltaStream.Tables -> "employees",
      DeltaStream.TargetPath -> s"$root/out2",
      DeltaStream.SourceDir -> s"$root/in",
      DeltaStream.CheckpointLocation -> s"$root/ckpt2")
    val routedNoSchema = intercept[IllegalArgumentException] {
      DeltaStream.run(spark, routed + (DeltaStream.ValueFormat -> "avro"))
    }
    assert(routedNoSchema.getMessage.contains(DeltaStream.AvroSchemaJson),
      routedNoSchema.getMessage)
    // nothing was created by any failed run
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/out")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/out2")))
  }
}
