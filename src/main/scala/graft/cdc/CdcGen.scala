package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded, fully deterministic workload generator — the Spark-native
  * equivalent of the reference's `generator.py` (Faker rows → INSERT,
  * generator.py:22-40) extended with updates/deletes so the merge path
  * (SURVEY.md §2.2) has something to do. No Faker, no RNG state: every
  * value is a pure expression of (id, seed), so any executor can produce
  * any partition independently — the property that makes the generator
  * scale-free (spark.range parallelizes; nothing is collected).
  *
  * Distributions mirror generator.py:25-32: department uniform over
  * {IT, HR, Sales, Marketing}, salary uniform-ish in [10000, 150000],
  * created_at a date; names/emails/phones are hash-picked from small
  * public wordlists.
  */
object CdcGen {

  private val firstNames = Seq("Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace",
    "Henry", "Irene", "Jack", "Karen", "Liam", "Mona", "Nate", "Olga", "Paul")
  private val lastNames = Seq("Adams", "Baker", "Clark", "Davis", "Evans", "Foster", "Garcia",
    "Hill", "Irwin", "Jones", "Kim", "Lopez", "Moore", "Nolan", "Owens", "Perez")
  private val domains = Seq("example", "acme", "globex", "initech")
  private val departments = Seq("IT", "HR", "Sales", "Marketing")

  private def pick(values: Seq[String], h: Column): Column =
    element_at(array(values.map(lit): _*), (pmod(h, lit(values.size)) + 1).cast("int"))

  private def h(seed: Long, salt: String, id: Column): Column =
    abs(xxhash64(lit(seed), lit(salt), id))

  /** Current post-image attributes for employee `id` at version `v`
    * (v=0 original insert, v=1 after update). */
  private def attrs(id: Column, seed: Long, version: Int): Seq[Column] = {
    val first = pick(firstNames, h(seed, "first", id))
    val last = pick(lastNames, h(seed, "last", id))
    Seq(
      id.cast("int").as("id"),
      concat(first, lit(" "), last).as("full_name"),
      concat(lower(first), lit("."), lower(last), lit("@"), pick(domains, h(seed, "dom", id)), lit(".com")).as("email"),
      concat(lit("555-"), lpad(pmod(h(seed, "ph", id), lit(10000)).cast("string"), 4, "0")).as("phone"),
      pick(departments, h(seed, "dept" + version, id)).as("department"),
      (lit(10000) + pmod(h(seed, "sal" + version, id), lit(140001))).cast("int").as("salary"),
      pmod(h(seed, "date", id), lit(2000)).cast("int").plus(lit(18000)).cast("int").as("created_at"))
  }

  private def rowStruct(id: Column, seed: Long, version: Int): Column =
    struct(attrs(id, seed, version): _*)

  private def sourceStruct(lsn: Column, txId: Column): Column = struct(
    lit("2.2.0.Final").as("version"), lit("postgresql").as("connector"),
    lit("debezium1").as("name"), (lit(1685000000000L) + lsn).as("ts_ms"),
    lit("false").as("snapshot"), lit("railway").as("db"), lit("public").as("schema"),
    lit("employees").as("table"), txId.as("txId"), lsn.as("lsn"))

  /** The full change log as envelope-shaped rows: n inserts, an update
    * for every 3rd id, a delete for every 7th — LSN strictly increasing
    * across phases (inserts, then updates, then deletes), 5 events per
    * txId like generator.py's 5-row commit (generator.py:38-40).
    */
  def changeLog(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(1, n + 1).select(col("id"))
    val nullRow = lit(null).cast(Envelope.employees.catalogString)

    def envelope(df: DataFrame, op: String, before: Column, after: Column, lsn: Column): DataFrame =
      df.select(struct(
        before.as("before"), after.as("after"),
        sourceStruct(lsn, (lsn.cast("long") / 50).cast("long") + 500).as("source"),
        lit(op).as("op"), (lit(1685000000000L) + lsn).as("ts_ms")).as("payload"))

    val inserts = envelope(ids, Envelope.OpCreate, nullRow, rowStruct(col("id"), seed, 0), col("id") * 10)
    val updates = envelope(ids.filter(pmod(col("id"), lit(3)) === 0), Envelope.OpUpdate,
      rowStruct(col("id"), seed, 0), rowStruct(col("id"), seed, 1), lit(n * 10) + col("id") * 10)
    val deletes = envelope(ids.filter(pmod(col("id"), lit(7)) === 0), Envelope.OpDelete,
      rowStruct(col("id"), seed, if (true) 1 else 0), nullRow, lit(n * 20) + col("id") * 10)
    // Deleted 7th ids whose id%3==0 were updated first; before-image
    // correctness beyond presence isn't asserted by the merge (only
    // after/op/lsn are), matching Debezium's at-least-shape guarantee.
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Expected post-merge snapshot for `changeLog(n)` — the golden oracle
    * used by tests: every id except multiples of 7, with the updated
    * attrs for multiples of 3. */
  def expectedSnapshot(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(1, n + 1).filter(pmod(col("id"), lit(7)) =!= 0)
    ids.select(
      when(pmod(col("id"), lit(3)) === 0, rowStruct(col("id"), seed, 1))
        .otherwise(rowStruct(col("id"), seed, 0)).as("r"))
      .select(col("r.*"))
  }

  /** Envelope rows → emulated Kafka-record JSON lines (FIXTURES.md §B):
    * one JSON object per record with the envelope serialized into
    * `value`, exactly what the real Kafka source would deliver after
    * `CAST(value AS STRING)`. */
  def toKafkaJsonLines(log: DataFrame): DataFrame =
    wrapKafkaLines(log.select(
      to_json(struct(col("payload"))).as("value"),
      col("payload.source.lsn").as("lsn"),
      col("payload.ts_ms").as("ts_ms")))

  /** The emulated-Kafka record wrapper shared by both wire formats:
    * (value, topic, partition, offset, timestamp) as one JSON line. */
  private def wrapKafkaLines(valued: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("lsn"))
    valued
      .withColumn("offset", row_number().over(w).cast("long") - 1)
      .select(to_json(struct(
        col("value"),
        lit("debezium1.public.employees").as("topic"),
        lit(0).as("partition"),
        col("offset"),
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("timestamp"))).as("line"),
        col("offset"))
  }

  /** S15 wire-format twin of [[toKafkaJsonLines]]: the envelope is
    * Avro-binary encoded (what the Confluent value converter puts on the
    * wire, reference README.md:262-263) and base64-wrapped purely for
    * the JSON-lines file transport — `unbase64` on read restores the
    * exact bytes a real Avro-valued topic would deliver. With `schemaId`
    * set, each value carries the Confluent 5-byte frame (magic 0 +
    * big-endian int32 id) exactly as KafkaAvroSerializer writes it.
    * Encoding runs per partition on executors (the writer schema travels
    * as its JSON form; nothing is collected). */
  def toKafkaAvroLines(log: DataFrame, schemaId: Option[Int] = None): DataFrame = {
    import log.sparkSession.implicits._
    val schemaJson = Avro.toAvroSchema(log.schema).toString
    val encoded = log
      .select(col("payload"), col("payload.source.lsn").as("lsn"), col("payload.ts_ms").as("ts_ms"))
      .mapPartitions { rows =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val writer = new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema)
        val out = new java.io.ByteArrayOutputStream()
        var enc: org.apache.avro.io.BinaryEncoder = null
        rows.map { r =>
          out.reset()
          schemaId.foreach { id => // header precedes the payload bytes
            out.write(0)
            out.write((id >>> 24) & 0xff); out.write((id >>> 16) & 0xff)
            out.write((id >>> 8) & 0xff); out.write(id & 0xff)
          }
          enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, enc)
          writer.write(Avro.rowToRecord(r, schema), enc)
          enc.flush()
          (java.util.Base64.getEncoder.encodeToString(out.toByteArray),
            r.getLong(1), r.getLong(2))
        }
      }.toDF("value", "lsn", "ts_ms")
    wrapKafkaLines(encoded)
  }

  /** Write the change log as `nBatches` JSON-lines files under `dir` —
    * each file plays one Kafka topic-partition segment for the streaming
    * file source (SURVEY.md §7.2 Kafka emulation). Single-partition
    * writes are fine: this is test fixture generation, not the data path. */
  def writeTopicFiles(spark: SparkSession, n: Long, dir: String, nBatches: Int = 3, seed: Long = 42L): Unit =
    writeLines(toKafkaJsonLines(changeLog(spark, n, seed)), dir, nBatches)

  /** SECOND-table topic segment for the multi-table `debezium1.*`
    * subscription (reference README.md:193 subscribes the prefix, so a
    * real deployment's stream carries every table of the schema): a
    * deterministic departments change log — creates of ids 1-12,
    * updates of ids 1-8, deletes of 3/6/9, lsn 1-23 — as ONE
    * JSON-lines file on topic `debezium1.public.departments`, in the
    * same wrapped-Kafka line shape as [[writeTopicFiles]]. 23 fixed
    * lines, written plainly (no Spark job); any engine re-derives the
    * expected snapshot from the landed bytes (stream_route_e2e's
    * oracle does exactly that). */
  def writeDeptTopicFile(path: String): Unit = {
    def line(op: String, id: Int, lsn: Long, name: String): String = {
      val row = s"""{"dept_id":$id,"name":"$name"}"""
      val before = if (op == "d") row else "null"
      val after = if (op == "d") "null" else row
      val value = s"""{"payload":{"before":$before,"after":$after,""" +
        s""""source":{"lsn":$lsn,"table":"departments"},"op":"$op","ts_ms":$lsn}}"""
      val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"value":"$esc","topic":"debezium1.public.departments",""" +
        s""""partition":0,"offset":$lsn,"timestamp":"2023-05-25T00:00:0${lsn % 10}.000Z"}"""
    }
    val events =
      (1 to 12).map(i => line("c", i, i.toLong, s"dept_${i}_v1")) ++
      (1 to 8).map(i => line("u", i, (12 + i).toLong, s"dept_${i}_v2")) ++
      Seq(3, 6, 9).zipWithIndex.map { case (i, j) => line("d", i, (21 + j).toLong, s"dept_${i}_v1") }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), events.mkString("\n"))
    ()
  }

  /** Avro-valued twin of [[writeTopicFiles]] (S15 fixture); `schemaId`
    * adds the Confluent 5-byte frame to every value. */
  def writeTopicAvroFiles(spark: SparkSession, n: Long, dir: String, nBatches: Int = 3, seed: Long = 42L,
                          schemaId: Option[Int] = None): Unit =
    writeLines(toKafkaAvroLines(changeLog(spark, n, seed), schemaId), dir, nBatches)

  /** Writer-schema JSON for `changeLog`'s envelope (the stand-in for a
    * schema-registry lookup on the decode side). */
  def avroWriterSchemaJson(spark: SparkSession): String =
    Avro.toAvroSchema(changeLog(spark, 1).schema).toString

  /** Schema-EVOLUTION fixture (S15 + U6): one topic, two live writer
    * ids. The inserts (lsn ≤ n·10) are framed under `id1` with the
    * original writer schema; the updates and deletes that follow are
    * framed under `id2` with a drifted writer schema whose row structs
    * gained a nullable int `bonus` column (salary/10) — the
    * add-a-column migration a live Debezium topic actually sees.
    * Returns the id→writer-schema registry the decode side needs;
    * each entry is exactly the schema [[toKafkaAvroLines]] encoded
    * that half with. */
  def writeTopicAvroEvolvedFiles(spark: SparkSession, n: Long, dir: String,
                                 id1: Int, id2: Int, seed: Long = 42L): Map[Int, String] = {
    val log = changeLog(spark, n, seed)
    val cut = n * 10 // changeLog lsn layout: inserts ≤ n·10 < updates < deletes
    val oldHalf = log.filter(col("payload.source.lsn") <= cut)
    def withBonus(img: Column): Column = {
      val fields = Envelope.employees.fields.toSeq.map(f => img.getField(f.name).as(f.name))
      when(img.isNotNull,
        struct(fields :+ (img.getField("salary") / 10).cast("int").as("bonus"): _*))
    }
    val newHalf = log.filter(col("payload.source.lsn") > cut).select(struct(
      withBonus(col("payload.before")).as("before"),
      withBonus(col("payload.after")).as("after"),
      col("payload.source").as("source"),
      col("payload.op").as("op"),
      col("payload.ts_ms").as("ts_ms")).as("payload"))
    writeLines(toKafkaAvroLines(oldHalf, Some(id1)), dir, 1)
    writeLines(toKafkaAvroLines(newHalf, Some(id2)), dir, 1)
    Map(id1 -> Avro.toAvroSchema(oldHalf.schema).toString,
        id2 -> Avro.toAvroSchema(newHalf.schema).toString)
  }

  private def writeLines(linesDf: DataFrame, dir: String, nBatches: Int): Unit = {
    val lines = linesDf.cache()
    try {
      val total = lines.count()
      val per = math.max(1L, (total + nBatches - 1) / nBatches)
      (0 until nBatches).foreach { b =>
        val part = lines.filter(col("offset") >= b * per && col("offset") < (b + 1) * per)
          .orderBy(col("offset")).select(col("line"))
        part.coalesce(1).write.mode("append").text(dir)
      }
    } finally lines.unpersist()
  }
}
