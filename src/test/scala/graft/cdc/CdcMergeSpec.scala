package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden CDC fixtures (FIXTURES.md §A sequences 1-7) driven through the
  * real parse path (Ingest.extractPostImage) and the merge (CdcMerge).
  */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  /** One Debezium envelope JSON line (FIXTURES.md §B shape). */
  private def ev(op: String, id: Int, lsn: Long, salary: Int = 1000,
                 extraField: Option[(String, String)] = None): String = {
    val extra = extraField.map { case (k, v) => s""","$k":"$v"""" }.getOrElse("")
    val row = s"""{"id":$id,"full_name":"N$id","email":"e$id@x.com","phone":"555","department":"IT","salary":$salary,"created_at":19000$extra}"""
    val before = if (op == "u" || op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"payload":{"before":$before,"after":$after,"source":{"version":"2.2.0.Final","connector":"postgresql","name":"debezium1","ts_ms":${1685000000000L + lsn},"snapshot":"false","db":"railway","schema":"public","table":"employees","txId":1,"lsn":$lsn},"op":"$op","ts_ms":${1685000000000L + lsn}}}"""
  }

  /** Raw envelope lines → emulated-Kafka-shaped DataFrame (what the real
    * connector delivers). */
  private def kafkaShaped(lines: Seq[String]): DataFrame =
    lines.toDF("v").select(
      lit(null).cast("binary").as("key"),
      col("v").cast("binary").as("value"),
      lit("debezium1.public.employees").as("topic"),
      lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))

  private def snap(lines: Seq[String]): DataFrame =
    CdcMerge.snapshot(Ingest.extractPostImage(kafkaShaped(lines)), Seq("id"), Seq("lsn"))

  test("fixture 1: insert_only — 5 inserts, one txn, all retained") {
    val s = snap((1 to 5).map(i => ev("c", i, i * 10L, salary = 100 * i)))
    assert(s.count() == 5)
    assert(s.select("id", "salary").as[(Int, Int)].collect().sorted.toSeq ==
      (1 to 5).map(i => (i, 100 * i)))
  }

  test("fixture 2: update — latest version wins") {
    val s = snap(Seq(ev("c", 1, 10, salary = 1000), ev("u", 1, 20, salary = 2000)))
    assert(s.select("salary").as[Int].collect().toSeq == Seq(2000))
    assert(s.select("op").as[String].head() == "u")
  }

  test("fixture 3: delete — key removed from snapshot") {
    val s = snap(Seq(ev("c", 1, 10), ev("d", 1, 20)))
    assert(s.count() == 0)
  }

  test("fixture 4: snapshot_read — op 'r' rows are regular upserts") {
    val s = snap(Seq(ev("r", 1, 10, salary = 500), ev("r", 2, 11, salary = 600)))
    assert(s.count() == 2)
  }

  test("fixture 5: same_key_multi — 3 updates in one batch, max-lsn wins") {
    val s = snap(Seq(ev("c", 7, 10, salary = 1),
      ev("u", 7, 20, salary = 2), ev("u", 7, 30, salary = 3), ev("u", 7, 25, salary = 9)))
    assert(s.select("salary").as[Int].collect().toSeq == Seq(3))
  }

  test("fixture 6: schema_drift — new column reconciled, old rows null") {
    val b1 = Ingest.extractPostImage(kafkaShaped(Seq(ev("c", 1, 10))))
    val drifted = Envelope.envelope(Envelope.employees.add("badge", "string"))
    val b2 = Ingest.extractPostImage(
      kafkaShaped(Seq(ev("c", 2, 20, extraField = Some("badge" -> "B2")))), drifted)
    val t = CdcMerge.upsert(CdcMerge.snapshot(b1, Seq("id"), Seq("lsn")), b2, Seq("id"), Seq("lsn"))
    assert(t.count() == 2)
    assert(t.filter($"id" === 1).select("badge").as[String].head() == null)
    assert(t.filter($"id" === 2).select("badge").as[String].head() == "B2")
  }

  test("fixture 7: delete_only batch — inferred schema has null-typed after") {
    val lines = Seq(ev("d", 1, 10), ev("d", 2, 20))
    // the hazard path: schema inferred from a batch with no post-images
    val inferred = Ingest.inferEnvelopeSchema(spark, lines.toDS())
    val parsed = Ingest.extractPostImage(kafkaShaped(lines), inferred)
    assert(parsed.count() == 2) // rows parse (image from `before`)
    // inference widens ints to long — part of what this fixture checks
    assert(parsed.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(CdcMerge.snapshot(parsed, Seq("id"), Seq("lsn")).count() == 0)
  }

  test("fixture 8: composite-key delete — ALL key columns recovered from before") {
    // A (tenant, id) composite merge key: the delete for (b, 1) must not
    // group under a partially-null key (which would leave the live row).
    import org.apache.spark.sql.types._
    val row = StructType(Seq(StructField("tenant", StringType),
      StructField("id", LongType), StructField("v", IntegerType)))
    def cev(op: String, tenant: String, id: Int, lsn: Long, v: Int = 0): String = {
      val r = s"""{"tenant":"$tenant","id":$id,"v":$v}"""
      val before = if (op == "u" || op == "d") r else "null"
      val after = if (op == "d") "null" else r
      s"""{"payload":{"before":$before,"after":$after,"source":{"version":"2.2.0.Final","connector":"postgresql","name":"debezium1","ts_ms":${1685000000000L + lsn},"snapshot":"false","db":"railway","schema":"public","table":"t","txId":1,"lsn":$lsn},"op":"$op","ts_ms":${1685000000000L + lsn}}}"""
    }
    val keys = Seq("tenant", "id")
    val parsed = Ingest.extractPostImage(kafkaShaped(Seq(
      cev("c", "a", 1, 10, v = 5), cev("c", "b", 1, 11, v = 6), cev("d", "b", 1, 20))),
      Envelope.envelope(row), keys)
    // the delete row recovered BOTH key columns (typed per the row schema)
    val del = parsed.filter($"op" === "d").select("tenant", "id").as[(String, Long)].collect()
    assert(del.toSeq == Seq(("b", 1L)))
    val s = CdcMerge.snapshot(parsed, keys, Seq("lsn"))
    assert(s.select("tenant", "id", "v").as[(String, Long, Int)].collect().toSeq ==
      Seq(("a", 1L, 5)))
  }

  test("fixture 9: full Debezium {schema, payload} envelope — unknown top-level field tolerated") {
    // Real Debezium with converter schemas.enable=true emits a top-level
    // `schema` descriptor alongside `payload`; the declared envelope only
    // names `payload`, and from_json must ignore the extra field.
    val schemaField = """"schema":{"type":"struct","fields":[{"type":"struct","field":"after"}],"optional":false,"name":"debezium1.public.employees.Envelope"}"""
    val lines = Seq(ev("c", 1, 10, salary = 700), ev("u", 1, 20, salary = 800))
      .map(l => "{" + schemaField + "," + l.stripPrefix("{"))
    val s = snap(lines)
    assert(s.select("id", "salary").as[(Int, Int)].collect().toSeq == Seq((1, 800)))
  }

  // ---- upsert algebra (SURVEY.md §5.4), exercised over a seeded
  // pseudo-random op log rather than scalacheck generators (DataFrames
  // in forAll thrash the session; determinism matters more here).
  private def randomLog(seed: Long, n: Int): DataFrame = {
    val r = new scala.util.Random(seed)
    val rows = (1 to n).map { i =>
      (r.nextInt(10) + 1, i.toLong, r.nextInt(3) match {
        case 0 => "c"; case 1 => "u"; case 2 => "d"
      }, r.nextInt(1000))
    }
    rows.toDF("id", "lsn", "op", "salary")
  }

  private def canon(df: DataFrame): Seq[(Int, Long, String, Int)] =
    df.select("id", "lsn", "op", "salary").as[(Int, Long, String, Int)]
      .collect().sortBy(t => (t._1, t._2)).toSeq

  test("property: merge(merge(S,B),B) == merge(S,B) (idempotence)") {
    for (seed <- 1L to 5L) {
      val log = randomLog(seed, 40)
      val s0 = CdcMerge.snapshot(log.filter($"lsn" <= 20), Seq("id"), Seq("lsn"))
      val b = log.filter($"lsn" > 20)
      val once = CdcMerge.upsert(s0, b, Seq("id"), Seq("lsn"))
      val twice = CdcMerge.upsert(once, b, Seq("id"), Seq("lsn"))
      assert(canon(once) == canon(twice), s"seed=$seed")
    }
  }

  test("property: upsertPruned == upsert") {
    for (seed <- 11L to 15L) {
      val log = randomLog(seed, 40)
      val s0 = CdcMerge.snapshot(log.filter($"lsn" <= 20), Seq("id"), Seq("lsn"))
      val b = log.filter($"lsn" > 20)
      assert(canon(CdcMerge.upsertPruned(s0, b, Seq("id"), Seq("lsn"))) ==
        canon(CdcMerge.upsert(s0, b, Seq("id"), Seq("lsn"))), s"seed=$seed")
    }
  }

  test("property: incremental batch merge == one-shot log snapshot") {
    for (seed <- 21L to 25L) {
      val log = randomLog(seed, 60)
      val oneShot = CdcMerge.snapshot(log, Seq("id"), Seq("lsn"))
      val incremental = (0 until 3).foldLeft(spark.emptyDataFrame) { (acc, b) =>
        val batch = log.filter($"lsn" > b * 20 && $"lsn" <= (b + 1) * 20)
        if (b == 0) CdcMerge.snapshot(batch, Seq("id"), Seq("lsn"))
        else CdcMerge.upsert(acc, batch, Seq("id"), Seq("lsn"))
      }
      assert(canon(oneShot) == canon(incremental), s"seed=$seed")
    }
  }

  test("delete-then-reinsert: later insert revives the key") {
    val log = Seq((1, 10L, "c", 5), (1, 20L, "d", 0), (1, 30L, "c", 7)).toDF("id", "lsn", "op", "salary")
    val s = CdcMerge.snapshot(log, Seq("id"), Seq("lsn"))
    assert(s.select("salary").as[Int].collect().toSeq == Seq(7))
  }

  test("snapshotPartial: per-column latest non-null; delete resets history") {
    val log = Seq(
      // key 1: insert both, patch value only, patch etype only
      (1L, 10L, "c", Some(1.0), Some("a")),
      (1L, 20L, "u", Some(2.0), None),
      (1L, 30L, "u", None, Some("b")),
      // key 2: insert, DELETE, then a value-only patch — the etype set
      // before the delete must NOT leak into the revived row
      (2L, 10L, "c", Some(9.0), Some("x")),
      (2L, 20L, "d", None, None),
      (2L, 30L, "u", Some(7.0), None),
      // key 3: insert then delete — gone entirely
      (3L, 10L, "c", Some(5.0), Some("z")),
      (3L, 20L, "d", None, None)
    ).toDF("id", "lsn", "op", "value", "etype")
    val got = CdcMerge.snapshotPartial(log, Seq("id"), "lsn", Seq("value", "etype"))
      .orderBy($"id")
      .as[(Long, Long, Option[Double], Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, 30L, Some(2.0), Some("b")),
      (2L, 30L, Some(7.0), None)))
  }
}
