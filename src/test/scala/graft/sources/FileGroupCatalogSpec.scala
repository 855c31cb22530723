package graft.sources

import graft.SparkSpec
import graft.cdc.FileGroups
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** DSv2 catalog surface over the file-group store: SQL resolution,
  * time travel, manifest bucket pruning surviving the catalog path,
  * and the read-only contract. */
class FileGroupCatalogSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def log() = Tables.events(spark, sf).select(
    col("user_id").as("id"), col("event_id").as("lsn"),
    when(pmod(col("event_id"), lit(11)) === 0, "d")
      .when(pmod(col("event_id"), lit(3)) === 0, "u")
      .otherwise("c").as("op"),
    col("value"))

  /** Fresh warehouse with one 2-commit table; registers the catalog. */
  private def warehouse(): String = {
    val root = tmpDir("graft_fgcat")
    val t = root + "/employees"
    val l = log()
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_cdc", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdc.root", root)
    root
  }

  test("SQL read equals the Scala-API read; SHOW TABLES lists the table") {
    val root = warehouse()
    val sql = spark.sql("SELECT id, lsn, op, value FROM graft_cdc.employees ORDER BY id")
      .collect().toSeq
    val api = FileGroups.read(spark, root + "/employees").get
      .select($"id", $"lsn", $"op", $"value").orderBy($"id").collect().toSeq
    assert(sql.nonEmpty && sql == api)
    assert(spark.sql("SHOW TABLES IN graft_cdc").select($"tableName").as[String]
      .collect().toSeq == Seq("employees"))
  }

  test("VERSION AS OF resolves retained versions and rejects others") {
    val root = warehouse()
    val v0sql = spark.sql("SELECT * FROM graft_cdc.employees VERSION AS OF 0").count()
    assert(v0sql == FileGroups.readAt(spark, root + "/employees", 0L).get.count())
    assert(spark.sql("SELECT * FROM graft_cdc.employees VERSION AS OF 1").count() ==
      FileGroups.read(spark, root + "/employees").get.count())
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_cdc.employees VERSION AS OF 9").count()
    }
    assert(ex.getMessage.contains("not retained"), ex.getMessage)
  }

  test("record-key equality through SQL prunes to the manifest's bucket files") {
    warehouse()
    val df = spark.sql("SELECT id, lsn FROM graft_cdc.employees WHERE id = 5")
    // values first: the pruned read must agree with the unpruned one
    val want = spark.sql("SELECT id, lsn FROM graft_cdc.employees")
      .filter($"id" === 5).collect().toSeq
    assert(df.collect().toSeq == want)
    // plan: the scan's file index holds ONE bucket dir (16 buckets
    // total), and the key predicate still reached the parquet scan
    val p = df.queryExecution.executedPlan.treeString
    assert(p.contains("InMemoryFileIndex(1 paths)"), p)
    assert(p.contains("_bucket="), p)
    assert(p.contains("PushedFilters: [IsNotNull(id), EqualTo(id,5)]"), p)
  }

  test("decimal and timestamp record keys prune through SQL (Debezium numeric/temporal PKs)") {
    // the round-18 scan-builder probe conversion: a decimal/timestamp
    // key-equality literal must reach the manifest index and cut the
    // file index to the probe's bucket — not silently fall back to the
    // full referenced-file scan
    val root = tmpDir("graft_fgcat_dt")
    val dec = log().withColumn("id", ($"id" + lit(0.25)).cast("decimal(10,2)"))
    FileGroups.commit(spark, root + "/dec", dec, 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    val ts = log().withColumn("id", timestamp_seconds($"id" % 500))
    FileGroups.commit(spark, root + "/ts", ts, 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    spark.conf.set("spark.sql.catalog.graft_dt", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dt.root", root)

    val dk = spark.sql("SELECT min(id) FROM graft_dt.dec").head().getDecimal(0)
    val dq = spark.sql(s"SELECT id, lsn FROM graft_dt.dec WHERE id = $dk")
    assert(dq.collect().toSeq ==
      spark.sql("SELECT id, lsn FROM graft_dt.dec").filter($"id" === dk).collect().toSeq)
    val dp = dq.queryExecution.executedPlan.treeString
    assert(dp.contains("InMemoryFileIndex(1 paths)"), dp)

    val tk = spark.sql("SELECT min(id) FROM graft_dt.ts").head().getTimestamp(0)
    val tq = spark.sql(s"SELECT id, lsn FROM graft_dt.ts WHERE id = TIMESTAMP '$tk'")
    assert(tq.collect().toSeq ==
      spark.sql("SELECT id, lsn FROM graft_dt.ts").filter($"id" === tk).collect().toSeq)
    assert(tq.collect().nonEmpty)
    val tp = tq.queryExecution.executedPlan.treeString
    assert(tp.contains("InMemoryFileIndex(1 paths)"), tp)
  }

  test("non-key and wide predicates fall back to the full referenced-file scan") {
    warehouse()
    val p = spark.sql("SELECT id FROM graft_cdc.employees WHERE lsn > 100")
      .queryExecution.executedPlan.treeString
    // every live bucket dir, not one — and lsn still pushed to parquet
    assert(!p.contains("InMemoryFileIndex(1 paths)"), p)
    assert(p.contains("GreaterThan(lsn,100)"), p)
  }

  private def chainMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")

  test("TIMESTAMP AS OF resolves by commit instant; predating every commit fails") {
    val root = warehouse()
    val t = root + "/employees"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    // pin deterministic commit instants on the atomic markers (their
    // mtime IS the commit point — written last in every commit path)
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$t/_COMMIT_0"), 1577836800000L, -1) // 2020-01-01
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$t/_COMMIT_1"), 1590969600000L, -1) // 2020-06-01
    val v0 = FileGroups.readAt(spark, t, 0L).get.count()
    val v1 = FileGroups.read(spark, t).get.count()
    assert(v0 != v1) // the two versions must be distinguishable
    assert(spark.sql(
      "SELECT * FROM graft_cdc.employees TIMESTAMP AS OF '2020-03-01 00:00:00'").count() == v0)
    assert(spark.sql(
      "SELECT * FROM graft_cdc.employees TIMESTAMP AS OF '2021-01-01 00:00:00'").count() == v1)
    val ex = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_cdc.employees TIMESTAMP AS OF '2019-01-01 00:00:00'").count()
    }
    assert(chainMsg(ex).contains("no retained version"), chainMsg(ex))
  }

  test("SQL time travel refuses pre-purge versions while a purge intent marker stands") {
    val root = warehouse()
    val t = root + "/employees"
    // the crash window: v2 stands in for a purge's committed rewrite,
    // the intent marker is still standing (forget never ran)
    FileGroups.commit(spark, t,
      Seq((1L, 99999L, "d", 0.0)).toDF("id", "lsn", "op", "value"),
      2L, Seq("id"), Seq("lsn"))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$t/_PURGE_2"))
    // the current (already-purged) snapshot still serves through SQL...
    assert(spark.sql("SELECT count(*) FROM graft_cdc.employees").head.getLong(0) > 0)
    // ...but VERSION AS OF a pre-purge version fails LOUDLY — same
    // resurrection guard as FileGroups.readAt, reached from SQL
    val ex = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_cdc.employees VERSION AS OF 1").count()
    }
    assert(chainMsg(ex).contains("purge 2 is pending"), chainMsg(ex))
  }

  test("fully-literal IN prunes; a non-literal IN entry disables pruning, never a literal subset") {
    warehouse()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val lits = spark.sql("SELECT id, lsn FROM graft_cdc.employees WHERE id IN (5, 7)")
    assert(canon(lits) ==
      canon(spark.sql("SELECT id, lsn FROM graft_cdc.employees").filter($"id".isin(5, 7))))
    val pLit = lits.queryExecution.executedPlan.treeString
    assert(pLit.contains("InMemoryFileIndex(1 paths)") ||
      pLit.contains("InMemoryFileIndex(2 paths)"), pLit)
    // id IN (5, lsn): pruning on the literal subset {5} alone would drop
    // file groups holding rows where id = lsn — the conjunct must be
    // discarded wholesale and the full referenced-file scan used
    val mixed = spark.sql("SELECT id, lsn FROM graft_cdc.employees WHERE id IN (5, lsn)")
    assert(canon(mixed) == canon(spark.sql("SELECT id, lsn FROM graft_cdc.employees")
      .filter($"id" === 5 || $"id" === $"lsn")))
    val pM = mixed.queryExecution.executedPlan.treeString
    assert(!pM.contains("InMemoryFileIndex(1 paths)") &&
      !pM.contains("InMemoryFileIndex(2 paths)"), pM)
  }

  test("manifest-recorded keys override a misconfigured catalog keys conf (self-describing table)") {
    warehouse()
    // the table was committed with keys=(id); a wrong conf claiming
    // (id, lsn) must NOT change probe hashing — the manifest wins, the
    // probe prunes to 1 bucket, and the values stay correct. (Before
    // the #keys manifest header, the conf was trusted and a mismatch
    // silently disabled — or worse, mis-aimed — pruning.)
    spark.conf.set("spark.sql.catalog.graft_cdc.keys", "id,lsn")
    try {
      val df = spark.sql("SELECT id, lsn FROM graft_cdc.employees WHERE id = 5")
      assert(df.collect().toSeq ==
        spark.sql("SELECT id, lsn FROM graft_cdc.employees").filter($"id" === 5).collect().toSeq)
      val p = df.queryExecution.executedPlan.treeString
      assert(p.contains("InMemoryFileIndex(1 paths)"), p)
      assert(p.contains("EqualTo(id,5)"), p) // predicate still pushed to parquet
    } finally spark.conf.unset("spark.sql.catalog.graft_cdc.keys")
  }

  test("string record keys prune through SQL: equality and IN cut to bucket files") {
    val root = tmpDir("graft_fgcat_str")
    val t = root + "/users"
    val l = log().withColumn("id", concat(lit("u"), $"id"))
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_cdc", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdc.root", root)
    val df = spark.sql("SELECT id, lsn FROM graft_cdc.users WHERE id = 'u5'")
    assert(df.collect().toSeq ==
      spark.sql("SELECT id, lsn FROM graft_cdc.users").filter($"id" === "u5").collect().toSeq)
    val p = df.queryExecution.executedPlan.treeString
    assert(p.contains("InMemoryFileIndex(1 paths)"), p)
    assert(p.contains("EqualTo(id,u5)"), p) // pushed to parquet too
    // IN over string keys prunes to <= 2 bucket dirs
    val in = spark.sql("SELECT id, lsn FROM graft_cdc.users WHERE id IN ('u5', 'u7')")
    assert(in.collect().toSeq.map(_.getString(0)).toSet.subsetOf(Set("u5", "u7")))
    val pIn = in.queryExecution.executedPlan.treeString
    assert(pIn.contains("InMemoryFileIndex(1 paths)") ||
      pIn.contains("InMemoryFileIndex(2 paths)"), pIn)
  }

  test("composite record keys prune through SQL when every key column is equality-constrained") {
    val root = tmpDir("graft_fgcat_comp")
    val t = root + "/orders"
    val l = log().withColumn("region", pmod($"id", lit(5)).cast("int"))
    FileGroups.commit(spark, t, l, 0L, Seq("id", "region"), Seq("lsn"), nBuckets = 16)
    spark.conf.set("spark.sql.catalog.graft_cdc", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdc.root", root)
    // the catalog resolves (id, region) from the MANIFEST — no keys
    // conf set at all
    val r0 = spark.sql("SELECT id, region FROM graft_cdc.orders ORDER BY id").head()
    val (kid, kreg) = (r0.getLong(0), r0.getInt(1))
    val df = spark.sql(
      s"SELECT id, lsn FROM graft_cdc.orders WHERE id = $kid AND region = $kreg")
    assert(df.collect().toSeq ==
      spark.sql("SELECT id, lsn FROM graft_cdc.orders")
        .filter($"id" === kid && $"region" === kreg).collect().toSeq)
    val p = df.queryExecution.executedPlan.treeString
    assert(p.contains("InMemoryFileIndex(1 paths)"), p)
    // HALF a key (only id constrained) cannot form tuples — full scan,
    // never a wrong cut
    val half = spark.sql(s"SELECT id, lsn FROM graft_cdc.orders WHERE id = $kid")
    assert(half.collect().toSeq ==
      spark.sql("SELECT id, lsn FROM graft_cdc.orders").filter($"id" === kid).collect().toSeq)
    assert(!half.queryExecution.executedPlan.treeString.contains("InMemoryFileIndex(1 paths)"))
  }

  test("CTAS lowers to a v0 commit: queryable, key-pinned, IF NOT EXISTS no-ops, duplicates fail") {
    val root = warehouse()
    spark.sql(
      """CREATE TABLE graft_cdc.snap TBLPROPERTIES('keys'='id', 'ord'='lsn', 'buckets'='8')
        |AS SELECT id, lsn, op, value FROM graft_cdc.employees WHERE id <= 20""".stripMargin)
    // a real committed file-group table: marker + manifest + readable
    assert(FileGroups.committedId(spark, root + "/snap").contains(0L))
    val got = spark.sql("SELECT id, lsn, value FROM graft_cdc.snap ORDER BY id").collect().toSeq
    assert(got.nonEmpty && got ==
      spark.sql("SELECT id, lsn, value FROM graft_cdc.employees WHERE id <= 20 ORDER BY id")
        .collect().toSeq)
    // the key landed in the manifest: a mismatched later commit refuses
    val ex = intercept[IllegalArgumentException] {
      FileGroups.commit(spark, root + "/snap",
        Seq((1L, 99L, "c", 0.5)).toDF("id", "lsn", "op", "value"), 1L, Seq("lsn"), Seq("id"))
    }
    assert(ex.getMessage.contains("keyed by"), ex.getMessage)
    // ...and MERGE through SQL onto the CTAS table works (same protocol)
    spark.sql(
      """MERGE INTO graft_cdc.snap t USING (SELECT 1L AS id, 1000L AS lsn, 5.5D AS v) s
        |ON t.id = s.id WHEN MATCHED THEN UPDATE SET value = s.v, lsn = s.lsn""".stripMargin)
    assert(spark.sql("SELECT value FROM graft_cdc.snap WHERE id = 1").as[Double]
      .collect().toSeq == Seq(5.5))
    // duplicate CREATE fails; IF NOT EXISTS is a no-op (state unchanged)
    val dup = intercept[Throwable] {
      spark.sql("CREATE TABLE graft_cdc.snap AS SELECT 9L AS id, 1L AS lsn")
    }
    assert(chainMsg(dup).contains("already exists"), chainMsg(dup))
    spark.sql("CREATE TABLE IF NOT EXISTS graft_cdc.snap AS SELECT 9L AS id, 1L AS lsn")
    assert(spark.sql("SELECT value FROM graft_cdc.snap WHERE id = 1").as[Double]
      .collect().toSeq == Seq(5.5))
    spark.sql("DROP TABLE graft_cdc.snap")
  }

  test("CTAS validates keys against the query output; plain CREATE TABLE stays unsupported") {
    warehouse()
    val exK = intercept[Throwable] {
      spark.sql("CREATE TABLE graft_cdc.bad TBLPROPERTIES('keys'='uuid') " +
        "AS SELECT 1L AS id, 2L AS lsn")
    }
    assert(chainMsg(exK).contains("not in the query output"), chainMsg(exK))
    val exP = intercept[Exception] {
      spark.sql("CREATE TABLE graft_cdc.t2 (id BIGINT) USING parquet")
    }
    assert(exP.getMessage.contains("first versioned commit"), exP.getMessage)
  }

  test("case-mismatched key config still casts, prunes and stats correctly (resolution parity)") {
    val root = warehouse()
    // TBLPROPERTIES names AND key-column case both differ from the
    // query output ('KEYS'='ID' vs column 'id'): the property must not
    // be silently ignored, and every index consumer (type cast, stats,
    // probe hashing) must resolve the field case-insensitively — a
    // case-sensitive find would skip the cast and hash probes into the
    // wrong buckets, silently returning 0 rows for present keys
    spark.sql(
      """CREATE TABLE graft_cdc.cased TBLPROPERTIES('KEYS'='ID', 'Ord'='lsn', 'buckets'='8')
        |AS SELECT CAST(id AS INT) AS id, lsn, op, value
        |FROM graft_cdc.employees WHERE id <= 30""".stripMargin)
    try {
      val df = spark.sql("SELECT id, lsn FROM graft_cdc.cased WHERE id = 5")
      assert(df.collect().toSeq ==
        spark.sql("SELECT id, lsn FROM graft_cdc.cased").filter($"id" === 5).collect().toSeq)
      assert(df.collect().nonEmpty, "present key must be found (wrong-type hash would lose it)")
      assert(df.queryExecution.executedPlan.treeString.contains("InMemoryFileIndex(1 paths)"))
      // the INT-typed key column got [lo,hi] stats despite the cased
      // manifest key name: a ghost probe far outside the range returns
      // empty from metadata alone
      assert(FileGroups.pointLookupTuples(spark, root + "/cased", Seq("ID"),
        Seq(Seq(99999999L))).get.count() == 0)
      val tags = FileGroups.tagKeyTuples(spark, root + "/cased", Seq("ID"),
        Seq(Seq(5L), Seq(99999999L))).get.collect()
      assert(tags.map(_.getString(1)).toSeq == Seq("update", "insert"))
    } finally spark.sql("DROP TABLE graft_cdc.cased")
  }

  test("DROP TABLE deletes a committed table; unknown names never recursively delete") {
    val root = warehouse()
    spark.sql("CREATE TABLE graft_cdc.doomed TBLPROPERTIES('keys'='id', 'ord'='lsn') " +
      "AS SELECT id, lsn, op, value FROM graft_cdc.employees WHERE id <= 5")
    assert(FileGroups.committedId(spark, root + "/doomed").isDefined)
    spark.sql("DROP TABLE graft_cdc.doomed")
    assert(FileGroups.committedId(spark, root + "/doomed").isEmpty)
    assert(!new java.io.File(root + "/doomed").exists())
    // a directory under the root that never committed is NOT a table:
    // DROP refuses (NoSuchTable), the directory survives
    new java.io.File(root + "/notatable/data").mkdirs()
    intercept[Throwable] { spark.sql("DROP TABLE graft_cdc.notatable") }
    assert(new java.io.File(root + "/notatable/data").exists())
    spark.sql("DROP TABLE IF EXISTS graft_cdc.notatable") // no-op, no error
    assert(new java.io.File(root + "/notatable/data").exists())
  }

  test("ALTER TABLE ADD COLUMNS widens the schema as a metadata commit; rejects everything else") {
    val root = warehouse()
    val t = root + "/employees"
    val headBefore = FileGroups.committedId(spark, t).get
    spark.sql("ALTER TABLE graft_cdc.employees ADD COLUMNS (tier STRING, score DOUBLE)")
    // a new METADATA-ONLY version: head advanced, same data files
    assert(FileGroups.committedId(spark, t).contains(headBefore + 1))
    // both doors see the widened schema, untouched rows null-filled
    val sql = spark.sql(
      "SELECT id, tier, score FROM graft_cdc.employees ORDER BY id").collect()
    assert(sql.nonEmpty && sql.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    val api = FileGroups.read(spark, t).get
    assert(api.columns.contains("tier") && api.columns.contains("score"))
    assert(api.filter($"tier".isNotNull || $"score".isNotNull).count() == 0)
    // data lands through the widened column; old buckets stay null
    spark.sql("UPDATE graft_cdc.employees SET tier = 'gold', lsn = lsn + 1 WHERE id = 1")
    val got = spark.sql(
      "SELECT id, tier FROM graft_cdc.employees WHERE id IN (1, 2) ORDER BY id").collect()
    assert(got.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
      == Seq((1L, "gold"), (2L, null)))
    // the widened column SURVIVES an unrelated commit that doesn't
    // carry it (the manifest-schema reconcile): id=2's bucket rewrite
    // must not narrow the table schema back
    spark.sql("UPDATE graft_cdc.employees SET value = 9.9, lsn = lsn + 1 WHERE id = 2")
    assert(spark.sql("SELECT tier FROM graft_cdc.employees WHERE id = 1")
      .head().getString(0) == "gold")
    // the Scala lookup door pads the widened columns identically, so a
    // point read's schema matches the SQL door's regardless of whether
    // the probed bucket was rewritten since the ALTER
    val lk = FileGroups.pointLookup(spark, t, Seq("id"), Seq(1L)).get
    assert(lk.columns.contains("tier") && lk.columns.contains("score"))
    assert(lk.count() >= 0)

    // rejections: duplicate column, non-nullable, nested, rename/drop
    def rejected(sql: String, needle: String): Unit = {
      val e = intercept[Throwable] { spark.sql(sql) }
      val msg = Iterator.iterate(e.asInstanceOf[Throwable])(_.getCause)
        .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(msg.contains(needle), s"$sql => $msg")
    }
    rejected("ALTER TABLE graft_cdc.employees ADD COLUMNS (tier STRING)", "already exists")
    rejected("ALTER TABLE graft_cdc.employees ADD COLUMNS (x INT NOT NULL)", "nullable")
    rejected("ALTER TABLE graft_cdc.employees ADD COLUMNS (y INT FIRST)", "FIRST/AFTER")
    rejected("ALTER TABLE graft_cdc.employees RENAME COLUMN value TO v", "not supported")
    rejected("ALTER TABLE graft_cdc.employees DROP COLUMN value", "not supported")
  }

  test("catalog root re-resolves from the live conf (no stale plugin cache)") {
    val root1 = warehouse()
    assert(spark.sql("SELECT count(*) FROM graft_cdc.employees").head.getLong(0) > 0)
    // second warehouse under the SAME catalog name: the cached plugin
    // instance must follow the conf, not the first-use snapshot
    val root2 = tmpDir("graft_fgcat_b")
    FileGroups.commit(spark, root2 + "/employees",
      Seq((1L, 10L, "c", 1.0)).toDF("id", "lsn", "op", "value"),
      0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    spark.conf.set("spark.sql.catalog.graft_cdc.root", root2)
    assert(spark.sql("SELECT count(*) FROM graft_cdc.employees").head.getLong(0) == 1L)
    spark.conf.set("spark.sql.catalog.graft_cdc.root", root1)
  }

  test("SHOW TBLPROPERTIES surfaces the pinned identity and the live retention policy") {
    val root = tmpDir("graft_fgcat_props")
    spark.conf.set("spark.sql.catalog.graft_props", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_props.root", root)
    spark.sql(
      s"""CREATE TABLE graft_props.emp
         |TBLPROPERTIES('keys'='id', 'ord'='lsn', 'buckets'='8', 'retain'='4')
         |AS SELECT user_id AS id, max(event_id) AS lsn, max(value) AS value
         |FROM parquet.`$sf/events.parquet` GROUP BY user_id""".stripMargin)
    def props(): Map[String, String] = spark.sql("SHOW TBLPROPERTIES graft_props.emp")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val p = props()
    assert(p("keys") == "id" && p("ord") == "lsn", p.toString)
    assert(p("buckets") == "8" && p("retain") == "4", p.toString)
    // 'location' is a RESERVED table property — SHOW TBLPROPERTIES
    // filters it (it shows through DESCRIBE EXTENDED instead)
    assert(p("version") == "0" && !p.contains("location"), p.toString)
    // the retention POLICY is live, not frozen at CTAS: CALL clean
    // re-sets it, and the next SHOW reflects the stored marker
    spark.sql("CALL graft_props.clean('emp', 2)")
    assert(props()("retain") == "2")
  }
}
