package graft.sources

import graft.SparkSpec
import graft.cdc.{FileGroups, Savepoints}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** SQL maintenance procedures on the file-group catalog (`CALL` —
  * Spark 4 DSv2 procedures): each is a thin binding over the existing
  * crash-safe Scala service, so these tests pin (a) the SQL results
  * against the Scala APIs and (b) the SQL-reachable guard rails
  * (savepoint-blocks-rollback, purge history removal, loud errors). */
class FileGroupProceduresSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val cat = "graft_proc"

  private def log() = Tables.events(spark, sf).select(
    col("user_id").as("id"), col("event_id").as("lsn"),
    when(pmod(col("event_id"), lit(11)) === 0, "d")
      .when(pmod(col("event_id"), lit(3)) === 0, "u")
      .otherwise("c").as("op"),
    col("value"))

  /** Fresh warehouse with one 2-commit table; registers the catalog. */
  private def warehouse(): String = {
    val root = tmpDir("graft_fgproc")
    val t = root + "/employees"
    val l = log()
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 16)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    root
  }

  test("show_commits lists the retained timeline with savepoint pins and manifest stats") {
    val root = warehouse()
    val t = root + "/employees"
    Savepoints.savepoint(spark, t, 0L)
    val rows = spark.sql(s"CALL $cat.show_commits(table => 'employees')")
      .select($"version", $"savepointed", $"file_groups", $"num_rows")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getLong(3))).toSeq
    assert(rows.map(_._1) == Seq(0L, 1L))
    assert(rows.map(_._2) == Seq(true, false))
    // num_rows comes from manifest metadata; it must equal the data
    assert(rows.last._4 == FileGroups.read(spark, t).get.count())
    assert(rows.head._4 == FileGroups.readAt(spark, t, 0L).get.count())
    assert(rows.forall(_._3 > 0))
    // commit instants present and non-decreasing
    val at = spark.sql(s"CALL $cat.show_commits('employees')")
      .select($"committed_at").as[java.sql.Timestamp].collect().toSeq
    assert(at.forall(_ != null) && at == at.sortBy(_.getTime))
  }

  test("create_savepoint pins through SQL: rollback refuses until release_savepoint") {
    val root = warehouse()
    val t = root + "/employees"
    assert(spark.sql(s"CALL $cat.create_savepoint('employees', 1)")
      .head.getBoolean(1))
    // pinned above the target → the rollback must refuse loudly
    val ex = intercept[Exception] {
      spark.sql(s"CALL $cat.rollback(table => 'employees', version => 0)")
    }
    assert(ex.getMessage.contains("savepointed"), ex.getMessage)
    assert(FileGroups.committedId(spark, t).contains(1L)) // untouched
    // release the pin (applied=true: it existed), then the rollback lands
    assert(spark.sql(s"CALL $cat.release_savepoint('employees', 1)").head.getBoolean(1))
    val removed = spark.sql(s"CALL $cat.rollback('employees', 0)")
      .as[Long].collect().toSeq
    assert(removed == Seq(1L))
    assert(FileGroups.committedId(spark, t).contains(0L))
    // the restored SQL read equals the Scala v0 read
    assert(spark.sql(s"SELECT count(*) FROM $cat.employees").head.getLong(0) ==
      FileGroups.readAt(spark, t, 0L).get.count())
  }

  test("savepointing an unretained version applies nothing; rollback to one is an error") {
    warehouse()
    assert(!spark.sql(s"CALL $cat.create_savepoint('employees', 9)").head.getBoolean(1))
    val ex = intercept[Exception] { spark.sql(s"CALL $cat.rollback('employees', 9)") }
    assert(ex.getMessage.contains("not retained"), ex.getMessage)
  }

  test("show_file_groups lists the physical layout with key stats and bloom presence") {
    val root = warehouse()
    val t = root + "/employees"
    val rows = spark.sql(s"CALL $cat.show_file_groups(table => 'employees')")
      .as[(Long, String, Long, Option[Long], Option[Long], Boolean)].collect().toSeq
    assert(rows.nonEmpty && rows.map(_._1) == rows.map(_._1).sorted)
    // totals agree with show_commits' manifest stats for the head
    val head = spark.sql(s"CALL $cat.show_commits('employees')")
      .orderBy($"version".desc).head()
    assert(rows.map(_._3).sum == head.getAs[Long]("num_rows"))
    assert(rows.size == head.getAs[Int]("file_groups"))
    // single-integer-key table: every group carries [lo,hi] stats and a
    // bloom, lo <= hi, and each path is a real directory of the table
    rows.foreach { case (_, rel, n, lo, hi, bloom) =>
      assert(n > 0 && bloom && lo.isDefined && hi.isDefined && lo.get <= hi.get)
      assert(new java.io.File(s"$t/$rel").isDirectory, rel)
    }
    // explicit version arity resolves a retained version; unknown fails
    val v0 = spark.sql(s"CALL $cat.show_file_groups('employees', 0)")
      .as[(Long, String, Long, Option[Long], Option[Long], Boolean)].collect().toSeq
    assert(v0.nonEmpty && v0.forall(_._2.startsWith("files/v0/")))
    val ex = intercept[Exception] {
      spark.sql(s"CALL $cat.show_file_groups('employees', 9)").collect()
    }
    assert(ex.getMessage.contains("not retained"), ex.getMessage)
  }

  test("purge_keys through SQL purges a STRING-keyed table (one signature, any key type)") {
    val root = tmpDir("graft_fgproc_str")
    val t = root + "/users"
    val l = log().withColumn("id", concat(lit("u"), $"id"))
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 8)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val victim = spark.sql(s"SELECT min(id) FROM $cat.users").as[String].head()
    val buckets = spark.sql(
      s"CALL $cat.purge_keys(table => 'users', keys => array('$victim'))")
      .as[Long].collect().toSeq
    assert(buckets.nonEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $cat.users WHERE id = '$victim'")
      .head.getLong(0) == 0L)
    // history forgotten — only the purge commit remains
    assert(graft.cdc.Ingest.snapshotVersions(spark, t) == Seq(2L))
  }

  test("purge_keys through SQL removes the keys from the current state AND retained history") {
    val root = warehouse()
    val t = root + "/employees"
    val victims = spark.sql(s"SELECT DISTINCT id FROM $cat.employees ORDER BY id LIMIT 3")
      .as[Long].collect().toSeq
    val buckets = spark.sql(
      s"CALL $cat.purge_keys(table => 'employees', keys => array(${victims.mkString(", ")}))")
      .as[Long].collect().toSeq
    assert(buckets.nonEmpty && buckets == buckets.sorted)
    // gone from the current snapshot (SQL read)...
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.employees WHERE id IN (${victims.mkString(", ")})")
      .head.getLong(0) == 0L)
    // ...and history is forgotten: only the purge commit remains, so no
    // retained version can resurrect the keys
    val retained = spark.sql(s"CALL $cat.show_commits('employees')")
      .select($"version").as[Long].collect().toSeq
    assert(retained == Seq(2L), retained.toString)
    assert(FileGroups.pendingPurge(spark, t).isEmpty) // intent marker retired
  }

  test("procedures resolve in the system namespace too, and SHOW PROCEDURES lists them") {
    warehouse()
    assert(spark.sql(s"CALL $cat.system.show_commits('employees')").count() == 2)
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat")
      .select($"procedure_name").as[String].collect().toSet
    assert(listed == FileGroupProcedures.Names.toSet, listed.toString)
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.purge_keys")
      .as[String].collect().mkString("\n")
    assert(desc.contains("purge_keys") && desc.contains("retained history"), desc)
  }

  test("unknown procedures and unknown tables fail loudly") {
    warehouse()
    val e1 = intercept[Exception] { spark.sql(s"CALL $cat.frobnicate('employees')") }
    assert(e1.getMessage.contains("frobnicate"), e1.getMessage)
    val e2 = intercept[Exception] { spark.sql(s"CALL $cat.show_commits('nope')") }
    assert(e2.getMessage.contains("no committed file-group table"), e2.getMessage)
  }

  test("clean: CTAS retain property widens the SQL-reachable history; CALL clean shrinks and reclaims") {
    val root = tmpDir("graft_fgclean_sql")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(
      s"""CREATE TABLE $cat.emp TBLPROPERTIES('keys'='id', 'ord'='lsn', 'retain'='4')
         |AS SELECT user_id AS id, max(event_id) AS lsn, max(value) AS value
         |FROM parquet.`$sf/events.parquet` GROUP BY user_id""".stripMargin)
    (1 to 3).foreach { i =>
      spark.sql(s"UPDATE $cat.emp SET value = value + $i.0 WHERE id % 7 = $i")
    }
    // default retention would keep {2,3}; the property keeps the last 4
    val versions = spark.sql(s"CALL $cat.show_commits('emp')")
      .select($"version").as[Long].collect().toSeq
    assert(versions == Seq(0L, 1L, 2L, 3L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.emp VERSION AS OF 0").as[Long].head() > 0)
    // shrink to the minimum: v0 and v1 reclaim, reported as rows
    val reclaimed = spark.sql(s"CALL $cat.clean('emp', 2)")
      .select($"reclaimed_version").as[Long].collect().toSeq
    assert(reclaimed == Seq(0L, 1L))
    assert(spark.sql(s"CALL $cat.show_commits('emp')")
      .select($"version").as[Long].collect().toSeq == Seq(2L, 3L))
    val gone = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM $cat.emp VERSION AS OF 0").collect()
    }
    assert(gone.getMessage.toLowerCase.contains("version"), gone.getMessage)
    // a policy-keeping re-run reclaims nothing; bad windows fail loudly
    assert(spark.sql(s"CALL $cat.clean('emp')").count() == 0)
    val low = intercept[Exception] { spark.sql(s"CALL $cat.clean('emp', 1)").collect() }
    assert(low.getMessage.contains("retain"), low.getMessage)
    val wrap = intercept[Exception] {
      spark.sql(s"CALL $cat.clean('emp', ${(1L << 32) + 5L})").collect()
    }
    assert(wrap.getMessage.contains("between 2 and"), wrap.getMessage)
    // a typo'd retention property is rejected at the statement
    val typo = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.emp2 TBLPROPERTIES('keys'='id', 'ord'='lsn', " +
        s"'retain'='1') AS SELECT 1L AS id, 1L AS lsn")
    }
    assert(typo.getMessage.contains("retain"), typo.getMessage)
  }

  test("run_compaction folds a MOR table's pending logs exactly like the Scala door") {
    val root = tmpDir("graft_fgproc_mor")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/sensors"
    val l = log()
    graft.cdc.MergeOnRead.logAppend(spark, dir, l.filter($"lsn" < 400), 0L)
    graft.cdc.MergeOnRead.logAppend(spark, dir, l.filter($"lsn" >= 400), 1L)
    // the pre-compaction merged view is the oracle the fold must equal
    val expected = graft.cdc.MergeOnRead.readMerged(spark, dir, Seq("id"), Seq("lsn")).get
      .select($"id", $"lsn", $"value").orderBy($"id").collect().toSeq

    // defaults come from the catalog conf (keys=id, ord=lsn)
    val out = spark.sql(s"CALL $cat.run_compaction('sensors')").collect().toSeq
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))) == Seq((1L, true)), out.toString)
    assert(graft.cdc.MergeOnRead.deltaIds(spark, dir).isEmpty, "logs must be consumed")
    val folded = spark.read.parquet(s"$dir/v1")
      .select($"id", $"lsn", $"value").orderBy($"id").collect().toSeq
    assert(folded == expected)

    // nothing pending: applied=false, version NULL
    val noop = spark.sql(s"CALL $cat.run_compaction('sensors')").collect().toSeq
    assert(noop.map(r => (r.isNullAt(0), r.getBoolean(1))) == Seq((true, false)))

    // explicit column arguments override the conf (named-arg form)
    graft.cdc.MergeOnRead.logAppend(spark, dir, l.filter($"lsn" < 100), 2L)
    val again = spark.sql(
      s"CALL $cat.run_compaction(table => 'sensors', record_keys => 'id', ord => 'lsn')")
      .collect().toSeq
    assert(again.map(r => (r.getLong(0), r.getBoolean(1))) == Seq((2L, true)))

    // unknown table fails loudly (a never-written MOR dir has neither
    // a base nor pending deltas)
    val unknown = intercept[Exception] { spark.sql(s"CALL $cat.run_compaction('nope')") }
    assert(unknown.getMessage.contains("no MOR table"), unknown.getMessage)
  }

  test("run_clustering rewrites the base range-sorted; file-group tables refuse both services") {
    val root = tmpDir("graft_fgproc_cluster")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/sensors"
    val l = log()
    graft.cdc.MergeOnRead.logAppend(spark, dir, l, 0L)
    spark.sql(s"CALL $cat.run_compaction('sensors')")
    val before = spark.read.parquet(s"$dir/v0")
      .select($"id", $"lsn", $"value").orderBy($"id").collect().toSeq

    val out = spark.sql(s"CALL $cat.run_clustering('sensors', 'id', 4)").collect().toSeq
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))) == Seq((0L, true)), out.toString)
    // the REPLACE copy is the resolved base now, contents identical
    assert(graft.cdc.Clustering.baseDir(spark, dir).contains(s"$dir/c0"))
    val after = spark.read.parquet(s"$dir/c0")
      .select($"id", $"lsn", $"value").orderBy($"id").collect().toSeq
    assert(after == before)
    // ...and the clustered copy is range-disjoint on the sort key: the
    // per-file [min,max] id intervals must not overlap
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/c0"))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).toSeq
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select($"id").as[Long].collect()
      (ids.min, ids.max)
    }.sortBy(_._1)
    assert(ranges.size > 1 && ranges.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi <= lo
      case _ => true
    }, ranges.toString)

    // already clustered: applied=false, version NULL
    val noop = spark.sql(s"CALL $cat.run_clustering('sensors', 'id')").collect().toSeq
    assert(noop.map(r => (r.isNullAt(0), r.getBoolean(1))) == Seq((true, false)))

    // validation: empty sort list and absurd file counts fail loudly
    val noCols = intercept[Exception] {
      spark.sql(s"CALL $cat.run_clustering('sensors', ' , ')").collect()
    }
    assert(noCols.getMessage.contains("sort_by"), noCols.getMessage)
    val badFiles = intercept[Exception] {
      spark.sql(s"CALL $cat.run_clustering('sensors', 'id', 0)").collect()
    }
    assert(badFiles.getMessage.contains("files"), badFiles.getMessage)

    // a FILE-GROUP table refuses both services with the layout pointer
    FileGroups.commit(spark, s"$root/employees", l, 0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    val fgCompact = intercept[Exception] {
      spark.sql(s"CALL $cat.run_compaction('employees')").collect()
    }
    assert(fgCompact.getMessage.contains("FILE-GROUP"), fgCompact.getMessage)
    val fgCluster = intercept[Exception] {
      spark.sql(s"CALL $cat.run_clustering('employees', 'id')").collect()
    }
    assert(fgCluster.getMessage.contains("FILE-GROUP"), fgCluster.getMessage)
  }
}
