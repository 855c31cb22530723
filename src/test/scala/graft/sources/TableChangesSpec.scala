package graft.sources

import graft.SparkSpec
import graft.cdc.FileGroups
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** `FROM graft_table_changes('cat.t', v1, v2)`: the SQL door on the
  * incremental change feed — value-identical to ChangeFeed.diff,
  * composable as a relation, loud on aged-out versions and bad args. */
class TableChangesSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def log() = Tables.events(spark, sf).select(
    col("user_id").as("id"), col("event_id").as("lsn"),
    when(pmod(col("event_id"), lit(11)) === 0, "d")
      .when(pmod(col("event_id"), lit(3)) === 0, "u")
      .otherwise("c").as("op"),
    col("value"))

  private def chainMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")

  private def mkTable(name: String): String = {
    val root = tmpDir("graft_tvf")
    val t = root + "/employees"
    val l = log()
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 8)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set(s"spark.sql.catalog.$name", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    t
  }

  test("SQL change feed equals ChangeFeed.diff and composes as a relation") {
    val t = mkTable("graft_tvf1")
    val sql = spark.sql(
      """SELECT id, change_op, before_lsn, after_lsn, before_value, after_value
        |FROM graft_table_changes('graft_tvf1.employees', 0, 1) ORDER BY id""".stripMargin)
      .collect().toSeq
    val want = graft.cdc.ChangeFeed.diff(
        FileGroups.readAt(spark, t, 0L).get, FileGroups.readAt(spark, t, 1L).get,
        Seq("id"), "lsn", Seq("op", "value"))
      .select($"id", $"change_op", $"before_lsn", $"after_lsn",
        $"before_value", $"after_value")
      .orderBy($"id").collect().toSeq
    assert(sql.nonEmpty && sql == want)
    // all three change kinds occur in the fixture
    assert(sql.map(_.getString(1)).toSet == Set("i", "u", "d"))
    // composes like any relation: a filtered aggregate over the feed
    val dels = spark.sql(
      """SELECT count(*) FROM graft_table_changes('graft_tvf1.employees', 0, 1)
        |WHERE change_op = 'd'""".stripMargin).head().getLong(0)
    assert(dels == want.count(_.getString(1) == "d") && dels > 0)
    // same-version diff is empty, not an error
    assert(spark.sql(
      "SELECT * FROM graft_table_changes('graft_tvf1.employees', 1, 1)").count() == 0)
  }

  test("string-keyed tables diff through the TVF (keys from the manifest header)") {
    val root = tmpDir("graft_tvf_str")
    val t = root + "/users"
    val l = log().withColumn("id", concat(lit("u"), $"id"))
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 8)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_tvfs", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tvfs.root", root)
    val sql = spark.sql(
      """SELECT id, change_op, before_lsn, after_lsn
        |FROM graft_table_changes('graft_tvfs.users', 0, 1) ORDER BY id""".stripMargin)
      .collect().toSeq
    val want = graft.cdc.ChangeFeed.diff(
        FileGroups.readAt(spark, t, 0L).get, FileGroups.readAt(spark, t, 1L).get,
        Seq("id"), "lsn", Seq("op", "value"))
      .select($"id", $"change_op", $"before_lsn", $"after_lsn")
      .orderBy($"id").collect().toSeq
    assert(sql.nonEmpty && sql == want)
    assert(sql.map(_.getString(1)).toSet == Set("i", "u", "d"))
  }

  test("aged-out versions, unknown catalogs and non-literal args fail loudly") {
    val t = mkTable("graft_tvf2")
    // a third commit ages v0 out of two-version retention
    FileGroups.commit(spark, t,
      Seq((1L, 99999L, "u", 5.0)).toDF("id", "lsn", "op", "value"), 2L,
      Seq("id"), Seq("lsn"))
    val gone = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_table_changes('graft_tvf2.employees', 0, 2)").collect()
    }
    assert(chainMsg(gone).contains("not retained") &&
      chainMsg(gone).contains("re-bootstrap"), chainMsg(gone))
    // retained prior → head still diffs
    assert(spark.sql(
      "SELECT * FROM graft_table_changes('graft_tvf2.employees', 1, 2)").count() > 0)

    val noCat = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_table_changes('no_such_cat.employees', 1, 2)").collect()
    }
    assert(chainMsg(noCat).contains("no catalog"), chainMsg(noCat))

    val badShape = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_table_changes('employees', 1, 2)").collect()
    }
    assert(chainMsg(badShape).contains("<catalog>.<table>"), chainMsg(badShape))

    val backwards = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_table_changes('graft_tvf2.employees', 2, 1)").collect()
    }
    assert(chainMsg(backwards).contains("must be <="), chainMsg(backwards))

    val nonLiteral = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_table_changes('graft_tvf2.employees', rand(), 2)").collect()
    }
    assert(chainMsg(nonLiteral).contains("literal"), chainMsg(nonLiteral))
  }
}
