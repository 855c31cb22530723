package graft.cdc

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck upsert-algebra properties (SURVEY.md §5.4) over generated
  * CDC op logs. Spark-backed, so the case count is capped — each case
  * builds DataFrames and runs three merges.
  */
object CdcMergeProps extends Properties("CdcMerge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private val genOps: Gen[List[(Int, String, Int)]] =
    Gen.listOfN(30, for {
      id <- Gen.choose(1, 8)
      op <- Gen.oneOf("c", "u", "d")
      v <- Gen.choose(0, 999)
    } yield (id, op, v))

  // id 0 stands in for NULL (mapped below): a malformed event whose
  // image lost its key. Pruning must treat these like any other key —
  // upsertPruned's semi/anti joins never match NULLs, so without the
  // null-route they'd duplicate and never delete.
  private val genOpsWithNulls: Gen[List[(Int, String, Int)]] =
    Gen.listOfN(30, for {
      id <- Gen.choose(0, 4)
      op <- Gen.oneOf("c", "u", "d")
      v <- Gen.choose(0, 999)
    } yield (id, op, v))

  private def df(ops: List[(Int, String, Int)], lsn0: Long) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    ops.zipWithIndex.map { case ((id, op, v), i) => (id, lsn0 + i, op, v) }
      .toDF("id", "lsn", "op", "salary")
      .withColumn("id", when(col("id") === 0, null).otherwise(col("id")).cast("int"))
  }

  private def canon(d: org.apache.spark.sql.DataFrame): Seq[(Option[Int], Long, String, Int)] = {
    import spark.implicits._
    d.select("id", "lsn", "op", "salary").as[(Option[Int], Long, String, Int)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
  }

  property("idempotence: merge(merge(S,B),B) == merge(S,B)") =
    forAll(genOps, genOps) { (a, b) =>
      val s0 = CdcMerge.snapshot(df(a, 0), Seq("id"), Seq("lsn"))
      val batch = df(b, 1000)
      val once = CdcMerge.upsert(s0, batch, Seq("id"), Seq("lsn"))
      canon(CdcMerge.upsert(once, batch, Seq("id"), Seq("lsn"))) == canon(once)
    }

  property("incremental == one-shot collapse") =
    forAll(genOps, genOps) { (a, b) =>
      val oneShot = CdcMerge.snapshot(df(a, 0).unionByName(df(b, 1000)), Seq("id"), Seq("lsn"))
      val incr = CdcMerge.upsert(
        CdcMerge.snapshot(df(a, 0), Seq("id"), Seq("lsn")), df(b, 1000), Seq("id"), Seq("lsn"))
      canon(oneShot) == canon(incr)
    }

  property("pruned == full upsert") =
    forAll(genOps, genOps) { (a, b) =>
      val s0 = CdcMerge.snapshot(df(a, 0), Seq("id"), Seq("lsn"))
      val batch = df(b, 1000)
      canon(CdcMerge.upsertPruned(s0, batch, Seq("id"), Seq("lsn"))) ==
        canon(CdcMerge.upsert(s0, batch, Seq("id"), Seq("lsn")))
    }

  property("pruned == full upsert under NULL merge keys") =
    forAll(genOpsWithNulls, genOpsWithNulls) { (a, b) =>
      val s0 = CdcMerge.snapshot(df(a, 0), Seq("id"), Seq("lsn"))
      val batch = df(b, 1000)
      canon(CdcMerge.upsertPruned(s0, batch, Seq("id"), Seq("lsn"))) ==
        canon(CdcMerge.upsert(s0, batch, Seq("id"), Seq("lsn")))
    }

  property("snapshot never contains a delete row and is key-unique") =
    forAll(genOps) { a =>
      val s = CdcMerge.snapshot(df(a, 0), Seq("id"), Seq("lsn"))
      val rows = canon(s)
      rows.forall(_._3 != "d") && rows.map(_._1).distinct.size == rows.size
    }
}
