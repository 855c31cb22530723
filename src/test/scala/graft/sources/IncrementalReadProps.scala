package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.cdc.{ChangeFeed, FileGroups}

/** ScalaCheck equivalence for the `startingVersion` read option over
  * GENERATED two-commit histories: for any op logs A then B (global
  * monotone lsn — the documented correctness assumption), the
  * option's post-image rows must equal the TVF-layer diff's
  * insert/update images AND the ord-threshold definition ("head rows
  * whose lsn exceeds version A's surviving maximum"). Spark-backed +
  * on-disk tables per case, so the case count is capped. */
object IncrementalReadProps extends Properties("IncrementalRead") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private val genOps: Gen[List[(Int, String, Int)]] =
    Gen.listOfN(25, for {
      id <- Gen.choose(1, 8)
      op <- Gen.oneOf("c", "u", "d")
      v <- Gen.choose(0, 999)
    } yield (id, op, v))

  private def df(ops: List[(Int, String, Int)], lsn0: Long) = {
    import spark.implicits._
    ops.zipWithIndex.map { case ((id, op, v), i) => (id.toLong, lsn0 + i, op, v) }
      .toDF("id", "lsn", "op", "salary")
  }

  private val n = new AtomicInteger

  property("startingVersion == diff upserts == ord-threshold cut") =
    forAll(genOps, genOps) { (a, b) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val i = n.incrementAndGet()
      val root = java.nio.file.Files.createTempDirectory(s"graft_irp_$i").toString
      val t = s"$root/employees"
      FileGroups.commit(spark, t, df(a, 0), 0L, Seq("id"), Seq("lsn"), nBuckets = 4)
      FileGroups.commit(spark, t, df(b, 1000), 1L, Seq("id"), Seq("lsn"))
      val cat = s"graft_irp_$i"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[FileGroupCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)

      def canon(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
        d.select(col("id"), col("lsn"), col("salary")).as[(Long, Long, Int)]
          .collect().sortBy(r => (r._1, r._2)).toSeq

      val got = canon(spark.read.option("startingVersion", 0).table(s"$cat.employees"))

      val v0 = FileGroups.readAt(spark, t, 0L).get
      val v1 = FileGroups.readAt(spark, t, 1L).get
      val viaDiff = canon(ChangeFeed.diff(v0, v1, Seq("id"), "lsn", Seq("op", "salary"))
        .filter(col("change_op").isin("i", "u"))
        .select(col("id"), col("after_lsn").as("lsn"), col("after_salary").as("salary")))
      val threshold = v0.agg(org.apache.spark.sql.functions.max(col("lsn")))
        .as[Option[Long]].head().getOrElse(Long.MinValue)
      val viaThreshold = canon(v1.filter(col("lsn") > threshold))

      got == viaDiff && got == viaThreshold
    }
}
