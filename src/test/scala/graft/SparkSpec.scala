package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate reuses one JVM-wide
  * session; warehouse pinned under target/ for the catalog tests). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    SparkSpec.cleanupAtExit(d)
    d.toString
  }
}

object SparkSpec {
  // every suite temp dir is swept when the test JVM exits — without
  // this each `sbt test` run leaks dozens of /tmp/graft_* dirs
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { f =>
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete(); ()
      }
      rm(f)
    }))
  private def cleanupAtExit(f: java.io.File): Unit = { hook; created.add(f); () }
}
