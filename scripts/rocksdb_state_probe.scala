// RocksDB state-store probe: run the sessionize stream (the
// unbounded-key stateful case) over sf0.1 events at 1x and at 10x KEY
// CARDINALITY (10 shifted user_id copies — 10x open sessions, the
// dimension state actually scales with), both on the RocksDB provider,
// and report the checkpoint state-dir bytes. Evidence for SCALE.md.
// Run: spark-shell --driver-class-path target/scala-2.13/classes \
//        -I scripts/rocksdb_state_probe.scala
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.tables.Tables

def dirBytes(p: String): Long = {
  val root = Paths.get(p)
  if (!Files.exists(root)) 0L
  else Files.walk(root).filter(Files.isRegularFile(_))
    .mapToLong(f => Files.size(f)).sum()
}

def runOnce(tag: String, copies: Int): (Long, Long) = {
  val root = Files.createTempDirectory(s"graft_rocks_$tag").toString
  val ev0 = Tables.events(spark, "/root/testdata/sf0.1")
    .select(col("user_id"), col("ts"), col("value"))
  val ev = (0 until copies).map(i =>
      ev0.withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L)))
    .reduce(_ unionAll _)
  val src = root + "/src"
  ev.coalesce(2).write.mode("append").parquet(src)
  val mx = ev0.agg(max(col("ts"))).collect()(0).getTimestamp(0)
  graft.streaming.Streams.withRocksDbState(spark) {
    val q = graft.streaming.Streams.sessionize(
        spark.readStream.schema(ev.schema).parquet(src), gapMs = 1800000L)
      .toDF()
      .writeStream.format("parquet")
      .option("path", root + "/out")
      .option("checkpointLocation", root + "/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }
  val state = dirBytes(root + "/ckpt/state")
  val rows = spark.read.parquet(root + "/out").count()
  (state, rows)
}

val (s1, r1) = runOnce("1x", 1)
val (s10, r10) = runOnce("10x", 10)
println(f"| sessionize state (RocksDB) | 1x keys: ${s1 / 1024}%d KiB ($r1%d sessions) | 10x keys: ${s10 / 1024}%d KiB ($r10%d sessions) | ratio ${s10.toDouble / s1}%.1f |")
System.exit(0)
