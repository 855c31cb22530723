// Long-retained-timeline probe for the graft-cdc streaming source
// (round 20, verdict task 7): many small versions consumed
// version-to-version — per-batch planning must stay O(1) manifest
// reads, so TOTAL consumption over V versions must scale ~linearly in
// V, never O(V^2). The loop interleaves commit -> processAllAvailable
// so every version is its own micro-batch (the continuous-deployment
// shape); commit cost per version is constant, so a quadratic
// planning term would dominate the 2x ratio.
// Run: spark-shell --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.extensions=graft.functions.GraftExtensions -I this
import org.apache.spark.sql.functions._
import graft.cdc.FileGroups

def consumeTimeline(nVersions: Int): Double = {
  val root = java.nio.file.Files.createTempDirectory("graft_incrprobe").toString
  val t = root + "/t"
  FileGroups.setRetention(spark, t, nVersions + 2)
  val base = spark.range(0, 2000).select(col("id"), lit(0L).as("lsn"),
    lit("c").as("op"), rand(7).as("value"))
  FileGroups.commit(spark, t, base, 0L, Seq("id"), Seq("lsn"), nBuckets = 8)
  val landed = new java.util.concurrent.atomic.AtomicLong
  val q = spark.readStream.format("graft-cdc").option("startingVersion", 0).load(t)
    .writeStream.option("checkpointLocation", root + "/ckpt")
    .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
      landed.addAndGet(b.count()); ()
    }
    .start()
  val t0 = System.nanoTime()
  try {
    (1 to nVersions).foreach { v =>
      val b = spark.range(v.toLong * 8, v.toLong * 8 + 8).select(col("id"),
        lit(v.toLong * 1000).as("lsn"), lit("u").as("op"), rand(v).as("value"))
      FileGroups.commit(spark, t, b, v.toLong, Seq("id"), Seq("lsn"))
      q.processAllAvailable()
    }
  } finally q.stop()
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"INCR_STREAM_PROBE versions=$nVersions landed=${landed.get} total=$sec%.2f s per-batch=${sec / nVersions}%.3f s")
  sec
}

consumeTimeline(6) // warm-up: JIT + stream machinery, not recorded
val a = consumeTimeline(24)
val b = consumeTimeline(48)
println(f"INCR_STREAM_PROBE ratio(48/24)=${b / a}%.2f (linear ~2.0, quadratic ~4.0)")
System.exit(0)
