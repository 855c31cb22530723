package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct, exactly like a
  * production training-data lake (parquet stores the bytes inline or as
  * references; Spark never interprets them until a decode stage).
  *
  * The decode itself is STUBBED — this container has no image/audio
  * codecs — behind [[decodeStub]], a deterministic fake that derives
  * "features" from the bytes. Everything around it is the real Spark
  * plumbing: schema, partition-preserving `mapPartitions` with iterator
  * batching (the JVM analog of `mapInPandas`: decode amortized per batch,
  * constant memory, no driver collect), and expression-based feature
  * columns for the cheap paths.
  */
object Multimodal {

  /** Typed metadata carried beside the payload bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Deterministic synthetic payload bytes from a seed column — a
    * 16-byte stand-in for real media content. */
  def syntheticContent(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(md5(seed))

  /** Attach a multimodal record column: content bytes + typed metadata
    * derived deterministically from the doc. */
  def attach(docs: DataFrame): DataFrame =
    docs
      .withColumn("content", syntheticContent(col("text")))
      .withColumn("meta", struct(
        lit("image").as("kind"),
        (pmod(xxhash64(col("text")), lit(1024)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(1024)) + 64).cast("int").as("height"),
        lit(0).cast("int").as("sample_rate")))

  /** ??? in spirit: the real decoder would go here (JPEG/PNG/WAV …).
    * Deterministic fake: "decodes" bytes into a fixed-length feature
    * vector by averaging byte windows. Keeps the exact batch shape a real
    * decoder would have: Array[Byte] in, Array[Float] out. */
  def decodeStub(content: Array[Byte], dims: Int = 4): Array[Float] = {
    val window = math.max(1, content.length / dims)
    Array.tabulate(dims) { d =>
      val slice = content.slice(d * window, math.min((d + 1) * window, content.length))
      if (slice.isEmpty) 0f else slice.map(b => (b & 0xff).toFloat).sum / slice.length
    }
  }

  /** Batch decode via partition-preserving mapPartitions: one decoder
    * instance per partition, streaming through rows — the scale-correct
    * shape (no per-row setup, no collect, memory bounded by one row). */
  def decodeFeatures(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // per-partition decoder setup would happen here (stubbed)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeStub(bytes))
      }
    }(enc)
  }

  /** Resize: rewrite the metadata to the target dimensions and derive
    * the "resized" payload deterministically (truncate/extend the byte
    * stand-in to the implied size). A real decoder would resample
    * pixels here; the Spark-side shape — narrow map, meta struct
    * rewritten in place, payload column replaced — is exactly what a
    * production resize stage looks like. */
  def resizeStub(df: DataFrame, width: Int, height: Int,
                 contentCol: String = "content", metaCol: String = "meta"): DataFrame =
    df.withColumn(metaCol, struct(
        col(s"$metaCol.kind").as("kind"),
        lit(width).cast(IntegerType).as("width"),
        lit(height).cast(IntegerType).as("height"),
        col(s"$metaCol.sample_rate").as("sample_rate")))
      // stand-in resample: truncate the byte digest toward the implied
      // size (a real decoder would resample pixels; the column shape —
      // payload replaced in the same row — is what matters here)
      .withColumn(contentCol,
        expr(s"substring($contentCol, 1, least(octet_length($contentCol), ${math.max(1, width * height / 4096)}))"))

  /** Frame sampling: explode the payload into fixed-size chunks ("frames")
    * with an index — pure expressions, stays in codegen. */
  def frameSample(df: DataFrame, contentCol: String = "content", frameBytes: Int = 4): DataFrame =
    df.withColumn("frame_idx",
        // `div` (integer division): Column `/` yields DOUBLE, which
        // sequence() rejects (requires integral bounds).
        explode(sequence(lit(0), expr(s"(length($contentCol) - 1) div $frameBytes"))))
      .withColumn("frame",
        expr(s"substring($contentCol, frame_idx * $frameBytes + 1, $frameBytes)"))
}
