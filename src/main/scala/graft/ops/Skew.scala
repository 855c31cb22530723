package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has heavy hitters.
  *
  * AQE's skew-join split (on by default in Spark 4) handles most cases
  * at runtime; explicit salting remains the tool when one key is SO hot
  * that even a split partition's build side won't fit, or when AQE is
  * unavailable (streaming micro-batches). Technique: the skewed (large)
  * side scatters each row into one of `salt` sub-keys; the small side
  * replicates each row to ALL `salt` sub-keys; the join key becomes
  * (key, salt) — the hot key's work spreads over `salt` reducers.
  */
object Skew {

  /** Inner equi-join of `large` (skewed) with `small` on `key`,
    * salt-scattered `salt` ways. Row multiplicity identical to the
    * plain join; cost: `small` is replicated ×salt (choose the side
    * accordingly). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    // deterministic scatter (hash of the whole row modulo salt) — a
    // random salt would break replay idempotence in streaming batches
    val scattered = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salt)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<bigint>")))
    scattered.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
