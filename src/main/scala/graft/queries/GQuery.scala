package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's declared surface (SURVEY.md §2.3).
  *
  * @param name   stable id, becomes the `SparkEntry.queries` key
  * @param fn     Spark-native implementation `(session, sfDir) => DataFrame`
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None → driver records a weaker rows-only check
  *               (used only where DuckDB genuinely can't express the op,
  *               e.g. approx sketches with engine-specific hashing).
  *
  * Determinism contract (FIXTURES.md): total ORDER BY with tie-breakers on
  * both sides; float aggregates go through exact DECIMAL(18,4) sums and are
  * only converted to double (+ round 4) at the very end, so Spark's and
  * DuckDB's different summation orders cannot diverge.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  /** Everything the engine declares, in one place. */
  def all: Seq[GQuery] = Relational.queries ++ Extensions.queries
}
