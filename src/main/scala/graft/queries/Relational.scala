package graft.queries

/** The relational query surface (SURVEY.md §2.3) — the operators any
  * consumer of the reference's Glue-synced table runs (reference intent:
  * README.md:298-304 "so they can be queried"), made first-class here.
  *
  * Scale notes (100 TB design point) are in each query's comment: joins
  * that must broadcast do so explicitly; aggregations rely on Spark's
  * partial (map-side) aggregation; windows partition on high-cardinality
  * keys so no single partition degenerates; everything else is a narrow
  * scan that Catalyst collapses into one WholeStageCodegen stage with
  * parquet filter/column pushdown.
  *
  * Split into family files in round 18 (the Extensions.scala pattern)
  * purely for review ergonomics — the registry, ids and oracles are
  * unchanged; shared oracle-determinism helpers live in [[RelCommon]].
  */
object Relational {
  /** The family files' concatenation — one flat registry, same names.
    * Order is cosmetic (every consumer keys or sorts by name). */
  def queries: Seq[GQuery] =
    RelationalJoins.queries ++ RelationalTpch.queries ++
      RelationalAgg.queries ++ RelationalWindows.queries ++
      RelationalSql.queries ++ RelationalFuncs.queries
}
