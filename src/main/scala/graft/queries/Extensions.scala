package graft.queries

/** The extension query surface: the reference's core CDC-merge semantics
  * made queryable (SURVEY.md §2.2/§2.3 `q_cdc_upsert_snapshot` — the
  * DeltaStreamer upsert, reference README.md:300-307, 348), plus the
  * LLM-training-data-pipeline operators (dedup family, similarity
  * search, text analysis, multimodal columns) over the `documents` /
  * `embeddings` tables.
  *
  * Every query here is built from codegen'd built-in expressions (no
  * UDFs) and carries a DuckDB oracle unless the semantics are genuinely
  * engine-specific (noted per query). Scale notes inline.
  */
object Extensions {
  /** The family files' concatenation — one flat registry, same names.
    * Order is cosmetic (every consumer keys or sorts by name). */
  def queries: Seq[GQuery] =
    ExtensionsCdc.queries ++ ExtensionsStream.queries ++
      ExtensionsDedup.queries ++ ExtensionsSim.queries ++
      ExtensionsText.queries ++ ExtensionsPipeline.queries
}
