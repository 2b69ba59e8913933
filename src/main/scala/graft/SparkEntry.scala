package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Core, Extra, Patterns}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's registry; each key has a DuckDB
  * oracle twin in `oracleSql` unless the operator is not SQL-expressible
  * (hash-dependent sketches, approximate ops), in which case the driver
  * records a rows-only check.
  */
object SparkEntry {
  /** Flagship query (SURVEY §7.3) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ Extra.queries ++ Patterns.queries ++
      graft.queries.Analytics.queries ++
      graft.ops.Clustering.queries ++
      graft.ops.Packing.queries ++
      graft.ops.Sketches.queries ++
      graft.ops.Sampling.queries ++
      graft.ops.Scale.queries ++
      graft.ops.RangeJoin.queries ++
      graft.ops.Quality.queries ++
      graft.ops.Diff.queries ++
      graft.ops.Incremental.queries ++
      graft.pipeline.Curation.queries ++
      graft.sources.Fasta.queries ++
      graft.text.Text.queries ++
      graft.text.Bm25.queries ++
      graft.text.BpeTrain.queries ++
      graft.dedup.Dedup.queries ++
      graft.similarity.Similarity.queries ++
      graft.similarity.Pq.queries ++
      graft.similarity.IvfPq.queries ++
      graft.multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Core.oracles ++ Extra.oracles ++ Patterns.oracles ++
      graft.queries.Analytics.oracles ++
      graft.ops.Clustering.oracles ++
      graft.ops.Packing.oracles ++
      graft.ops.Sketches.oracles ++
      graft.ops.Sampling.oracles ++
      graft.ops.Scale.oracles ++
      graft.ops.RangeJoin.oracles ++
      graft.ops.Quality.oracles ++
      graft.ops.Diff.oracles ++
      graft.ops.Incremental.oracles ++
      graft.pipeline.Curation.oracles ++
      graft.sources.Fasta.oracles ++
      graft.text.Text.oracles ++
      graft.text.Bm25.oracles ++
      graft.text.BpeTrain.oracles ++
      graft.dedup.Dedup.oracles ++
      graft.similarity.Similarity.oracles ++
      graft.similarity.Pq.oracles ++
      graft.similarity.IvfPq.oracles ++
      graft.multimodal.Multimodal.oracles
}
