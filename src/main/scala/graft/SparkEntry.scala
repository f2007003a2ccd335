package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module inventories; EVERY query
  * has a DuckDB oracle twin in `oracleSql` with byte-identical column
  * aliases (the driver's compare sorts columns by name before
  * hashing) — zero rows-only residue since the hash-seeded families
  * (MinHash, SimHash, sign-LSH ANN, the rolling-hash fingerprint)
  * gained exact twins that replay the engine's integer hash algebra
  * in HUGEINT SQL (r11–r13; `TextHashes.fnvFoldSql` is the shared
  * fold). The driver's gate is rows + schema + hash per query.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): the EP2 max-pursuit-params slice —
    * scan → boundary aggs (W1/W2) → join back → range max (A7/W3) —
    * over `events` at sf0.001. Mirrors optimal_pursuit.py:193-259. */
  def entry(spark: SparkSession): DataFrame =
    queries("ep2_range_max")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.Materialized.queries ++
      ops.Snapshot.queries ++
      ops.Events.queries ++
      ops.Graph.queries ++
      ops.Layout.queries ++
      ops.Skew.queries ++
      ops.Sketches.queries ++
      ops.Quality.queries ++
      pipelines.Report.queries ++
      pipelines.NflQueries.queries ++
      pipelines.Animate.queries ++
      llm.TextOps.queries ++
      llm.Bpe.queries ++
      llm.Dedup.queries ++
      llm.Similarity.queries ++
      llm.Multimodal.queries ++
      llm.Curate.queries ++
      llm.Classifier.queries ++
      llm.Kmeans.queries ++
      llm.Unigram.queries ++
      streaming.StreamQueries.queries ++
      io.IoQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++
      ops.Materialized.oracle ++
      ops.Snapshot.oracle ++
      ops.Events.oracle ++
      ops.Graph.oracle ++
      ops.Layout.oracle ++
      ops.Skew.oracle ++
      ops.Sketches.oracle ++
      ops.Quality.oracle ++
      pipelines.Report.oracle ++
      pipelines.NflQueries.oracle ++
      pipelines.Animate.oracle ++
      llm.TextOps.oracle ++
      llm.Bpe.oracle ++
      llm.Dedup.oracle ++
      llm.Similarity.oracle ++
      llm.Multimodal.oracle ++
      llm.Curate.oracle ++
      llm.Classifier.oracle ++
      llm.Kmeans.oracle ++
      llm.Unigram.oracle ++
      streaming.StreamQueries.oracle ++
      io.IoQueries.oracle
}
