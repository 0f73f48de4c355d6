package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the module registries under `graft.queries`;
  * each entry takes (session, sfDir) and returns a deterministic, fully
  * ordered DataFrame. `oracleSql` carries the DuckDB-equivalent SQL for
  * every query whose semantics are ANSI-SQL-expressible; the rest
  * (LSH-family dedup/ANN, hash fingerprints) are covered by seeded
  * determinism tests in ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the greedy mRMR selection (the reference's core capability,
    * SURVEY.md §2 O1/O3/O6) end-to-end on the discretized lineitem matrix.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ifs_select_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.IfsQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EmbeddingQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.SourceQueries.queries ++
      graft.queries.TemporalQueries.queries ++
      graft.queries.UserQueries.queries ++
      graft.queries.StatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.IfsQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.EmbeddingQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.SourceQueries.oracles ++
      graft.queries.TemporalQueries.oracles ++
      graft.queries.UserQueries.oracles ++
      graft.queries.StatQueries.oracles
}
