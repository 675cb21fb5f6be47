package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator (one entry per
  * SURVEY.md §2 line); `oracleSql` holds the DuckDB-equivalent ANSI SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed curation pipeline (exact dedup → quality gates →
    * temperature resample → corpus stats): the engine's reason to exist
    * in one plan, exercising scan+filter fusion, a hash-window dedup,
    * broadcast-back aggregates, and the final stats aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_curation_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.TimeWindows.queries ++ ops.IngestOps.queries ++
      ops.Text.queries ++ ops.Vectors.queries ++ ops.Multimodal.queries ++
      ops.Physical.queries ++ ops.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (⊘ queries in SURVEY.md §2).
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++ ops.TimeWindows.oracleSql ++ ops.IngestOps.oracleSql ++
      ops.Text.oracleSql ++ ops.Vectors.oracleSql ++ ops.Multimodal.oracleSql ++
      ops.Physical.oracleSql ++ ops.Curation.oracleSql
}
