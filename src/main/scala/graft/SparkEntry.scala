package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the mandated
  * LLM-pipeline extensions, §2.11) is exposed as a named query; each
  * SQL-expressible one carries equivalent DuckDB SQL in [[oracleSql]] for the
  * driver's hash-match compare (Verify.scala → CORRECTNESS_r{N}.json).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's mart shape (group-by-year conditional aggregation,
    * `/root/reference/dbt/models/marts/fct_spacex_launches_by_year.sql:3-11`)
    * over testdata orders. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q13StatusRateByYear(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Analytics.queries ++ ops.Events.queries ++
      ops.Text.queries ++ ops.Dedup.queries ++ ops.Vector.queries ++
      ops.Mixture.queries ++ ops.Graph.queries ++
      ops.Changes.queries ++ ops.Sketches.queries ++
      ops.Launches.queries ++ ops.Multimodal.queries ++ ops.Skew.queries ++
      ops.Maintenance.queries ++
      streaming.Streaming.queries ++ streaming.StatefulSessions.queries ++
      Map("q101_corpus_pipeline" -> (Pipelines.q101CorpusPipeline _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Analytics.oracles ++ ops.Events.oracles ++
      ops.Text.oracles ++ ops.Dedup.oracles ++ ops.Vector.oracles ++
      ops.Mixture.oracles ++ ops.Graph.oracles ++
      ops.Changes.oracles ++ ops.Sketches.oracles ++
      ops.Launches.oracles ++ ops.Multimodal.oracles ++ ops.Skew.oracles ++
      ops.Maintenance.oracles ++
      streaming.Streaming.oracles ++ streaming.StatefulSessions.oracles ++
      Map("q101_corpus_pipeline" -> Pipelines.q101Oracle)
}
