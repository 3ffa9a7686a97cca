package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization helpers (SURVEY.md §2.1 S9–S10; §4 partition-pruning
  * row): the dbt view/table layer mapped Spark-first.
  *
  * - view: `createOrReplaceTempView` — lazy, recomputed, inlined by the
  *   analyzer (exact VIEW semantics, SURVEY §3.2).
  * - table: parquet write, optionally hive-style partitioned so downstream
  *   filters on the partition column prune files instead of scanning
  *   (`PartitionFilters` in the plan — free partition pruning at 100 TB).
  */
object Materialize {

  def asView(df: DataFrame, name: String): Unit = df.createOrReplaceTempView(name)

  /** Overwrite-write `df` as parquet at `path`, partitioned by `cols`
    * (hive-style directories). The reference's `--full-refresh` CTAS
    * (`/root/reference/README.md:92`) is mode=overwrite. */
  def asPartitionedTable(df: DataFrame, path: String, cols: String*): Unit = {
    val w = df.write.mode("overwrite")
    (if (cols.nonEmpty) w.partitionBy(cols: _*) else w).parquet(path)
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
