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

  /** MERGE-style upsert without a table format: the stored table at `path`
    * unioned with `updates`, deduplicated to the latest row per `key` (by
    * `versionCol`, ties to the update side), rewritten atomically via a
    * staging directory. This is the missing half of the reference's
    * append-mode ingest (`spacex_api_dag.py:49` appends snapshots forever;
    * `README.md:80` replaces wholesale — upsert = append + latest-per-key,
    * SURVEY §2.5). At scale the same logic targets a transactional format
    * (Delta/Iceberg MERGE); the union+window shape is identical.
    *
    * Returns the merged frame re-read from storage. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      key: String, versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val existing =
      if (new java.io.File(path).exists) readTable(spark, path).withColumn("__src", lit(0))
      else updates.limit(0).withColumn("__src", lit(0))
    val merged = existing.unionByName(updates.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(versionCol).desc, col("__src").desc)))
      .filter(col("__rn") === 1).drop("__rn", "__src")
    val staging = path + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    val target = new java.io.File(path)
    if (target.exists) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(target)
    }
    require(new java.io.File(staging).renameTo(target), s"rename $staging -> $path failed")
    readTable(spark, path)
  }
}
