package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (/root/repo/TESTDATA.md).
  *
  * Schemas come from the parquet footers (pinned in FIXTURES.md §1). Reads go
  * through Spark's vectorized parquet reader; callers keep projections and
  * filters declarative so Catalyst pushes them into the scan (column pruning +
  * `PushedFilters`). The same loaders work unchanged when `dir` is a
  * many-file directory on a cluster — nothing here assumes a single file.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to read
    * as a timestamp (PARQUET_TYPE_ILLEGAL). Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench/tests do);
    * the raw ns long is then floor-converted here to the µs TimestampType
    * the rest of the engine expects (FIXTURES.md: "ns — Spark truncates to
    * µs; align oracle"). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
