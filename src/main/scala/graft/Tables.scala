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

  /** `events.ts` canonicalization: whatever physical shape the parquet footer
    * carries, the rest of the engine sees one logical type — µs
    * `TimestampType` (session-zoned; sessions pin UTC). The generator has
    * already shipped two shapes across rounds and storage drift like this is
    * exactly what a staging boundary re-cast exists for (the reference does
    * the same on its raw layer: `stg_spacex_launches.sql:7` casts
    * `date_utc::timestamptz` defensively):
    *  - TIMESTAMP(NANOS): Spark 4 refuses it as a timestamp
    *    (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong`
    *    is set (Verify/Bench/tests do); the raw ns long is floor-converted to
    *    µs (`ts div 1000` — FIXTURES.md: "ns — Spark truncates to µs; align
    *    oracle").
    *  - TIMESTAMP_NTZ(MICROS) (`isAdjustedToUTC=0`): reads as
    *    TimestampNTZType; cast to TimestampType under the pinned-UTC session
    *    is bit-identical epoch-µs to DuckDB's `epoch_us` on the same file
    *    (VERDICT r6 verified: max 1706659032194062 both engines).
    *  - TimestampType: already canonical, pass through.
    *  - anything else (string/date drift): best-effort cast, same choke point.
    * TablesSpec plants a parquet fixture per shape and runs a
    * `unix_micros` + `withWatermark` query over each, so the next silent
    * testdata regeneration is a no-op instead of a 25-query outage. */
  def events(spark: SparkSession, dir: String): DataFrame =
    canonicalTs(load(spark, dir, "events"))

  /** The single `ts` normalization choke point, shared by the batch loader
    * above and every streaming `readStream` over the events table (the
    * streaming sources re-read the file with their own schema, so they must
    * apply the same rule — r6's outage hit exactly the sites that had
    * hand-rolled a two-case copy of this match). Works on batch and
    * streaming frames alike: it only inspects the analyzed schema. */
  def canonicalTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // Unit inference by magnitude (ADVICE r7): a raw int64 ts may be
        // epoch-ns, -µs, -ms or -s depending on the generator; blindly
        // assuming ns would silently land an epoch-µs regeneration in ~1970.
        // Any epoch between 1973-03 and 5138 classifies unambiguously
        // (1e17 ns ≈ 1e14 µs ≈ 1e11 ms ≈ 1973-03-03); a per-row CASE keeps
        // this streaming-safe (no driver-side aggregate) and inside
        // whole-stage codegen. TablesSpec plants one fixture per unit.
        df.withColumn("ts", timestamp_micros(expr(
          """CASE WHEN abs(ts) >= 100000000000000000 THEN ts div 1000
            |     WHEN abs(ts) >= 100000000000000    THEN ts
            |     WHEN abs(ts) >= 100000000000       THEN ts * 1000
            |     ELSE ts * 1000000 END""".stripMargin)))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
