package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards the `Tables.events` timestamp-canonicalization boundary
  * (VERDICT r6 item 2). The driver has regenerated `/root/testdata` with a
  * different physical `ts` shape twice across rounds — TIMESTAMP(NANOS) long
  * then TIMESTAMP_NTZ(MICROS) — and the second switch silently broke every
  * `unix_micros`/`withWatermark` consumer. Here each shape is PLANTED as a
  * parquet fixture and pushed through the same loader plus the two
  * operations that died, so a future regeneration is a no-op, not an outage.
  *
  * Expected values are fixed: 2024-01-31T00:00:00.123456Z = epoch-µs
  * 1706659200123456 (and a second row one hour later). The nanos fixture
  * stores that ×1000 with 999 extra ns, pinning the floor-to-µs rule.
  */
class TablesSpec extends SparkSpec {
  private val usA = 1706659200123456L // 2024-01-31T00:00:00.123456Z
  private val usB = usA + 3600L * 1000 * 1000

  /** Writes a 2-row events-shaped parquet with `ts` in the given shape and
    * loads it back through Tables.events. */
  private def planted(shape: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tablesspec-$shape").toString
    val base = Seq((1L, usA, 10L, "click", 1.0, "{}"), (2L, usB, 11L, "view", 2.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = shape match {
      // plain int64 column — the same LongType the legacy nanosAsLong read
      // of a TIMESTAMP(NANOS) file produces (999 sub-µs ns must floor away)
      case "nanos_long" => base.withColumn("ts", expr("us * 1000 + 999"))
      // raw int64 epoch in coarser units — no parquet timestamp logical
      // type at all. ADVICE r7: blindly assuming ns would land these in
      // ~1970; canonicalTs now classifies by magnitude per-row.
      case "micros_long"  => base.withColumn("ts", col("us"))
      case "millis_long"  => base.withColumn("ts", expr("us div 1000"))
      case "seconds_long" => base.withColumn("ts", expr("us div 1000000"))
      case "ntz_micros" => base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      case "tz_micros"  => base.withColumn("ts", timestamp_micros(col("us")))
      case "string"     => base.withColumn("ts", date_format(timestamp_micros(col("us")), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    }
    withTs.drop("us").select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  for (shape <- Seq("nanos_long", "micros_long", "millis_long", "seconds_long",
      "ntz_micros", "tz_micros", "string")) {
    test(s"events canonicalization: $shape parquet -> µs TimestampType, unix_micros + watermark work") {
      val ev = planted(shape)
      assert(ev.schema("ts").dataType === TimestampType,
        s"$shape must canonicalize to TimestampType, got ${ev.schema("ts").dataType}")
      // coarser units lose the sub-unit fraction at WRITE time, so expect
      // the values truncated to what the fixture could physically carry
      val (expA, expB) = shape match {
        case "millis_long"  => (usA / 1000 * 1000, usB / 1000 * 1000)
        case "seconds_long" => (usA / 1000000 * 1000000, usB / 1000000 * 1000000)
        case _              => (usA, usB)
      }
      // the two operation families the r6 regression killed: epoch extraction…
      val got = ev.select(unix_micros(col("ts")).as("us")).orderBy("us").collect().map(_.getLong(0))
      assert(got.toSeq === Seq(expA, expB), s"$shape epoch-µs mismatch")
      // …and event-time declaration (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
      // throws at analysis if ts is not TimestampType)
      val windowed = ev.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour")).count()
      assert(windowed.collect().length === 2)
    }
  }

  test("events canonicalization: current driver testdata reads as µs TimestampType") {
    val ev = Tables.events(spark, sf())
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(max(unix_micros(col("ts")))).head().getLong(0) > 0L)
  }
}
