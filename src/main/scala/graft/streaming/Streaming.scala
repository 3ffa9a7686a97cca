package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.10 / §7.6 stretch).
  *
  * The reference has no true streaming — its cadence is a daily batch
  * re-pull (`/root/reference/airflow/dags/spacex_api_dag.py:58`) — so this
  * is engine capability: the same hourly aggregation as ops.Events.q20, run
  * through `readStream` → watermark → `window()` → memory sink. Driving a
  * bounded parquet source with `processAllAvailable()` makes the run
  * synchronous and deterministic, so the result is oracle-checkable exactly
  * like a batch query.
  *
  * At scale this plan is the standard incremental shape: stateful hourly
  * windows keyed by (window, event_type), partial aggregation before the
  * state store shuffle, watermark bounding state size. (`countDistinct` is
  * not available in streaming aggregation — the batch q20 carries it.)
  */
object Streaming {

  private val counter = new AtomicInteger(0)

  /** Bounded streaming run of the hourly event aggregation (complete mode →
    * in-memory table, unique per invocation). */
  def q24StreamingHourly(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val rawSchema = s.read.parquet(path).schema // ts arrives as ns long (nanosAsLong)
    val name = s"graft_stream_hourly_${counter.incrementAndGet()}"
    // The file stream source requires a directory: stream the sf dir with a
    // glob filter selecting just the events table.
    val src = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val withTs = src.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => src
    }
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(graft.Exact.cents(col("value"))).as("sum_value_cents"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name)
      .select(
        expr("unix_seconds(window.start)").as("hour_epoch_s"),
        col("event_type"),
        col("n_events"),
        (col("sum_value_cents").cast("double") / lit(100.0)).as("sum_value"))
      .orderBy(col("hour_epoch_s"), col("event_type"))
  }

  val q24Oracle: String =
    """SELECT (epoch_ms(ts) // 3600000) * 3600 AS hour_epoch_s, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Stream-static join (SURVEY §2.10): streaming events enriched with the
    * static customer dimension (broadcast per micro-batch — the standard
    * streaming-enrichment shape), then aggregated per market segment.
    * Events with user_ids outside the customer table are dropped by the
    * inner join; the oracle is the identical batch join. At scale the
    * static side refreshes per batch and broadcasts; state is bounded by
    * |segments|. */
  def q77StreamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val rawSchema = s.read.parquet(path).schema
    val name = s"graft_stream_enrich_${counter.incrementAndGet()}"
    val src = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val cust = broadcast(graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment")))
    val agg = src
      .join(cust, src("user_id") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(graft.Exact.cents(col("value"))).as("sum_value_cents"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name)
      .select(col("c_mktsegment"), col("n_events"),
        (col("sum_value_cents").cast("double") / lit(100.0)).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  val q77Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_streaming_hourly" -> (q24StreamingHourly _),
    "q77_stream_static_join" -> (q77StreamStaticJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q24_streaming_hourly" -> q24Oracle,
    "q77_stream_static_join" -> q77Oracle,
  )
}
