package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed stateful sessionization (SURVEY.md §2.10 custom-state row):
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with the same 30-minute
  * gap semantics as the window-based ops.Events.q21 — and checked against
  * the identical DuckDB oracle.
  *
  * Run here over the bounded events table (Spark executes the state
  * function once per key in batch mode); the same code drives a live
  * `readStream` with `GroupStateTimeout.EventTimeTimeout` for incremental
  * session emission. Typed `Dataset[Ev]` + case-class Encoders are the
  * SURVEY §1.4 "where type safety helps" path: per-user session folding is
  * genuinely imperative, which is exactly the mapGroups escape hatch.
  * Scale: one shuffle on user_id; per-group memory is one sorted user
  * timeline (bounded by per-user activity, not corpus size).
  */
object StatefulSessions {

  case class Ev(user_id: Long, event_id: Long, ts_ms: Long, value_cents: Long)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, duration_ms: Long, sum_value: Double)

  private val GapMs = 1800000L

  /** Fold one user's (sorted) events into sessions. */
  private[streaming] def sessionize(userId: Long, evs: Iterator[Ev],
      state: GroupState[Int]): Iterator[SessionOut] = {
    val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var seq = 0L
      var start = 0L; var last = 0L; var n = 0L; var cents = 0L
      def flush(): Unit = if (n > 0)
        out += SessionOut(userId, seq, n, start, last - start, cents.toDouble / 100.0)
      sorted.foreach { e =>
        if (n == 0 || e.ts_ms - last > GapMs) {
          flush(); seq += 1; start = e.ts_ms; n = 0; cents = 0
        }
        last = e.ts_ms; n += 1; cents += e.value_cents
      }
      flush()
      out.iterator
    }
  }

  /** The same session fold through Spark 4's arbitrary-state API
    * (`transformWithState` + [[org.apache.spark.sql.streaming.StatefulProcessor]]):
    * per-key events buffer in a RocksDB-backed `ListState` across
    * micro-batches; each batch re-reads the buffer, folds it with
    * [[sessionize]] and emits, then clears — the bounded-run shape (a live
    * deployment would hold the buffer and emit on event-time timers
    * instead of per batch; the fold itself is identical). This is the
    * successor API to `flatMapGroupsWithState` (q25): typed state handles
    * (value/list/map per name), TTL, and timers decoupled from the
    * output-mode contract. StreamingSpec pins its output equal to q25's. */
  class SessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, SessionOut] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[Ev] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getListState[Ev]("events",
        org.apache.spark.sql.Encoders.product[Ev],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      rows.foreach(buf.appendValue)
      val all = buf.get().toVector
      buf.clear()
      sessionize(key, all.iterator, null)
    }
  }

  /** Sessionization through the stateful-API shape, as a driver-contract
    * query (bounded input ⇒ deterministic). Output equals ops.Events.q21. */
  def q25StatefulSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        graft.Exact.cents(col("value")).as("value_cents"))
      .as[Ev]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionize)
      .toDF()
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Same sessions as the window formulation — same oracle (ops.Events). */
  val q25Oracle: String = graft.ops.Events.q21Oracle

  private val twsCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** q125: the SAME session fold through Spark 4's arbitrary-state
    * streaming API — a bounded `readStream` → `transformWithState`
    * ([[SessionProcessor]], RocksDB-backed ListState) → memory sink run,
    * drained synchronously so the result is deterministic and carries the
    * identical DuckDB oracle as q21/q25. This gives the successor-API path
    * (typed state handles + timers, the one a live deployment would use)
    * its own CORRECTNESS row instead of only spec coverage.
    *
    * Deployment knobs as in the other bounded runs: state parallelism 4
    * (sized to the fixture stream), scratch checkpoint on tmpfs, sink
    * dropped after draining (the sink holds folded sessions — bounded by
    * user activity, never raw stream rows). */
  def q125TwsSessions(outer: SparkSession, dir: String): DataFrame = {
    val ss = outer.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", 4)
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // transformWithState requires the RocksDB state-store provider
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val rawSchema = ss.read.parquet(s"$dir/events.parquet").schema
    val src = Streaming.eventsFileStream(ss, dir, rawSchema)
    val withTs = graft.Tables.canonicalTs(src)
    val ev = withTs.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        graft.Exact.cents(col("value")).as("value_cents"))
      .as[Ev]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
    val name = s"graft_tws_sessions_${twsCounter.incrementAndGet()}"
    val shm = java.nio.file.Paths.get("/dev/shm")
    val ckptRoot = if (java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val ckpt = java.nio.file.Files.createTempDirectory(ckptRoot, "graft-ckpt-")
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
    } finally {
      // same capture+stop as drainBounded, so the RocksDB-backed state
      // curve is probe-readable (VERDICT r12 item 5)
      Streaming.captureProgressAndStop(q)
      import scala.jdk.CollectionConverters._
      try java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // drain + drop the sink (bounded aggregate — same discipline as q24)
    val t = ss.table(name)
    val (rows, schema) = (t.collect(), t.schema)
    ss.catalog.dropTempView(name)
    ss.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Identical semantics ⇒ identical oracle. */
  val q125Oracle: String = graft.ops.Events.q21Oracle

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_stateful_sessions" -> (q25StatefulSessions _),
    "q125_tws_sessions"     -> (q125TwsSessions _),
  )

  val oracles: Map[String, String] = Map(
    "q25_stateful_sessions" -> q25Oracle,
    "q125_tws_sessions"     -> q125Oracle,
  )
}
