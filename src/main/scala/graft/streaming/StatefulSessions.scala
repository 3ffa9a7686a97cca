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

  /** The LIVE-deployment session processor (VERDICT r13 item 4): where
    * [[SessionProcessor]] re-folds and CLEARS its buffer every batch (the
    * bounded-run contract), this one HOLDS per-key buffers across batches
    * and emits on EVENT-TIME TIMERS — the shape a production deployment
    * runs. Per key it keeps exactly one pending timer at
    * (max buffered event time) + gap: every arrival batch deletes and
    * re-registers it (an extension of the session pushes its close-out
    * forward); when the watermark crosses the expiry the timer fires,
    * [[sessionize]] folds the buffer, CLOSED sessions (last + gap ≤ expiry
    * — at a fired timer that is all of them, since expiry was registered
    * off the buffer's own max) are emitted and their rows evicted, and any
    * still-open tail re-arms a fresh timer. State is therefore bounded by
    * ACTIVE sessions (rows within one gap of the per-key frontier), not by
    * batch size or stream length — the curve `StreamProbe --paced` records.
    *
    * Timers are the one stateful-API feature q125's bounded contract could
    * not exercise (a bounded drain clears state before any wall-clock
    * passes); event-time timers fire on WATERMARK advancement alone, so a
    * bounded run with no-data batches enabled drives them deterministically:
    * the final no-data batch advances the watermark to the global max event
    * time and closes out every key idle for more than one gap. */
  class TimerSessionProcessor
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
      // single pending timer per key: the session close-out moves forward
      // with the key's own event-time frontier
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      var mx = Long.MinValue
      buf.get().foreach(e => if (e.ts_ms > mx) mx = e.ts_ms)
      if (mx != Long.MinValue) getHandle.registerTimer(mx + GapMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      val all = buf.get().toVector
      val sessions = sessionize(key, all.iterator, null).toVector
      val expiry = info.getExpiryTimeInMs()
      val (closed, open) = sessions.partition(s =>
        s.start_ms + s.duration_ms + GapMs <= expiry)
      buf.clear()
      // defensive: a fired timer's expiry sits one gap past the buffer max
      // it was registered on, so `open` is empty unless the engine ever
      // fires a stale timer after same-batch arrivals — keep those rows
      // buffered and re-arm rather than lose them
      if (open.nonEmpty) {
        val keepFrom = open.head.start_ms
        all.filter(_.ts_ms >= keepFrom).foreach(buf.appendValue)
        getHandle.registerTimer(open.map(s => s.start_ms + s.duration_ms).max + GapMs)
      }
      closed.iterator
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

  /** q284: sessionization through the TIMER path ([[TimerSessionProcessor]])
    * as a driver-contract query — a bounded `readStream` with a 0-delay
    * watermark, `TimeMode.EventTime`, and no-data batches enabled, so the
    * run is deterministic: the single-file source arrives in one batch,
    * every key registers its close-out timer, and the final no-data batch
    * advances the watermark to the global max event time and fires every
    * timer whose expiry it covers. The emitted set is therefore EXACTLY the
    * q21 sessions of users whose last event sits at least one gap before
    * the stream frontier (keys still active within the gap hold their
    * buffers and emit nothing — the live-deployment semantics, oracle'd
    * as the HAVING cutoff). Timer-firing boundary (expiry ≤ watermark
    * fires) is pinned by StreamingSpec against a crafted exact-tie
    * fixture. */
  def q284TwsTimerSessions(outer: SparkSession, dir: String): DataFrame = {
    val ss = outer.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", 4)
    // timers fire on watermark advancement alone: the no-data batch is the
    // one that closes out idle keys (the round-4 outer-join discipline)
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val rawSchema = ss.read.parquet(s"$dir/events.parquet").schema
    val src = Streaming.eventsFileStream(ss, dir, rawSchema)
    val withTs = graft.Tables.canonicalTs(src)
      .withWatermark("ts", "0 milliseconds")
    val ev = withTs.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        graft.Exact.cents(col("value")).as("value_cents"))
      .as[Ev]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
    val name = s"graft_tws_timer_${twsCounter.incrementAndGet()}"
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
      Streaming.captureProgressAndStop(q)
      import scala.jdk.CollectionConverters._
      try java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val t = ss.table(name)
    val (rows, schema) = (t.collect(), t.schema)
    ss.catalog.dropTempView(name)
    ss.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** q21's sessions, restricted to keys whose close-out timer the final
    * watermark (global max event time, ms-floored both engines) covers. */
  val q284Oracle: String =
    s"""WITH cutoff AS (
       |  SELECT user_id FROM events
       |  GROUP BY user_id
       |  HAVING max(epoch_ms(ts)) + $GapMs <= (SELECT max(epoch_ms(ts)) FROM events)),
       |s AS (SELECT * FROM (${graft.ops.Events.q21Oracle}))
       |SELECT s.* FROM s JOIN cutoff USING (user_id)
       |ORDER BY user_id, session_seq""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_stateful_sessions"   -> (q25StatefulSessions _),
    "q125_tws_sessions"       -> (q125TwsSessions _),
    "q284_tws_timer_sessions" -> (q284TwsTimerSessions _),
  )

  val oracles: Map[String, String] = Map(
    "q25_stateful_sessions"   -> q25Oracle,
    "q125_tws_sessions"       -> q125Oracle,
    "q284_tws_timer_sessions" -> q284Oracle,
  )
}
