package graft

import org.apache.spark.sql.functions._

/** Streaming semantics beyond the driver-checked queries: watermark
  * late-data accounting — the operational metric a production stream is
  * monitored by (dropped-row counts must be OBSERVABLE, or silent data
  * loss looks like success). */
class StreamingSpec extends SparkSpec {

  test("watermark accounting: late rows are dropped from state AND counted in progress") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-late-src")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq((ts("2024-01-01 12:00:00"), 1L)).toDF("ts", "v")
    b1.write.parquet(srcDir.resolve("b1").toString)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*")
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val name = "graft_late_accounting"
    val q = agg.writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      q.processAllAvailable() // batch 1 → watermark advances to 11:50
      // a row two hours older than the watermark arrives late
      Seq((ts("2024-01-01 10:00:00"), 2L)).toDF("ts", "v")
        .write.parquet(srcDir.resolve("b2").toString)
      q.processAllAvailable()
      val progress = q.recentProgress
      val dropped = progress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1L, s"expected exactly the late row dropped, saw $dropped")
      // and the state holds only the on-time window — the late row never
      // resurrected a closed aggregate
      val stateRows = progress.flatMap(_.stateOperators).map(_.numRowsTotal).max
      assert(stateRows == 1L, s"state should hold 1 window, saw $stateRows")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("q186: checkpoint restart recovers state and never replays committed files") {
    // the driver oracle pins the VALUES; this pins the MECHANISM — the
    // phase-2 query instance must process only the files that landed after
    // the phase-1 shutdown (committed offsets honored), yet its final
    // complete-mode result must cover phase-1 rows too (state recovered)
    val out = streaming.Streaming.q186CheckpointRestart(spark, sf()).collect()
    val batch = Tables.events(spark, sf())
      .groupBy(expr("CAST(floor(unix_micros(ts) / 3600000000) * 3600 AS BIGINT)").as("hour_epoch_s"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(Exact.cents(col("value"))).cast("double") / lit(100.0)).as("sum_value"))
      .orderBy(col("hour_epoch_s"), col("event_type"))
      .collect()
    assert(out.nonEmpty)
    assert(out.toSeq === batch.toSeq,
      "restarted stream diverges from the batch answer — lost state or replayed files")
    Caches.releaseAll()
  }

  test("q224: idempotent upsert sink absorbs a replayed batch (exactly-once write)") {
    val out = streaming.Streaming.q224IdempotentSink(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("replay_ok") == 1L,
      "re-delivered batch changed the mart — the sink is not idempotent"))
    // the mart's latest cumulative rows must equal the batch aggregate
    val batch = Tables.events(spark, sf())
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(Exact.cents(col("value"))).cast("double") / lit(100.0)).as("sum_value"))
      .orderBy(col("event_type"))
      .collect()
    assert(out.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
      r.getAs[Double]("sum_value"))).toSeq ===
      batch.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSeq)
    Caches.releaseAll()
  }

  test("q166: late-filter watermark lags one batch (wave-1 stats, pinned off hour alignment)") {
    // Non-hour-aligned fixture that DISTINGUISHES the two candidate rules:
    //   wave 1 (on-time bulk)  A=08:05 B=09:05 C=10:30  → W_wave1 = 09:30
    //   wave 2 (on-time tail)  D=11:00                  → W_all   = 10:00
    //   stragglers  S1=08:15 (window end 09:00 ≤ both W → dropped),
    //               S2=09:15 (window end 10:00: ≤ W_all but > W_wave1 —
    //                         the discriminator), S3=10:45 (kept by both).
    // Batch 2's late filter uses the watermark from batch 0's stats only
    // (SPARK-40925 two-value protocol), so S2 survives: counted = 6, not 5.
    // ids picked so md5-first-4-hex % 20 == 0 exactly for {9, 13, 53}.
    import spark.implicits._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2001-09-09 $hhmm:00")
    val rows = Seq(
      (1L, ts("08:05")), (2L, ts("09:05")), (3L, ts("10:30")), (4L, ts("11:00")),
      (9L, ts("08:15")), (13L, ts("09:15")), (53L, ts("10:45")))
    val dir = java.nio.file.Files.createTempDirectory("graft-q166-pin")
    rows.toDF("event_id", "ts").write.parquet(dir.resolve("events.parquet").toString)
    val out = graft.streaming.Streaming.q166LateDataAudit(spark, dir.toString)
      .collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((7L, 3L, 1L, 6L)),
      "wave-1-only watermark must keep the discriminator straggler (6 counted)")
  }

  test("q168: dedup-within-watermark boundary rules (late ≤ lagged W_f, evict ≤ W_e)") {
    // Non-aligned fixture exercising all three outcome classes AND three
    // boundary equalities (M = 14:00 → cut = 12:30, W_f = max(b1) − 1h =
    // 11:30, retry window (08:30, 12:30], retries restamped ts + 2h —
    // rule 3 makes exact-ts replays structurally unreachable):
    //   (4, 08:30)  ts == window lower bound     → NOT replayed (> pin)
    //   (1, 09:00)  retry 11:00 < W_f            → late-dropped
    //   (9, 09:15)  retry 11:15 < W_f            → late-dropped
    //   (85, 09:30) retry 11:30 == W_f           → late-dropped (≤ pin)
    //   (13, 10:00) retry 12:00, expiry 11:00    → re-emitted (state gone)
    //   (92, 10:30) expiry 11:30 == W_f          → re-emitted (evict ≤ pin)
    //   (53, 11:00) expiry 12:00 > W_f           → suppressed (state live)
    //   (2, 12:30)  expiry 13:30 > W_f           → suppressed
    import spark.implicits._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2001-09-09 $hhmm:00")
    val rows = Seq(
      (4L, ts("08:30")), (1L, ts("09:00")), (2L, ts("12:30")), (3L, ts("14:00")),
      (9L, ts("09:15")), (85L, ts("09:30")), (13L, ts("10:00")),
      (92L, ts("10:30")), (53L, ts("11:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft-q168-pin")
    rows.toDF("event_id", "ts").write.parquet(dir.resolve("events.parquet").toString)
    val out = graft.streaming.Streaming.q168StreamDedupAudit(spark, dir.toString)
      .collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((9L, 7L, 3L, 2L, 2L)),
      "(n_events, n_retries, n_late, n_reemitted, n_suppressed)")
  }

  test("transformWithState (Spark 4 arbitrary-state API) equals the q25 session fold") {
    import graft.streaming.StatefulSessions.{Ev, SessionOut}
    // transformWithState requires the RocksDB state-store provider — set on
    // a cloned session so the suite's shared session is untouched
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    import ss.implicits._
    val dir = sf()
    val rawSchema = ss.read.parquet(s"$dir/events.parquet").schema
    val src = ss.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val withTs = Tables.canonicalTs(src)
    val ev = withTs.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        graft.Exact.cents(col("value")).as("value_cents"))
      .as[Ev]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new graft.streaming.StatefulSessions.SessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    val name = "graft_tws_sessions"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt")
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val viaTws = ss.table(name)
        .orderBy(col("user_id"), col("session_seq"))
        .as[SessionOut].collect()
      val viaFmgws = graft.streaming.StatefulSessions
        .q25StatefulSessions(spark, dir)
        .as[SessionOut](ss.implicits.newProductEncoder).collect()
      assert(viaTws.length == viaFmgws.length,
        s"${viaTws.length} vs ${viaFmgws.length} sessions")
      assert(viaTws.sameElements(viaFmgws))
    } finally {
      q.stop()
      ss.catalog.dropTempView(name)
    }
  }

  test("q284 timer boundary: expiry == final watermark FIRES; an open tail holds the whole key") {
    // Crafted ties that DISTINGUISH the candidate firing rules (gap 30 min):
    //   user 1: 08:00, 08:10 → one session, close-out timer at 08:40
    //   user 2: 08:40 → the global max, so final watermark = 08:40 exactly;
    //           its own timer (09:10) can never fire
    //   user 3: 07:00 (a CLOSED session) + 08:20 (open tail, timer 08:50)
    // user 1's expiry sits EXACTLY on the final watermark — emitted iff the
    // engine fires timers at expiry ≤ wm (the boundary the q284 oracle's
    // HAVING `<=` encodes). user 3 pins single-timer-per-key semantics: the
    // un-fired 08:50 timer holds BOTH its sessions (the closed 07:00 one
    // included) — live-deployment behavior, matching the oracle's per-USER
    // cutoff rather than a per-session one.
    import spark.implicits._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2001-09-09 $hhmm:00")
    val rows = Seq(
      (1L, 101L, ts("08:00"), 1.0), (1L, 102L, ts("08:10"), 2.0),
      (2L, 201L, ts("08:40"), 3.0),
      (3L, 301L, ts("07:00"), 4.0), (3L, 302L, ts("08:20"), 5.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-q284-pin")
    rows.toDF("user_id", "event_id", "ts", "value")
      .write.parquet(dir.resolve("events.parquet").toString)
    val out = graft.streaming.StatefulSessions
      .q284TwsTimerSessions(spark, dir.toString).collect()
    assert(out.map(_.getAs[Long]("user_id")).toSet == Set(1L),
      s"expected exactly user 1's session (tie fires, open tail holds): " +
        out.mkString("[", ", ", "]"))
    val s1 = out.head
    assert(s1.getAs[Long]("n_events") == 2L &&
      s1.getAs[Long]("duration_ms") == 600000L &&
      s1.getAs[Double]("sum_value") == 3.0, s"session fold wrong: $s1")
  }

  test("q284 equals q25 restricted to keys idle for at least one gap") {
    val timer = graft.streaming.StatefulSessions
      .q284TwsTimerSessions(spark, sf()).collect()
    val full = graft.streaming.StatefulSessions
      .q25StatefulSessions(spark, sf()).collect()
    import spark.implicits._
    val mx = Tables.events(spark, sf())
      .agg(max(expr("unix_micros(ts) div 1000"))).as[Long].head()
    val cutoff = Tables.events(spark, sf())
      .groupBy(col("user_id"))
      .agg(max(expr("unix_micros(ts) div 1000")).as("umx"))
      .filter(col("umx") + 1800000L <= mx)
      .select(col("user_id")).as[Long].collect().toSet
    val expected = full.filter(r => cutoff(r.getAs[Long]("user_id")))
    assert(timer.map(_.toString).sorted.toSeq ==
      expected.map(_.toString).sorted.toSeq,
      s"timer path diverged: ${timer.length} vs expected ${expected.length}")
    // and it must be a STRICT subset on this fixture (some key is active
    // within the gap of the stream frontier — else the law is vacuous)
    assert(timer.length < full.length, "cutoff law vacuous on this fixture")
  }

  test("Trigger.AvailableNow: the production backfill trigger self-terminates with the full answer") {
    // processAllAvailable() is a TEST API (blocks a driver thread, races
    // with live sources); the production bounded-backfill idiom is
    // Trigger.AvailableNow — process everything present, checkpoint, STOP.
    // Pin both halves: self-termination and batch-equal results.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", 4)
    val dir = sf()
    val schema = ss.read.parquet(s"$dir/events.parquet").schema
    val src = graft.Tables.canonicalTs(
      ss.readStream.schema(schema).option("pathGlobFilter", "events.parquet").parquet(dir))
    val agg = src.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val name = "graft_available_now"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-an-ckpt")
    val q = agg.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
      val got = ss.table(name)
        .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
        .orderBy(col("w"), col("event_type"))
        .collect().map(_.toString).toSeq
      val batch = graft.Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
        .orderBy(col("w"), col("event_type"))
        .collect().map(_.toString).toSeq
      assert(got.nonEmpty && got == batch,
        "AvailableNow run diverges from the batch answer")
    } finally {
      if (q.isActive) q.stop()
      ss.catalog.dropTempView(name)
    }
  }

  test("RocksDB state store: the production backend engages and matches HDFS-backed results") {
    // local[32] keeps every state store on one JVM heap; a 1000-executor
    // deployment holds state orders of magnitude past heap — RocksDB is the
    // backend that makes stateful streaming survive that scale (off-heap +
    // disk, incremental checkpoint). Same query, both providers, identical
    // answers — and the progress metrics must PROVE RocksDB actually ran.
    def run(rocks: Boolean): (Seq[String], Boolean) = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", 4)
      if (rocks) ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val dir = sf()
      val schema = ss.read.parquet(s"$dir/events.parquet").schema
      val src = graft.Tables.canonicalTs(
        ss.readStream.schema(schema).option("pathGlobFilter", "events.parquet").parquet(dir))
      val agg = src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(graft.Exact.cents(col("value"))).as("cents"))
      val name = s"graft_rocks_${if (rocks) "on" else "off"}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rocks-ckpt")
      val q = agg.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val rows = ss.table(name)
          .select(col("window.start").cast("long").as("w"), col("event_type"),
            col("n"), col("cents"))
          .orderBy(col("w"), col("event_type"))
          .collect().map(_.toString).toSeq
        val sawRocks = q.lastProgress.stateOperators.exists(
          _.customMetrics.keySet().toArray.exists(_.toString.startsWith("rocksdb")))
        (rows, sawRocks)
      } finally {
        q.stop()
        ss.catalog.dropTempView(name)
      }
    }
    val (viaHdfs, hdfsSawRocks) = run(rocks = false)
    val (viaRocks, rocksSawRocks) = run(rocks = true)
    assert(!hdfsSawRocks, "default run unexpectedly used RocksDB")
    assert(rocksSawRocks, "RocksDB provider never engaged — config did not take")
    assert(viaHdfs.nonEmpty && viaHdfs == viaRocks,
      "state backend changed the answer — provider-dependent semantics bug")
  }

  test("q192 full-outer join: agrees with q128 on the left side and batch on matches") {
    val fo = graft.streaming.Streaming.q192StreamFullOuterJoin(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_mod10") -> r).toMap
    val lo = graft.streaming.Streaming.q128StreamLeftOuterJoin(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_mod10") -> r).toMap
    // the full outer's matched and left-null sides are exactly the left
    // outer's output, bucket by bucket (right-null rows are additive)
    lo.foreach { case (k, l) =>
      val f = fo(k)
      assert(f.getAs[Long]("n_matched") == l.getAs[Long]("n_matched"), s"bucket $k matched")
      assert(f.getAs[Long]("n_left_only") == l.getAs[Long]("n_unmatched"), s"bucket $k left-only")
      assert(f.getAs[Long]("sum_gap_us") == l.getAs[Long]("sum_gap_us"), s"bucket $k gap")
    }
    // matches are watermark-independent: total equals the batch interval join
    val e = Tables.events(spark, sf())
    val su = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("sts"))
    val pu = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val batchMatches = su.join(pu,
      col("su") === col("pu") && col("pts") >= col("sts") &&
        col("pts") <= col("sts") + expr("INTERVAL 1 HOUR")).count()
    assert(fo.values.map(_.getAs[Long]("n_matched")).sum == batchMatches)
    Caches.releaseAll()
  }
}
