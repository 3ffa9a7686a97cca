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
    val withTs = src.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => src
    }
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
}
