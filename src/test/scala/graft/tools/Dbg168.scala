package graft.tools

import org.apache.spark.sql.functions._

/** Empirical probe for dropDuplicatesWithinWatermark eviction semantics
  * (scratch, q168 design).
  *
  * Fixture (UTC 2001-09-09, delay 1 h): wave 1 = originals A=08:05,
  * B=09:04:30, C=10:05, D=11:04:30 (max, NOT hour-aligned). Watermark
  * after batch 0: W = 11:04:30 − 1 h = 10:04:30. A key's dedup state
  * expires at ts + 1 h; a wave-2 duplicate is re-emitted iff the state
  * was evicted, i.e. iff W {>, >=} ts + 1 h.
  *   dup(A): A+1h = 09:05   < W → state gone   → RE-EMITTED (both rules)
  *   dup(B): B+1h = 10:04:30 = W → boundary     → DISCRIMINATOR
  *   dup(C): C+1h = 11:05   > W → state live    → suppressed (both rules)
  *   dup(D): D+1h = 12:04:30 > W → state live   → suppressed
  * Also probes whether batch 1 late-filters old rows at all (two-value
  * watermark protocol says its late filter uses batch −1 stats = 0, so
  * dup(A) must NOT be dropped as late).
  */
object Dbg168 {
  def main(args: Array[String]): Unit = {
    val s0 = graft.GraftSession.local(4)
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    import s.implicits._
    def ts(t: String) = java.sql.Timestamp.valueOf(s"2001-09-09 $t")
    // A,B evict under wm0=10:04:30 (B at equality — probe 1 showed both
    // evicted, state 4→2). X expires 10:08, BETWEEN wm0 and wm1=10:34:30:
    // dup(X) re-emitted ⟺ batch-2-time eviction used wm1 (post-batch-1
    // watermark). dup(A) re-emitted unless a late filter drops it first.
    // Y=10:04:30 sits EXACTLY on batch 2's late watermark: its dup is
    // dropped iff the late rule is ts <= wm, passes iff strict <.
    val orig = Seq((1L, ts("08:05:00")), (2L, ts("09:04:30")),
      (5L, ts("09:08:00")), (7L, ts("10:04:30")), (3L, ts("10:05:00")),
      (4L, ts("11:04:30")))
    val filler = Seq((6L, ts("11:34:30")))
    val dups = orig // exact replays, same ids and event times
    val tmp = java.nio.file.Files.createTempDirectory("dbg-dedup-")
    Seq(("b1", orig), ("b2", filler), ("b3", dups)).zipWithIndex.foreach { case ((sub, rows), i) =>
      rows.toDF("event_id", "ts").coalesce(1).write.parquet(s"$tmp/$sub")
      new java.io.File(s"$tmp/$sub").listFiles()
        .foreach(_.setLastModified(1000000000000L + i * 60000L))
    }
    val schema = s.read.parquet(s"$tmp/b1").schema
    val src = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet")
      .parquet(tmp.toString)
    val dedup = src.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val ckpt = java.nio.file.Files.createTempDirectory("dbg-dedup-ckpt-")
    val q = dedup.writeStream.format("memory").queryName("dbg168")
      .outputMode("append").option("checkpointLocation", ckpt.toString).start()
    q.processAllAvailable(); q.stop()
    q.recentProgress.foreach { p =>
      println(s"DBGbatch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}" +
        s" ops=${p.stateOperators.map(o => o.operatorName + " dropped:" + o.numRowsDroppedByWatermark + " state:" + o.numRowsTotal).mkString(",")}")
    }
    val emitted = s.table("dbg168").groupBy(col("event_id"))
      .agg(count(lit(1)).as("n")).orderBy(col("event_id"))
    emitted.show(false)
    println("n>1 means the wave-2 duplicate was RE-EMITTED for that id")
    s0.stop()
  }
}
