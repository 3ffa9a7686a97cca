package graft.tools

import org.apache.spark.sql.functions._

/** Empirical probe for the q166 late-filter watermark protocol (scratch).
  *
  * Question: in batch 2 (third file), does the late-record filter use the
  * watermark derived from batch 0's stats only (two-batch lag), or from
  * batches 0+1 (one-batch lag)?
  *
  * Fixture (all UTC, 2001-09-09): non-stragglers A=08:05 B=09:05 C=10:30
  * (wave 1), D=11:00 (wave 2). Stragglers S1=08:15 (window end 09:00),
  * S2=09:15 (window end 10:00, the DISCRIMINATOR), S3=10:45.
  *   W_wave1 = 10:30 - 1h = 09:30  -> drops {S1}        -> counted 6
  *   W_all   = 11:00 - 1h = 10:00  -> drops {S1, S2}    -> counted 5
  */
object Dbg166b {
  def main(args: Array[String]): Unit = {
    val s0 = graft.GraftSession.local(4)
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    import s.implicits._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2001-09-09 $hhmm:00")
    // ids chosen so md5-first-4-hex %20==0 exactly for stragglers {9,13,53}
    val wave1 = Seq((1L, ts("08:05")), (2L, ts("09:05")), (3L, ts("10:30")))
    val wave2 = Seq((4L, ts("11:00")))
    val strag = Seq((9L, ts("08:15")), (13L, ts("09:15")), (53L, ts("10:45")))
    val tmp = java.nio.file.Files.createTempDirectory("dbg-late-b-")
    Seq(("b1", wave1), ("b2", wave2), ("b3", strag)).zipWithIndex.foreach {
      case ((sub, rows), i) =>
        rows.toDF("event_id", "ts").coalesce(1).write.parquet(s"$tmp/$sub")
        new java.io.File(s"$tmp/$sub").listFiles()
          .foreach(_.setLastModified(1000000000000L + i * 60000L))
    }
    val schema = s.read.parquet(s"$tmp/b1").schema
    val src = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet")
      .parquet(tmp.toString)
    val agg = src.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("dbg-ckpt-b-")
    val q = agg.writeStream.format("memory").queryName("dbgb")
      .outputMode("update").option("checkpointLocation", ckpt.toString).start()
    q.processAllAvailable(); q.stop()
    q.recentProgress.foreach { p =>
      println(s"DBGbatch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}")
    }
    val fin = s.table("dbgb").groupBy(col("window")).agg(max(col("n")).as("n"))
    fin.orderBy("window").show(false)
    val counted = fin.agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
    println(s"COUNTED=$counted  (6 => wave1-only watermark; 5 => all-ns watermark)")
    s0.stop()
  }
}
