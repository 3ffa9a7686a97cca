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
}
