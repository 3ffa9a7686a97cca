package graft.tools
import org.apache.spark.sql.functions._
object Dbg166 {
  def main(args: Array[String]): Unit = {
    val s0 = graft.GraftSession.local(4)
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val straggler = expr("conv(substring(md5(cast(cast(event_id as string) as binary)), 1, 4), 16, 10) % 20 = 0")
    val ev = graft.Tables.events(s, "/root/testdata/sf0.01").select(col("event_id"), col("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("dbg-late-")
    ev.filter(!straggler).coalesce(1).write.parquet(s"$tmp/b1")
    ev.filter(straggler).coalesce(1).write.parquet(s"$tmp/b2")
    def stamp(sub: String, t: Long): Unit = new java.io.File(s"$tmp/$sub").listFiles().foreach(_.setLastModified(t))
    stamp("b1", 1000000000000L); stamp("b2", 1000000060000L)
    val schema = s.read.parquet(s"$tmp/b1").schema
    val src = s.readStream.schema(schema).option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet").parquet(tmp.toString)
    val agg = src.withWatermark("ts", "1 hour").groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("dbg-ckpt-")
    val q = agg.writeStream.format("memory").queryName("dbg").outputMode("update").option("checkpointLocation", ckpt.toString).start()
    q.processAllAvailable()
    q.stop()
    println("NPROGRESS=" + q.recentProgress.length)
    q.recentProgress.foreach { p =>
      println(s"DBGbatch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} ops=${p.stateOperators.map(o => o.operatorName + ":" + o.numRowsDroppedByWatermark).mkString(",")}")
    }
    s0.stop()
  }
}
