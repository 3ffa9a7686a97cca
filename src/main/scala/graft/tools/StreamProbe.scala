package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only streaming scale probe (VERDICT r10 item 7, extended r12): run
  * the stream-stream join family on a scaled replica (`ScaleUp` output) and
  * record, per query, the wall seconds AND the state-store metrics Spark
  * reports per stateful operator — peak `numRowsTotal` across micro-batches
  * (the state the watermark actually allowed to accumulate), total
  * `numRowsRemoved` (eviction doing its job), and micro-batch count. This
  * grounds the "state stays bounded by the watermark horizon" claim with
  * measured numbers instead of semantics arguments.
  *
  * `--paced N` (VERDICT r11 item 2): a whole-input drain runs in 1–2
  * micro-batches, so the watermark never advances MID-run — peak state
  * equals total input and eviction only fires in a trailing no-data batch
  * (or never, for the inner join). Paced mode rewrites the replica's events
  * into N time-ordered parquet files with strictly increasing stamped
  * mtimes and replays them one file per micro-batch
  * (`maxFilesPerTrigger=1`, the q166/q186 stamped-mtime shape), so the
  * watermark climbs with every batch, state evicts continuously, and peak
  * state measures the WATERMARK HORIZON (rows within ~1 h of the frontier)
  * instead of the input size — the actual bounded-state claim. Time-ordered
  * arrival also means zero late drops: the output is the same rows the
  * unpaced drain emits.
  *
  * `--stateParts P` (VERDICT r11 item 3): overrides the fixture-sized state
  * parallelism (4) the query code pins, demonstrating the deployment knob —
  * at 100× input, 32 state partitions should cut the join walls several
  * fold because per-batch state-store commit work parallelizes.
  *
  * Usage: `StreamProbe <sfDir> [--paced N] [--stateParts P] [querySubstring...]`
  * — prints one JSON line.
  */
object StreamProbe {

  /** Split `<dir>/events.parquet` into `n` time-ordered chunk files under a
    * fresh temp dir (returned), file i covering an earlier ts range than
    * file i+1 and carrying a strictly larger stamped mtime, so the file
    * stream source (oldest-first) replays event time monotonically. */
  private def buildPaced(spark: SparkSession, dir: String, n: Int): String = {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory(Paths.get("/tmp"), "graft-paced-")
    val evDir = out.resolve("events.parquet")
    Files.createDirectories(evDir)
    // canonicalTs first so the ordering key is real event time regardless
    // of the generator's ts encoding; chunks are written with the canonical
    // ts (the queries' own canonicalTs pass is a no-op on it).
    val src = graft.Tables.canonicalTs(
      spark.read.parquet(s"$dir/events.parquet"))
    // ntile over a global sort — single-partition window, acceptable for a
    // dev probe (2M rows at the 100× tier), never a production shape.
    val w = Window.orderBy(col("ts"), col("event_id"))
    val tiled = src.withColumn("__chunk", ntile(n).over(w)).persist()
    try {
      val base = System.currentTimeMillis() - (n + 1) * 1000L
      (1 to n).foreach { i =>
        val tmp = out.resolve(f"tmp-$i%04d")
        tiled.filter(col("__chunk") === i).drop("__chunk")
          .coalesce(1).write.parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(tmp).iterator().asScala
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(sys.error(s"no part file in $tmp"))
        val dst = evDir.resolve(f"chunk-$i%04d.parquet")
        Files.move(part, dst)
        dst.toFile.setLastModified(base + i * 1000L)
        Files.list(tmp).iterator().asScala.toSeq.foreach(Files.deleteIfExists)
        Files.deleteIfExists(tmp)
      }
    } finally tiled.unpersist()
    out.toString
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf01x10")
    var paced = 0
    var stateParts = 0
    val only = scala.collection.mutable.Buffer[String]()
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--paced"      => paced = args(i + 1).toInt; i += 2
        case "--stateParts" => stateParts = args(i + 1).toInt; i += 2
        case q              => only += q; i += 1
      }
    }
    val spark: SparkSession = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val joins = Seq(
      "q103_stream_stream_join",
      "q128_stream_left_outer",
      "q192_stream_full_outer")
    val all = joins ++ Seq("q186_checkpoint_restart", "q224_idempotent_sink")
    // paced mode only rewrites events, so it drives the events-only joins
    val base = if (paced > 0) joins else all
    val names = if (only.isEmpty) base else base.filter(n => only.exists(n.contains))

    val runDir = if (paced > 0) buildPaced(spark, dir, paced) else dir
    if (paced > 0) graft.streaming.Streaming.probeMaxFilesPerTrigger.set(Some(1))
    if (stateParts > 0) graft.streaming.Streaming.probeStateParallelism.set(Some(stateParts))
    try {
      val results = names.map { name =>
        val fn = graft.streaming.Streaming.queries(name)
        val t0 = System.nanoTime()
        val rows = fn(spark, runDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val st = graft.streaming.Streaming.lastRunStateMetrics.get()
        graft.streaming.Streaming.lastRunStateMetrics.remove()
        val trace = graft.streaming.Streaming.lastRunStateTrace.get()
        graft.streaming.Streaming.lastRunStateTrace.remove()
        graft.Caches.releaseAll()
        val stJson = st.map { case (op, peak, removed, batches) =>
          s"""{"op":"$op","peak_state_rows":$peak,"rows_removed":$removed,"batches":$batches}"""
        }.mkString("[", ",", "]")
        // per-batch curve: [batchId, stateRows, removed] per operator row
        val trJson = trace.map { case (b, op, tot, rem) =>
          s"""[$b,"$op",$tot,$rem]"""
        }.mkString("[", ",", "]")
        (name, f"""{"sec":$sec%.1f,"rows":$rows,"state":$stJson,"trace":$trJson}""")
      }
      println(results.map { case (n, j) => s""""$n":$j""" }
        .mkString(
          s"""{"metric":"stream_probe","sf":"${dir.split('/').last}",""" +
            s""""paced_chunks":$paced,"state_parts":$stateParts,"queries":{""",
          ",", "}}"))
    } finally {
      graft.streaming.Streaming.probeMaxFilesPerTrigger.remove()
      graft.streaming.Streaming.probeStateParallelism.remove()
    }
    spark.stop()
  }
}
