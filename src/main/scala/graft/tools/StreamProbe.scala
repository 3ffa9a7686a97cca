package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only streaming scale probe (VERDICT r10 item 7, extended r12/r13):
  * run the stream-stream join family (and, paced, the stateful-API
  * operators) on a scaled replica (`ScaleUp` output) and record, per query,
  * the wall seconds AND the state-store metrics Spark reports per stateful
  * operator — peak `numRowsTotal` across micro-batches (the state the
  * watermark actually allowed to accumulate), total `numRowsRemoved`
  * (eviction doing its job), and micro-batch count. This grounds the "state
  * stays bounded by the watermark horizon" claim with measured numbers
  * instead of semantics arguments.
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
  * instead of the input size — the actual bounded-state claim.
  *
  * `--late D` (VERDICT r12 item 4; requires `--paced N`): time-ordered
  * arrival means zero late drops, so plain paced runs never exercise
  * late-data accounting mid-run. With D > 0 the chunk ARRIVAL order is a
  * bounded-displacement permutation of event-time order: within each
  * consecutive block of D+1 chunks the time-earliest chunk arrives LAST
  * (displacement D positions, except the final block when n is not a
  * multiple of D+1, where the truncated block's earliest chunk is displaced
  * blockLen−1 < D; every other chunk moves one position earlier). Its rows land behind a watermark the later chunks already
  * advanced, so the joins report store-side `numRowsDroppedByWatermark > 0`
  * per batch (recorded in the trace), and the probe additionally runs the
  * q166-style hourly-aggregation audit whose measured loss
  * (n_total − Σ final window counts) is checked against the ANALYTIC
  * per-batch prediction derived from the chunk stats with q166's pinned
  * cutoff arithmetic: the late filter in batch b uses the ms-floored max
  * event time of batches ≤ b−2 minus the 1 h horizon, and a row is dropped
  * iff its hour-window END ≤ that watermark (the lagged protocol,
  * StreamingSpec's q166 pin).
  *
  * `--stateParts P` (VERDICT r11 item 3): overrides the fixture-sized state
  * parallelism (4) the query code pins, demonstrating the deployment knob —
  * at 100× input, 32 state partitions should cut the join walls several
  * fold because per-batch state-store commit work parallelizes.
  *
  * Usage: `StreamProbe <sfDir> [--paced N] [--late D] [--stateParts P]
  * [querySubstring...]` — prints one JSON line.
  */
object StreamProbe {

  private val usage =
    "usage: StreamProbe <sfDir> [--paced N] [--late D] [--stateParts P] [querySubstring...]"

  /** `Files.list` with the stream closed (ADVICE r12 — each unclosed stream
    * leaks a directory fd). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector
    } finally st.close()
  }

  /** Per-chunk stats the analytic late-drop predictor needs: chunk index
    * (1-based, event-time order), max event time (µs), and row counts per
    * hour-window end (µs). */
  private case class ChunkStats(idx: Int, maxUs: Long, winCounts: Map[Long, Long])

  /** Split `<dir>/events.parquet` into `n` time-ordered chunk files under a
    * fresh temp dir (returned with per-chunk stats), file i covering an
    * earlier ts range than file i+1. Arrival order (stamped mtimes, replayed
    * oldest-first by the file source) is event-time order when `late == 0`;
    * with `late = D > 0` it is the bounded-displacement permutation
    * described in the object scaladoc. Returns (tempDir, chunk stats in
    * ARRIVAL order); the caller deletes tempDir when done (ADVICE r12). */
  private def buildPaced(spark: SparkSession, dir: String, n: Int,
      late: Int): (java.nio.file.Path, Seq[ChunkStats]) = {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory(Paths.get("/tmp"), "graft-paced-")
    val evDir = out.resolve("events.parquet")
    Files.createDirectories(evDir)
    // paced mode rewrites ONLY events; stream-static queries (q77) also
    // read dimension tables from the run dir — symlink the siblings in
    listDir(Paths.get(dir))
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        p.getFileName.toString != "events.parquet")
      .foreach(p => Files.createSymbolicLink(out.resolve(p.getFileName), p))
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
      // bounded stats frame: n chunks × |hour windows| rows
      val stats = tiled
        .groupBy(col("__chunk"),
          expr("(unix_micros(ts) div 3600000000 + 1) * 3600000000")
            .as("win_end_us"))
        .agg(count(lit(1)).as("cnt"), max(expr("unix_micros(ts)")).as("mx"))
        .collect()
      val byChunk = stats.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
        case (c, rows) => ChunkStats(c, rows.map(_.getLong(3)).max,
          rows.map(r => r.getLong(1) -> r.getLong(2)).toMap)
      }
      // arrival position per chunk index (1-based both ways): identity when
      // late == 0; block-rotated (earliest chunk of each D+1 block last)
      // when late > 0.
      val pos: Int => Int =
        if (late <= 0) identity
        else { i =>
          val block0 = (i - 1) / (late + 1) * (late + 1) // 0-based block start
          val off = i - 1 - block0
          val blockLen = math.min(late + 1, n - block0)
          if (off == 0) block0 + blockLen // earliest → end of block
          else block0 + off // everyone else one position earlier
        }
      val base = System.currentTimeMillis() - (n + 1) * 1000L
      (1 to n).foreach { i =>
        val tmp = out.resolve(f"tmp-$i%04d")
        tiled.filter(col("__chunk") === i).drop("__chunk")
          .coalesce(1).write.parquet(tmp.toString)
        val part = listDir(tmp)
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(sys.error(s"no part file in $tmp"))
        val dst = evDir.resolve(f"chunk-$i%04d.parquet")
        Files.move(part, dst)
        // setLastModifiedTime throws on failure — a silently unstamped
        // chunk would replay out of order and fake late drops (ADVICE r12)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(base + pos(i) * 1000L))
        listDir(tmp).foreach(Files.deleteIfExists)
        Files.deleteIfExists(tmp)
      }
      (out, byChunk.sortBy(c => pos(c.idx)))
    } finally tiled.unpersist()
  }

  /** Analytic per-batch late-drop prediction over chunks in ARRIVAL order,
    * with q166's pinned lagged-watermark arithmetic (see object scaladoc).
    * Batch b (0-based) = arrival position b+1. */
  private def predictDrops(arrival: Seq[ChunkStats]): Seq[Long] =
    arrival.zipWithIndex.map { case (c, b) =>
      if (b < 2) 0L
      else {
        val wmStatsUs = arrival.take(b - 1).map(_.maxUs).max // batches ≤ b−2
        val wUs = (wmStatsUs / 1000L - 3600000L) * 1000L
        c.winCounts.collect { case (winEnd, cnt) if winEnd <= wUs => cnt }.sum
      }
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    try java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(q => java.nio.file.Files.deleteIfExists(q))
    catch { case scala.util.control.NonFatal(_) => () }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf01x10")
    var paced = 0
    var late = 0
    var stateParts = 0
    val only = scala.collection.mutable.Buffer[String]()
    def flagVal(i: Int): Int = {
      // missing or non-numeric flag values die with usage, not a raw
      // ArrayIndexOutOfBounds/NumberFormatException (ADVICE r12)
      if (i + 1 >= args.length) sys.error(s"missing value for ${args(i)}\n$usage")
      args(i + 1).toIntOption.getOrElse(
        sys.error(s"non-numeric value '${args(i + 1)}' for ${args(i)}\n$usage"))
    }
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--paced"      => paced = flagVal(i); i += 2
        case "--late"       => late = flagVal(i); i += 2
        case "--stateParts" => stateParts = flagVal(i); i += 2
        case q              => only += q; i += 1
      }
    }
    if (late > 0 && paced <= 0) sys.error(s"--late requires --paced\n$usage")
    val spark: SparkSession = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val joins = Seq(
      "q103_stream_stream_join",
      "q128_stream_left_outer",
      "q192_stream_full_outer")
    // paced mode only rewrites events, so it drives the events-only
    // queries; the stateful-API trio (VERDICT r12 item 5) joins the paced
    // set when explicitly named.
    val stateful = Seq("q24_streaming_hourly", "q77_stream_static_join",
      "q125_tws_sessions", "q284_tws_timer_sessions")
    val all = joins ++ Seq("q186_checkpoint_restart", "q224_idempotent_sink")
    val candidates = if (paced > 0) joins ++ stateful else all
    val names =
      if (only.isEmpty) { if (paced > 0) joins else all }
      else candidates.filter(n => only.exists(n.contains))
    val registry = graft.streaming.Streaming.queries ++
      graft.streaming.StatefulSessions.queries

    val (runDir, arrival) =
      if (paced > 0) {
        val (d, a) = buildPaced(spark, dir, paced, late)
        (d.toString, a)
      } else (dir, Seq.empty[ChunkStats])
    if (paced > 0) graft.streaming.Streaming.probeMaxFilesPerTrigger.set(Some(1))
    if (stateParts > 0) graft.streaming.Streaming.probeStateParallelism.set(Some(stateParts))
    try {
      val results = names.map { name =>
        val fn = registry(name)
        val t0 = System.nanoTime()
        try {
          try {
          val rows = fn(spark, runDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val st = graft.streaming.Streaming.lastRunStateMetrics.get()
          val trace = graft.streaming.Streaming.lastRunStateTrace.get()
          val stJson = st.map { case (op, peak, removed, batches) =>
            s"""{"op":"$op","peak_state_rows":$peak,"rows_removed":$removed,"batches":$batches}"""
          }.mkString("[", ",", "]")
          // per-batch curve: [batchId, op, stateRows, removed, droppedByWm]
          val trJson = trace.map { case (b, op, tot, rem, drop) =>
            s"""[$b,"$op",$tot,$rem,$drop]"""
          }.mkString("[", ",", "]")
          (name, f"""{"sec":$sec%.1f,"rows":$rows,"state":$stJson,"trace":$trJson}""")
          } catch {
            // one failing query must not void the others' evidence
            case scala.util.control.NonFatal(e) =>
              (name, s"""{"error":"${e.getClass.getSimpleName}: ${
                Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(160)
                  .replace("\\", "\\\\").replace("\"", "'")}"}""")
          }
        } finally {
          // per-query cleanup even when a query fails mid-loop (ADVICE r12)
          graft.streaming.Streaming.lastRunStateMetrics.remove()
          graft.streaming.Streaming.lastRunStateTrace.remove()
          graft.Caches.releaseAll()
        }
      }
      val lateJson =
        if (late > 0) {
          val predicted = predictDrops(arrival)
          val audit = graft.streaming.Streaming
            .probeLateHourlyAudit(spark, runDir).collect()(0)
          graft.Caches.releaseAll()
          val (total, counted, dropped) =
            (audit.getLong(0), audit.getLong(1), audit.getLong(2))
          val ok = predicted.sum == dropped
          s""","late_audit":{"n_total":$total,"n_counted":$counted,""" +
            s""""late_drops_measured":$dropped,""" +
            s""""late_drops_predicted":${predicted.sum},""" +
            s""""predicted_per_batch":${predicted.mkString("[", ",", "]")},""" +
            s""""prediction_matches":$ok}"""
        } else ""
      println(results.map { case (n, j) => s""""$n":$j""" }
        .mkString(
          s"""{"metric":"stream_probe","sf":"${dir.split('/').last}",""" +
            s""""paced_chunks":$paced,"late_displacement":$late,""" +
            s""""state_parts":$stateParts,"queries":{""",
          ",", "}" + lateJson + "}"))
    } finally {
      graft.streaming.Streaming.probeMaxFilesPerTrigger.remove()
      graft.streaming.Streaming.probeStateParallelism.remove()
      if (paced > 0) deleteRecursively(java.nio.file.Paths.get(runDir))
    }
    spark.stop()
  }
}
