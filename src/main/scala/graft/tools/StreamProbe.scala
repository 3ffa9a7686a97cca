package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only streaming scale probe (VERDICT r10 item 7): run the
  * stream-stream join family on a scaled replica (`ScaleUp` output) and
  * record, per query, the wall seconds AND the state-store metrics Spark
  * reports per stateful operator — peak `numRowsTotal` across micro-batches
  * (the state the watermark actually allowed to accumulate), total
  * `numRowsRemoved` (eviction doing its job), and micro-batch count. This
  * grounds the "state stays bounded by the watermark horizon" claim with
  * measured numbers instead of semantics arguments: at 10× the input, peak
  * state should track the rows inside one watermark horizon (input-rate ×
  * horizon), NOT total input.
  *
  * Usage: `StreamProbe <sfDir> [querySubstring...]` — prints one JSON line.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf01x10")
    val only = args.drop(1)
    val spark: SparkSession = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = Seq(
      "q103_stream_stream_join",
      "q128_stream_left_outer",
      "q192_stream_full_outer",
      "q186_checkpoint_restart",
      "q224_idempotent_sink")
    val names = if (only.isEmpty) all else all.filter(n => only.exists(n.contains))
    val results = names.map { name =>
      val fn = graft.streaming.Streaming.queries(name)
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = graft.streaming.Streaming.lastRunStateMetrics.get()
      graft.streaming.Streaming.lastRunStateMetrics.remove()
      graft.Caches.releaseAll()
      val stJson = st.map { case (op, peak, removed, batches) =>
        s"""{"op":"$op","peak_state_rows":$peak,"rows_removed":$removed,"batches":$batches}"""
      }.mkString("[", ",", "]")
      (name, f"""{"sec":$sec%.1f,"rows":$rows,"state":$stJson}""")
    }
    println(results.map { case (n, j) => s""""$n":$j""" }
      .mkString(s"""{"metric":"stream_probe","sf":"${dir.split('/').last}","queries":{""", ",", "}}"))
    spark.stop()
  }
}
