package graft

/** Degenerate-input robustness: EVERY SparkEntry query must run (not
  * necessarily return rows) on a testdata directory whose tables are all
  * empty. ADVICE.md r1 found q48 NPE'ing on a corpus with no near-dup
  * pairs — this pins the whole surface against that failure class (empty
  * aggregates returning NULL, .head on empty frames, min/max of nothing,
  * windows over zero rows, streams with zero files' worth of rows).
  */
class EmptyDataSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val src = sf()
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      val full = spark.read.parquet(s"$src/$n.parquet")
      full.limit(0).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query survives all-empty input tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
      finally Caches.releaseAll()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // r5 VERDICT: q166's driver-side aggregate reads (Streaming.scala — the
  // watermark-cut max, the sink-state sum, the totals row) each get a named
  // degenerate case so the CLASS is closed, not just the all-empty instance.

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q166-empty")
    rows.toDF("event_id", "ts").write.parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }
  private def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2001-09-09 $hhmm:00")

  test("q166: all-straggler input short-circuits the NULL watermark cut") {
    // ids {9, 13, 53} are all md5-stragglers → the non-straggler frame is
    // empty, max(ts) is NULL, and the watermark never leaves epoch 0:
    // nothing dropped, audit row (3, 3, 0, 3) without touching the stream.
    val out = graft.streaming.Streaming.q166LateDataAudit(spark,
      eventsDir(Seq((9L, ts("08:15")), (13L, ts("09:15")), (53L, ts("10:45"))))).collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((3L, 3L, 0L, 3L)))
  }

  test("q166: single on-time event leaves wave 1 empty (sink-state sum over one row)") {
    // cut = max − 30 min puts the lone event in wave 2; batch 0 is an empty
    // parquet file with no event-time stats, so batch 2's late filter sees
    // watermark 0. Exercises the memory-sink sum and totals-row reads with
    // a one-row stream: (1, 0, 0, 1).
    val out = graft.streaming.Streaming.q166LateDataAudit(spark,
      eventsDir(Seq((1L, ts("10:00"))))).collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((1L, 0L, 0L, 1L)))
  }
}
