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
}
