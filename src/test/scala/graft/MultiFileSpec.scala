package graft

import org.apache.spark.sql.Row

/** Many-file input tier (VERDICT r7, next-round #1): every table rewritten
  * as a 16-part directory must produce BIT-IDENTICAL results to the
  * single-file layout — at 100 TB the input is always thousands of part
  * files, and any query whose answer depends on file count, file order, or
  * per-file row grouping is broken at scale even if the single-file tier
  * hashes green. Representative queries cover each scan family: lineitem
  * scan+agg, a broadcast join chain, window ranking, MinHash LSH dedup
  * (documents), IVF-PQ ANN (embeddings), event sessionization (the
  * canonicalTs re-round-trip), and a streaming watermark query whose
  * readStream globs the part files directly.
  */
class MultiFileSpec extends SparkSpec {

  private lazy val mfDir: String = {
    val dst = java.nio.file.Files.createTempDirectory("graft-mf").toString
    val n = 16
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"${sf("sf0.01")}/$t.parquet")
        .repartition(n)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    dst
  }

  private val probes = Seq(
    "q01_pricing_summary",   // full lineitem scan + hash agg
    "q03_revenue_by_nation", // multi-join chain with broadcast dims
    "q07_top3_per_segment",  // window ranking
    "q21_sessions",          // event-time sessionization over re-written ts
    "q46_minhash_lsh_pairs", // shingle→band→bucket-join dedup over documents
    "q102_ivfpq_topk",       // ANN probe over embeddings
    "q24_streaming_hourly")  // structured streaming over the part-file glob

  for (name <- probes) {
    test(s"$name: 16-file directories hash-identical to single-file layout") {
      val fn = SparkEntry.queries(name)
      val single: Seq[Row] =
        try fn(spark, sf("sf0.01")).collect().toSeq finally Caches.releaseAll()
      val multi: Seq[Row] =
        try fn(spark, mfDir).collect().toSeq finally Caches.releaseAll()
      assert(single.nonEmpty, s"$name returned no rows — probe is vacuous")
      assert(multi === single,
        s"$name diverges between single-file and 16-file input layouts")
    }
  }

  test("multi-file scan parallelism: lineitem reads as >1 input partition") {
    // the POINT of the layout at scale: a directory of part files must
    // split into many scan tasks (single 100 TB files cannot)
    val parts = spark.read.parquet(s"$mfDir/lineitem.parquet").rdd.getNumPartitions
    assert(parts > 1, s"expected multi-partition scan, got $parts")
  }
}
