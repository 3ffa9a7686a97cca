package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only constrained-memory spill proof (VERDICT r7, next-round #2).
  *
  * The 128 GiB sandbox never exercises the spill paths that dominate real
  * clusters: at comfortable heap, hash aggregation, sort, and shuffle all
  * stay in memory, so a query whose answer silently depends on
  * everything-fits (an aggregation buffer that assumes one pass, a sort
  * whose comparator breaks on merge-of-spills) would test green here and
  * corrupt at 100 TB, where EVERY operator spills. This main runs a query
  * subset twice from `scripts/spill_proof.sh` — once at default heap, once
  * with the JVM capped (e.g. `-Xmx2g`) so the same 10×-scale inputs MUST
  * spill — and emits a canonical result checksum per query plus the
  * executor spill counters, so the script can assert (a) identical
  * checksums and (b) that the constrained run actually spilled (a
  * no-spill "proof" proves nothing).
  *
  * Usage: `SpillProof <sfDir> <outJson> [query...]` (default queries = the
  * shuffle/sort/agg-heaviest batch queries from the 10× scaling probe).
  */
object SpillProof {

  private val DefaultQueries = Seq(
    "q124_mad_outliers", "q101_corpus_pipeline", "q154_pagerank_dangling",
    "q114_trigram_rarity", "q158_leakage_safe_split", "q156_semantic_dedup",
    "q118_basket_pairs", "q147_cluster_keepbest", "q121_shortest_hops",
    "q48_dedup_clusters", "q102_ivfpq_topk", "q106_ngram_jaccard_join",
    "q163_span_coverage", "q183_longest_dup_span")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf0.1-x10")
    val out = args.lift(1).getOrElse("/tmp/spill_hashes.json")
    val names = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Memory-proportional auto-broadcast threshold — what a real
    // memory-constrained deployment sets. The default 10 MB assumes a
    // multi-GB executor; at -Xmx2g (driver AND all executor threads in one
    // local-mode heap) building a near-10 MB hash relation can exceed the
    // free heap and fail the whole query ("Not enough memory to build and
    // broadcast" — observed on q48's pair table at the 10× tier). Scaling
    // the threshold with the heap demotes those joins to shuffle joins,
    // which spill instead of failing; result equality across DIFFERENT
    // physical plans is a stronger correctness statement anyway. Explicit
    // broadcast() hints (1-row bounds frames etc.) ignore this and still
    // broadcast — they are bounded by construction.
    val bcast = math.max(1L << 20, Runtime.getRuntime.maxMemory() / 2048)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast.toString)

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        memSpill.addAndGet(sc.stageInfo.taskMetrics.memoryBytesSpilled)
        diskSpill.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
      }
    })

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      // Hash DISTRIBUTED (the repo's own no-collect rule, and the reason
      // this harness can run under a 2 GiB driver at all: q118 returns
      // 1.2M rows at 10× — collecting that IS the driver OOM we are not
      // testing for). Each row renders to one string (nulls sentineled so
      // null never aliases an empty string,  column separator so
      // adjacent columns never re-segment), and two independent
      // order-insensitive checksums reduce it: Σ crc32(row) and
      // Σ crc32(reverse(row)). Cross-heap equality of (n, h1, h2) is the
      // spill-correctness gate; row order is irrelevant by construction,
      // so shuffle nondeterminism between heap sizes cannot alias a real
      // value divergence.
      val (n, h1, h2) =
        try {
          import org.apache.spark.sql.functions._
          val df = fn(spark, dir)
          val rendered = concat_ws("|#|",
            df.columns.map(c => coalesce(col(c).cast("string"), lit("<NUL>"))): _*)
          val r = df.select(rendered.as("r"))
            .agg(count(lit(1)), coalesce(sum(crc32(col("r"))), lit(0L)),
              coalesce(sum(crc32(reverse(col("r")))), lit(0L)))
            .head()
          (r.getLong(0), r.getLong(1), r.getLong(2))
        } finally graft.Caches.releaseAll()
      val sec = (System.nanoTime() - t0) / 1e9
      val hash = f"$h1%x-$h2%x"
      println(f"[spill] $name%-28s rows=$n%-8d ${sec}%6.1fs hash=$hash")
      (name, n, hash, sec)
    }

    val json = new StringBuilder
    json ++= s"""{"dir":"$dir","heap_max_mb":$heapMb,"cpus":$cpus,"""
    json ++= s""""spill_mem_mb":${memSpill.get / (1024 * 1024)},"""
    json ++= s""""spill_disk_mb":${diskSpill.get / (1024 * 1024)},"queries":{"""
    json ++= results.map { case (n, r, h, s) =>
      f""""$n":{"rows":$r,"hash":"$h","sec":$s%.1f}"""
    }.mkString(",")
    json ++= "}}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json.toString)
    println(s"[spill] heap=${heapMb}MB spilled mem=${memSpill.get / (1024 * 1024)}MB " +
      s"disk=${diskSpill.get / (1024 * 1024)}MB -> $out")
    spark.stop()
  }
}
