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
  * spill — and emits a canonical result hash per query plus the executor
  * spill counters, so the script can assert (a) identical hashes and
  * (b) that the constrained run actually spilled (a no-spill "proof"
  * proves nothing).
  *
  * Usage: `SpillProof <sfDir> <outJson> [query...]` (default queries = the
  * shuffle/sort/agg-heaviest batch queries from the 10× scaling probe).
  * Hashes are md5 over the SORTED canonical row strings — row order is
  * irrelevant, so shuffle nondeterminism between heap sizes cannot alias
  * a real value divergence.
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
      val rows =
        try fn(spark, dir).collect()
        finally graft.Caches.releaseAll()
      val sec = (System.nanoTime() - t0) / 1e9
      // canonical per-row rendering; sorted so row order cannot matter
      val canon = rows.map(_.toString).sorted.mkString("\n")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
      println(f"[spill] $name%-28s rows=${rows.length}%-6d ${sec}%6.1fs hash=$hash")
      (name, rows.length, hash, sec)
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
