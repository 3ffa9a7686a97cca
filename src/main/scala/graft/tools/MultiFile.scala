package graft.tools

/** Dev-only re-layout of the driver's testdata into MANY-FILE directories —
  * the input shape a 100 TB cluster actually has (VERDICT r7, next-round #1).
  *
  * The driver ships each table as a single `<dir>/<name>.parquet` file;
  * production corpora arrive as thousands of part files per table, where
  * scan parallelism comes from file splitting, footers are read per file,
  * and the scheduler packs small files into `maxPartitionBytes` bins.
  * `Tables.load` already takes any path Spark can read (a directory of
  * part files is the DEFAULT Spark layout) — this tool exists to let
  * Verify/Bench PROVE that: `MultiFile <srcDir> <dstDir> [nFiles]` rewrites
  * every table as `<dstDir>/<name>.parquet/part-*` (round-robin
  * `repartition(n)`, so files are uniform and ordering-degenerate — any
  * result that depends on file order would be caught by the hash compare).
  *
  * The events table round-trips through whatever physical `ts` shape the
  * source carries (raw ns-long under the legacy read, NTZ µs, …);
  * `Tables.canonicalTs` re-canonicalizes on load either way — this tool
  * deliberately does NOT normalize, so the multi-file tier also exercises
  * the unit-inference path on re-written footers.
  */
object MultiFile {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf0.1-mf32")
    val n = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .repartition(n)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"[multifile] wrote $src as $n-file directories under $dst")
    spark.stop()
  }
}
