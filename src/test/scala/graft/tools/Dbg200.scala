package graft.tools

import graft.Tables
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of q200 at a scale-up dir to localize
  * where the BM25 plan loses time (not part of the driver contract). */
object Dbg200 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg200] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    t("tokenize+count")(toks.count())
    val postings = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    t("postings")(postings.count())
    val probeTerms = toks.filter(col("doc_id") < 20)
      .select(col("doc_id").as("probe_id"),
        explode(array_distinct(col("toks"))).as("tok"))
    t("probeTerms")(probeTerms.count())
    t("hits")(probeTerms.join(postings, Seq("tok"))
      .filter(col("doc_id") =!= col("probe_id")).count())
    t("q200 full")(Text.q200Bm25Retrieval(spark, dir).count())
    graft.Caches.releaseAll()
    println(Text.q200Bm25Retrieval(spark, dir)
      .queryExecution.executedPlan.toString.take(5000))
    graft.Caches.releaseAll()
    spark.stop()
  }
}
