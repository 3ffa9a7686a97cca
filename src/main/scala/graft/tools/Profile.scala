package graft.tools

import graft.Tables
import graft.ops.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the heavy extension queries (not part of the
  * driver contract). Times each stage of the minhash/LSH and vector plans to
  * localize non-codegen hot spots. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    t("q46 full")(graft.ops.Dedup.q46MinhashLshPairs(spark, dir).count())

    val emb = Tables.embeddings(spark, dir)
    t("emb.count")(emb.count())
    val v = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    t("cast+norm") { v.select(sqrt(aggregate(zip_with(col("v"), col("v"), (a, b) => a * b), lit(0.0), (x, y) => x + y)).as("n")).agg(sum("n")).head(); 1L }
    t("q52 full")(graft.ops.Vector.q52EmbeddingNearDup(spark, dir).count())
    t("q50 full")(graft.ops.Vector.q50CosineTopk(spark, dir).count())
    t("q21 sessions")(graft.ops.Events.q21Sessions(spark, dir).count())
    spark.stop()
  }
}
