package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only synthetic scale-up of the driver's testdata (NOT part of the
  * driver contract, which benches sf0.1): replicate the fact tables K×
  * with shifted primary keys against the SAME dimension tables — the shape
  * real growth takes (more orders per customer, more events per user, more
  * near-duplicate documents per source) — to probe how wall-time curves as
  * data outgrows the judged tier. `ScaleUp <srcDir> <dstDir> [k]` writes
  * parquet to dstDir; run `SPARK_GRAFT_SF_DIR=<dstDir> runMain graft.Bench
  * <subset...>` against it.
  *
  * Key shifting preserves referential integrity within each replica
  * (l_orderkey ↔ o_orderkey shift together) and leaves foreign keys into
  * dims (custkey, suppkey, partkey, user_id) unshifted, so join fan-outs
  * scale K× like production facts. doc_id/vec_id shift so dedup/ANN see K
  * near-copies of every document — the hard case for those operators.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = Seq("region", "nation", "customer", "supplier", "part")
    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    }

    def maxPlus1(t: String, c: String): Long =
      spark.read.parquet(s"$src/$t.parquet").agg(max(col(c))).head.get(0) match {
        case null      => 0L
        case n: Number => n.longValue() + 1L
      }

    def replicate(t: String, shifted: Seq[(String, Long)]): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val copies = (0 until k).map { i =>
        shifted.foldLeft(base) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(i * span))
        }
      }
      copies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    // ONE shared span for the linked pair, taken from the parent table:
    // independently-computed maxima diverge whenever trailing orders have
    // no lineitems, and every replica's lineitems would then reference the
    // wrong (or absent) orders — silently corrupting join fan-outs in the
    // scaling probe (ADVICE r5).
    val orderSpan = maxPlus1("orders", "o_orderkey")
    replicate("orders", Seq("o_orderkey" -> orderSpan))
    replicate("lineitem", Seq("l_orderkey" -> orderSpan))
    replicate("events", Seq("event_id" -> maxPlus1("events", "event_id")))
    replicate("documents", Seq("doc_id" -> maxPlus1("documents", "doc_id")))
    replicate("embeddings", Seq("vec_id" -> maxPlus1("embeddings", "vec_id")))
    println(s"[scaleup] wrote ${k}x of $src to $dst")
    spark.stop()
  }
}
