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
    // mode "unique" (VERDICT r10 item 2): replica i > 0 gets UNIQUE document
    // payloads — every token suffixed with the replica tag ("dog" → "dogr3",
    // lowercase-alnum so it survives Text.tokens), which makes every 5-gram
    // shingle replica-local. Near-dup pair output then stays ~K× the base
    // corpus's pairs (each replica reproduces its own internal near-dups,
    // none across replicas) — the regime REAL 100 TB growth has, vs the
    // default shifted-key mode where every doc gains K-1 exact near-copies
    // (the adversarial pair-output blow-up tier). n_chars is recomputed so
    // length-derived features stay consistent with the new text.
    val unique = args.lift(3).contains("unique")
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

    def replicate(t: String, shifted: Seq[(String, Long)],
        payload: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val copies = (0 until k).map { i =>
        payload(shifted.foldLeft(base) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(i * span))
        }, i)
      }
      copies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    // unique-mode payload transform: replica 0 keeps the original corpus
    // verbatim (it stays a subset); replicas i > 0 get replica-tagged tokens.
    // ADVICE r11: the tag is applied per ALNUM RUN, not per whitespace word —
    // a word-level suffix detaches from intra-word punctuation after
    // Text.tokens ("don't" → tokens "don", "tr3"), leaking un-tagged tokens
    // across replicas. Tagging every [A-Za-z0-9]+ run makes the
    // replica-local-shingle guarantee alphabet-independent (case preserved,
    // so case-derived quality features are untouched).
    def uniqueDocText(df: DataFrame, i: Int): DataFrame =
      if (!unique || i == 0) df
      else df
        .withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1r$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))

    // ONE shared span for the linked pair, taken from the parent table:
    // independently-computed maxima diverge whenever trailing orders have
    // no lineitems, and every replica's lineitems would then reference the
    // wrong (or absent) orders — silently corrupting join fan-outs in the
    // scaling probe (ADVICE r5).
    val orderSpan = maxPlus1("orders", "o_orderkey")
    replicate("orders", Seq("o_orderkey" -> orderSpan))
    replicate("lineitem", Seq("l_orderkey" -> orderSpan))
    replicate("events", Seq("event_id" -> maxPlus1("events", "event_id")))
    replicate("documents", Seq("doc_id" -> maxPlus1("documents", "doc_id")),
      uniqueDocText)
    replicate("embeddings", Seq("vec_id" -> maxPlus1("embeddings", "vec_id")))
    println(s"[scaleup] wrote ${k}x of $src to $dst" +
      (if (unique) " (unique document payloads)" else ""))
    spark.stop()
  }
}
