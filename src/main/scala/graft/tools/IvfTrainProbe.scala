package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only probe for the trained-IVF question (VERDICT r11 item 1): does
  * k-means training lift index recall at a fixed probe fraction?
  *
  * On the driver's synthetic embeddings the answer is measurably "no
  * structure to learn": same-label mean cosine is ~0.0008 vs ~0.0000 for
  * different labels (isotropic by construction), so trained and untrained
  * codebooks both hover near the geometric baseline and neither can
  * "materially" beat the other. To show the trained path DOES win when
  * structure exists — the regime a real corpus is in — this probe PLANTS
  * cluster structure (the planted-skew AQE test's idiom applied to
  * embeddings): each vector is shifted toward a deterministic per-label
  * direction, `e'[j] = e[j] + α·u(label)[j]`, with u derived by integer
  * hashing (no RNG, reproducible), then both q274 (untrained seed
  * centroids) and q277 (q110-trained exact fixed-point k-means) run on the
  * planted corpus and report index recall vs the brute top-10.
  *
  * Usage: `IvfTrainProbe <srcSfDir> <workDir> [alpha100] [jitter100]
  * [synthetic]` — alpha100 is the shift strength ×100 (default 8 → α=0.08;
  * per-dim values are ~N(0,1)-ish scaled, so α=0.08 over 64 dims gives
  * same-label cosine ≈ 0.3). jitter100 (default 0) adds a per-VECTOR
  * hash-derived jitter β·v(vec_id)[j] on top of the per-label shift
  * (VERDICT r13 item 6): on a ScaleUp replica every vector has K−1 exact
  * shifted-key copies and a label-only plant keeps them exactly coincident,
  * forcing the 100%/100% recall degeneracy. A small jitter separates the
  * copies but they remain a micro-cluster inside one cell (index recall
  * stays trivially 100% — measured at the 200k tier), so `synthetic` mode
  * DROPS the copied base entirely: e'[j] = α·u(label)[j] + β·v(vec_id)[j]
  * — N distinct reproducible vectors with label clusters of strength
  * α/β (same-label cos ≈ α²/(α²+β²)), the regime a real 100× corpus is in
  * (new vectors, not copies). Prints one JSON line (including q282's
  * trained-IVF-PQ ADC recall) and leaves the planted replica in workDir.
  */
object IvfTrainProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/sfplanted")
    val alpha = args.lift(2).map(_.toInt).getOrElse(8) / 100.0
    val jitter = args.lift(3).map(_.toInt).getOrElse(0) / 100.0
    val synthetic = args.lift(4).contains("synthetic")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // plant: u(label)[j] = multiplicative-hash value in [-0.5, 0.5) (the
    // skew-planting idiom — 10 labels, no aliasing risk); v(vec_id)[j] =
    // xxhash64-derived value. The per-vector term MUST be a real hash: a
    // linear congruence (first cut) satisfies v(id+Δ)[j] − v(id)[j] =
    // Δ·c mod m for every j, so ids Δ ≡ 0 (mod m/gcd) got IDENTICAL
    // vectors — ~200 exact clones per query at the 200k tier, silently
    // re-creating the copy degeneracy the jitter exists to break.
    val baseTerm = if (synthetic) "" else "x +"
    val planted = spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("embedding", expr(
        s"""transform(embedding, (x, j0) -> CAST($baseTerm
           |  $alpha * (CAST(pmod(label * 73856093 + (j0 + 1) * 19349663, 1000)
           |            AS DOUBLE) / 1000.0 - 0.5) +
           |  $jitter * (CAST(pmod(xxhash64(vec_id, j0), 1000)
           |            AS DOUBLE) / 1000.0 - 0.5) AS FLOAT))""".stripMargin))
    planted.write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    def recall(name: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, work)
      val r = df.agg(avg(col("index_recall_ppm")).as("ir"),
        avg(col(if (name.contains("q277")) "ivf_ndcg_ppm" else "ivf_recall_ppm")).as("m2"))
        .head()
      graft.Caches.releaseAll()
      (r.getDouble(0), r.getDouble(1), (System.nanoTime() - t0) / 1e9)
    }
    // trained-PQ quantization distortion (VERDICT r12 item 3): corpus-total
    // SSE under q102's untrained seed codebook vs the q281-trained one
    def pqDistortion(): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val r = graft.SparkEntry.queries("q281_trained_pq_distortion")(spark, work)
        .agg(sum(col("sse_seed")).as("s"), sum(col("sse_trained")).as("t")).head()
      graft.Caches.releaseAll()
      (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
    }
    // structure check: mean same-label vs cross-label cosine on the replica
    val structSql = spark.read.parquet(s"$work/embeddings.parquet")
      .filter(col("vec_id") < 300)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vv"))
    val n = structSql.withColumn("nrm",
      sqrt(aggregate(transform(col("vv"), x => x * x), lit(0.0), (a, x) => a + x)))
    val pairs = n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select((col("a.label") === col("b.label")).as("same"),
        (aggregate(zip_with(col("a.vv"), col("b.vv"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x) / (col("a.nrm") * col("b.nrm"))).as("cs"))
      .groupBy("same").agg(avg(col("cs")).as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val (untrained, _, secU) = recall("q274_ivf_retrieval_eval")
    val (trained, _, secT) = recall("q277_trained_ivf_eval")
    // trained-IVF-PQ end-to-end recall (q282's recall_ppm vs the brute
    // top-10) — the number directive r13 item 6 wants non-degenerate
    val (pqRecall, secPqR) = {
      val t0 = System.nanoTime()
      val r = graft.SparkEntry.queries("q282_trained_ivfpq_recall")(spark, work)
        .agg(avg(col("recall_ppm"))).head().getDouble(0)
      graft.Caches.releaseAll()
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (sseSeed, sseTrained, secPq) = pqDistortion()
    val pqImp =
      if (sseSeed > 0) (BigInt(sseSeed - sseTrained) * 1000000 / BigInt(sseSeed)).toLong
      else 0L
    println(f"""{"metric":"ivf_trained_probe","src":"$src","alpha":$alpha%.2f,""" +
      f""""jitter":$jitter%.2f,"synthetic":$synthetic,""" +
      f""""same_label_cos":${pairs.getOrElse(true, 0.0)}%.4f,""" +
      f""""cross_label_cos":${pairs.getOrElse(false, 0.0)}%.4f,""" +
      f""""untrained_index_recall_ppm":$untrained%.0f,""" +
      f""""trained_index_recall_ppm":$trained%.0f,""" +
      f""""ivfpq_adc_recall_ppm":$pqRecall%.0f,""" +
      f""""untrained_sec":$secU%.1f,"trained_sec":$secT%.1f,""" +
      f""""ivfpq_sec":$secPqR%.1f,""" +
      f""""pq_sse_seed":$sseSeed,"pq_sse_trained":$sseTrained,""" +
      f""""pq_improvement_ppm":$pqImp,"pq_sec":$secPq%.1f}""")
    spark.stop()
  }
}
