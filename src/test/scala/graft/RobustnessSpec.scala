package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-corpus robustness for the THRESHOLD-TUNED operators (VERDICT r5
  * item 5): constants tuned on the driver's synthetic corpus (q46's band
  * width + 0.5 Jaccard cut, q129's ≤4 edit-distance in (brand,size)
  * blocks, q156's ε=0.30 cosine, q161's ±3·MAD seasonal gate) must not
  * silently become no-ops on data they weren't tuned on. The spec builds a
  * VARIANT corpus — every row unioned with a deterministically PERTURBED
  * replica under shifted keys (one word appended to each document, one
  * character appended to each part name, +0.02 on one embedding
  * component, events replayed 30 min later) — and asserts each operator
  * still finds the planted near-but-NOT-exact structure. A pass means the
  * thresholds have real margin: they fire on ~0.95-similar pairs, not
  * just on the exact duplicates of the tuning corpus.
  */
class RobustnessSpec extends SparkSpec {

  private lazy val variant: (String, Long, Long, Long) = {
    val src = sf("sf0.01")
    val dir = java.nio.file.Files.createTempDirectory("graft-variant").toString

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docSpan = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    docs.unionByName(docs
        .withColumn("doc_id", col("doc_id") + lit(docSpan))
        .withColumn("text", concat(col("text"), lit(" robustness probe"))))
      .write.parquet(s"$dir/documents.parquet")

    val part = spark.read.parquet(s"$src/part.parquet")
    val partSpan = part.agg(max(col("p_partkey"))).head.getLong(0) + 1L
    part.unionByName(part
        .withColumn("p_partkey", col("p_partkey") + lit(partSpan))
        .withColumn("p_name", concat(col("p_name"), lit("x"))))
      .write.parquet(s"$dir/part.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecSpan = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    emb.unionByName(emb
        .withColumn("vec_id", col("vec_id") + lit(vecSpan))
        .withColumn("embedding",
          expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(x + 0.02 AS FLOAT) ELSE x END)")))
      .write.parquet(s"$dir/embeddings.parquet")

    // shape-agnostic: canonicalize ts first (ns-long / NTZ / TZ all become
    // µs TimestampType — the same boundary rule the engine applies), then
    // shift by interval; the perturbed file reads back as TimestampType
    val ev = Tables.canonicalTs(spark.read.parquet(s"$src/events.parquet"))
    val evSpan = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    ev.unionByName(ev
        .withColumn("event_id", col("event_id") + lit(evSpan))
        .withColumn("ts", col("ts") + expr("INTERVAL 30 MINUTES")))
      .write.parquet(s"$dir/events.parquet")

    (dir, docSpan, partSpan, vecSpan)
  }

  private def run(q: (org.apache.spark.sql.SparkSession, String) => DataFrame): DataFrame =
    q(spark, variant._1)

  test("q46 MinHash/LSH bands catch one-word-appended near-dups (not only exact copies)") {
    try {
      val pairs = run(ops.Dedup.q46MinhashLshPairs _)
      val planted = pairs.filter(col("doc_b") - col("doc_a") === lit(variant._2))
        .select(col("jaccard")).collect()
      assert(planted.nonEmpty, "no (original, perturbed-replica) pair surfaced")
      assert(planted.forall(r => r.getDouble(0) > 0.5 && r.getDouble(0) < 1.0),
        "planted pairs must be near (0.5, 1.0) exclusive — perturbed, not exact")
    } finally Caches.releaseAll()
  }

  test("q129 banded edit-distance catches one-character-appended names") {
    try {
      val planted = run(ops.Dedup.q129EditDistPairs _)
        .filter(col("k2") - col("k1") === lit(variant._3))
      assert(planted.count() > 0, "no (original, appended-x replica) pair in the top-50")
    } finally Caches.releaseAll()
  }

  test("q156 SemDeDup ε has margin: jittered replicas still dedup") {
    try {
      val stats = run(ops.Vector.q156SemanticDedup _)
        .agg(sum(col("n_dup_pairs")).as("p"), sum(col("n_dropped")).as("d")).head()
      assert(stats.getLong(0) > 0L, "ε=0.30 found no dup pairs on the jittered corpus")
      assert(stats.getLong(1) > 0L, "no vectors dropped")
    } finally Caches.releaseAll()
  }

  test("q161 seasonal anomaly gate still fires on the time-shifted union") {
    try {
      assert(run(ops.Events.q161SeasonalAnomaly _).count() > 0L,
        "±3·MAD gate flagged nothing on the variant corpus")
    } finally Caches.releaseAll()
  }
}
