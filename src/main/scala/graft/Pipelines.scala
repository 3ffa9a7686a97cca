package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a user of this
  * library actually runs, built entirely from the engine's own operators
  * (BASELINE.json north_star: the LLM-data-pipeline surface):
  *
  *  1. dedup   — exact (content hash) + near-dup (MinHash/LSH clusters),
  *               via [[ops.Dedup.cleanedCorpus]];
  *  2. quality — minimum token count + punctuation-ratio gate
  *               (ops.Text.q41's criteria);
  *  3. chunk   — overlapping token windows (50 tokens, stride 25 — the
  *               q97 packing shape), exploded to one row per chunk;
  *  4. split   — deterministic md5-slot train/eval partition (the q92
  *               content-stable sampling), written hive-partitioned so
  *               downstream readers prune by split.
  *
  * Every stage is a declarative plan: the only shuffles are the dedup
  * pipeline's own and the final partitioned write; chunking and splitting
  * are embarrassingly parallel. Returns the per-split summary.
  */
object Pipelines {

  private val ChunkLen = 50
  private val ChunkStride = 25

  def prepareCorpus(s: SparkSession, dir: String, outDir: String,
      minTokens: Int = 10, maxPunctRatio: Double = 0.5): DataFrame = {
    val deduped = ops.Dedup.cleanedCorpus(s, dir, s"$outDir/deduped")

    val toks = ops.Text.tokens(col("text"))
    val quality = deduped
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
          .cast("double") / greatest(length(col("text")), lit(1)))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)

    val nChunks = when(col("n_tokens") <= ChunkLen, lit(1))
      .otherwise(ceil((col("n_tokens") - ChunkLen).cast("double") / ChunkStride).cast("int") + 1)
    val chunks = quality
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(
        col("doc_id"), col("lang"), col("chunk_idx"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * ChunkStride + 1).cast("int"), lit(ChunkLen)))
          .as("chunk_text"))

    val split = when(
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long") % 16 === 0, "eval").otherwise("train")
    val corpus = chunks.withColumn("split", split)
    corpus.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/chunks")

    Materialize.readTable(s, s"$outDir/chunks")
      .groupBy(col("split"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"))
      .orderBy(col("split"))
  }
}
