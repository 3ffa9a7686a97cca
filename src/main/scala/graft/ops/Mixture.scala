package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixture construction (SURVEY.md §2.12 extension): given a
  * global token budget, allocate per-source token targets and draw a
  * content-stable sample hitting them — the step that turns a cleaned
  * multi-source corpus into a training mix (the "data mixing" stage every
  * large-model pipeline runs between dedup/quality and tokenization).
  *
  * Allocation is WATER-FILLING, computed in exact integers: the budget is
  * spread as an equal per-source level `L`, except sources whose whole
  * inventory fits under the level, which are taken in full ("capped") and
  * their leftover re-spread over the rest. Formally, with sources sorted by
  * (available tokens asc, name), `L` is the unique level such that
  * `sum(min(avail_s, L)) = B`; the integer remainder `B - (Pk + L*m)` is
  * assigned one extra token of target to each of the `r` smallest uncapped
  * sources, so `sum(target_s) == B` EXACTLY (or `== total` when the budget
  * covers everything). The crossing point is found set-based from prefix
  * sums over the |sources|-row aggregate — no driver loop, no floats.
  *
  * Sampling is the q92 content-stable scheme: doc kept iff
  * `slot(doc) * avail_s < target_s * 4096`, slot = first 3 hex digits of
  * md5(doc_id) — deterministic on any cluster, stable under corpus
  * repartition, and proportional to `target_s / avail_s` without ever
  * materializing a random number.
  *
  * Scale shape: one groupBy of the corpus to per-source inventories (tiny
  * frame), window arithmetic over that reduced frame only (PlanSpec-safe),
  * then the target map broadcast-joins back onto the corpus for the sample
  * filter and one final per-source rollup — two corpus-wide shuffles total,
  * nothing driver-side.
  */
object Mixture {

  private val Slots = 4096L

  /** Per-source token inventory: (source, avail, n_docs). */
  private def inventory(docTok: DataFrame): DataFrame =
    docTok.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("avail"), count(lit(1)).as("n_docs"))

  /** Water-filling targets over the inventory frame for budget `B` (a
    * Column over the cross-joined totals, e.g. `expr("total div 2")` or a
    * literal). Returns (source, avail, n_docs, target).
    * private[graft]: PropertySpec pins the allocation invariants on
    * arbitrary inventories. */
  private[graft] def allocate(inv: DataFrame, budget: org.apache.spark.sql.Column): DataFrame = {
    // every scalar (total, n_src, k, pk) is a full-frame window over the
    // SAME reduced |sources|-row frame — no scalar cross-joins, so the plan
    // has zero nested-loop nodes and the whole allocation is one narrow
    // WindowExec chain over an Aggregate (PlanSpec lint–clean by shape)
    val wAll = Window.partitionBy()
    // order: avail asc, source asc — the canonical order in BOTH engines
    val wOrd = Window.orderBy(col("avail"), col("source"))
    inv
      .withColumn("total", sum(col("avail")).over(wAll))
      .withColumn("n_src", count(lit(1)).over(wAll))
      .withColumn("b", budget)
      .withColumn("idx", row_number().over(wOrd))
      .withColumn("prefix", sum(col("avail")).over(wOrd))
      // cost of setting the level AT this source's inventory: everything up
      // to and including it taken in full, everyone after held at avail_i
      .withColumn("spend_here",
        col("prefix") - col("avail") + col("avail") * (col("n_src") - col("idx") + 1L))
      .withColumn("capped", (col("spend_here") <= col("b")).cast("long"))
      // capped is true on a PREFIX of the sort order (spend_here is
      // non-decreasing in idx), so k = count and Pk = conditional sum
      .withColumn("k", sum(col("capped")).over(wAll))
      .withColumn("pk", sum(col("avail") * col("capped")).over(wAll))
      .withColumn("m", col("n_src") - col("k"))
      // `div` (integral), not Column./ (a DOUBLE Divide) — q106's lesson
      .withColumn("lvl", when(col("m") > 0, expr("(b - pk) div m")).otherwise(lit(0L)))
      .withColumn("rem", when(col("m") > 0, (col("b") - col("pk")) % col("m")).otherwise(lit(0L)))
      .withColumn("target",
        when(col("capped") === 1, col("avail"))
          .otherwise(col("lvl") + when(col("idx") - col("k") <= col("rem"), 1L).otherwise(0L)))
      .select(col("source"), col("avail"), col("n_docs"), col("target"))
  }

  /** Driver query: allocate half the corpus's tokens across sources and
    * report, per source, the inventory, the exact target, and what the
    * content-stable sample actually drew. */
  def q113MixtureSample(s: SparkSession, dir: String): DataFrame = {
    val docTok = graft.Caches.persist(Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens")))
    val inv = inventory(docTok)
    // budget = floor(total/2): allocate() sees it as a per-row column via
    // the totals cross-join, so the whole plan stays declarative
    val targets = allocate(inv, expr("total div 2"))
    val slot = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 3), 16, 10)
      .cast("long")
    val sampled = docTok
      .join(broadcast(targets), Seq("source"))
      .withColumn("keep",
        (slot * col("avail") < col("target") * Slots).cast("long"))
      .groupBy(col("source"))
      .agg(
        coalesce(sum(col("keep")), lit(0L)).as("n_sampled"),
        coalesce(sum(col("keep") * col("n_tokens")), lit(0L)).as("tokens_sampled"))
    targets.join(sampled, Seq("source"))
      .select(col("source"), col("avail").as("avail_tokens"), col("n_docs"),
        col("target").as("target_tokens"), col("n_sampled"), col("tokens_sampled"))
      .orderBy(col("source"))
  }

  /** Identical water-filling + md5-slot sampling in DuckDB. */
  val q113Oracle: String =
    s"""WITH doc_tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(${Text.tokensSql}) AS BIGINT) AS n_tokens
      |  FROM documents),
      |inv AS (
      |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail,
      |    count(*) AS n_docs
      |  FROM doc_tok GROUP BY source),
      |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS total, count(*) AS n_src FROM inv),
      |ranked AS (
      |  SELECT i.*, t.total, t.n_src, t.total // 2 AS b,
      |    row_number() OVER (ORDER BY avail, source) AS idx,
      |    CAST(sum(avail) OVER (ORDER BY avail, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix
      |  FROM inv i CROSS JOIN tot t),
      |flags AS (
      |  SELECT *,
      |    CASE WHEN prefix - avail + avail * (n_src - idx + 1) <= b
      |      THEN 1 ELSE 0 END AS capped
      |  FROM ranked),
      |kp AS (
      |  SELECT CAST(coalesce(sum(capped), 0) AS BIGINT) AS k,
      |    CAST(coalesce(sum(avail * capped), 0) AS BIGINT) AS pk
      |  FROM flags),
      |targets AS (
      |  SELECT source, avail, n_docs,
      |    CASE WHEN capped = 1 THEN avail
      |      ELSE (b - pk) // (n_src - k)
      |        + CASE WHEN idx - k <= (b - pk) % (n_src - k) THEN 1 ELSE 0 END
      |    END AS target
      |  FROM flags CROSS JOIN kp),
      |sampled AS (
      |  SELECT d.source,
      |    CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3) AS BIGINT)
      |        * t.avail < t.target * $Slots THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |    CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3) AS BIGINT)
      |        * t.avail < t.target * $Slots THEN d.n_tokens ELSE 0 END) AS BIGINT) AS tokens_sampled
      |  FROM doc_tok d JOIN targets t ON d.source = t.source
      |  GROUP BY d.source)
      |SELECT t.source, t.avail AS avail_tokens, t.n_docs,
      |  CAST(t.target AS BIGINT) AS target_tokens, s.n_sampled, s.tokens_sampled
      |FROM targets t JOIN sampled s ON t.source = s.source
      |ORDER BY t.source""".stripMargin

  private val PackCapacity = 512L // tokens per training sequence
  private val PackShards = 64L

  /** Sequence packing — the step between sampling and tokenization in a
    * training pipeline: documents are concatenated (per source, in a
    * deterministic order) and cut into fixed-capacity training sequences.
    * A document is assigned to the sequence where its first token lands
    * (`floor(preceding_tokens / capacity)`), i.e. greedy concat-and-split
    * packing, computed as a running sum — no sequential driver loop.
    *
    * Scale shape: packing is SHARDED — the running sum is a window over
    * `(source, pack_shard)` where `pack_shard = doc_id % 64` spreads each
    * source over 64 independent packing streams. Shard count is the
    * parallelism knob: at 100 TB you size it to the cluster (each shard
    * packs ~1/shards of a source on one task); sequences never cross
    * shards, which is exactly how production packers bound coordination.
    * The per-sequence frame is then rolled up per source: sequence count,
    * packed tokens, and the mean fill ratio against capacity. */
  def q115SequencePack(s: SparkSession, dir: String): DataFrame = {
    val docTok = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("pack_shard", col("doc_id") % PackShards)
    val wPack = Window.partitionBy(col("source"), col("pack_shard"))
      .orderBy(col("doc_id"))
    val seqs = docTok
      .withColumn("cum", sum(col("n_tokens")).over(wPack))
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $PackCapacity"))
      .groupBy(col("source"), col("pack_shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
    seqs.groupBy(col("source"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_sequences"),
        sum(col("toks")).as("packed_tokens"))
      .withColumn("mean_fill",
        col("packed_tokens").cast("double") / (col("n_sequences") * PackCapacity))
      .orderBy(col("source"))
  }

  val q115Oracle: String =
    s"""WITH doc_tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(${Text.tokensSql}) AS BIGINT) AS n_tokens,
      |    doc_id % $PackShards AS pack_shard
      |  FROM documents),
      |packed AS (
      |  SELECT *,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source, pack_shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM doc_tok),
      |seqs AS (
      |  SELECT source, pack_shard, (cum - n_tokens) // $PackCapacity AS seq_id,
      |    count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS toks
      |  FROM packed GROUP BY 1, 2, 3)
      |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  count(*) AS n_sequences,
      |  CAST(sum(toks) AS BIGINT) AS packed_tokens,
      |  CAST(sum(toks) AS DOUBLE) / (count(*) * $PackCapacity) AS mean_fill
      |FROM seqs GROUP BY source ORDER BY source""".stripMargin

  /** q159: weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, JACM 2007): each document gets priority
    * `q_i = w_i / u_i` with `w_i` its weight (chars) and `u_i` a uniform
    * in (0,1] derived from md5(doc_id); the sample is the top-k priorities
    * and the (k+1)-th priority is the threshold τ. The scheme's point is
    * the estimator: `ŵ_i = max(w_i, τ)` makes `Σ ŵ_i` over the sample an
    * UNBIASED estimate of the total weight of ANY subset — so the output
    * carries the estimate next to the exact total (q157's error-accounting
    * discipline, as a `rank=0` audit row).
    *
    * Determinism across engines: `u = (h+1)/2^32` and `q = w/u` use only
    * IEEE-correctly-rounded ops (÷, no ln/pow — the classic A-ES
    * exponential-race key `-ln(u)/w` would hinge on libm vs
    * java.lang.Math transcendental rounding), so the priorities are
    * bit-identical in Spark and DuckDB; `ŵ` is re-scaled to integer micros
    * before the order-sensitive SUM, keeping the audit row exact.
    *
    * Scale: top-(k+1) is `orderBy(...).limit(k+1)` =
    * TakeOrderedAndProject — per-partition heaps, k+1 rows to the driver
    * stage, never a global sort. The post-limit window runs on a k+1-row
    * frame. Weighted reservoir over 100 TB is exactly this plan. */
  def q159PrioritySample(s: SparkSession, dir: String): DataFrame = {
    val K = 20
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("w"))
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val pri = docs
      .withColumn("u", (h.cast("double") + lit(1.0)) / lit(4294967296.0))
      .withColumn("pri", col("w").cast("double") / col("u"))
    val top = pri.orderBy(col("pri").desc, col("doc_id").asc).limit(K + 1)
    val win = Window.orderBy(col("pri").desc, col("doc_id").asc)
    val tau = Window.partitionBy()
    val sample = top
      .withColumn("rank", row_number().over(win))
      .withColumn("tau", min(col("pri")).over(tau))
      .filter(col("rank") <= K)
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("w").as("weight"),
        round(greatest(col("w").cast("double"), col("tau")) * 1e6)
          .cast("long").as("w_hat_micros"))
    // Tagged union, not a crossJoin of two 1-row aggregates — the latter
    // plans as CartesianProduct (PlanSpec lint; the q133 pattern).
    val audit = pri.select(col("w").as("v"), lit(0).as("tag"))
      .unionByName(sample.select(col("w_hat_micros").as("v"), lit(1).as("tag")))
      .agg(sum(when(col("tag") === 0, col("v"))).as("weight"),
        sum(when(col("tag") === 1, col("v"))).as("w_hat_micros"))
      .select(lit(0L).as("rank"), lit(-1L).as("doc_id"),
        col("weight"), col("w_hat_micros"))
    sample.unionByName(audit).orderBy(col("rank"))
  }

  val q159Oracle: String =
    """WITH w AS (
      |  SELECT doc_id, greatest(n_chars, 1) AS w FROM documents),
      |p AS (
      |  SELECT doc_id, w,
      |    CAST(w AS DOUBLE) /
      |      ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1.0)
      |        / 4294967296.0) AS pri
      |  FROM w),
      |top AS (SELECT * FROM p ORDER BY pri DESC, doc_id ASC LIMIT 21),
      |ranked AS (
      |  SELECT doc_id, w, pri,
      |    row_number() OVER (ORDER BY pri DESC, doc_id ASC) AS rank,
      |    min(pri) OVER () AS tau
      |  FROM top),
      |samp AS (
      |  SELECT CAST(rank AS BIGINT) AS rank, doc_id, CAST(w AS BIGINT) AS weight,
      |    CAST(round(greatest(CAST(w AS DOUBLE), tau) * 1e6) AS BIGINT) AS w_hat_micros
      |  FROM ranked WHERE rank <= 20)
      |SELECT rank, doc_id, weight, w_hat_micros FROM samp
      |UNION ALL
      |SELECT 0, -1, (SELECT CAST(sum(w) AS BIGINT) FROM p),
      |  (SELECT CAST(sum(w_hat_micros) AS BIGINT) FROM samp)
      |ORDER BY rank""".stripMargin

  /** q175: TEMPERATURE-scaled mixture allocation (α = 0.5) — the
    * multilingual/multi-domain rebalance every large pretraining mix runs:
    * sampling weights ∝ tokens^α flatten the natural distribution so small
    * sources are oversampled relative to their share (α=1 is proportional,
    * α=0 uniform; 0.5 is the common compromise — the unigram-LM /
    * multilingual-corpus sampling exponent). Complements q113's
    * water-filling (a CAP-style allocator): temperature reshapes the whole
    * distribution instead of leveling its head.
    *
    * Everything is exact integer arithmetic:
    *  - tokens^0.5 = isqrt(avail), computed as float floor(sqrt) then
    *    CLAMPED exactly (`f ± [f²>x] / [(f+1)²≤x]`) so a float-rounding
    *    edge can never flip a weight — both engines converge to true
    *    ⌊√x⌋ regardless of their sqrt rounding;
    *  - the proportional share of budget B uses the decomposition
    *    `w·(B div W) + (w·(B mod W)) div W` instead of `(B·w) div W`:
    *    identical value, but every intermediate fits in BIGINT even at the
    *    100 TB tier (B·w directly would reach ~2^68 and wrap; here
    *    B div W ≤ √total and w ≤ √avail keep products under ~2^56);
    *  - the leftover `B − Σbase` (< n_src) goes one token to each of the
    *    largest remainders `(w·(B mod W)) mod W` (ties → source asc), so
    *    `Σalloc == B` EXACTLY — largest-remainder (Hamilton) rounding.
    *
    * Scale: one corpus groupBy to the |sources|-row inventory; every
    * "scalar" (W, B, Σbase) is a full-frame window over that reduced frame
    * (PlanSpec-safe); nothing returns to the corpus. `epochs_ppm` =
    * alloc·10^6 div avail is the oversampling factor the trainer reads. */
  /** Temperature (α=0.5) targets over an inventory frame: weight =
    * exact ⌊√avail⌋, alloc = largest-remainder share of `total div 4`.
    * Σalloc == total div 4 EXACTLY; alloc MAY exceed a small source's
    * inventory — that is the oversampling temperature sampling exists for
    * (epochs_ppm > 10^6 = the trainer repeats that source).
    * private[graft]: PropertySpec pins the invariants on arbitrary
    * inventories. */
  /** weight = exact ⌊√avail⌋ — float floor(sqrt) then clamped exactly so
    * either engine's sqrt rounding converges to true isqrt. The +1 probe
    * squares (f+1); 3037000499 is the largest long whose square fits, so
    * the bump is gated on f < that bound — without it an avail near 2^63
    * would overflow the probe (wrap in non-ANSI, fault in ANSI; ADVICE
    * r7). f ≥ the bound already implies avail ≥ f², so the clamp is exact
    * there without probing. Shared by the temperature allocator (q175)
    * and the data-wall sweep (q213). */
  private def withExactIsqrtWeight(inv: DataFrame): DataFrame =
    inv
      .withColumn("f", floor(sqrt(col("avail").cast("double"))).cast("long"))
      .withColumn("weight",
        col("f") - when(col("f") * col("f") > col("avail"), 1L).otherwise(0L)
          + when(col("f") < 3037000499L &&
              (col("f") + 1L) * (col("f") + 1L) <= col("avail"), 1L).otherwise(0L))
      .drop("f")

  private[graft] def temperatureTargets(inv: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy(col("rem").desc, col("source").asc)
    withExactIsqrtWeight(inv)
      .withColumn("total", sum(col("avail")).over(wAll))
      .withColumn("bigw", sum(col("weight")).over(wAll))
      .withColumn("b", expr("total div 4"))
      .withColumn("bw1", expr("greatest(bigw, 1)")) // all-zero-weight guard (ANSI div)
      .withColumn("base",
        expr("weight * (b div bw1) + (weight * (b % bw1)) div bw1"))
      .withColumn("rem", expr("(weight * (b % bw1)) % bw1"))
      .withColumn("leftover", expr("b - sum(base) over ()"))
      .withColumn("rk", row_number().over(wRem))
      .withColumn("alloc_tokens",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("epochs_ppm", expr("alloc_tokens * 1000000 div greatest(avail, 1)"))
      .select(col("source"), col("avail"), col("n_docs"),
        col("weight"), col("alloc_tokens"), col("epochs_ppm"))
  }

  def q175TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docTok = Tables.documents(s, dir)
      .select(col("source"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    temperatureTargets(inventory(docTok))
      .withColumnRenamed("avail", "avail_tokens")
      .orderBy(col("source").asc)
  }

  val q175Oracle: String =
    s"""WITH doc_tok AS (
      |  SELECT source, CAST(len(${Text.tokensSql}) AS BIGINT) AS n_tokens
      |  FROM documents),
      |inv AS (
      |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail, count(*) AS n_docs
      |  FROM doc_tok GROUP BY 1),
      |wts AS (
      |  SELECT *,
      |    CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)
      |      - CASE WHEN CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)
      |             * CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) > avail THEN 1 ELSE 0 END
      |      + CASE WHEN (CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) + 1)
      |             * (CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) + 1) <= avail THEN 1 ELSE 0 END
      |      AS weight
      |  FROM inv),
      |tot AS (
      |  SELECT *, CAST(sum(avail) OVER () AS BIGINT) AS total,
      |    CAST(greatest(sum(weight) OVER (), 1) AS BIGINT) AS bigw FROM wts),
      |based AS (
      |  SELECT *, total // 4 AS b,
      |    weight * ((total // 4) // bigw)
      |      + (weight * ((total // 4) % bigw)) // bigw AS base,
      |    (weight * ((total // 4) % bigw)) % bigw AS rem
      |  FROM tot),
      |ranked AS (
      |  SELECT *, CAST(b - sum(base) OVER () AS BIGINT) AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
      |  FROM based)
      |SELECT source, avail AS avail_tokens, n_docs, CAST(weight AS BIGINT) AS weight,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens,
      |  CAST((base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * 1000000
      |    // greatest(avail, 1) AS BIGINT) AS epochs_ppm
      |FROM ranked
      |ORDER BY source ASC""".stripMargin

  /** q213: data-wall repetition sweep — the budget-planning audit the
    * scaling-law era forced on every pretraining mix (Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models": repeating a source
    * up to ~4 epochs costs little; beyond that returns decay fast). For a
    * sweep of total token budgets B ∈ {¼, ½, 1, 2, 4}·total, allocate B
    * across sources under q175's temperature-α=0.5 weights with exact
    * largest-remainder rounding (Σalloc == B per budget), then report per
    * budget: sources pushed past 1 epoch, sources past the 4-epoch wall,
    * the worst oversampling factor, and the exact-ppm share of the budget
    * served by repeated (beyond-inventory) tokens. The curve says where
    * the data wall bites THIS corpus: the budget at which repeated_ppm
    * turns nonzero is the corpus's fresh-token ceiling under the chosen
    * temperature.
    *
    * Everything is exact integer arithmetic — the isqrt weight clamp and
    * the overflow-free proportional decomposition are q175's (scaladoc
    * there); budgets are `total·m div 4` for m ≤ 16, so at the 100 TB
    * tier (total ~2^45 tokens) every product stays far inside BIGINT.
    *
    * Scale stance: one corpus groupBy to the |sources|-row inventory; the
    * 5-way budget explode multiplies the REDUCED frame only (5·|sources|
    * rows); global scalars (total, W) are full-frame windows computed
    * before the explode, per-budget scalars (leftover, remainder rank)
    * are windows partitioned by the 5-value multiplier — all over the
    * bounded frame, never the corpus. Final agg reduces to 5 rows. */
  def q213DataWallSweep(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    val wB = Window.partitionBy(col("m"))
    val wRem = Window.partitionBy(col("m"))
      .orderBy(col("rem").desc, col("source").asc)
    val docTok = Tables.documents(s, dir)
      .select(col("source"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    withExactIsqrtWeight(inventory(docTok))
      .withColumn("total", sum(col("avail")).over(wAll))
      .withColumn("bw1", expr("greatest(sum(weight) over (), 1)"))
      .withColumn("m", explode(array(lit(1L), lit(2L), lit(4L), lit(8L), lit(16L))))
      .withColumn("b", expr("total * m div 4"))
      .withColumn("base",
        expr("weight * (b div bw1) + (weight * (b % bw1)) div bw1"))
      .withColumn("rem", expr("(weight * (b % bw1)) % bw1"))
      .withColumn("leftover", col("b") - sum(col("base")).over(wB))
      .withColumn("rk", row_number().over(wRem))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("epochs_ppm", expr("alloc * 1000000 div greatest(avail, 1)"))
      .groupBy(col("m").as("budget_quarters"))
      .agg(
        max(col("b")).as("budget_tokens"),
        count(lit(1)).as("n_sources"),
        sum(when(col("alloc") > col("avail"), lit(1L)).otherwise(lit(0L)))
          .as("n_repeated"),
        sum(when(col("epochs_ppm") > 4000000L, lit(1L)).otherwise(lit(0L)))
          .as("n_past_wall"),
        max(col("epochs_ppm")).as("max_epochs_ppm"),
        sum(greatest(col("alloc") - col("avail"), lit(0L))).as("repeated_tokens"))
      .withColumn("repeated_ppm",
        expr("repeated_tokens * 1000000 div greatest(budget_tokens, 1)"))
      .orderBy(col("budget_quarters"))
  }

  val q213Oracle: String =
    s"""WITH doc_tok AS (
      |  SELECT source, CAST(len(${Text.tokensSql}) AS BIGINT) AS n_tokens
      |  FROM documents),
      |inv AS (
      |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail, count(*) AS n_docs
      |  FROM doc_tok GROUP BY 1),
      |wts AS (
      |  SELECT *,
      |    CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)
      |      - CASE WHEN CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)
      |             * CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) > avail THEN 1 ELSE 0 END
      |      + CASE WHEN (CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) + 1)
      |             * (CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) + 1) <= avail THEN 1 ELSE 0 END
      |      AS weight
      |  FROM inv),
      |tot AS (
      |  SELECT *, CAST(sum(avail) OVER () AS BIGINT) AS total,
      |    CAST(greatest(sum(weight) OVER (), 1) AS BIGINT) AS bw1 FROM wts),
      |swept AS (
      |  SELECT t.*, m.m, t.total * m.m // 4 AS b
      |  FROM tot t CROSS JOIN (VALUES (1), (2), (4), (8), (16)) AS m(m)),
      |based AS (
      |  SELECT *,
      |    weight * (b // bw1) + (weight * (b % bw1)) // bw1 AS base,
      |    (weight * (b % bw1)) % bw1 AS rem
      |  FROM swept),
      |ranked AS (
      |  SELECT *, CAST(b - sum(base) OVER (PARTITION BY m) AS BIGINT) AS leftover,
      |    row_number() OVER (PARTITION BY m ORDER BY rem DESC, source ASC) AS rk
      |  FROM based),
      |alloced AS (
      |  SELECT *, base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc,
      |    (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * 1000000
      |      // greatest(avail, 1) AS epochs_ppm
      |  FROM ranked)
      |SELECT CAST(m AS BIGINT) AS budget_quarters,
      |  CAST(max(b) AS BIGINT) AS budget_tokens,
      |  CAST(count(*) AS BIGINT) AS n_sources,
      |  CAST(sum(CASE WHEN alloc > avail THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeated,
      |  CAST(sum(CASE WHEN epochs_ppm > 4000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_past_wall,
      |  CAST(max(epochs_ppm) AS BIGINT) AS max_epochs_ppm,
      |  CAST(sum(greatest(alloc - avail, 0)) AS BIGINT) AS repeated_tokens,
      |  CAST(sum(greatest(alloc - avail, 0)) * 1000000
      |    // greatest(max(b), 1) AS BIGINT) AS repeated_ppm
      |FROM alloced GROUP BY m ORDER BY budget_quarters""".stripMargin

  /** q177: context-length fit audit — the report a pipeline runs BEFORE
    * committing to a training context length L. For each candidate L it
    * quantifies, in exact integers, what the corpus costs at that length:
    * tokens lost to per-document truncation, padding waste if every doc
    * rides its own padded sequence, the sequence count a perfect packer
    * needs (⌈Σ kept / L⌉ — the bin-packing lower bound q115's greedy
    * packer approaches), and the utilization ppm of both layouts. The
    * unpacked-vs-packed utilization gap is the empirical justification
    * for running q115 at all.
    *
    * Scale: one corpus scan; the 3-way L explode multiplies rows before
    * the aggregate but each is a few integers (map-side combined), and
    * the post-aggregate frame is |L| rows. No joins, no windows over
    * unreduced frames. */
  def q177ContextFitAudit(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .select(col("n_tokens"), explode(array(lit(128L), lit(512L), lit(2048L))).as("ctx_len"))
      .withColumn("kept", least(col("n_tokens"), col("ctx_len")))
      .groupBy(col("ctx_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("kept")).as("kept_tokens"),
        sum(col("n_tokens") - col("kept")).as("trunc_lost_tokens"),
        sum(col("ctx_len") - col("kept")).as("pad_waste_unpacked"))
      .withColumn("seqs_packed_lb", expr("(kept_tokens + ctx_len - 1) div ctx_len"))
      .withColumn("util_unpacked_ppm",
        expr("kept_tokens * 1000000 div greatest(n_docs * ctx_len, 1)"))
      .withColumn("util_packed_ppm",
        expr("kept_tokens * 1000000 div greatest(seqs_packed_lb * ctx_len, 1)"))
      .select(col("ctx_len"), col("n_docs"), col("total_tokens"), col("kept_tokens"),
        col("trunc_lost_tokens"), col("pad_waste_unpacked"), col("seqs_packed_lb"),
        col("util_unpacked_ppm"), col("util_packed_ppm"))
      .orderBy(col("ctx_len"))
  }

  val q177Oracle: String =
    s"""WITH d AS (
      |  SELECT CAST(len(${Text.tokensSql}) AS BIGINT) AS n_tokens FROM documents),
      |x AS (
      |  SELECT n_tokens, CAST(ctx_len AS BIGINT) AS ctx_len,
      |    least(n_tokens, CAST(ctx_len AS BIGINT)) AS kept
      |  FROM d, unnest([128, 512, 2048]) AS t(ctx_len)),
      |g AS (
      |  SELECT ctx_len, count(*) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |    CAST(sum(kept) AS BIGINT) AS kept_tokens,
      |    CAST(sum(n_tokens - kept) AS BIGINT) AS trunc_lost_tokens,
      |    CAST(sum(ctx_len - kept) AS BIGINT) AS pad_waste_unpacked
      |  FROM x GROUP BY 1)
      |SELECT ctx_len, n_docs, total_tokens, kept_tokens, trunc_lost_tokens,
      |  pad_waste_unpacked,
      |  CAST((kept_tokens + ctx_len - 1) // ctx_len AS BIGINT) AS seqs_packed_lb,
      |  CAST(kept_tokens * 1000000 // greatest(n_docs * ctx_len, 1) AS BIGINT) AS util_unpacked_ppm,
      |  CAST(kept_tokens * 1000000
      |    // greatest(((kept_tokens + ctx_len - 1) // ctx_len) * ctx_len, 1) AS BIGINT) AS util_packed_ppm
      |FROM g
      |ORDER BY ctx_len""".stripMargin

  /** q193: deterministic training-shard assignment — the "global shuffle"
    * stage that turns a curated corpus into training shards. Each document
    * gets a pseudorandom but fully deterministic position from a Knuth
    * multiplicative hash (h = doc_id · 2654435761 mod 2³², the public
    * golden-ratio constant), shard = h mod 64; the per-shard report audits
    * the balance the hash is supposed to deliver (doc share in exact ppm,
    * token mass, position range). Seeded-permutation-by-hash is the
    * standard reproducible alternative to `rand()` ordering — identical
    * output on every engine, every run, any partitioning.
    *
    * Scale stance (100 TB): assignment is a pure map (no shuffle at all);
    * the audit is one 64-group agg with map-side combine, then a window
    * over the 64-row reduced frame for the exact shares. Writing the
    * shards themselves is `write.partitionBy(shard)` — embarrassingly
    * parallel. Products stay < 2⁶³ for any doc_id < 2³² (bound noted,
    * same guard discipline as the isqrt clamp at Mixture.scala:337). */
  def q193ShardAssign(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(64L)))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("h")).as("min_pos"),
        max(col("h")).as("max_pos"))
      .withColumn("tot_docs", sum(col("n_docs")).over(w))
      .select(col("shard"), col("n_docs"), col("sum_tokens"), col("min_pos"), col("max_pos"),
        expr("(n_docs * 1000000) div tot_docs").as("doc_share_ppm"))
      .orderBy(col("shard"))
  }

  val q193Oracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(${Text.tokensSql}) AS BIGINT) AS n_tokens,
      |    (doc_id * 2654435761) % 4294967296 AS h
      |  FROM documents),
      |g AS (
      |  SELECT h % 64 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |    CAST(min(h) AS BIGINT) AS min_pos, CAST(max(h) AS BIGINT) AS max_pos
      |  FROM d GROUP BY 1)
      |SELECT CAST(shard AS BIGINT) AS shard, n_docs, sum_tokens, min_pos, max_pos,
      |  CAST((n_docs * 1000000) // CAST(sum(n_docs) OVER () AS BIGINT) AS BIGINT)
      |    AS doc_share_ppm
      |FROM g ORDER BY shard""".stripMargin

  /** q240: dense global curriculum ordinals WITHOUT a global sort — the
    * distributed "zipWithIndex by sort order" primitive. A curriculum
    * trainer wants every document numbered 1..N in (n_chars, doc_id)
    * order (shortest-first); `row_number()` over a global ORDER BY
    * funnels 100 TB through ONE sort task. Two-pass instead (the
    * TeraSort/range-partition recipe): (1) value-bucket the sort key
    * (equi-width n_chars div 256 — deterministic, no sampling), ONE
    * aggregate for per-bucket counts, prefix-sum offsets over the
    * bounded bucket frame; (2) rank WITHIN each bucket (the window's
    * partition count is the parallelism knob) and add the broadcast
    * bucket offset. Total order (n_chars, doc_id) has no ties, so the
    * result is exactly row_number() — which is what the oracle pins,
    * proving the decomposition law, not an approximation. Production
    * swaps the equi-width bucketing for q136's sampled range boundaries
    * when the key distribution is unknown; the offset arithmetic is
    * unchanged. */
  def q240GlobalSequence(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      .withColumn("rank_bucket", expr("n_chars div 256L"))
    val counts = docs.groupBy(col("rank_bucket")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy(col("rank_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = counts
      .withColumn("off", sum(col("cnt")).over(wOff) - col("cnt"))
      .select(col("rank_bucket"), col("off"))
    val wIn = Window.partitionBy(col("rank_bucket"))
      .orderBy(col("n_chars"), col("doc_id"))
    docs.join(broadcast(offs), Seq("rank_bucket"))
      .withColumn("global_seq", (col("off") + row_number().over(wIn)).cast("long"))
      .select(col("doc_id"), col("n_chars"), col("global_seq"))
      .orderBy(col("global_seq"))
  }

  val q240Oracle: String =
    """SELECT doc_id, n_chars,
      |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS global_seq
      |FROM documents
      |ORDER BY global_seq""".stripMargin

  /** q263: rendezvous-hash shard rebalancing audit (Thaler & Ravishankar
    * 1998, highest-random-weight hashing — the stateless sibling of
    * consistent hashing): when a 16-shard corpus layout grows to 17
    * shards, HRW placement (shard = argmax_s h(doc, s)) moves EXACTLY the
    * documents whose new-shard weight wins — an expected 1/17 of the
    * corpus — while mod-N placement reshuffles ~16/17 of it. This query
    * measures both movement fractions on data next to the 1/17 theoretical
    * line: the audit that justifies HRW for a 100 TB shard layout, where
    * "moved" means re-copied bytes.
    *
    * Determinism: h(doc, s) is the house 60-bit md5 stream; argmax is
    * max(struct(h, s)) — total order, no ties in practice and
    * deterministic under them. The 17× fan-out is a pure map feeding one
    * doc-keyed aggregate; the movement census is a second 1-row
    * aggregate. HRW's per-doc cost is O(shards) — the reason real systems
    * pair it with shard counts in the hundreds, not millions. */
  def q263HrwResharding(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(s, dir)
      .select(col("doc_id"))
      .withColumn("sh", explode(expr("sequence(0L, 16L)")))
      .withColumn("h", conv(substring(md5(
        concat(col("doc_id").cast("string"), lit(":"), col("sh").cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("sh") < 16, struct(col("h"), col("sh")))).as("m16"),
        max(struct(col("h"), col("sh"))).as("m17"))
      .select(col("doc_id"),
        col("m16.sh").as("s16"), col("m17.sh").as("s17"))
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum((col("doc_id") % 16 =!= col("doc_id") % 17).cast("long")).as("moved_mod"),
      sum((col("s16") =!= col("s17")).cast("long")).as("moved_hrw"))
      .select(col("n_docs"), col("moved_mod"), col("moved_hrw"),
        expr("(moved_mod * 1000000L) div greatest(n_docs, 1L)").as("moved_mod_ppm"),
        expr("(moved_hrw * 1000000L) div greatest(n_docs, 1L)").as("moved_hrw_ppm"),
        lit(1000000L / 17L).as("expected_hrw_ppm"))
  }

  val q263Oracle: String =
    """WITH f AS (
      |  SELECT doc_id, unnest(range(0, 17)) AS sh FROM documents),
      |h AS (
      |  SELECT doc_id, sh,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
      |      || CAST(sh AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM f),
      |pd AS (
      |  SELECT doc_id,
      |    max(CASE WHEN sh < 16 THEN {'h': h, 's': sh} END)['s'] AS s16,
      |    max({'h': h, 's': sh})['s'] AS s17
      |  FROM h GROUP BY doc_id),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN doc_id % 16 <> doc_id % 17 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS moved_mod,
      |    CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT) AS moved_hrw
      |  FROM pd)
      |SELECT n_docs, moved_mod, moved_hrw,
      |  CAST((moved_mod * 1000000) // greatest(n_docs, 1) AS BIGINT) AS moved_mod_ppm,
      |  CAST((moved_hrw * 1000000) // greatest(n_docs, 1) AS BIGINT) AS moved_hrw_ppm,
      |  CAST(58823 AS BIGINT) AS expected_hrw_ppm
      |FROM agg""".stripMargin

  /** q272: Neyman labeling-budget allocation (Neyman 1934, the optimal
    * stratified-sampling allocation) — the eval-set construction operator:
    * a fixed human-labeling budget B spread across sources ∝ N_h·σ_h
    * (stratum size × within-stratum spread) minimizes the variance of the
    * stratified estimate, vs the naive proportional-to-size split. Spread
    * here is document length; the weight is PURE INTEGER via the identity
    * N²·var = N·Σx² − (Σx)² — so N·σ = isqrt(N·Σx² − (Σx)²) needs no
    * division at all. isqrt = float seed → ONE exact-integer Newton step
    * (y = (f + vv div f) div 2, which corrects any seed error up to ~f) →
    * the house ±1 clamp (q175's recipe, hardened for the DECIMAL(38)
    * magnitudes N·Σx² reaches at the 100 TB tier, where the float seed
    * alone can be off by more than 1).
    *
    * Both the Neyman and the proportional allocation use q175's
    * overflow-safe share decomposition + largest-remainder (Hamilton)
    * rounding, so BOTH columns sum to exactly B = 1000 — the audit a
    * labeling vendor invoice reconciles against. Ships both so the
    * variance tilt (where Neyman moves labels relative to size) is
    * readable per source.
    *
    * Scale: one corpus hash aggregate to the |sources| moment frame;
    * everything after is full-frame windows over that reduced frame. */
  def q272NeymanAllocation(s: SparkSession, dir: String): DataFrame = {
    val B = 1000L
    val wAll = Window.partitionBy()
    val mom = Tables.documents(s, dir)
      .select(col("source"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"),
        sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sxx"))
      .withColumn("vv", expr(
        "CAST(n_docs AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      // isqrt(vv): float seed, one Newton step, exact ±1 clamp
      .withColumn("f0", greatest(
        floor(sqrt(col("vv").cast("double"))).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)), lit(1L).cast(
          org.apache.spark.sql.types.DecimalType(38, 0))))
      .withColumn("f1", expr("(f0 + vv div f0) div 2"))
      // clamp products DECIMAL-widened: f1² passes 2^63 once vv does
      .withColumn("w", expr(
        """CAST(f1 - (CASE WHEN CAST(f1 AS DECIMAL(38,0)) * f1 > vv THEN 1 ELSE 0 END)
          | + (CASE WHEN (CAST(f1 AS DECIMAL(38,0)) + 1) * (f1 + 1) <= vv THEN 1 ELSE 0 END)
          | AS BIGINT)""".stripMargin))
    // ADVICE r10 hardening, both engine and oracle: (a) the degenerate
    // all-zero-weight case (one doc per source → every vv = 0 → every w = 0)
    // falls back to proportional-to-size — Neyman is indifferent at zero
    // variance, and without the fallback every base is 0, left = B, and
    // Σalloc = |sources| ≠ B; (b) the share products run in DECIMAL(38,0) —
    // at 100 TB magnitudes w reaches ~1e16+ and w*(B % W) would silently
    // wrap in non-ANSI BIGINT while DuckDB raises (divergent failure modes).
    // Quotients stay ≤ B so the LongType `div` results never overflow.
    def hamilton(in: DataFrame, wCol: String, out: String): DataFrame = {
      val wRem = Window.orderBy(col(s"${out}_rem").desc, col("source").asc)
      in
        .withColumn(s"${out}_ew", expr(
          s"CAST(CASE WHEN sum($wCol) over () = 0 THEN n_docs ELSE $wCol END AS DECIMAL(38,0))"))
        .withColumn(s"${out}_W", expr(
          s"greatest(sum(${out}_ew) over (), CAST(1 AS DECIMAL(38,0)))"))
        .withColumn(s"${out}_base", expr(
          s"${out}_ew * (${B}L div ${out}_W) + (${out}_ew * (${B}L % ${out}_W)) div ${out}_W"))
        .withColumn(s"${out}_rem", expr(s"(${out}_ew * (${B}L % ${out}_W)) % ${out}_W"))
        .withColumn(s"${out}_left", expr(s"${B}L - sum(${out}_base) over ()"))
        .withColumn(s"${out}_rk", row_number().over(wRem))
        .withColumn(out, (col(s"${out}_base")
          + when(col(s"${out}_rk") <= col(s"${out}_left"), 1L).otherwise(0L)).cast("long"))
    }
    hamilton(hamilton(mom, "w", "alloc_neyman"), "n_docs", "alloc_proportional")
      .select(col("source"), col("n_docs"),
        expr("sx div n_docs").as("mean_chars"), col("w").as("neyman_weight"),
        col("alloc_neyman"), col("alloc_proportional"))
      .orderBy(col("source"))
  }

  val q272Oracle: String = {
    val B = 1000L
    def ham(src: String, w: String, out: String) =
      s"""${out}_a AS MATERIALIZED (
         |  SELECT *, CAST(CASE WHEN sum($w) OVER () = 0 THEN n_docs ELSE $w END
         |    AS HUGEINT) AS ${out}_ew
         |  FROM $src),
         |${out}_b AS MATERIALIZED (
         |  SELECT *, greatest(sum(${out}_ew) OVER (), 1) AS ${out}_W FROM ${out}_a),
         |${out}_c AS MATERIALIZED (
         |  SELECT *,
         |    ${out}_ew * ($B // ${out}_W) + (${out}_ew * ($B % ${out}_W)) // ${out}_W
         |      AS ${out}_base,
         |    (${out}_ew * ($B % ${out}_W)) % ${out}_W AS ${out}_rem
         |  FROM ${out}_b),
         |${out}_d AS MATERIALIZED (
         |  SELECT *, $B - sum(${out}_base) OVER () AS ${out}_left,
         |    row_number() OVER (ORDER BY ${out}_rem DESC, source ASC) AS ${out}_rk
         |  FROM ${out}_c),
         |${out}_e AS MATERIALIZED (
         |  SELECT *, CAST(${out}_base +
         |    CASE WHEN ${out}_rk <= ${out}_left THEN 1 ELSE 0 END AS BIGINT) AS $out
         |  FROM ${out}_d)""".stripMargin
    s"""WITH mom AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS sx,
       |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
       |  FROM documents GROUP BY 1),
       |vvt AS (
       |  SELECT *, CAST(n_docs AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vv
       |  FROM mom),
       |sd AS (
       |  SELECT *, greatest(CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS HUGEINT), 1) AS f0
       |  FROM vvt),
       |nw AS (
       |  SELECT *, (f0 + vv // f0) // 2 AS f1 FROM sd),
       |wt AS MATERIALIZED (
       |  SELECT source, n_docs, sx,
       |    CAST(f1 - (CASE WHEN f1 * f1 > vv THEN 1 ELSE 0 END)
       |      + (CASE WHEN (f1 + 1) * (f1 + 1) <= vv THEN 1 ELSE 0 END)
       |      AS BIGINT) AS w
       |  FROM nw),
       |${ham("wt", "w", "alloc_neyman")},
       |${ham("alloc_neyman_e", "n_docs", "alloc_proportional")}
       |SELECT source, n_docs, CAST(sx // n_docs AS BIGINT) AS mean_chars,
       |  w AS neyman_weight, alloc_neyman, alloc_proportional
       |FROM alloc_proportional_e ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q272_neyman_allocation" -> (q272NeymanAllocation _),
    "q263_hrw_resharding" -> (q263HrwResharding _),
    "q240_global_sequence" -> (q240GlobalSequence _),
    "q193_shard_assign" -> (q193ShardAssign _),
    "q177_context_fit_audit" -> (q177ContextFitAudit _),
    "q113_mixture_sample" -> (q113MixtureSample _),
    "q115_sequence_pack"  -> (q115SequencePack _),
    "q159_priority_sample" -> (q159PrioritySample _),
    "q175_temperature_mix" -> (q175TemperatureMix _),
    "q213_data_wall_sweep" -> (q213DataWallSweep _))

  val oracles: Map[String, String] = Map(
    "q272_neyman_allocation" -> q272Oracle,
    "q263_hrw_resharding" -> q263Oracle,
    "q240_global_sequence" -> q240Oracle,
    "q193_shard_assign" -> q193Oracle,
    "q177_context_fit_audit" -> q177Oracle,
    "q113_mixture_sample" -> q113Oracle,
    "q115_sequence_pack"  -> q115Oracle,
    "q159_priority_sample" -> q159Oracle,
    "q175_temperature_mix" -> q175Oracle,
    "q213_data_wall_sweep" -> q213Oracle)
}
