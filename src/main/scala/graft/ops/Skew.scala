package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 partitioning row; the
  * 100 TB stance in BASELINE.json).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is the
  * fallback when one key dominates so heavily that even split shuffle blocks
  * land on one reducer chain (e.g. a null-heavy FK or a celebrity key in a
  * training corpus). The scheme: the large side gets a uniform random-free
  * deterministic salt derived from a high-cardinality companion column; the
  * small side is replicated across all salt values; the join key becomes
  * (key, salt). Results are identical to the unsalted join — pinned by
  * SkewSpec — while the hot key's rows spread over `buckets` reducers.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salting the large side into
    * `buckets` sub-keys. `saltSource` must be a column of the large side
    * with per-row variation (a unique id); the salt is `pmod(hash(...))` —
    * deterministic, no RNG, so plans stay reproducible.
    *
    * Only join types that do NOT preserve the small side are allowed: the
    * small side is replicated once per salt bucket, so a preserved-side
    * ("right"/"full_outer") unmatched row would be emitted `buckets` times
    * (ADVICE.md r1). inner/left/semi/anti are exactly the types where
    * replicated small-side rows collapse back to unsalted semantics. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      saltSource: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedEquiJoin: joinType '$joinType' would duplicate unmatched " +
        s"small-side rows ${buckets}x (small side is replicated per salt bucket)")
    val salted = large.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
