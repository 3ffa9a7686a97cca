package graft.ops

import graft.{Exact, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Driver-checked salted join: lineitem ⋈ supplier through
    * [[saltedEquiJoin]] (8 buckets, salt from the high-cardinality
    * l_orderkey), aggregated per supplier nation. The oracle is the PLAIN
    * unsalted join — the whole point is that salting changes the shuffle
    * layout, never the result. */
  def q67SaltedSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val su = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    saltedEquiJoin(li, su, "l_suppkey", col("l_orderkey"), buckets = 8)
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        (sum(Exact.cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_price"))
      .orderBy(col("nationkey"))
  }

  val q67Oracle: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_salted_skew_join" -> (q67SaltedSkewJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q67_salted_skew_join" -> q67Oracle,
  )
}
