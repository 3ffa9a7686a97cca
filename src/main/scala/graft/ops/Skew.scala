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

  /** q160: pre-flight join-skew / output-cardinality profiler. Before
    * launching a many-to-many join at 100 TB (here: the lineitem part-level
    * self-join a "parts bought together" analysis implies), the cheap move
    * is profiling the key distribution: exact output cardinality is
    * `Σ_k f(k)²`, and the heavy keys that would stall a reducer are the
    * top `f(k)` — this one aggregate decides broadcast vs salt vs AQE and
    * sizes the salt bucket count, for the cost of ONE map-side-combined
    * groupBy instead of an exploratory join that may never finish.
    *
    * Output: top-5 heaviest keys (each with its per-side rows and its
    * `f²` contribution) plus a `partkey=-1` audit row carrying the exact
    * totals: distinct keys in `left_rows`, total input rows in
    * `right_rows`, and the full `Σ f²` join output cardinality in
    * `out_rows` — the number the planner needs. All integers; the top-5 is
    * TakeOrderedAndProject, never a global sort. */
  def q160JoinSkewProfile(s: SparkSession, dir: String): DataFrame = {
    val freq = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("f"))
    val top = freq
      .select(col("l_partkey").as("partkey"), col("f").as("left_rows"),
        col("f").as("right_rows"), (col("f") * col("f")).as("out_rows"))
      .orderBy(col("out_rows").desc, col("partkey").asc)
      .limit(5)
    val audit = freq.agg(
      count(lit(1)).as("left_rows"), sum(col("f")).as("right_rows"),
      sum(col("f") * col("f")).as("out_rows"))
      .select(lit(-1L).as("partkey"), col("left_rows"), col("right_rows"),
        col("out_rows"))
    top.unionByName(audit).orderBy(col("out_rows").desc, col("partkey").asc)
  }

  val q160Oracle: String =
    """WITH freq AS (
      |  SELECT l_partkey, count(*) AS f FROM lineitem GROUP BY 1),
      |top AS (
      |  SELECT l_partkey AS partkey, CAST(f AS BIGINT) AS left_rows,
      |    CAST(f AS BIGINT) AS right_rows, CAST(f * f AS BIGINT) AS out_rows
      |  FROM freq ORDER BY f * f DESC, l_partkey ASC LIMIT 5)
      |SELECT * FROM top
      |UNION ALL
      |SELECT -1, count(*), CAST(sum(f) AS BIGINT), CAST(sum(f * f) AS BIGINT)
      |FROM freq
      |ORDER BY out_rows DESC, partkey ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_salted_skew_join" -> (q67SaltedSkewJoin _),
    "q160_join_skew_profile" -> (q160JoinSkewProfile _),
  )

  val oracles: Map[String, String] = Map(
    "q67_salted_skew_join" -> q67Oracle,
    "q160_join_skew_profile" -> q160Oracle,
  )
}
