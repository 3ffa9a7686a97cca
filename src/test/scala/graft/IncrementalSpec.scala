package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the round-4 incremental/sketch operators beyond their driver oracle
  * checks: CDC compaction semantics on a hand-built changelog, the
  * merge-equals-recompute law on a random split, HLL determinism under
  * repartitioning plus its error bound, and the losslessness of the banded
  * Levenshtein used by q129.
  */
class IncrementalSpec extends SparkSpec {
  import ops.{Changes, Sketches}

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("cdcSnapshot keeps latest per key, honors deletes, breaks ts ties by seq") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType),
      StructField("seq", LongType), StructField("op", StringType),
      StructField("v", StringType)))
    val rows = java.util.Arrays.asList(
      // key 1: two updates out of arrival order — latest ts wins
      Row(1L, ts("2024-01-02 00:00:00"), 10L, "U", "new"),
      Row(1L, ts("2024-01-01 00:00:00"), 9L, "U", "old"),
      // key 2: update then delete — key disappears
      Row(2L, ts("2024-01-01 00:00:00"), 11L, "U", "x"),
      Row(2L, ts("2024-01-03 00:00:00"), 12L, "D", "x"),
      // key 3: delete then a LATER re-insert — key resurfaces
      Row(3L, ts("2024-01-01 00:00:00"), 13L, "D", "dead"),
      Row(3L, ts("2024-01-02 00:00:00"), 14L, "U", "alive"),
      // key 4: same ts twice — higher seq wins
      Row(4L, ts("2024-01-01 00:00:00"), 20L, "U", "second"),
      Row(4L, ts("2024-01-01 00:00:00"), 19L, "U", "first"))
    val log = spark.createDataFrame(rows, schema)
    val snap = Changes.cdcSnapshot(log, col("k"), col("ts"), col("seq"),
        col("op"), Seq("v" -> col("v")))
      .select(col("k"), col("m.v").as("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap === Map(1L -> "new", 3L -> "alive", 4L -> "second"))
  }

  test("mergeAggStates(base, delta) equals the direct aggregate on any split") {
    val o = Tables.orders(spark, sf())
    val cents = Exact.cents(col("o_totalprice"))
    // content-stable split (md5 parity) — not a year split, so the test
    // exercises groups present on both sides
    val side = conv(substring(md5(col("o_orderkey").cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("long") % 2
    val base = Changes.aggState(o.filter(side === 0), "o_orderpriority", cents)
    val delta = Changes.aggState(o.filter(side === 1), "o_orderpriority", cents)
    val merged = Changes.mergeAggStates("o_orderpriority", base, delta)
      .orderBy("o_orderpriority").collect().toSeq
    val direct = Changes.aggState(o, "o_orderpriority", cents)
      .orderBy("o_orderpriority").collect().toSeq
    assert(merged === direct)
  }

  test("HLL estimate is partition-invariant and within the m=256 error bound") {
    import spark.implicits._
    val n = 20000
    val ids = (1L to n).toDF("id").withColumn("g", lit("all"))
    def est(parts: Int): Long =
      Sketches.hllEstimate(Sketches.hllRegisters(ids.repartition(parts), col("g"), col("id")))
        .select(col("hll_estimate")).head().getLong(0)
    val e7 = est(7)
    assert(est(3) === e7, "HLL must be bit-identical under any partitioning")
    // standard error 1.04/sqrt(256) = 6.5%; 3 sigma ≈ 20%
    assert(math.abs(e7 - n) < n * 0.2, s"estimate $e7 too far from $n")
  }

  test("banded levenshtein(a, b, k) matches the full distance within threshold") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def word() = (1 to (5 + rnd.nextInt(20))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.fill(300)((word(), word())).toDF("a", "b")
    val bad = pairs.select(
        expr("levenshtein(a, b)").as("full"), expr("levenshtein(a, b, 4)").as("banded"))
      .filter((col("full") <= 4 && col("full") =!= col("banded")) ||
        (col("full") > 4 && col("banded") =!= -1))
      .count()
    assert(bad === 0L)
  }
}
