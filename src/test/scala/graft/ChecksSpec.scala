package graft

import org.apache.spark.sql.functions._

/** Data-quality assertions (graft.Checks): eager audit, observe-piggyback
  * audit (zero extra scans), duplicate-key detection. */
class ChecksSpec extends SparkSpec {

  test("audit counts violations per rule in one pass (incl. NULL semantics)") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("ok"), 10),
      (None, Some("ok"), 200),
      (Some(3L), None, -5),
      (Some(4L), Some("bad"), 50)
    ).toDF("id", "status", "v")
    val got = Checks.audit(df,
      "id_not_null" -> Checks.notNull(col("id")),
      "status_accepted" -> Checks.acceptedValues(col("status"), Seq("ok", "retry")),
      "v_in_range" -> Checks.inRange(col("v"), lit(0), lit(100)))
    assert(got == Map("id_not_null" -> 1L, "status_accepted" -> 2L, "v_in_range" -> 2L))
    // empty frame: zero violations, not NULL explosions
    assert(Checks.audit(df.limit(0), "id_not_null" -> Checks.notNull(col("id")))
      == Map("id_not_null" -> 0L))
  }

  test("observed rules ride the pipeline's own action — no extra job") {
    val orders = Tables.orders(spark, sf())
    val (audited, obs) = Checks.observed(orders, "orders_audit",
      "key_not_null" -> Checks.notNull(col("o_orderkey")),
      "price_positive" -> Checks.inRange(col("o_totalprice"), lit(0.0), lit(1e9)))
    val n = audited.count() // the pipeline's existing action
    assert(n > 0)
    val metrics = obs.get
    assert(metrics("key_not_null") == 0L && metrics("price_positive") == 0L)
  }

  test("quarantine splits pass/fail and names every violated rule") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("ok"), 10),   // clean
      (None, Some("ok"), 200),      // fails id + range
      (Some(3L), None, 5),          // fails accepted (NULL)
      (Some(4L), Some("ok"), 70)    // clean
    ).toDF("id", "status", "v")
    val (good, bad) = Checks.quarantine(df,
      "id_not_null" -> Checks.notNull(col("id")),
      "status_accepted" -> Checks.acceptedValues(col("status"), Seq("ok")),
      "v_in_range" -> Checks.inRange(col("v"), lit(0), lit(100)))
    assert(good.select("v").as[Int].collect().sorted.toSeq === Seq(10, 70))
    val quarantined = bad.select(col("v"), col("_failed_rules")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(quarantined === Map(
      200 -> "id_not_null,v_in_range",
      5 -> "status_accepted"))
    // disjoint and complete
    assert(good.count() + bad.count() === df.count())
  }

  test("duplicateKeys finds exactly the multiply-loaded keys") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (3L, "c2"), (3L, "c3"))
      .toDF("id", "v")
    val dups = Checks.duplicateKeys(df, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dups == Map(2L -> 2L, 3L -> 3L))
    // the launches fixture's planted duplicate snapshots surface here too
    val launches = ops.Launches.staging(
      ops.Launches.ingest(spark, ops.Launches.fixturePath))
    assert(Checks.duplicateKeys(launches, Seq("launch_id")).count() > 0)
  }
}
