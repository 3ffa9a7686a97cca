package graft

import graft.ops.Launches
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden tests for the reference-pipeline replay — pins the semantics the
  * DuckDB oracle can't reach (fixture inputs): SURVEY.md §2.6 NULL
  * three-valued logic, §7.4 HALF_UP decimal rounding, F4/F5 lenient coercion,
  * latest-snapshot dedup, empty input. */
class LaunchesSpec extends SparkSpec {

  private lazy val raw = Launches.ingest(spark, Launches.fixturePath)
  private lazy val stg = Launches.staging(raw)
  private lazy val deduped = Launches.latestSnapshot(stg)
  private lazy val fct = Launches.mart(deduped).collect()

  test("ingest coerces malformed date and non-numeric flight_number to NULL") {
    val crs2 = raw.filter(col("name") === "CRS-2").collect()
    assert(crs2.length == 1 && crs2.head.isNullAt(crs2.head.fieldIndex("date_utc")))
    val edge = raw.filter(col("name") === "Edge Null Date").collect()
    assert(edge.length == 1 && edge.head.isNullAt(edge.head.fieldIndex("flight_number")))
  }

  test("latest-snapshot dedup keeps one row per launch_id, newest load_ts") {
    assert(deduped.count() == deduped.select("launch_id").distinct().count())
    val demo = deduped.filter(col("launch_id") === "5eb87cdaffd86e000604b32b").collect()
    assert(demo.head.getAs[String]("details") == "Second snapshot of DemoSat")
  }

  test("mart: successes + failures == launches in every year (NULL → else in both sums)") {
    fct.foreach { r =>
      assert(r.getAs[Long]("successes") + r.getAs[Long]("failures") == r.getAs[Long]("launches"),
        s"row $r")
    }
  }

  test("mart: NULL success counts as failure and inflates the rate denominator") {
    // 2012: COTS 2 (null) + CRS-1 (null) -> launches=2, successes=0, rate 0.00
    val y2012 = fct.find(r => r.getAs[Integer]("year") == 2012).get
    assert(y2012.getAs[Long]("launches") == 2)
    assert(y2012.getAs[Long]("successes") == 0)
    assert(y2012.getAs[Long]("failures") == 2)
    assert(y2012.getAs[java.math.BigDecimal]("success_rate_pct").toPlainString == "0.00")
    // 2014: Thaicom 6 (true), CRS-3 (null), OG2 (true) -> 2/3 = 66.67 (HALF_UP)
    val y2014 = fct.find(r => r.getAs[Integer]("year") == 2014).get
    assert(y2014.getAs[Long]("launches") == 3)
    assert(y2014.getAs[java.math.BigDecimal]("success_rate_pct").toPlainString == "66.67")
  }

  test("mart: HALF_UP rounding on exact decimal (1/8 = 12.50, not banker's 12.4)") {
    // Synthetic: 8 launches, 1 success -> 12.5 must render 12.50 (and 1/3 -> 33.33)
    import spark.implicits._
    val df = Seq(
      (2000, Some(true)), (2000, Some(false)), (2000, Some(false)), (2000, Some(false)),
      (2000, Some(false)), (2000, Some(false)), (2000, Some(false)), (2000, None),
      (2001, Some(true)), (2001, Some(false)), (2001, None)
    ).toDF("year", "success")
    val got = Launches.mart(df).collect().map(r =>
      r.getAs[Integer]("year") -> r.getAs[java.math.BigDecimal]("success_rate_pct").toPlainString).toMap
    assert(got(2000) == "12.50")
    assert(got(2001) == "33.33")
  }

  test("mart: NULL-year group (unparseable date) survives as its own row") {
    assert(fct.exists(r => r.isNullAt(r.fieldIndex("year"))))
  }

  test("mart on empty input produces zero rows (nullif guard, no crash)") {
    import spark.implicits._
    val empty = Seq.empty[(Integer, Option[Boolean])].toDF("year", "success")
    assert(Launches.mart(empty).collect().isEmpty)
  }

  test("q30 driver shape: centi-percent BIGINT equals the DECIMAL(10,2) rate ×100") {
    // VERDICT r8 item 1: the driver-facing q30 emits the rate as exact
    // integer centi-percent; it must equal the reference DECIMAL semantics
    // (mart's success_rate_pct) scaled by 100 on every row.
    val driverRows = Launches.q30LaunchesMart(spark, "").collect()
    assert(driverRows.nonEmpty)
    assert(!driverRows.head.schema.fieldNames.contains("success_rate_pct"))
    val byYear = fct.map(r =>
      Option(r.getAs[Integer]("year")) ->
        r.getAs[java.math.BigDecimal]("success_rate_pct")).toMap
    driverRows.foreach { r =>
      val expect = byYear(Option(r.getAs[Integer]("year")))
        .movePointRight(2).longValueExact()
      assert(r.getAs[Long]("success_rate_centi_pct") == expect, s"row $r")
    }
    // golden: 2014 = 2/3 successes -> 66.67% -> 6667 centi-pct (HALF_UP)
    val y2014 = driverRows.find(r => r.getAs[Integer]("year") == 2014).get
    assert(y2014.getAs[Long]("success_rate_centi_pct") == 6667L)
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q30/q31 oracle VALUES CTE stays in lockstep with the jsonl fixture") {
    // The DuckDB oracle embeds the fixture inline (VERDICT r7 item 4); an
    // edit to launches_raw.jsonl that forgets the oracle must fail HERE,
    // not as a driver hash-mismatch two artifacts later.
    val fixtureLines = scala.io.Source.fromFile(Launches.fixturePath).getLines().toSeq
    val sql = Launches.q30Oracle
    val tuples = sql.linesIterator.count(_.trim.startsWith("('"))
    assert(tuples === fixtureLines.size,
      s"oracle VALUES rows $tuples != fixture rows ${fixtureLines.size}")
    // every (id, load_ts) snapshot pair must appear verbatim in the SQL
    fixtureLines.foreach { l =>
      val id = l.split("\"id\":\"")(1).takeWhile(_ != '"')
      val lts = l.split("\"load_ts\":\"")(1).takeWhile(_ != '"')
      assert(sql.contains(s"('$id'") && sql.contains(s"'$lts')"),
        s"fixture snapshot ($id, $lts) missing from oracle VALUES")
    }
  }

  test("nested JSON flattens via struct access (SURVEY S3, pd.json_normalize analogue)") {
    import spark.implicits._
    val lines = Seq(
      """{"id":"a1","rocket":{"rid":"r9","name":"Falcon 9"},"cores":[{"flight":1},{"flight":2}]}""",
      """{"id":"a2","rocket":{"rid":"rh","name":"Heavy"},"cores":[]}""").toDS()
    val nested = spark.read.json(lines)
    val flat = nested.select(
      col("id"),
      col("rocket.rid").as("rocket_rid"),
      col("rocket.name").as("rocket_name"),
      size(col("cores")).as("n_cores"))
    val rows = flat.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("rocket_rid")).toSeq == Seq("r9", "rh"))
    assert(rows.map(_.getAs[Int]("n_cores")).toSeq == Seq(2, 0))
    // arrays flatten via explode
    assert(nested.select(col("id"), explode(col("cores")).as("core"))
      .select(col("core.flight")).count() == 2)
  }

  test("catalog materialization (SURVEY S8–S11): database + saveAsTable + view round-trip") {
    // S8: create namespace; S10: physical table; S9: view; S11: catalog listing
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics")
    Launches.mart(deduped).write.mode("overwrite").saveAsTable("analytics.fct_launches_by_year")
    stg.createOrReplaceTempView("stg_launches_v")
    val tables = spark.catalog.listTables("analytics").collect().map(_.name)
    assert(tables.contains("fct_launches_by_year"))
    assert(spark.table("analytics.fct_launches_by_year").count() == fct.length)
    assert(spark.table("stg_launches_v").count() == stg.count())
    spark.sql("DROP TABLE analytics.fct_launches_by_year")
  }
}
