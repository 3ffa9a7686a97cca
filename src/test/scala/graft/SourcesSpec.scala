package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY §2.1): parquet is the canonical
  * format (driver contract); CSV and JSON line-format round-trips prove the
  * reader/writer surface, and bucketed tables prove the co-located-join
  * path (SURVEY §4 partitioning row — the "pre-shuffled at rest" layout a
  * 100 TB fact-fact join wants).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round-trip: write orders, read back with explicit schema, same aggregate") {
    val dir = tmp("graft-csv")
    val o = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
    o.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(o.schema).option("header", "true").csv(dir)
    val a = o.agg(count(lit(1)), sum(Exact.cents(col("o_totalprice"))),
      countDistinct(col("o_orderstatus"))).head
    val b = back.agg(count(lit(1)), sum(Exact.cents(col("o_totalprice"))),
      countDistinct(col("o_orderstatus"))).head
    assert(a == b)
  }

  test("JSON-lines round-trip preserves rows and types") {
    val dir = tmp("graft-json")
    val e = Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    e.write.mode("overwrite").json(dir)
    val back = spark.read.schema(e.schema).json(dir)
    assert(back.schema == e.schema)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)), sum(Exact.cents(col("value"))), max(col("event_id"))).head
    assert(key(back) == key(e))
  }

  test("upsert: insert-new + update-existing, latest version wins, idempotent") {
    import spark.implicits._
    val path = tmp("graft-upsert") + "/t"
    val v1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
    Materialize.upsert(spark, path, v1, "id", "ver")
    // update id=2, insert id=3
    val v2 = Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ver")
    val merged = Materialize.upsert(spark, path, v2, "id", "ver")
    val got = merged.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ("a", 1L), 2L -> ("b2", 2L), 3L -> ("c", 2L)))
    // same-version replay: update side wins ties, result unchanged
    val again = Materialize.upsert(spark, path, v2, "id", "ver")
    assert(again.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap == got)
  }

  test("ORC round-trip preserves rows and aggregate values") {
    val dir = tmp("graft-orc")
    val o = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
    o.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == o.schema)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)), sum(Exact.cents(col("o_totalprice"))),
        countDistinct(col("o_orderstatus"))).head
    assert(key(back) == key(o))
  }

  test("streaming upsert sink: micro-batches MERGE into the stored table, latest version wins") {
    import spark.implicits._
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft-stream-upsert-src")
    val table = tmp("graft-stream-upsert") + "/t"
    val ckpt = tmp("graft-stream-upsert-ckpt")
    val schema = Seq((1L, "x", 1L)).toDF("id", "v", "ver").schema
    // batch 1: two users at version 1
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
      .write.parquet(srcDir.resolve("b1").toString)
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString + "/*")
    val q = streaming.Streaming.upsertSink(stream, table, "id", "ver", ckpt)
    try {
      q.processAllAvailable()
      // batch 2 arrives later: id=2 updated, id=3 new
      Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ver")
        .write.parquet(srcDir.resolve("b2").toString)
      q.processAllAvailable()
    } finally q.stop()
    val got = Materialize.readTable(spark, table)
      .collect().map(r => r.getAs[Long]("id") -> (r.getAs[String]("v"), r.getAs[Long]("ver"))).toMap
    assert(got == Map(1L -> ("a", 1L), 2L -> ("b2", 2L), 3L -> ("c", 2L)), got.toString)
  }

  test("versioned store: time travel, uncommitted writes invisible, retention") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-versioned").toString + "/t"
    val v1 = Materialize.Versioned.write(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v2 = Materialize.Versioned.write(spark, root, Seq((1L, "a2")).toDF("k", "v"))
    val v3 = Materialize.Versioned.write(spark, root, Seq((9L, "z")).toDF("k", "v"))
    assert(Seq(v1, v2, v3) === Seq(1L, 2L, 3L))
    // latest reads v3; time travel to v1 still sees the original two rows
    assert(Materialize.Versioned.read(spark, root).collect().toSet ===
      Set(org.apache.spark.sql.Row(9L, "z")))
    assert(Materialize.Versioned.read(spark, root, Some(1L)).count() === 2L)
    // a version dir without _SUCCESS (writer died mid-job) is not live:
    // invisible to readers and skipped over by the next writer's numbering
    val dead = new java.io.File(s"$root/v=00000004"); dead.mkdirs()
    new java.io.File(dead, "part-00000.parquet").createNewFile()
    assert(Materialize.Versioned.versions(spark, root) === Seq(1L, 2L, 3L))
    assert(Materialize.Versioned.read(spark, root).collect().head.getLong(0) === 9L)
    intercept[IllegalArgumentException] {
      Materialize.Versioned.read(spark, root, Some(4L))
    }
    // a retried write claims the debris slot (crash recovery = plain retry)
    val v4 = Materialize.Versioned.write(spark, root, Seq((7L, "r")).toDF("k", "v"))
    assert(v4 === 4L)
    assert(Materialize.Versioned.read(spark, root).collect().head.getString(1) === "r")
    // plant marker-less crash debris BELOW the retained range (v=0) and AT
    // the next-slot position (v=5): retention must reap the former (write()
    // never revisits it) and leave the latter (could be a live concurrent
    // writer racing the slot)
    val oldDebris = new java.io.File(s"$root/v=00000000"); oldDebris.mkdirs()
    new java.io.File(oldDebris, "part-00000.parquet").createNewFile()
    val slotDebris = new java.io.File(s"$root/v=00000005"); slotDebris.mkdirs()
    // retention keeps the newest 2 live versions; v1/v2 gone, v3/v4 intact
    assert(Materialize.Versioned.expireVersions(spark, root, keepLast = 2) === Seq(1L, 2L))
    assert(Materialize.Versioned.versions(spark, root) === Seq(3L, 4L))
    assert(Materialize.Versioned.read(spark, root, Some(3L)).collect().toSet ===
      Set(org.apache.spark.sql.Row(9L, "z")))
    assert(!oldDebris.exists(), "old crash debris below the retained range is reaped")
    assert(slotDebris.exists(), "next-slot debris is left for write()'s own reclaim")
  }

  test("upsert recovers the table from a crash between the two renames") {
    import spark.implicits._
    val path = tmp("graft-upsert-crash") + "/t"
    val v1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
    Materialize.upsert(spark, path, v1, "id", "ver")
    // simulate a crash after step 2 (live table renamed aside) and before
    // step 3: the only surviving copy sits in path__old
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // the rerun must RESTORE the survivor (not treat the table as absent
    // and delete it), then merge normally
    val v2 = Seq((2L, "b2", 2L)).toDF("id", "v", "ver")
    val merged = Materialize.upsert(spark, path, v2, "id", "ver")
    val got = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2"), got.toString)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__old")))
  }

  test("compact: fragmented table rewritten to few files, data identical") {
    val path = tmp("graft-compact") + "/t"
    val src = Tables.orders(spark, sf())
    src.repartition(64).write.mode("overwrite").parquet(path) // fragment: 64 tiny files
    val (before, after) = Materialize.compact(spark, path, targetBytes = 1L << 30)
    assert(before >= 64, s"expected >=64 fragments, saw $before")
    assert(after == 1, s"expected 1 file after compaction, saw $after")
    val got = Materialize.readTable(spark, path)
    assert(got.count() == src.count())
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
  }

  test("compact: hive-partitioned table keeps layout, one file per partition") {
    import spark.implicits._
    val path = tmp("graft-compact-part") + "/t"
    val rows = (1L to 400L).map(i => (i, s"d${i % 4}", s"v$i")).toDF("id", "d", "v")
    rows.repartition(16).write.mode("overwrite").partitionBy("d").parquet(path) // ≤16 files per d
    val (before, after) = Materialize.compact(spark, path, partitionCols = Seq("d"))
    assert(before > 4 && after == 4, s"before=$before after=$after")
    val got = Materialize.readTable(spark, path)
    assert(got.select("id", "d", "v").exceptAll(rows).isEmpty)
    // partition dirs survive → pruning still works
    assert(got.filter(col("d") === "d1").count() == 100)
  }

  test("incremental materialization overwrites only the touched partitions") {
    import spark.implicits._
    val dir = tmp("graft-incr") + "/t"
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b")).toDF("id", "d", "v")
    Materialize.asPartitionedTable(day1, dir, "d")
    // re-materialize ONLY 2024-01-02 with new content + append 2024-01-03
    val delta = Seq((3L, "2024-01-02", "b2"), (4L, "2024-01-03", "c")).toDF("id", "d", "v")
    Materialize.overwritePartitions(delta, dir, "d")
    // partition values read back type-inferred (DATE here) — compare as text
    val got = Materialize.readTable(spark, dir)
      .collect().map(r =>
        (r.getAs[Long]("id"), String.valueOf(r.getAs[Any]("d")), r.getAs[String]("v"))).toSet
    // 01-01 untouched, 01-02 replaced (id 2 gone), 01-03 added
    assert(got == Set((1L, "2024-01-01", "a"), (3L, "2024-01-02", "b2"), (4L, "2024-01-03", "c")))
    // static-overwrite default restored: a plain partitioned overwrite replaces everything
    Materialize.asPartitionedTable(day1, dir, "d")
    assert(Materialize.readTable(spark, dir).count() == 2)
  }

  test("HTTP fetch (S1): stub server -> ingestHttp mart equals the file-path mart") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // serve the bundled fixture as one JSON array — the SpaceX API's shape
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(ops.Launches.fixturePath)).toArray.mkString(",")
    val body = s"[$lines]".getBytes("UTF-8")
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v4/launches", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(200, body.length.toLong)
        try x.getResponseBody.write(body) finally x.close()
      }
    })
    server.createContext("/down", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(503, -1); x.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val viaHttp = ops.Launches.mart(ops.Launches.latestSnapshot(ops.Launches.staging(
        ops.Launches.ingestHttp(spark, s"$base/v4/launches"))))
      val viaFile = ops.Launches.mart(ops.Launches.latestSnapshot(ops.Launches.staging(
        ops.Launches.ingest(spark, ops.Launches.fixturePath))))
      assert(viaHttp.collect().toSeq == viaFile.collect().toSeq)
      // reference raise_for_status semantics: non-2xx fails the ingest
      val err = intercept[java.io.IOException] {
        ops.Launches.fetchPayload(s"$base/down")
      }
      assert(err.getMessage.contains("503"), err.getMessage)
    } finally server.stop(0)
  }

  test("JDBC (embedded Derby): append-create, partitioned-range read, append, overwrite") {
    // Derby ships in /opt/spark/jars (pure JVM, in-memory DB) — this
    // executes the real spark.read/write.jdbc relation provider end-to-end,
    // closing the §2.1 S4/S6/S7 JDBC row that was previously
    // unverifiable-by-spec (VERDICT r4 item 3). derby.log goes to a temp
    // home; the memory: DB is dropped at the end.
    System.setProperty("derby.system.home", tmp("graft-derby"))
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val o = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
    val nOrders = o.count()
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)), sum(Exact.cents(col("o_totalprice"))),
        countDistinct(col("o_custkey")), max(col("o_orderkey"))).head
    try {
      // S6 append sink: mode=append creates the table on first write
      Materialize.writeJdbc(o, url, "ORDERS_T")
      val back = Materialize.readJdbc(spark, url, "ORDERS_T")
      assert(key(back) == key(o))

      // S4 partitioned-range parallel read: 4 concurrent range scans
      val maxK = o.agg(max(col("o_orderkey"))).head.getLong(0)
      val part = Materialize.readJdbcPartitioned(
        spark, url, "ORDERS_T", "o_orderkey", 1L, maxK, 4)
      assert(part.rdd.getNumPartitions == 4, "expected 4 JDBC range partitions")
      assert(key(part) == key(o))

      // append semantics (spacex_api_dag.py:49): second write adds rows
      Materialize.writeJdbc(o.limit(10), url, "ORDERS_T")
      assert(Materialize.readJdbc(spark, url, "ORDERS_T").count() == nOrders + 10)

      // S7 replace sink: overwrite truncates/recreates
      Materialize.writeJdbc(o.limit(5), url, "ORDERS_T", mode = "overwrite")
      assert(Materialize.readJdbc(spark, url, "ORDERS_T").count() == 5)
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftjdbc;drop=true")
      catch { case _: java.sql.SQLException => () } // success path throws 08006
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark
    wh.sql("DROP TABLE IF EXISTS graft_orders_b")
    wh.sql("DROP TABLE IF EXISTS graft_cust_b")
    Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    Tables.customer(spark, sf()).select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_cust_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("graft_orders_b")
          .join(spark.table("graft_cust_b"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        j.collect() // force execution so executedPlan is final (AQE)
        j
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not re-shuffle its bucketed inputs; the only
    // exchange allowed is the post-join groupBy's
    val joinSection = plan.split("(?i)hashaggregate").last
    assert(!joinSection.toLowerCase.contains("exchange hashpartitioning(o_custkey"), plan)
    assert(!joinSection.toLowerCase.contains("exchange hashpartitioning(c_custkey"), plan)
    // cross-check the result is right
    val expected = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf()), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("corrupt part file: default read fails loud, ignoreCorruptFiles skips exactly it") {
    // at 100 TB some part file IS eventually truncated mid-write or bit-rotted;
    // the two correct behaviors are (a) fail loud by default — silent row loss
    // must never look like success — and (b) when the operator opts in,
    // skip precisely the corrupt file and keep every healthy row
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toString
    Seq(1L, 2L, 3L).toDF("v").repartition(1).write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt-00000.snappy.parquet"),
      Array.fill[Byte](512)(0x5a)) // valid-looking name, garbage bytes
    val strict = spark.newSession()
    strict.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assertThrows[org.apache.spark.SparkException] {
      strict.read.parquet(dir).count()
    }
    val lenient = spark.newSession()
    lenient.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    assert(lenient.read.parquet(dir).agg(sum("v")).head.getLong(0) == 6L,
      "lenient read must keep every row of the healthy files")
  }
}
