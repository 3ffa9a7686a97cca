package graft.tools

/** Dev probe: does this Spark 4 build support WITH RECURSIVE and VARIANT?
  * (Feature-gating for candidate SQL-surface queries; run manually via
  * `Test/runMain graft.tools.DbgSql4`.) */
object DbgSql4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    def probe(name: String)(f: => Any): Unit =
      try { val r = f; println(s"[dbg] $name OK: $r") }
      catch { case e: Throwable => println(s"[dbg] $name FAIL: ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}") }

    probe("recursive-cte") {
      spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5)
          |SELECT sum(n) FROM t""".stripMargin).collect().mkString
    }
    probe("variant-parse") {
      spark.sql("""SELECT variant_get(parse_json('{"a": {"b": 7}}'), '$.a.b', 'long')""")
        .collect().mkString
    }
    probe("try-variant") {
      spark.sql("""SELECT try_variant_get(parse_json('{"a": 1}'), '$.missing', 'long')""")
        .collect().mkString
    }
    probe("variant-typeof") {
      spark.sql("""SELECT schema_of_variant(parse_json('[1, {"x": 2.5}]'))""").collect().mkString
    }
    spark.stop()
  }
}
