package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: does CBO + ANALYZE reorder a join chain on this Spark build? */
object DbgCbo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE DATABASE IF NOT EXISTS cbodb")
    spark.sql("USE cbodb")
    for (t <- Seq("nation", "customer", "orders")) {
      graft.Tables.load(spark, dir, t).write.mode("overwrite").saveAsTable(t)
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // written in worst order: big ⋈ big first, tiny dim last
    val q = spark.sql(
      """SELECT n_name, count(*) FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_regionkey = 0
        |GROUP BY n_name""".stripMargin)
    println("=== optimized ===")
    println(q.queryExecution.optimizedPlan.toString.take(3000))
    spark.stop()
  }
}
