package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump the formatted physical plan of every SparkEntry query to
  * stdout (plan review per SURVEY.md §4 — pushdown, broadcast, codegen). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.explainString(FormattedMode)
        println(s"===== $name =====")
        println(plan.linesIterator.takeWhile(!_.startsWith("(")).mkString("\n"))
      } catch { case e: Throwable => println(s"===== $name ===== EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
