package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump the formatted physical plan of every SparkEntry query to
  * stdout (plan review per SURVEY.md §4 — pushdown, broadcast, codegen).
  *
  * Usage: ExplainDump [sfDir] [outDir] [nameSubstring...]
  *  - no outDir: print the plan tree (no details section) for each query;
  *  - with outDir: additionally write the FULL `explain("formatted")`
  *    output to <outDir>/<name>.txt — the optimization rounds' committed
  *    plan evidence (plans/r{N}/<query>_{before,after}.txt). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption
    val only = args.drop(2)
    outDir.foreach(d => new java.io.File(d).mkdirs())
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
    selected.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.explainString(FormattedMode)
        println(s"===== $name =====")
        println(plan.linesIterator.takeWhile(!_.startsWith("(")).mkString("\n"))
        outDir.foreach { d =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/$name.txt"), plan)
        }
      } catch { case e: Throwable => println(s"===== $name ===== EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
