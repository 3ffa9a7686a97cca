package graft

import org.apache.spark.sql.functions._

/** Z-order clustering + file-manifest pruning (graft.Layout): the
  * data-layout half of table maintenance. Uses a deterministic 100×100
  * grid so the expected file-skip behavior is exact, not statistical. */
class LayoutSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def refZ(a: Int, b: Int, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("zValue matches a reference bit-interleave on a sample grid") {
    import spark.implicits._
    val pairs = for (a <- 0 until 64; b <- 0 until 64) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == refZ(a, b), s"z($a,$b)")
    }
  }

  test("z-ordered layout: selective predicates on EITHER column skip most files") {
    import spark.implicits._
    val path = tmp("graft-zorder") + "/t"
    // 100×100 grid, one row per cell
    val grid = (0 until 10000).map(i => (i % 100, i / 100, i.toLong)).toDF("x", "y", "id")
    Layout.zorderWrite(grid, path, "x", "y", nFiles = 16)
    val man = Layout.manifest(spark, path, Seq("x", "y")).collect()
    assert(man.length == 16, s"expected 16 files, saw ${man.length}")
    assert(man.map(_.getAs[Long]("n_rows")).sum == 10000L)
    // each column's narrow band must touch a minority of files — the
    // whole point of the curve; a single-column sort would pass one of
    // these and fail the other with all 16 files
    val manDf = Layout.manifest(spark, path, Seq("x", "y"))
    val nx = Layout.candidateFiles(manDf, "x", lit(10), lit(19)).count()
    val ny = Layout.candidateFiles(manDf, "y", lit(10), lit(19)).count()
    assert(nx <= 8, s"x-band touches $nx/16 files")
    assert(ny <= 8, s"y-band touches $ny/16 files")
  }

  test("candidate files are sufficient: reading only them loses no matching rows") {
    import spark.implicits._
    val path = tmp("graft-zorder-c") + "/t"
    val grid = (0 until 10000).map(i => (i % 100, i / 100, i.toLong)).toDF("x", "y", "id")
    Layout.zorderWrite(grid, path, "x", "y", nFiles = 16)
    val man = Layout.manifest(spark, path, Seq("x", "y"))
    val files = Layout.candidateFiles(man, "x", lit(42), lit(57))
      .collect().map(_.getAs[String]("file"))
    val pruned = spark.read.parquet(files: _*)
      .filter(col("x").between(42, 57))
    val full = spark.read.parquet(path).filter(col("x").between(42, 57))
    assert(pruned.count() == full.count() && full.count() == 16 * 100L)
  }
}
