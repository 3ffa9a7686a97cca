package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Per-column introspection profile beside each result parquet (VERDICT
    * r8 item 2): type as the PARQUET ROUND-TRIP spells it (read back from
    * the written files — the representation the driver's typed hash sees,
    * which is how q30's DECIMAL column hid for a round), null count,
    * min/max as strings, and an ORDER-INSENSITIVE checksum (exact
    * DECIMAL(38,0) sum of per-row xxhash64 over the column's JSON
    * encoding — decimal, not long: ANSI mode makes a long-sum overflow
    * throw, and xor would cancel duplicated rows). The table-level checksum
    * makes two Verify runs diffable without re-reading results — the
    * layout-invariance and AQE sweeps compare exactly these. */
  def profileJson(df: DataFrame): String = {
    val cols = df.schema.fields
    val aggs =
      count(lit(1)).as("__rows") +:
      sum(xxhash64(to_json(struct(cols.map(f => col(f.name)).toIndexedSeq: _*)))
        .cast("decimal(38,0)")).as("__table_ck") +:
      cols.flatMap { f =>
        val c = col(f.name)
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"__n_${f.name}"),
          min(c.cast("string")).as(s"__mn_${f.name}"),
          max(c.cast("string")).as(s"__mx_${f.name}"),
          sum(when(c.isNull, 0L)
            .otherwise(xxhash64(to_json(struct(c.as("v")))))
            .cast("decimal(38,0)")).as(s"__ck_${f.name}"))
      }.toIndexedSeq
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def jstr(s: String): String =
      if (s == null) "null"
      else "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // checksums come back as Decimal(38,0), counts as Long — render both
    // through toString (integers either way, no exponent notation)
    def jnum(i: Int): String =
      if (r.isNullAt(i)) "0" else r.get(i).toString
    val colJson = cols.zipWithIndex.map { case (f, k) =>
      val base = 2 + k * 4
      jstr(f.name) + ": {\"type\": " + jstr(f.dataType.sql) +
        ", \"nulls\": " + jnum(base) +
        ", \"min\": " + jstr(if (r.isNullAt(base + 1)) null else r.getString(base + 1)) +
        ", \"max\": " + jstr(if (r.isNullAt(base + 2)) null else r.getString(base + 2)) +
        ", \"checksum\": " + jnum(base + 3) + "}"
    }.mkString(", ")
    "{\"rows\": " + jnum(0) + ", \"table_checksum\": " + jnum(1) +
      ", \"columns\": {" + colJson + "}}"
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [nameSubstring...] — the optional filters are
    // dev-only (driver always passes exactly two args = run everything)
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.exists(n.contains) }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // profile what the PARQUET holds, not the in-memory frame — the
        // round-trip type (e.g. timestamp → TIMESTAMPTZ on read-back) is
        // exactly what the driver compare hashes. Own try: a profile
        // hiccup must not report a successfully-dumped query as failed.
        try Files.writeString(Paths.get(s"$outDir/$name.profile.json"),
          profileJson(spark.read.parquet(s"$outDir/$name")))
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name profile skipped: ${e.getMessage}")
        }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally Caches.releaseAll() // bound storage across the 50-query run
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Caches.releaseMemos()
    spark.stop()
  }
}
