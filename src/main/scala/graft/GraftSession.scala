package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession builder pre-configured with
  * everything the engine's semantics assume. Verify/Bench/tests and any
  * embedding application should start here instead of hand-assembling the
  * config (r1/r2 had four copies drifting).
  *
  * Pinned settings and why:
  *  - session timezone UTC — the reference stores naive-UTC timestamps
  *    (SURVEY.md §1.3) and every oracle comparison assumes it;
  *  - `nanosAsLong` — events.ts is TIMESTAMP(NANOS) parquet, which Spark 4
  *    otherwise refuses to read (Tables.events converts ns→µs);
  *  - shuffle partitions = cores on local mode — the driver harness's
  *    contract (BASELINE.md); on a cluster leave the default/AQE to size it;
  *  - GraftExtensions — native expressions resolvable from SQL text.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.functions.GraftExtensions()(_))

  /** Session for the driver harness: local[cpus], cpus shuffle partitions.
    *
    * `SPARK_GRAFT_CONF` (dev-only; `k=v;k=v`) overlays RUNTIME confs after
    * construction — the hook the determinism sweeps use to re-run the full
    * Verify suite under a production-shaped config (AQE coalescing/skew
    * fully on, `shuffle.partitions=200`) and assert every result hash
    * unchanged. Runtime confs only: static confs are pinned above. */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach { kvs =>
      kvs.split(';').filter(_.contains("=")).foreach { kv =>
        val i = kv.indexOf('=')
        s.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
      }
    }
    s
  }
}
