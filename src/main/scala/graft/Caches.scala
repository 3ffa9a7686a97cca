package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle registry for per-query cached state (ADVICE.md r1: persisted
  * subplans and localCheckpoint RDDs were never released, so a multi-sf
  * Verify/Bench run grew storage memory without bound).
  *
  * Query builders register every `persist()` and `localCheckpoint()` here;
  * the harness (Verify/Bench) calls [[releaseAll]] after each query's final
  * action. Caches still do their job *within* a query — the three consumers
  * of a persisted subplan share one materialization — and Spark's
  * CacheManager plan-dedup still shares entries across queries that run
  * between two releases; release just bounds the lifetime to one harness
  * step. On a cluster the same pattern applies, with `unpersist` shrinking
  * executor storage memory instead of local heap.
  */
object Caches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** `df.persist()` + register for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    df.persist()
    live += (() => { df.unpersist(false); () })
    df
  }

  /** Register an already-localCheckpoint()ed frame for release. */
  def trackCheckpoint(df: DataFrame): DataFrame = synchronized {
    live += (() => releaseCheckpoint(df))
    df
  }

  /** Unpersist the RDD behind a localCheckpoint()ed frame. `localCheckpoint`
    * persists its materialized RDD (MEMORY_AND_DISK) with no public release
    * API; the RDD sits in the plan as a LogicalRDD leaf. No-op for other
    * plan shapes. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
      .foreach(_.unpersist(false))

  /** Release everything registered since the last call. Safe to call while
    * nothing is registered; tolerates already-released entries. */
  def releaseAll(): Unit = synchronized {
    live.foreach(f => try f() catch { case _: Throwable => () })
    live.clear()
  }
}
