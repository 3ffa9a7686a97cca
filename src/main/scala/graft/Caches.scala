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
  *
  * Scoping (ADVICE r2): the registry is THREAD-LOCAL — a query is built and
  * released on one thread, so one tenant's [[releaseAll]] can no longer
  * unpersist a concurrent tenant's in-flight caches on a shared session
  * (the multi-tenant shape OperatorsSpec's concurrency test advertises).
  * Library code that caches internally should use [[scoped]], which
  * releases exactly the entries registered inside the block and leaves the
  * caller's registrations alone.
  */
object Caches {
  private val live = new ThreadLocal[scala.collection.mutable.ArrayBuffer[() => Unit]] {
    override def initialValue(): scala.collection.mutable.ArrayBuffer[() => Unit] =
      scala.collection.mutable.ArrayBuffer.empty
  }

  /** `df.persist()` + register for the next [[releaseAll]] on this thread. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    live.get += (() => { df.unpersist(false); () })
    df
  }

  /** Register an already-localCheckpoint()ed frame for release. */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    live.get += (() => releaseCheckpoint(df))
    df
  }

  /** Unpersist the RDD behind a localCheckpoint()ed frame. `localCheckpoint`
    * persists its materialized RDD (MEMORY_AND_DISK) with no public release
    * API; the RDD sits in the plan as a LogicalRDD leaf. No-op for other
    * plan shapes. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
      .foreach(_.unpersist(false))

  /** Run `f`, then release ONLY the cache entries `f` registered on this
    * thread — the self-cleaning wrapper for library entry points (e.g.
    * [[Pipelines.prepareCorpus]]) whose callers may hold their own live
    * caches. Safe because such entry points return either written-storage
    * reads or small results, never a plan over the released caches. */
  def scoped[T](f: => T): T = {
    val buf = live.get
    val markAtEntry = buf.length
    try f
    finally {
      // a releaseAll() inside f clears the buffer, so anything present now
      // below the entry mark is gone — everything remaining was registered
      // by f and belongs to this scope. Release from 0 in that case (a
      // plain clamp would silently leave f's own entries persisted).
      val mark = if (buf.length < markAtEntry) 0 else markAtEntry
      buf.drop(mark).reverseIterator.foreach(r => try r() catch { case _: Throwable => () })
      buf.remove(mark, buf.length - mark)
    }
  }

  /** Release everything registered ON THE CALLING THREAD since the last
    * call — a call from any other thread is a no-op for this thread's
    * entries (the price of the per-tenant scoping above; each tenant
    * releases on the thread that built its query, as Verify/Bench/tests
    * do). Safe to call while nothing is registered; tolerates
    * already-released entries. */
  def releaseAll(): Unit = {
    val buf = live.get
    buf.foreach(f => try f() catch { case _: Throwable => () })
    buf.clear()
  }
}
