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
  // global live-entry count across all threads — the observability hook for
  // the thread-local releaseAll contract (ADVICE r3). Every registered
  // closure runs exactly once (releaseAll/scoped invoke then discard), so a
  // plain decrement inside the wrapper is balanced.
  private val total = new java.util.concurrent.atomic.AtomicInteger(0)

  private def register(release: () => Unit): Unit = {
    total.incrementAndGet()
    live.get += (() => { try release() finally total.decrementAndGet(); () })
  }

  /** `df.persist()` + register for the next [[releaseAll]] on this thread. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    register(() => { df.unpersist(false); () })
    df
  }

  /** [[persist]] at an explicit storage level — DISK_ONLY for frames whose
    * footprint is a multiple of the input (e.g. an exploded token stream):
    * spilling them through storage memory would evict caches that earn
    * their residency, while disk keeps the recompute-avoidance without the
    * memory bill. */
  def persist(df: DataFrame, level: org.apache.spark.storage.StorageLevel): DataFrame = {
    df.persist(level)
    register(() => { df.unpersist(false); () })
    df
  }

  /** Register an already-localCheckpoint()ed frame for release. */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    register(() => releaseCheckpoint(df))
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
    * reads or small results, never a plan over the released caches.
    *
    * Scope membership is tracked by entry IDENTITY (a snapshot of the
    * closures present at entry), not by a length mark: a `releaseAll()`
    * inside `f` followed by new registrations would desynchronize any
    * positional mark (ADVICE r3), whereas an identity snapshot is immune —
    * whatever survives in the buffer at exit and was NOT present at entry
    * was registered by `f` and is released here. Nested scopes compose for
    * the same reason. */
  def scoped[T](f: => T): T = {
    val buf = live.get
    val atEntry = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[() => Unit, java.lang.Boolean]())
    buf.foreach(atEntry.add)
    try f
    finally {
      val (callers, mine) = buf.partition(atEntry.contains)
      mine.reverseIterator.foreach(r => try r() catch { case scala.util.control.NonFatal(_) => () })
      buf.clear()
      buf ++= callers
    }
  }

  /** Release everything registered ON THE CALLING THREAD since the last
    * call.
    *
    * THREAD-LOCAL CONTRACT (public API, not just an implementation note):
    * a call from any other thread is a NO-OP for this thread's entries —
    * the price of the per-tenant scoping above. Each tenant must release
    * on the thread that built its query, as Verify/Bench/tests do. Code
    * that builds a plan on a pool/worker thread and releases on the main
    * thread silently leaks: watch [[liveCount]] (global, all threads) vs
    * [[liveCountHere]] (calling thread) to observe such leaks — a global
    * count that stays positive after every thread has released is the
    * signature. Safe to call while nothing is registered; tolerates
    * already-released entries. */
  def releaseAll(): Unit = {
    val buf = live.get
    buf.foreach(f => try f() catch { case scala.util.control.NonFatal(_) => () })
    buf.clear()
  }

  /** Live registered entries on the CALLING thread (not yet released). */
  def liveCountHere: Int = live.get.length

  /** Live registered entries across ALL threads — a leak detector for the
    * thread-local [[releaseAll]] contract: if this stays positive after
    * every tenant released, some thread registered entries that no one
    * can release anymore (e.g. plan built on a worker thread, release
    * called on main). */
  def liveCount: Int = total.get()
}
