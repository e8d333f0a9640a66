package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle SQL.
  * Column names MUST match between `fn`'s output and the oracle.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** Load a testdata table from the per-SF directory. Also (idempotently)
    * registers the graft native SQL functions so queries can use them
    * inside higher-order-function lambdas on any session.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.expressions.GraftExtensions.registerAll(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  // A never-recycled per-session ID (SparkSession.sessionUUID is
  // private[sql], so we mint our own): the WeakHashMap key does not pin
  // the session, and a fresh session can never be served another
  // session's cached frames the way a recycled identityHashCode could
  // (r9 ADVICE). Entries in the caches below for sessions closed without
  // calling [[evict]] still linger (a slow driver-memory leak in
  // long-lived multi-session processes) — every session owner must pair
  // create with evict, as Bench/Verify/Main and the test suites do.
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private[queries] def sessionId(spark: SparkSession): String =
    sessionIds.computeIfAbsent(
      spark, _ => java.util.UUID.randomUUID().toString)

  private val memoCache =
    scala.collection.concurrent.TrieMap.empty[((String, String), String), DataFrame]

  /** Memoize + persist a shared intermediate (cleaned inputs, engine
    * outputs) so the many queries built on top of it materialize it once
    * per session/SF — the local analogue of caching hot dimension tables
    * on a cluster.
    */
  def memo(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame =
    memoCache.getOrElseUpdate(((sessionId(spark), dir), key), {
      val df = build
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    })

  /** Unpersist and forget every frame memoized on `spark` (all SF dirs).
    * One-shot bench/verify JVMs never need this, but a long-lived session
    * iterating over multiple SF dirs would otherwise accumulate
    * MEMORY_AND_DISK blocks indefinitely; Bench/Verify call it before
    * `spark.stop()` as the reference pattern.
    */
  def evict(spark: SparkSession): Unit = {
    val id = sessionId(spark)
    memoCache.keys
      .filter { case ((sid, _), _) => sid == id }
      .foreach { k =>
        memoCache.remove(k).foreach(_.unpersist(blocking = false))
      }
    TdpQueries.evictDriverState(id)
    RangeRank.evictDriverState(id)
  }

  /** Lineage cut: eagerly truncate `df`'s logical plan so iterated
    * consumers (CC/rank/beam rounds, multi-census sweeps) don't hand
    * Catalyst a compounding tree to re-optimize on every action — the
    * tdp_louvain_round planning lesson (~30 s of pure driver
    * optimization on vertex-sized data without the cut). Prefers the
    * RELIABLE checkpoint when the session has a checkpoint dir (survives
    * executor loss on a real cluster; r12 ADVICE), falling back to the
    * executor-local fast path otherwise. This is the ONLY place
    * `localCheckpoint` may appear in main sources — CutLintSpec greps
    * for strays so an inlined local-only variant can't quietly
    * reintroduce the unreliable path.
    */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** Lineage cut for a BOUNDED frame — alphabet-, vocab-, or
    * centroid-sized, NEVER data-sized (the caller's declaration, same
    * contract as the blessed-broadcast sites): materializes at one
    * partition and re-exposes SinglePartition to the planner (a bare
    * checkpoint scan reports UnknownPartitioning, which satisfies no
    * clustered distribution), so iterated joins/aggregations over the
    * frame plan EXCHANGE-FREE — each fixed-point round becomes one
    * narrow stage instead of shuffle+shuffle+checkpoint (r14; guide
    * §2.4 "remove shuffles outright").
    */
  /** Test-only observation hook (thread-local: suites may run in
    * parallel inside one JVM): CutOneLintSpec installs a probe so every
    * cutOne INPUT can be audited for the bounded-frame contract above —
    * nothing but the comment would otherwise stop a future data-sized
    * call site from serializing a corpus through one partition (r14
    * VERDICT). Production cost is a ThreadLocal get returning null.
    */
  private[graft] val cutOneProbe =
    new InheritableThreadLocal[DataFrame => Unit]()

  /** Run independent operating-point computations CONCURRENTLY (guide
    * §2.6 — Spark's scheduler happily runs several jobs at once; sweeps
    * over independent thresholds/widths/shards are only sequential
    * because the driver calls their actions sequentially, and each
    * sweep's straggler tail leaves the executor pool idle). Results keep
    * the caller's order and each thunk is deterministic, so scheduling
    * cannot change values — only wall clock. The pool is per-call (the
    * sweeps ARE the work; thread creation is nanoseconds against Spark
    * jobs) and failures propagate like the sequential loop's would.
    */
  private[queries] def inParallel[A](xs: Seq[() => A]): Seq[A] =
    if (xs.size <= 1) xs.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(xs.size)
      try {
        val futs = xs.map(f =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = f()
          }))
        futs.map(_.get())
      } catch {
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause // surface the thunk's own failure, not the wrapper
      } finally pool.shutdown()
    }

  def cutOne(df: DataFrame): DataFrame = {
    val p = cutOneProbe.get()
    if (p != null) p(df)
    cut(df.coalesce(1)).coalesce(1)
  }

  def all: Seq[QueryDef] =
    CoreQueries.defs ++ EngineQueries.defs ++ FunctionQueries.defs ++
      SummaryQueries.defs ++ TdpQueries.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
