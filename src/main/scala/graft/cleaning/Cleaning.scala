package graft.cleaning

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared cleaning primitives: rename, keep-only projection, and the
  * ingest-order window dedup that replicates pandas' stable
  * `drop_duplicates(keep=...)` semantics (SURVEY §2.7 D1–D3).
  */
object Cleaning {

  /** Synthetic ingest-order column used to replicate pandas' file-order
    * dedup. Tagged once at the start of cleaning.
    */
  val IngestIdCol = "_ingest_id"

  /** Tag ingest order if not already present. `monotonically_increasing_id`
    * is (partition-index << 33) + row-in-partition — monotone in file order
    * for a deterministic scan, and ASSIGNED BELOW any exchange the spread
    * below adds (the project sits under the repartition in the plan), so
    * the dedup windows ordering on it still see exact file order.
    *
    * r15 (guide §2.5 — "one huge unsplittable file: repartition
    * immediately after the read"): when the source yields far fewer
    * splits than the session's shuffle width (a single-row-group parquet,
    * gzip, or a 1-file export — exactly the bench testdata's layout), the
    * whole pre-dedup normalizer chain would otherwise run inside the one
    * scan task. Spread the ingest-tagged rows once; the ingest id, not
    * row placement, carries the ordering contract. No-op whenever the
    * scan is already at least quarter-width (real multi-split layouts at
    * scale), so no extra shuffle is added where the input parallelizes
    * naturally.
    */
  def withIngestId(df: DataFrame): DataFrame =
    if (df.columns.contains(IngestIdCol)) df
    else {
      val tagged = df.withColumn(IngestIdCol, monotonically_increasing_id())
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      if (df.rdd.getNumPartitions * 4 >= n) tagged
      else tagged.repartition(n)
    }

  /** P1 — rename raw headers to canonical names (only those present). */
  def renameColumns(df: DataFrame, columnMap: Seq[(String, String)]): DataFrame =
    columnMap.foldLeft(df) { case (d, (raw, canonical)) =>
      if (d.columns.contains(raw)) d.withColumnRenamed(raw, canonical) else d
    }

  /** P2 — keep-only projection, ignoring absent columns
    * (reference _drop_unneeded_columns, src/cleaning/clean_matrix.py:152-163).
    * Always retains the ingest-id column when present.
    */
  def keepColumns(df: DataFrame, keep: Seq[String]): DataFrame = {
    val present = keep.filter(df.columns.contains) ++
      (if (df.columns.contains(IngestIdCol)) Seq(IngestIdCol) else Nil)
    df.select(present.map(col): _*)
  }

  /** D1 — key-based dedup keep-first in ingest order
    * (reference drop_duplicates(subset, keep="first"),
    * src/cleaning/clean_relius.py:344-347).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderBy: Column): DataFrame =
    dedupBy(df, keys, Seq(orderBy.asc))

  /** D2 — dedup keep-last in ingest order
    * (reference src/cleaning/clean_relius_demo.py:141-144: the sort on key
    * columns is stable, so last-in-file wins within each key group).
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], orderBy: Column): DataFrame =
    dedupBy(df, keys, Seq(orderBy.desc))

  /** D3 — dedup by completeness then ingest order
    * (reference src/cleaning/clean_relius_roth_basis.py:164-172: pandas'
    * default quicksort on a constant-completeness group preserves original
    * order in practice for the tiny groups involved; first-in-file wins on
    * ties).
    */
  def dedupByCompleteness(
      df: DataFrame,
      keys: Seq[String],
      completenessCols: Seq[String],
      orderBy: Column): DataFrame = {
    val completeness = completenessCols
      .map(c => col(c).isNotNull.cast("int"))
      .reduce(_ + _)
    dedupBy(df, keys, Seq(completeness.desc, orderBy.asc))
  }

  private def dedupBy(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    // r15: pin the dedup exchange at the session's configured shuffle
    // parallelism. The window only needs ClusteredDistribution(keys), so
    // this single explicit exchange feeds the window with no second
    // shuffle AND keeps the CPU-dense normalizer/validator tail that the
    // cleaners run on the window's output at full fan-out — AQE's
    // cached-plan coalescing would otherwise fold the post-window stage
    // to advisory-size partition counts (regex normalization is orders
    // of magnitude denser per byte than scan/shuffle work; measured at
    // sf0.1: clean_relius tail serialized onto 1-2 tasks). The count is
    // the contract-scaled spark.sql.shuffle.partitions, not a constant.
    // Pin on the NON-FLOAT subset of the keys: the window's required
    // distribution wraps float keys in NaN/-0.0 normalization
    // (knownfloatingpointnormalized), which a user repartition cannot
    // express — partitioning on the plain float column would NOT satisfy
    // the requirement and the planner would add a second exchange
    // (observed: clean_relius shuffled twice). A hash partitioning on a
    // subset of the window keys satisfies ClusteredDistribution (equal
    // full key implies equal subset key), so the window reuses this
    // exchange directly — the same subset-co-partitioning device as
    // EngineQueries.bucketedInputs.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val pinKeys = {
      val nonFloat = keys.filter(k => df.schema(k).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => false
        case _ => true
      })
      if (nonFloat.nonEmpty) nonFloat else keys
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.repartition(n, pinKeys.map(col): _*)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** P11 — drop rows with any null among `keys` (reference
    * dropna(subset=keys, how="any"), src/cleaning/clean_matrix.py:443-447).
    */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    val present = keys.filter(df.columns.contains)
    if (present.isEmpty) df else df.na.drop("any", present)
  }

  /** Apply `f` to `colName` only when present (the reference's
    * `if col in df.columns` guards).
    */
  def withColumnIfPresent(df: DataFrame, colName: String, f: Column => Column): DataFrame =
    if (df.columns.contains(colName)) df.withColumn(colName, f(col(colName))) else df

  /** One V7 warning observation: the reference's message with its count. */
  final case class QaCount(message: String, n: Long)

  // Thread-local so concurrent cleaner runs (parallel pipelines or test
  // suites in one JVM) cannot contaminate each other's QA summaries: the
  // eager warnIf counts run on the caller's thread, and the same thread
  // drains them right after the cleaner returns.
  private val qaBuffer = new ThreadLocal[scala.collection.mutable.ListBuffer[QaCount]] {
    override def initialValue() = scala.collection.mutable.ListBuffer.empty[QaCount]
  }

  /** Drain the QA counts recorded by [[warnIf]] ON THIS THREAD since the
    * last drain (insertion order). The CLI prints these as its QA summary.
    */
  def drainQaCounts(): Seq[QaCount] = {
    val buf = qaBuffer.get()
    val out = buf.toList
    buf.clear()
    out
  }

  /** V7 — cleaner warning counters, mirroring the reference's eager
    * mid-pipeline warns (src/cleaning/clean_matrix.py:327-335,
    * clean_relius.py:251-288: SSN invalids counted before the date
    * filter, code lengths after normalization). Enabled, each check runs
    * one count() at its pipeline position — exactly the frame the
    * reference counts — logs when n > 0, and records the observation for
    * the CLI's QA summary. Library callers keep `enabled = false` and
    * stay fully lazy.
    */
  def warnIf(df: DataFrame, cond: Column, message: Long => String, enabled: Boolean): Unit =
    if (enabled) {
      val n = df.filter(cond).count()
      if (n > 0) org.apache.log4j.Logger.getLogger(getClass).warn(message(n))
      qaBuffer.get() += QaCount(message(n), n)
    }
}
