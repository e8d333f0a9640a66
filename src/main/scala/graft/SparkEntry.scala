package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in graft.queries.Registry; this object is the
  * thin stable surface the driver invokes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Engine A end-to-end: adapter -> cleaners -> full-outer reconciliation.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("ea_reconcile")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracles
}
