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
  /** Load a testdata table from the per-SF directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def all: Seq[QueryDef] =
    CoreQueries.defs ++ EngineQueries.defs ++ FunctionQueries.defs ++
      SummaryQueries.defs ++ TdpQueries.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
