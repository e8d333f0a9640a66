package graft.queries

import org.apache.spark.sql.functions._

/** Foundational queries over the testdata tables: scans, projections,
  * filters, aggregations (SURVEY §2.1/2.2/2.4 analogues).
  */
object CoreQueries {
  import Registry.table

  def defs: Seq[QueryDef] = Seq(
    // A-family hash aggregation with map-side partial aggregation; the
    // grouped sum over integral-valued doubles is exact, so it hash-matches
    // the DuckDB oracle bit-for-bit.
    QueryDef(
      "q1_agg",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
