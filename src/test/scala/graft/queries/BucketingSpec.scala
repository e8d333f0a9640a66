package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-storage evidence for SCALING.md: writing both join inputs
  * bucketed on the join keys removes the exchanges from the join plan —
  * the co-location strategy the engine pipelines use at cluster scale.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without exchanges") {
    val s = spark
    import s.implicits._
    val warehouse = Files.createTempDirectory("graft-warehouse").toString
    val dir = "/root/testdata/sf0.001"

    val matrix = Testdata.cleanMatrix(s, dir)
      .select("plan_id", "ssn", "gross_amt", "tax_code_1")
    val demo = Testdata.cleanDemo(s, dir)
      .select("plan_id", "ssn", "dob", "term_date")

    s.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$warehouse'")
    try {
      matrix.write.mode("overwrite")
        .bucketBy(8, "plan_id", "ssn").sortBy("plan_id", "ssn")
        .saveAsTable("graft_bkt.matrix_b")
      demo.write.mode("overwrite")
        .bucketBy(8, "plan_id", "ssn").sortBy("plan_id", "ssn")
        .saveAsTable("graft_bkt.demo_b")

      // Disable broadcast so the planner exercises the bucketed SMJ path
      // (at real scale neither side would fit a broadcast anyway).
      val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = s.table("graft_bkt.matrix_b")
          .join(s.table("graft_bkt.demo_b"), Seq("plan_id", "ssn"))
        val expected = matrix.join(demo, Seq("plan_id", "ssn")).count()
        assert(joined.count() == expected)

        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(2000))
        assert(!plan.contains("Exchange hashpartitioning"),
          "bucketed join still shuffles:\n" + plan.take(2000))
        assert(plan.contains("Bucketed: true"), plan.take(2000))
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      s.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
