package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.debug.codegenStringSeq

import graft.SparkSpec
import graft.queries.Testdata

/** Regression guard for the janino 64 KB method-limit failure mode: a
  * collapsed projection whose generated `processNext()` exceeds the JVM
  * method limit makes Spark attempt the compile for tens of seconds and
  * then SILENTLY run the stage interpreted (observed on Engine C before
  * its masks were staged into columns, and on Engine D in round 1).
  * This spec compiles every WholeStageCodegen subtree of each engine
  * pipeline up front and fails loudly if any subtree does not produce
  * valid bytecode or any generated method approaches the 64 KB limit.
  */
class CodegenHealthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertAllSubtreesCompile(name: String, build: => DataFrame): Unit = {
    // AQE defers stage planning, so the pre-execution plan carries no
    // WholeStageCodegen subtrees to compile; turn it off for the health
    // check (the generated code is identical either way).
    val s = spark
    val prev = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val subtrees =
      try codegenStringSeq(build.queryExecution.executedPlan)
      finally s.conf.set("spark.sql.adaptive.enabled", prev)
    assert(subtrees.nonEmpty, s"$name: no WholeStageCodegen subtree at all")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats.maxMethodCodeSize > 0,
        s"$name: a WholeStageCodegen subtree failed to compile " +
          s"(stats unavailable) — likely over the 64 KB method limit:\n$subtree")
      assert(stats.maxMethodCodeSize < 60000,
        s"$name: generated method is ${stats.maxMethodCodeSize} bytes — " +
          s"within 10% of janino's 64 KB limit, one rule away from " +
          s"interpreted fallback:\n$subtree")
    }
  }

  test("Engine A reconcile plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineA",
      graft.engines.MatchPlanId.reconcile(
        Testdata.cleanRelius(spark, dir), Testdata.cleanMatrix(spark, dir)))
  }

  test("Engine B plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineB",
      graft.engines.AgeTaxCode.run(
        Testdata.cleanMatrix(spark, dir), Testdata.cleanDemo(spark, dir)))
  }

  test("Engine C plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineC",
      graft.engines.RothTaxable.run(
        Testdata.cleanMatrix(spark, dir), Testdata.cleanDemo(spark, dir),
        Testdata.cleanBasis(spark, dir)))
  }

  test("Engine D plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineD",
      graft.engines.IraRollover.run(Testdata.cleanMatrix(spark, dir)))
  }
}
