package graft.engines

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.cleaning.{CleanMatrix, CleanRelius, CleanReliusDemo, CleanRothBasis}
import graft.io.Load
import graft.queries.Testdata

/** Schema-stability on empty inputs: every cleaner and engine must accept
  * a zero-row frame and return a zero-row frame with its normal output
  * schema — the property that keeps a 100 TB orchestration alive when one
  * day's export is empty (no special-casing upstream, no NPEs from
  * rule ladders over missing data).
  */
class EmptyInputSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def empty(full: DataFrame): DataFrame = full.limit(0)

  test("cleaners accept empty raw frames") {
    val s = spark
    assert(CleanRelius(empty(Testdata.reliusRaw(s, dir))).count() == 0)
    assert(CleanMatrix(empty(Testdata.matrixRaw(s, dir))).count() == 0)
    assert(CleanReliusDemo(empty(Testdata.demoRaw(s, dir))).count() == 0)
    assert(CleanRothBasis(empty(Testdata.basisRaw(s, dir))).count() == 0)
  }

  test("engines produce schema-stable empty outputs on empty inputs") {
    val s = spark
    val relius = Testdata.cleanRelius(s, dir)
    val matrix = Testdata.cleanMatrix(s, dir)
    val demo = Testdata.cleanDemo(s, dir)
    val basis = Testdata.cleanBasis(s, dir)

    val ea = MatchPlanId.reconcile(empty(relius), empty(matrix))
    assert(ea.count() == 0)
    assert(ea.schema == MatchPlanId.reconcile(relius, matrix).schema)

    val eb = AgeTaxCode.run(empty(matrix), empty(demo))
    assert(eb.count() == 0)
    assert(eb.schema == AgeTaxCode.run(matrix, demo).schema)

    val ec = RothTaxable.run(empty(matrix), empty(demo), empty(basis))
    assert(ec.count() == 0)
    assert(ec.schema == RothTaxable.run(matrix, demo, basis).schema)

    val ed = IraRollover.run(empty(matrix))
    assert(ed.count() == 0)
    assert(ed.schema == IraRollover.run(matrix).schema)
  }

  test("correction builder and splitter handle empty engine output") {
    val s = spark
    val matrix = Testdata.cleanMatrix(s, dir)
    val ed = IraRollover.run(matrix.limit(0))
    val corr = graft.outputs.BuildCorrectionFile.buildCorrectionDataFrame(ed)
    assert(corr.count() == 0)
    val tabs = graft.outputs.BuildCorrectionFile.splitCorrectionsByAction(corr)
    assert(tabs("Correction").count() == 0)
    assert(tabs("Investigate").count() == 0)
  }
}
