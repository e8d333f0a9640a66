package graft.io

import java.nio.file.Files

import graft.SparkSpec
import graft.cleaning.{CleanMatrix, CleanRelius}
import graft.core.GenerateSampleData
import graft.engines.MatchPlanId
import graft.outputs.BuildCorrectionFile

class IoSpec extends SparkSpec {

  test("sanitizeSheetNames truncates to 31 chars and dedupes") {
    val long = "x" * 40
    val out = Write.sanitizeSheetNames(Seq(long, long, "Correction", "Correction"))
    assert(out.head == "x" * 31)
    assert(out(1) == "x" * 29 + "_1")
    assert(out(2) == "Correction" && out(3) == "Correction_1")
    assert(out.forall(_.length <= 31))
  }

  test("reportDir routes by engine and sample flag; rejects unknown engines") {
    assert(Write.reportDir("/tmp/r", "match_planid", sample = true)
      == "/tmp/r/reports/samples/match_planid")
    assert(Write.reportDir("/tmp/r", "roth_taxable", sample = false)
      == "/tmp/r/reports/outputs/roth_taxable")
    intercept[IllegalArgumentException] {
      Write.reportDir("/tmp/r", "nope", sample = false)
    }
  }

  test("sample generator: deterministic, planted edges, join coverage") {
    val s1 = GenerateSampleData(spark, nBase = 50, seed = 42L)
    val s2 = GenerateSampleData(spark, nBase = 50, seed = 42L)
    assert(s1.relius.collect().toSeq == s2.relius.collect().toSeq)
    assert(s1.relius.count() == 52) // 50 base + 2 edge rows
    assert(s1.matrix.count() == 52)
    val coverage = GenerateSampleData.joinCoverage(s1)
    assert(coverage > 0.8 && coverage <= 1.0) // base rows all match; edges don't
  }

  test("end-to-end: sample -> clean -> reconcile -> correction file -> write") {
    val sample = GenerateSampleData(spark, nBase = 40, seed = 7L)
    val matches = MatchPlanId.reconcile(
      CleanRelius(sample.relius), CleanMatrix(sample.matrix))
    val corrections = BuildCorrectionFile.buildCorrectionDataFrame(matches)
    val out = Files.createTempDirectory("graft-io").toString
    val paths = Write.writeCorrectionFile(corrections, out, sample = true)
    assert(paths.length == 2)
    assert(paths.forall(_.contains("reports/samples/match_planid")))
    val written = spark.read.option("header", "true").csv(paths.head)
    assert(written.columns.contains("New Tax Code"))
  }

  test("Load validates required columns") {
    val s = spark
    import s.implicits._
    val bad = Seq(("p", "s")).toDF("PLANID_1", "SSNUM_1")
    val e = intercept[IllegalArgumentException] {
      Load.validateColumns(bad, Load.ReliusRawSchema.fieldNames.toSeq, "Relius")
    }
    assert(e.getMessage.contains("FIRSTNAM"))
  }

  test("JSON-lines and ORC round-trip with explicit schemas") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5))
      .toDF("id", "tag", "v")
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    df.write.mode("overwrite").json(s"$base/j")
    df.write.mode("overwrite").orc(s"$base/o")
    // Explicit schema on read — never infer on a production source.
    val back_j = s.read.schema(df.schema).json(s"$base/j")
    val back_o = s.read.schema(df.schema).orc(s"$base/o")
    for (back <- Seq(back_j, back_o)) {
      // File reads surface every column nullable; compare names + types.
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      val got = back.orderBy("id").collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
      assert(got == Seq((1L, Some("a"), 1.5), (2L, Some("b"), 2.5),
        (3L, None, 3.5)))
    }
  }

  test("writePartitioned: partition filter prunes directories at read time") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 3000).map(i => (i.toLong, s"2026-0${i % 3 + 1}", i * 2.0))
      .toDF("id", "month", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Write.writePartitioned(df, dir, Seq("month"))
    // Layout: one directory per month value.
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("month=2026-01", "month=2026-02", "month=2026-03"))
    // A filter on the partition column reaches the scan as a
    // PartitionFilter (pruned at planning, not a row filter).
    val back = s.read.parquet(dir).filter(col("month") === "2026-02")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("month"),
      plan.take(2000))
    assert(back.count() == 1000)
  }
}
