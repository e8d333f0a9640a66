package graft

import org.apache.spark.sql.SparkSession

import graft.cleaning.{CleanMatrix, CleanRelius}
import graft.core.GenerateSampleData
import graft.engines.MatchPlanId
import graft.io.{Load, Write}
import graft.outputs.BuildCorrectionFile

/** O3 — EP1 CLI parity: load -> clean -> reconcile -> build -> write with
  * console totals (reference
  * `/root/reference/src/outputs/build_correction_file.py:367-421`).
  *
  * Usage:
  *   graft.Main <reliusPath> <matrixPath> <outDir>   # csv or parquet inputs
  *   graft.Main --sample <outDir>                    # seeded sample data
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-reconciliation")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Reliable checkpoint() files and localCheckpoint blocks written by
      // Registry.cut are deleted by the ContextCleaner once their RDDs are
      // collected, so long sessions don't grow the checkpoint dir (r13 ADVICE).
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (reliusRaw, matrixRaw, outDir, sample) = args.toSeq match {
      case Seq("--sample", out) =>
        val s = GenerateSampleData(spark)
        (s.relius, s.matrix, out, true)
      case Seq(reliusPath, matrixPath, out) =>
        (Load.relius(spark, reliusPath), Load.matrix(spark, matrixPath), out, false)
      case _ =>
        System.err.println(
          "usage: graft.Main <reliusPath> <matrixPath> <outDir> | --sample <outDir>")
        sys.exit(2)
    }

    // V7 parity: the reference warns eagerly during cleaning; the CLI
    // enables the counters (library callers default to lazy/silent).
    val reliusClean = CleanRelius(reliusRaw, warnCounts = true)
    val matrixClean = CleanMatrix(matrixRaw, warnCounts = true)
    val qa = graft.cleaning.Cleaning.drainQaCounts()
    if (qa.nonEmpty) {
      println("QA summary:")
      qa.foreach(q => println(f"  ${q.n}%8d  ${q.message}"))
    }
    val matches = MatchPlanId.reconcile(reliusClean, matrixClean)
    val corrections = BuildCorrectionFile.buildCorrectionDataFrame(matches)

    val paths = Write.writeCorrectionFile(corrections, outDir,
      engine = "match_planid", sample = sample)

    val statusCounts = matches.groupBy("match_status").count().collect()
      .map(r => s"${r.get(0)}: ${r.getLong(1)}").sorted
    println(s"Reconciliation complete. Status totals: ${statusCounts.mkString(", ")}")
    println(s"Correction rows: ${corrections.count()}")
    println(s"Wrote: ${paths.mkString(", ")}")
    spark.stop()
  }
}
