package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-shape dumper for the optimization rounds: writes
  * `.explain("formatted")` of each named query (or every query) to
  * `<outDir>/<name>.txt`, computing nothing. Usage:
  *   sbt "runMain graft.Explain <sfDir> <outDir> [name,name,...]"
  * The same session config as Bench so the dumped plans are the plans
  * the bench actually runs (AQE initial plans; the executed final plans
  * additionally carry AQEShuffleRead nodes).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // r15: keep the dumped plans identical to the Bench session's.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keySet.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$n.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[explain] FAIL $n: ${e.getMessage}")
      }
    }
    graft.queries.Registry.evict(spark)
    spark.stop()
  }
}
