package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // pandas errors="coerce" cast semantics (invalid -> NULL), matching
      // the reference's normalizers; Spark 4 defaults ANSI on.
      .config("spark.sql.ansi.enabled", "false")
      // Reliable checkpoint() files and localCheckpoint blocks written by
      // Registry.cut are deleted by the ContextCleaner once their RDDs are
      // collected, so long sessions don't grow the checkpoint dir (r13 ADVICE).
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // r14: see Bench — the 100-entry codegen LRU thrashes at 306
      // queries; scale-neutral driver-memory-for-compile-time trade.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // r15: see Bench — AQE may coalesce cached-plan output partitions,
      // so memoized-frame scans stop costing one task per tiny shuffle
      // partition. Applied symmetrically to the driver-verifiable path.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated filter for focused local iteration; the
    // driver's invocation leaves it unset and dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // A failing query must be LOUD: collected here, written to a
    // failures.json manifest next to the parquet dumps, and reflected in a
    // non-zero exit. Round 6 proved that a stderr line alone lets a broken
    // query silently vanish from the correctness surface (six event-time
    // queries were absent — not red — in CORRECTNESS_r06).
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] FAIL $name: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Failure manifest (empty object when green) — machine-readable so the
    // driver/judge can distinguish "query absent because broken" from
    // "query absent because filtered".
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    graft.queries.Registry.evict(spark)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size} queries FAILED: ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
