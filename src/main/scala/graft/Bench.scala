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
    // Warmup: pay the fixed JVM/codegen/parquet-datasource startup cost in
    // a DEDICATED timed entry instead of silently charging it to whichever
    // query runs first alphabetically (historically ~12.5 s billed to
    // a10_term_rate), so per-query numbers stay comparable across rounds.
    // Exercises the whole-stage-codegen, broadcast-join, window and
    // parquet-scan paths once over a 5-row table.
    val warmup = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/region.parquet")
        .createOrReplaceTempView("graft_warm")
      spark.sql(
        """SELECT a.r_regionkey,
          |  count(*) OVER (PARTITION BY a.r_regionkey) AS c
          |FROM graft_warm a JOIN graft_warm b USING (r_regionkey)""".stripMargin
      ).count()
      spark.range(1000000).selectExpr("sum(id * 2) AS s").count()
      "warmup" -> (System.nanoTime() - t0) / 1e9
    }
    // Deterministic order so shared-frame materialization costs attribute
    // to the same query on every run.
    val results = Seq(warmup) ++ SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The calling harness captures only the LAST ~2000 chars of stdout,
    // so the ONE-line JSON must fit that window or the harness records
    // parsed:null — which is exactly what happened to the full 105-entry
    // map in rounds 1-3. Round 4 fit the window but STILL parsed null:
    // sbt's forked-run logger prefixed the line with "[info] " and
    // appended a "[success] Total time ..." epilogue after it. build.sbt
    // now sets outputStrategy := StdoutOutput (raw pass-through) and
    // Global/showSuccess := false, and the println below happens AFTER
    // spark.stop(), so the JSON is the literal last line of stdout.
    // Emit the slowest queries individually (the ones a reader acts on)
    // and fold the rest into a single summed entry, budgeted so the whole
    // line stays well under the window. The total is summed over the SAME
    // rounded values so value == sum(queries) holds exactly for a consumer
    // cross-checking the line. The complete per-query map still goes to
    // bench_full_local.json for bookkeeping.
    def sec3(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def entry(k: String, v: Double): String = "\"" + k + "\":" + sec3(v)
    val rounded = results.map { case (k, v) => k -> math.rint(v * 1000) / 1000 }
    val total = rounded.map(_._2).sum
    val fullJson = rounded.sortBy(_._1).map((entry _).tupled)
      .mkString("{\"n\":" + rounded.size + ",\"total\":" + sec3(total) + ",\"queries\":{", ",", "}}")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full_local.json"),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // bookkeeping only — never fail the bench
    val lineBudget = 1400
    val overhead = 120 // metric/value/unit/sf framing + an "other" entry
    val desc = rounded.sortBy { case (k, v) => (-v, k) }
    val cut = {
      var used = 0
      var i = 0
      while (i < desc.size && used + desc(i)._1.length + 12 < lineBudget - overhead) {
        used += desc(i)._1.length + 12
        i += 1
      }
      i
    }
    val (kept, rest) = desc.splitAt(cut)
    val parts = kept.map((entry _).tupled) ++
      (if (rest.isEmpty) Nil
       else Seq(entry(s"other_${rest.size}_queries", rest.map(_._2).sum)))
    val qs = parts.mkString("{", ",", "}")
    // Stop Spark FIRST: its shutdown can log to the console, and the JSON
    // line must be the final stdout line for the harness's parser.
    spark.stop()
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
