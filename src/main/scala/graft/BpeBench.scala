package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the batched-BPE scale claim (SCALING.md):
  * learn the same number of merges with K=1 (Sennrich's sequential
  * argmax — one vocab-scale aggregate + driver barrier PER MERGE) and
  * with K>1 (one aggregate per ROUND of K disjoint merges), and report
  * merges/sec plus the projected wall-clock of a production 30k-merge
  * vocabulary. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BpeBench"
  *
  * Prints one JSON line per configuration. The corpus pass (vocab
  * build) is warmed before timing so the numbers isolate the per-round
  * learning cost — the quantity batching divides by K.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "12").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      // Reliable checkpoint() files and localCheckpoint blocks written by
      // Registry.cut are deleted by the ContextCleaner once their RDDs are
      // collected, so long sessions don't grow the checkpoint dir (r13 ADVICE).
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the shared vocab memo so neither timed run pays the corpus
    // reduction — the claim under test is per-round barrier cost.
    graft.queries.TdpQueries.bpeLearnBatched(spark, sfDir, 1, 1)

    val results = Seq(1, 3).map { k =>
      val rounds = math.max(1, merges / k)
      val t0 = System.nanoTime()
      val learned =
        graft.queries.TdpQueries.bpeLearnBatched(spark, sfDir, rounds, k)
      val sec = (System.nanoTime() - t0) / 1e9
      val n = learned.size
      val mps = n / sec
      f"""{"k":$k,"rounds":$rounds,"merges":$n,"sec":$sec%.2f,""" +
        f""""merges_per_sec":$mps%.2f,""" +
        f""""projected_30k_merge_hours":${30000.0 / mps / 3600.0}%.2f}"""
    }
    println(s"""{"metric":"bpe_batching","sf_dir":"$sfDir",""" +
      s""""runs":[${results.mkString(",")}]}""")
    graft.queries.Registry.evict(spark)
    spark.stop()
  }
}
