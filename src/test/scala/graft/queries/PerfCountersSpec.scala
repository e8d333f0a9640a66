package graft.queries

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Deterministic per-query PERF-COUNTER regression gate (r13 VERDICT #1):
  * wall-clock on this host is fogged by hypervisor steal (~2.6× probe
  * inflation in every driver window since r10), so a plan regression —
  * a lost broadcast, an uncut memo tree re-optimized per round, a
  * shuffle that doubled — can hide inside the noise for a full round.
  * Shuffle bytes, task counts and stage counts are functions of
  * PLAN + DATA, not of the host: at a fixed SF, fixed config and a
  * fixed execution order they reproduce exactly. This spec replays the
  * registry in Bench's deterministic order (spine first, so memoized
  * chains are attributed to their canonical query) against a COMMITTED
  * expectations file and fails on any upward step beyond tolerance.
  *
  * Tolerances are deliberately loose — 2× + absolute slack — because
  * the enemy is the ORDER-OF-MAGNITUDE class (the r13 louvain tree read
  * ~20× its healthy stage count), not percent-level drift; loose bounds
  * keep AQE/statistics jitter from crying wolf.
  *
  * Regenerating after an intentional plan change:
  * {{{
  * SPARK_GRAFT_REGEN_PERF=1 sbt "testOnly graft.queries.PerfCountersSpec"
  * }}}
  * rewrites `src/test/resources/perf_expectations_sf0.001.tsv` (commit
  * the diff — its review IS the plan-change review).
  */
class PerfCountersSpec extends SparkSpec {

  private val dirA = "/root/testdata/sf0.001"
  private val expectationsPath =
    Paths.get("src/test/resources/perf_expectations_sf0.001.tsv")

  private def orderedNames: Seq[String] = {
    val names = Registry.queries.keySet
    graft.Bench.spine.filter(names) ++
      (names -- graft.Bench.spine).toSeq.sorted
  }

  test("per-query shuffle bytes / tasks / stages match committed expectations") {
    val perf = new graft.perf.PerfCounters
    spark.sparkContext.addSparkListener(perf)
    try {
      // Memoized frames from earlier suites in the shared session would
      // shift first-consumer attribution — start from a cold cache.
      Registry.evict(spark)
      val measured = orderedNames.map { n =>
        val p0 = perf.current(spark)
        Registry.queries(n)(spark, dirA).count()
        val d = perf.deltaSince(spark, p0)
        n -> d
      }
      if (sys.env.get("SPARK_GRAFT_REGEN_PERF").contains("1")) {
        val lines =
          "# query\ttasks\tstages\tshuffle_read_bytes\tshuffle_write_bytes" +:
            measured.sortBy(_._1).map { case (n, d) =>
              s"$n\t${d.tasks}\t${d.stages}\t${d.shuffleReadBytes}\t${d.shuffleWriteBytes}"
            }
        Files.createDirectories(expectationsPath.getParent)
        Files.write(expectationsPath, lines.asJava,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        info(s"regenerated ${expectationsPath} (${measured.size} queries)")
      } else {
        assert(Files.exists(expectationsPath),
          s"no expectations file at $expectationsPath — generate one with " +
            "SPARK_GRAFT_REGEN_PERF=1")
        val expected = Files.readAllLines(expectationsPath).asScala
          .filterNot(l => l.startsWith("#") || l.isBlank)
          .map { l =>
            val f = l.split("\t")
            f(0) -> (f(1).toLong, f(2).toLong, f(3).toLong, f(4).toLong)
          }.toMap
        val measuredNames = measured.map(_._1).toSet
        val missing = measuredNames -- expected.keySet
        val stale = expected.keySet -- measuredNames
        assert(missing.isEmpty && stale.isEmpty,
          s"expectations out of sync with the registry — regenerate with " +
            s"SPARK_GRAFT_REGEN_PERF=1 (missing: ${missing.toSeq.sorted
              .take(5)}, stale: ${stale.toSeq.sorted.take(5)})")
        def over(got: Long, exp: Long, slack: Long): Boolean =
          got > exp * 2 + slack
        val offenders = measured.flatMap { case (n, d) =>
          val (t, st, sr, sw) = expected(n)
          val probs = Seq(
            (over(d.tasks, t, 16), s"tasks ${t} -> ${d.tasks}"),
            (over(d.stages, st, 16), s"stages ${st} -> ${d.stages}"),
            (over(d.shuffleReadBytes, sr, 1L << 20),
              s"shuffle_read ${sr} -> ${d.shuffleReadBytes}"),
            (over(d.shuffleWriteBytes, sw, 1L << 20),
              s"shuffle_write ${sw} -> ${d.shuffleWriteBytes}"))
            .collect { case (true, msg) => msg }
          if (probs.isEmpty) None else Some(s"  $n: ${probs.mkString(", ")}")
        }
        assert(offenders.isEmpty,
          "plan counters regressed beyond 2x+slack vs committed " +
            "expectations (intentional change? regenerate with " +
            s"SPARK_GRAFT_REGEN_PERF=1 and commit the diff):\n" +
            offenders.mkString("\n"))
      }
    } finally {
      spark.sparkContext.removeSparkListener(perf)
      Registry.evict(spark)
    }
  }
}
