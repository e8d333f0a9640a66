package graft.queries

import scala.collection.mutable

import graft.SparkSpec

/** Registry-wide `Registry.cutOne` BOUNDEDNESS lint (r14 VERDICT #5 /
  * r15 item): `cutOne` materializes its input through ONE partition and
  * re-exposes SinglePartition to the planner — correct and fast for the
  * alphabet-/grid-/vocab-sized frames it is contracted for, and a
  * catastrophic serialization point for anything data-sized (a corpus
  * squeezed through one task at 100 TB). The contract was previously a
  * doc comment only; this spec enforces it the way BroadcastLintSpec
  * polices forced broadcasts:
  *
  *   - a thread-local probe inside `Registry.cutOne` records the row
  *     count of every input frame while each registry query is BUILT
  *     (cutOne runs eagerly at build time, so building is observing);
  *   - every recorded input must pass the EMPIRICAL growth check — its
  *     row count at sf0.01 (10x the data) may not exceed 3x its sf0.001
  *     count (+64 rows slack). Bounded frames (alphabets, grids,
  *     centroid sets) are ~flat across SF; a data-sized frame grows
  *     ~10x and fails loudly;
  *   - a red-team control proves the check CAN fail: a corpus-sized
  *     frame pushed through the same classifier trips the bound.
  */
class CutOneLintSpec extends SparkSpec {

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  /** Build `names` (all when None) in Registry order at `dir`, recording
    * each cutOne input's row count attributed to the query being built.
    * Evicts memoized frames first so shared-frame cutOne calls attribute
    * to their deterministic first consumer.
    */
  private def cutOneCounts(
      dir: String, names: Option[Set[String]]): Map[String, Seq[Long]] = {
    Registry.evict(spark)
    val out = mutable.LinkedHashMap.empty[String, mutable.Buffer[Long]]
    var current = ""
    Registry.cutOneProbe.set { df =>
      out.getOrElseUpdate(current, mutable.Buffer.empty[Long]) += df.count()
    }
    try Registry.all
      .filter(q => names.forall(_.contains(q.name)))
      .foreach { q => current = q.name; q.fn(spark, dir) }
    finally {
      Registry.cutOneProbe.remove()
      Registry.evict(spark)
    }
    out.map { case (k, v) => (k, v.toSeq) }.toMap
  }

  test("every cutOne input frame is bounded (flat across a 10x data step)") {
    val a = cutOneCounts(dirA, None)
    assert(a.nonEmpty, "no cutOne call sites observed — probe broken?")
    // Only the queries that actually call cutOne need the 10x pass; the
    // flagged set contains each shared memo's first consumer, and the
    // filtered pass preserves Registry order, so attribution pairs up.
    val b = cutOneCounts(dirB, Some(a.keySet))
    val offenders = a.toSeq.flatMap { case (name, countsA) =>
      val countsB = b.getOrElse(name, Seq.empty)
      if (countsA.size != countsB.size)
        Seq(s"$name: cutOne call count differs across SFs " +
          s"(${countsA.size} vs ${countsB.size})")
      else countsA.zip(countsB).zipWithIndex.collect {
        case ((na, nb), i) if nb > 3 * na + 64 =>
          s"$name[site $i]: cutOne input grows $na -> $nb at 10x data " +
            "— data-sized frame through one partition"
      }
    }
    assert(offenders.isEmpty,
      s"unbounded cutOne inputs:\n${offenders.mkString("\n")}")
  }

  test("red-team control: a corpus-sized cutOne input trips the bound") {
    // The exact failure class the lint exists for: a data-sized frame
    // (cleaned Matrix rows) fed to cutOne. Don't actually cutOne it —
    // apply the same growth criterion to its counts.
    val na = Testdata.cleanMatrix(spark, dirA).count()
    val nb = Testdata.cleanMatrix(spark, dirB).count()
    assert(nb > 3 * na + 64,
      s"control failed: growth check would bless a corpus frame ($na -> $nb)")
  }
}
