package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.core.{Normalizers => N}

class ExpressionsSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  /** Deterministic scalacheck sample: mixed unicode/ascii/messy strings. */
  private def genStrings(n: Int): Seq[String] = {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.numStr.map(_ + ".0"),
      Gen.numStr.map(s => s" $s-"),
      Gen.const(""),
      Gen.identifier)
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))
  }

  test("NormalizeSsnExpr matches the Column-composition normalizer") {
    val s = registered
    import s.implicits._
    val inputs = Seq("123-45-6789", "45678901.0", " 123456789 ", "999999999",
      "ABC", null, "1234567890123", "", "0.0", ".0", "12.30", "007", "  ") ++
      genStrings(120)
    val rows = inputs.toDF("ssn_in").select(
      col("ssn_in"),
      expr("graft_normalize_ssn(ssn_in)").as("native"),
      N.normalizeSsn(col("ssn_in")).as("composed")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"mismatch for input '${r.get(0)}': ${r.get(1)} vs ${r.get(2)}")
    }
  }

  test("NormalizeSsnExpr property: output is null or exactly 9 digits") {
    val s = registered
    import s.implicits._
    val out = genStrings(200).toDF("ssn_in")
      .select(expr("graft_normalize_ssn(ssn_in)")).collect().map(_.getString(0))
    out.foreach(o =>
      assert(o == null || (o.length == 9 && o.forall(_.isDigit)), s"bad: '$o'"))
  }

  test("PolyHashExpr matches the higher-order-function fold") {
    val s = registered
    import s.implicits._
    val inputs = Seq("abc", "the fast key", "a", "join filter window scan") ++
      genStrings(100).filter(_.nonEmpty)
    val rows = inputs.toDF("t").select(
      col("t"),
      expr("graft_polyhash(t)").as("native"),
      expr("aggregate(transform(sequence(1, length(t)), i -> ascii(substr(t, i, 1)))," +
        " 0L, (acc, x) -> (acc * 31 + x) % 1000000007)").as("fold")).collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'"))
  }

  test("native expressions stay inside whole-stage codegen") {
    val s = registered
    // File-backed input so the projection is not constant-folded away.
    val df = graft.queries.Registry
      .table(s, "/root/testdata/sf0.001", "orders")
      .select(expr("graft_normalize_ssn(CAST(o_orderkey AS STRING))").as("n"),
        expr("graft_polyhash(CAST(o_custkey AS STRING))").as("h"))
    assert(df.collect().nonEmpty) // generated code compiles and runs
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"),
      plan.take(1500)) // "*(N)" prefix = inside a codegen stage
  }

  test("normalizeTaxCode property: null or 1-2 uppercase alphanumerics") {
    val s = registered
    import s.implicits._
    val out = genStrings(200).toDF("c")
      .select(N.normalizeTaxCode(col("c"))).collect().map(_.getString(0))
    out.foreach(o => assert(o == null ||
      (o.length >= 1 && o.length <= 2 &&
        o.forall(ch => ch.isDigit || (ch.isLetter && !ch.isLower))), s"bad: '$o'"))
  }

  test("normalizeTransactionId property: null or digits only") {
    val s = registered
    import s.implicits._
    val out = genStrings(200).toDF("c")
      .select(N.normalizeTransactionId(col("c"))).collect().map(_.getString(0))
    out.foreach(o =>
      assert(o == null || (o.nonEmpty && o.forall(_.isDigit)), s"bad: '$o'"))
  }
  test("DotProductExpr is bit-identical to the zip_with fold") {
    val s = registered
    import s.implicits._
    // Float embeddings (the parquet element type) incl. negatives, zeros,
    // and magnitudes that make double-rounding order observable.
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val a = Array.fill(64)((rnd.nextFloat() - 0.5f) * (1 + rnd.nextInt(100)))
      val b = Array.fill(64)((rnd.nextFloat() - 0.5f) * (1 + rnd.nextInt(100)))
      (i, a, b)
    }
    val out = rows.toDF("i", "a", "b").select(
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("DotProductExpr nullifies on null elements and handles double arrays") {
    val s = registered
    import s.implicits._
    val r1 = s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect()(0)
    assert(r1.getDouble(0) == 11.0)
    val r2 = s.sql("SELECT graft_dot(array(1.0D, NULL), array(3.0D, 4.0D))")
      .collect()(0)
    assert(r2.isNullAt(0))
  }

  // --- r14 fused text kernels: each must be VALUE-IDENTICAL to the
  // interpreted higher-order-function chain it replaced (the DuckDB
  // oracles still compute the HOF formulation, so any drift is a
  // correctness regression, not a perf bug).

  /** Messy corpus-ish strings: unicode, runs of mixed whitespace
    * (space/tab/newline/VT/FF/CR), empties, boundary whitespace.
    */
  private def genTexts(n: Int): Seq[String] = {
    val ws = Seq(" ", "\t", "\n", "\u000B", "\f", "\r")
    val rnd = new scala.util.Random(7)
    def tok() = Seq("the", "data", "join", "Ω≈ç", "naïve", "x1", "a",
      "scan", "π")(rnd.nextInt(9))
    (0 until n).map { _ =>
      val k = rnd.nextInt(12)
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb.append(ws(rnd.nextInt(6)))
      (0 until k).foreach { _ =>
        sb.append(tok())
        (0 to rnd.nextInt(2)).foreach(_ => sb.append(ws(rnd.nextInt(6))))
      }
      sb.toString
    } ++ Seq("", " ", "\t\n", "a", "a b", "a b c", "a  b\tc d")
  }

  test("WsTokensExpr matches filter(split(text)) exactly") {
    val s = registered
    import s.implicits._
    val rows = genTexts(200).toDF("text").select(
      col("text"),
      expr("graft_ws_tokens(text)").as("native"),
      expr(raw"filter(split(text, '\\s+'), x -> x != '')").as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for '${r.getString(0)}': ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
  }

  test("ShingleHashesExpr matches shingle+distinct+polyhash chain; null toks -> empty") {
    val s = registered
    import s.implicits._
    val hof =
      """transform(array_distinct(CASE WHEN size(toks) >= 3 THEN
        |  transform(sequence(1, size(toks) - 2), i ->
        |    concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ',
        |      element_at(toks, i + 2)))
        |  ELSE array() END), sh -> graft_polyhash(sh))""".stripMargin
    val rows = genTexts(200).toDF("text")
      .select(expr("graft_ws_tokens(text)").as("toks"))
      .select(col("toks"),
        expr("graft_shingle_hashes(toks)").as("native"),
        expr(hof).as("hofv")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"mismatch for ${r.getSeq[String](0)}")
    }
    // repeated shingles dedup to first occurrence, like array_distinct
    val rep = Seq(Tuple1(Seq("a", "b", "a", "b", "a", "b"))).toDF("toks")
      .select(expr("graft_shingle_hashes(toks)").as("h"), expr(hof).as("e"))
      .collect()(0)
    assert(rep.getSeq[Long](0) == rep.getSeq[Long](1), rep.toString)
    val nul = s.sql("SELECT graft_shingle_hashes(CAST(NULL AS ARRAY<STRING>))")
      .collect()(0)
    assert(nul.getSeq[Long](0) == Seq.empty[Long], "null toks must yield []")
  }

  test("SpanHashesExpr matches transform+slice+concat_ws+polyhash; short/null -> empty") {
    val s = registered
    import s.implicits._
    for (w <- Seq(1, 3, 8)) {
      val hof =
        s"""CASE WHEN size(toks) >= $w THEN
           |  transform(sequence(1, size(toks) - ${w - 1}), i ->
           |    graft_polyhash(concat_ws(' ', slice(toks, i, $w))))
           |  ELSE array() END""".stripMargin
      val rows = genTexts(150).toDF("text")
        .select(expr("graft_ws_tokens(text)").as("toks"))
        .select(col("toks"),
          expr(s"graft_span_hashes(toks, $w)").as("native"),
          expr(hof).as("hofv")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"w=$w mismatch for ${r.getSeq[String](0)}")
      }
    }
    val nul = s.sql(
      "SELECT graft_span_hashes(CAST(NULL AS ARRAY<STRING>), 8)").collect()(0)
    assert(nul.getSeq[Long](0) == Seq.empty[Long], "null toks must yield []")
  }

  test("IntersectCountExpr matches size(array_intersect); dups, empties, nulls") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(25).toLong) // dup-heavy
      (i, arr(), arr())
    } ++ Seq((0, Array.empty[Long], Array(1L, 2L)), (-1, Array(3L), Array.empty[Long]))
    val out = rows.toDF("i", "a", "b").select(
      expr("graft_intersect_count(a, b)").as("native"),
      expr("size(array_intersect(a, b))").cast("long").as("ref")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"${r.getLong(0)} != ${r.getLong(1)}"))
    // null arrays mirror size(null) = -1 under the non-ANSI convention
    val nul = s.sql("SELECT graft_intersect_count(CAST(NULL AS ARRAY<BIGINT>)," +
      " array(1L)), CAST(size(array_intersect(CAST(NULL AS ARRAY<BIGINT>)," +
      " array(1L))) AS BIGINT)").collect()(0)
    assert(nul.getLong(0) == nul.getLong(1) && nul.getLong(0) == -1L)
    // r15 (r14 ADVICE): the convention is read from the session conf at
    // analysis time, like Spark's Size — with the legacy size-of-null
    // convention OFF, a null side yields NULL on both sides of the
    // equivalence, not -1.
    val key = "spark.sql.legacy.sizeOfNull"
    val prev = s.conf.get(key)
    try {
      s.conf.set(key, "false")
      val r = s.sql("SELECT graft_intersect_count(CAST(NULL AS ARRAY<BIGINT>)," +
        " array(1L)), CAST(size(array_intersect(CAST(NULL AS ARRAY<BIGINT>)," +
        " array(1L))) AS BIGINT)").collect()(0)
      assert(r.isNullAt(0) && r.isNullAt(1),
        s"expected NULL = NULL with legacy sizeOfNull off, got $r")
    } finally s.conf.set(key, prev)
  }

  test("L2SqExpr matches aggregate(zip_with(...)) fold; lengths, nulls") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // random long vectors incl. equal-length, unequal-length and empty
    val rows = (1 to 300).map { i =>
      val n = if (i % 7 == 0) rnd.nextInt(5) else 64
      val m = if (i % 11 == 0) n + 1 + rnd.nextInt(3) else n
      (i, Array.fill(n)(rnd.nextLong() % 2000000L),
        Array.fill(m)(rnd.nextLong() % 2000000L))
    }
    val out = rows.toDF("i", "a", "b").select(
      expr("graft_l2sq(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
        "0L, (acc, v) -> acc + v)").as("ref")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null mismatch: ${r.get(0)} vs ${r.get(1)}")
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1), s"${r.getLong(0)} != ${r.getLong(1)}")
    }
    // null array on either side -> null, same as the fold
    val nul = s.sql("SELECT graft_l2sq(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("MinHashMinsExpr matches 8 array_min(transform(...)) folds; empty -> nulls") {
    val s = registered
    import s.implicits._
    import graft.queries.TdpQueries.{MhA, MhB, P}
    val aArr = MhA.mkString("array(", ",", ")")
    val bArr = MhB.mkString("array(", ",", ")")
    val folds = MhA.zip(MhB).zipWithIndex.map { case ((a, b), j) =>
      expr(s"array_min(transform(hashes, h -> (h * $a + $b) % $P))").as(s"e$j")
    }
    val rows = genTexts(200).toDF("text")
      .select(expr("graft_shingle_hashes(graft_ws_tokens(text))").as("hashes"))
      .select(col("hashes") +:
        expr(s"graft_minhash_mins(hashes, $aArr, $bArr, $P)").as("native") +:
        folds: _*).collect()
    rows.foreach { r =>
      val native = r.getSeq[Any](1)
      val expected = (0 until 8).map(j => r.get(2 + j))
      assert(native == expected, s"mins mismatch: $native vs $expected")
    }
    val empty = s.sql(
      s"SELECT graft_minhash_mins(CAST(array() AS ARRAY<BIGINT>), $aArr, $bArr, $P)")
      .collect()(0)
    assert(empty.getSeq[Any](0) == Seq.fill(8)(null),
      "empty hashes must yield 8 null minima (array_min semantics)")
  }

}
