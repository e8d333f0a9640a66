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

}
