package graft

import graft.functions.ArrayMath
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  behavior of "graft SQL function registration"

  it should "expose dot_product in SQL after in-session registration" in {
    ArrayMath.registerSqlFunctions(spark)
    spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) shouldBe 11.0
    // implicit cast path: array<int> arguments
    spark.sql("SELECT dot_product(array(1, 2), array(3, 4)) AS d")
      .head().getDouble(0) shouldBe 11.0
  }

  it should "reject a wrong arity at analysis" in {
    ArrayMath.registerSqlFunctions(spark)
    an[Exception] should be thrownBy
      spark.sql("SELECT dot_product(array(1.0d))").collect()
  }

  it should "expose collect_top_k in SQL (largest k, optional reverse)" in {
    ArrayMath.registerSqlFunctions(spark)
    val top = spark.sql(
      """SELECT g, sort_array(collect_top_k(v, 2), false) AS t
        |FROM VALUES ('a', 5), ('a', 9), ('a', 7), ('b', 1) AS t(g, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    top(0).getSeq[Int](1) shouldBe Seq(9, 7)
    top(1).getSeq[Int](1) shouldBe Seq(1)
    val bottom = spark.sql(
      """SELECT sort_array(collect_top_k(v, 2, true), true) AS t
        |FROM VALUES (5), (9), (7) AS t(v)""".stripMargin).collect()
    bottom(0).getSeq[Int](0) shouldBe Seq(5, 7)
  }

  it should "expose lang_id and fingerprint in SQL, matching the " +
    "Column-API expressions" in {
    ArrayMath.registerSqlFunctions(spark)
    spark.sql("SELECT lang_id('der die das und ist nicht') AS l")
      .head().getString(0) shouldBe
      graft.ops.TextAnalysis.langIdOf("der die das und ist nicht")
    spark.sql("SELECT fingerprint('a b c d e f g h', 3) AS f")
      .head().getLong(0) shouldBe
      graft.ops.TextAnalysis.fingerprintOf("a b c d e f g h", 3)
    // n accepts any FOLDABLE integral expression, not just a bare literal
    val want = graft.ops.TextAnalysis.fingerprintOf("a b c d e f g h", 3)
    spark.sql("SELECT fingerprint('a b c d e f g h', 1 + 2) AS f")
      .head().getLong(0) shouldBe want
    spark.sql("SELECT fingerprint('a b c d e f g h', CAST(3 AS BIGINT)) AS f")
      .head().getLong(0) shouldBe want
    // ...but a non-foldable expression is a plan-time error
    an[Exception] should be thrownBy
      spark.sql("SELECT fingerprint('x', CAST(rand() * 3 AS INT))")
        .collect()
  }

  it should "expose nfc_normalize in SQL, composing decomposed " +
    "sequences and passing already-normal text through" in {
    ArrayMath.registerSqlFunctions(spark)
    // 'e' + U+0301 combining acute → composed U+00E9. NOTE: Spark's
    // chr() wraps at 256 (DuckDB's takes a full codepoint), so the
    // decomposed input is embedded as a literal, not built with chr().
    spark.sql("SELECT nfc_normalize('café') AS t")
      .head().getString(0) shouldBe "café"
    spark.sql("SELECT length(nfc_normalize('aé')) AS n")
      .head().getInt(0) shouldBe 2
    // ASCII fast path: unchanged (and the expression is null-safe)
    spark.sql("SELECT nfc_normalize('plain ascii') AS t")
      .head().getString(0) shouldBe "plain ascii"
    spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS t")
      .head().isNullAt(0) shouldBe true
  }

  it should "inject dot_product via spark.sql.extensions" in {
    // Build a sibling session over the SAME SparkContext with the
    // extensions applied (the spark.sql.extensions code path); restore the
    // default session afterwards so other suites are unaffected.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      withExt.sql(
        "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(2.0d, 2.0d, 2.0d))")
        .head().getDouble(0) shouldBe 12.0
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
