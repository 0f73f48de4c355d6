package graft.sources

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** The CSV corner q_csv_roundtrip's option set exists for: by default
  * Spark writes BOTH empty string and NULL as a bare empty field and
  * reads both back as NULL — a silent corpus mutation. The shared
  * csvWrite/csvRead helpers must keep the distinction, plus quoting,
  * embedded delimiters, escaped quotes, and newlines.
  */
class CsvLosslessSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  it should "round-trip empty strings, nulls, quotes, commas, and " +
    "newlines distinctly" in {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "plain"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "has,comma"),
      (5L, "has \"quotes\" inside"),
      (6L, "line one\nline two"),
      (7L, "\\N"),
      (8L, "\\\\N"),   // deeper escape family member
      (9L, "\\Nx"))    // near-token text outside the family
    val df = rows.toDF("id", "text")
    val base = Files.createTempDirectory("graft_csv_spec").toString
    try {
      graft.queries.SourceQueries.csvWrite(df, s"$base/out")
      val back = graft.queries.SourceQueries
        .csvRead(s, df.schema, s"$base/out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      back(1L) shouldBe "plain"
      back(2L) shouldBe ""          // NOT null
      back(3L) shouldBe null        // NOT ""
      back(4L) shouldBe "has,comma"
      back(5L) shouldBe "has \"quotes\" inside"
      back(6L) shouldBe "line one\nline two"
      back(7L) shouldBe "\\N"       // literal token, NOT null
      back(8L) shouldBe "\\\\N"
      back(9L) shouldBe "\\Nx"
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
    }
  }
}
