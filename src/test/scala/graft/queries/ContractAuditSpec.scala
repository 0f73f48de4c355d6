package graft.queries

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Negative path for q_contract_audit: on the driver's testdata every
  * rule passes (and the oracle proves engine≡oracle on those zeros), so
  * this spec is the only place the rules demonstrably FIRE — a synthetic
  * table set with known violations must produce exactly the expected
  * counts per rule.
  */
class ContractAuditSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  it should "count seeded violations exactly" in {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_contract").toString
    try {
      // documents: 6 rows — one n_chars mismatch, one duplicated doc_id
      // (2 extra rows of the same id → 2 violations of uniqueness? no:
      // n - distinct = 2 ids short), one NULL lang, one empty lang
      Seq(
        (1L, "good text", Option("en"), "src0", 9L),
        (2L, "bad count", Option("en"), "src0", 5L),   // n_chars != len
        (3L, "dup id", Option("de"), "src1", 6L),
        (3L, "dup id", Option("de"), "src1", 6L),      // same id again
        (4L, "no lang", None, "src1", 7L),             // NULL lang
        (5L, "empty lang", Option(""), "src2", 10L))   // '' lang
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      // lineitem: 4 rows — one discount out of range, one non-positive qty
      Seq(
        (1.0, 0.05), (2.0, 1.50),                      // discount > 1
        (0.0, 0.10),                                   // quantity <= 0
        (3.0, 0.00))
        .toDF("l_quantity", "l_discount")
        .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
      // orders: 3 rows — one non-positive total
      Seq(10.0, -5.0, 20.0).toDF("o_totalprice")
        .coalesce(1).write.parquet(s"$dir/orders.parquet")

      val out = graft.SparkEntry.queries("q_contract_audit")(s, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      out(("documents", "n_chars_eq_len")) shouldBe (6L, 1L)
      out(("documents", "doc_id_unique")) shouldBe (6L, 1L)
      out(("documents", "lang_nonnull")) shouldBe (6L, 2L)
      out(("lineitem", "discount_in_unit_range")) shouldBe (4L, 1L)
      out(("lineitem", "quantity_positive")) shouldBe (4L, 1L)
      out(("orders", "totalprice_positive")) shouldBe (3L, 1L)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
