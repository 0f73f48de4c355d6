package graft.examples

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class CuratePipelineSpec extends AnyFlatSpec with Matchers
  with SparkTestBase {

  behavior of "CuratePipeline.curate"

  private def docs = {
    val s = spark
    import s.implicits._
    // 3 exact dups of one text, 2 near-dups (one token changed on a
    // 40-token text), 2 distinct clean docs, 1 junk doc (all-stopword
    // repetition → score ≈ 0.08 < 0.2).
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = long.replace("tok40", "tok40x")
    Seq(
      (1L, long, 40L), (2L, long, 40L), (3L, long, 40L),
      (4L, near, 40L),
      (5L, "a perfectly ordinary document with several words here", 9L),
      (6L, "another distinct document that talks about other things", 8L),
      (7L, "the the the the the", 19L)
    ).toDF("doc_id", "text", "n_chars")
  }

  it should "drop exact dups, near dups, and low-quality docs" in {
    val out = CuratePipeline.curate(docs, minQuality = 0.2, shards = 4)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted
    // 1 survives its exact class {1,2,3}; 4 is a near-dup of 1 (Jaccard
    // ≈ 39/41 > 0.8) so the min id of the cluster survives; junk 7 is
    // quality-filtered.
    kept should contain(1L)
    kept should not contain 2L
    kept should not contain 3L
    kept should not contain 4L
    kept should contain(5L)
    kept should contain(6L)
    kept should not contain 7L
  }

  it should "assign deterministic in-range shards" in {
    val a = CuratePipeline.curate(docs, shards = 4)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = CuratePipeline.curate(docs, shards = 4)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    a shouldBe b
    a.values.foreach { s => s should (be >= 0L and be < 4L) }
  }
}
