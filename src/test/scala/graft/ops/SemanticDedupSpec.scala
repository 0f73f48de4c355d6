package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class SemanticDedupSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  behavior of "SemanticDedup"

  // Two obvious clusters around the axis centroids (ids 0 and 1), with an
  // exact-duplicate pair in each cluster region.
  private def emb() = {
    val s = spark
    import s.implicits._
    Seq(
      0L -> Array(1f, 0f),      // centroid 0
      1L -> Array(0f, 1f),      // centroid 1
      2L -> Array(0.8f, 0.6f),  // cluster 0
      3L -> Array(0.8f, 0.6f),  // exact dup of 2
      4L -> Array(0f, 1f),      // cluster 1, exact dup of centroid 1
      5L -> Array(0f, 1f)       // exact dup of 1 and 4
    ).toDF("vec_id", "embedding")
  }

  it should "assign to the nearest centroid and drop higher-id near-dups" in {
    val out = SemanticDedup.semanticDedupStats(
      emb(), "vec_id", "embedding", k = 2, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // cluster 0 holds {0, 2, 3}: (2,3) are dups -> 3 dropped.
    // cluster 1 holds {1, 4, 5}: both 4 and 5 duplicate centroid 1.
    out should contain theSameElementsInOrderAs Seq(
      (0L, 3L, 1L), (1L, 3L, 2L))
  }

  it should "drop nothing when the threshold exceeds every pair sim" in {
    val out = SemanticDedup.semanticDedupStats(
      emb(), "vec_id", "embedding", k = 2, threshold = 1.0000001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out should contain theSameElementsInOrderAs Seq(
      (0L, 3L, 0L), (1L, 3L, 0L))
  }

  it should "break assignment ties toward the lowest centroid id" in {
    val s = spark
    import s.implicits._
    // Vector 2 is equidistant from both centroids: cosine ties at
    // round(1/sqrt(2), 6) with cid 0 and cid 1 -> cluster 0 wins.
    val df = Seq(
      0L -> Array(1f, 0f),
      1L -> Array(0f, 1f),
      2L -> Array(1f, 1f)
    ).toDF("vec_id", "embedding")
    val out = SemanticDedup.semanticDedupStats(
      df, "vec_id", "embedding", k = 2, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out should contain theSameElementsInOrderAs Seq(
      (0L, 2L, 0L), (1L, 1L, 0L))
  }

  behavior of "SemanticDedup.simplifiedSilhouette"

  it should "score tight clusters near 1 and a boundary point near 0" in {
    val s = spark
    import s.implicits._
    // Clusters at the axes; 2 and 3 are near their centroids (s → 1);
    // 4 sits exactly between the two centroids (a = b → s = 0).
    val df = Seq(
      0L -> Array(1f, 0f),
      1L -> Array(0f, 1f),
      2L -> Array(0.995f, 0.0998749f), // ~5.7° off centroid 0
      3L -> Array(0.0998749f, 0.995f), // ~5.7° off centroid 1
      4L -> Array(1f, 1f)              // equidistant -> cluster 0, s = 0
    ).toDF("vec_id", "embedding")
    val out = SemanticDedup.simplifiedSilhouette(df, "vec_id",
        "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(t => (t._1, t._2)) should contain theSameElementsInOrderAs
      Seq((0L, 3L), (1L, 2L))
    // cluster 0 = {0 (s=1), 2 (s≈0.99), 4 (s=0)} -> mean ≈ 0.663
    val c0 = out.find(_._1 == 0L).get._3
    c0 should (be > 0.6 and be < 0.7)
    // cluster 1 = {1 (s=1), 3 (s≈0.99)} -> mean ≈ 0.995
    val c1 = out.find(_._1 == 1L).get._3
    c1 should be > 0.99
  }

  it should "be invariant to partitioning" in {
    val base = SemanticDedup.simplifiedSilhouette(emb(), "vec_id",
      "embedding", k = 2).collect().map(_.toSeq)
    val repart = SemanticDedup.simplifiedSilhouette(
      emb().repartition(5), "vec_id", "embedding", k = 2)
      .collect().map(_.toSeq)
    base shouldBe repart
  }
}
