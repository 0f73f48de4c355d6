package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class SimilaritySpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val emb = {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // 3 well-separated clusters in 16 dims
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextGaussian() * 5))
    (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  behavior of "quantizeInt8"

  it should "scale per-vector to [-127,127] and handle zero vectors" in {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),   // maxabs 2 -> q = (64, -127, 32)
      (2L, Seq(0.0f, 0.0f, 0.0f)),    // zero vector -> all-zero q
      (3L, Seq(127.0f, -127.0f, 0f))  // exact range ends
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Byte](2))).toMap
    out(1L)._2 shouldBe Seq[Byte](64, -127, 32)
    out(2L)._2 shouldBe Seq[Byte](0, 0, 0)
    out(2L)._1 shouldBe 0.0
    out(3L)._2 shouldBe Seq[Byte](127, -127, 0)
    // dequantized error bounded by scale/2 per element
    val scale1 = out(1L)._1
    (out(1L)._2.map(_.toDouble * scale1), Seq(1.0, -2.0, 0.5))
      .zipped.foreach { (deq, orig) =>
        math.abs(deq - orig) should be <= scale1 / 2 + 1e-9
      }
  }

  behavior of "bruteForceTopK"

  it should "return k neighbors per query, self excluded, same-cluster first" in {
    val out = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .collect()
    out.length shouldBe 15
    out.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      nid should not be qid
      // clusters are i % 3 — nearest neighbors stay in the query's cluster
      (nid % 3) shouldBe (qid % 3)
    }
    // ranks are 1..5 per query
    out.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getLong(1)).sorted shouldBe (1L to 5L)
    }
  }

  it should "order by similarity descending" in {
    val sims = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 10)
      .orderBy("rnk").collect().map(_.getDouble(3))
    sims.toSeq shouldBe sims.sorted.reverse.toSeq
  }

  behavior of "lshCandidates"

  it should "recall the brute-force top-5 at a generous radius" in {
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshCandidates(
        emb, queries, "vec_id", "embedding", maxL2 = 1.0,
        numHashTables = 8)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    recall should be >= 0.8
  }

  it should "be deterministic for a fixed seed" in {
    def run() = Similarity.lshCandidates(
        emb, emb.filter(col("vec_id") < 2), "vec_id", "embedding", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    run() shouldBe run()
  }

  behavior of "cosineNearDupPairs"

  it should "find exactly the within-cluster pairs at a 0.9 threshold" in {
    val pairs = Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", 0.9).collect()
    // 3 clusters of 20 → C(20,2) pairs each
    pairs.length shouldBe 3 * 190
    pairs.foreach { r =>
      r.getLong(0) should be < r.getLong(1)
      (r.getLong(0) % 3) shouldBe (r.getLong(1) % 3)
      r.getDouble(2) should be >= 0.9
    }
  }

  behavior of "cosineNearDupLsh"

  it should "recall the exact near-dup pairs with no cross-cluster noise" in {
    val exact = Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupLsh(
        emb, "vec_id", "embedding", 0.9, numHashTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    recall should be >= 0.95
    lsh.foreach { case (a, b) => (a % 3) shouldBe (b % 3) }
  }

  behavior of "ivfTopK"

  it should "match brute-force top-5 with high recall" in {
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(
        emb, queries, "vec_id", "embedding", 5, nList = 6, nProbe = 2)
      .collect()
    ivf.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getLong(1)).sorted shouldBe (1L to 5L)
    }
    val approx = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    recall should be >= 0.9
  }

  it should "be deterministic for a fixed seed" in {
    def run() = Similarity.ivfTopK(
        emb, emb.filter(col("vec_id") < 2), "vec_id", "embedding", 3,
        nList = 6, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    run() shouldBe run()
  }

  behavior of "pqTopK"

  it should "recall most of the brute-force top-5 from 4-byte codes" in {
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 16 dims → m=4 subspaces of 4 dims, 16 codes each (fine enough to
    // discriminate within a tight cluster, not just across clusters)
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
        m = 4, kCode = 16)
      .collect()
    pq.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getLong(1)).sorted shouldBe (1L to 5L)
    }
    // PQ distances are lossy, but well-separated clusters must still rank
    // same-cluster vectors first
    pq.foreach { r => (r.getLong(2) % 3) shouldBe (r.getLong(0) % 3) }
    val approx = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    recall should be >= 0.6
  }

  it should "be deterministic for a fixed seed" in {
    def run() = Similarity.pqTopK(
        emb, emb.filter(col("vec_id") < 2), "vec_id", "embedding", 3,
        m = 4, kCode = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    run() shouldBe run()
  }

  behavior of "ivfPqTopK"

  it should "recall the brute-force top-5 through probed cells + codes" in {
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // probe enough cells that pruning loss stays separate from PQ loss
    val got = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
        nList = 6, nProbe = 3, m = 4, kCode = 16)
      .collect()
    got.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getLong(1)).sorted shouldBe (1L to 5L)
    }
    got.foreach { r => (r.getLong(2) % 3) shouldBe (r.getLong(0) % 3) }
    val approx = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    recall should be >= 0.6
  }

  it should "be deterministic for a fixed seed" in {
    def run() = Similarity.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 2), "vec_id", "embedding", 3,
        nList = 6, nProbe = 2, m = 4, kCode = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    run() shouldBe run()
  }

  it should "fence an over-limit query batch loudly (maxQueryBatch)" in {
    // r12 verdict #3: the PQ paths collect the query batch and broadcast
    // per-query ADC tables — correct for probe batches only. The fence
    // must throw a named error, never silently blow the driver.
    val queries = emb.filter(col("vec_id") < 5) // 5 queries
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, queries, "vec_id", "embedding", 3,
        m = 4, maxQueryBatch = 4)
    }
    e1.getMessage should include("maxQueryBatch")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 3,
        nList = 6, m = 4, maxQueryBatch = 4)
    }
    e2.getMessage should include("maxQueryBatch")
    // at the limit exactly, both run
    Similarity.pqTopK(emb, queries, "vec_id", "embedding", 3,
      m = 4, maxQueryBatch = 5).count() should be > 0L
  }

  behavior of "mmrTopK"

  it should "pick the top-1 first, then diversify across clusters" in {
    val queries = emb.filter(col("vec_id") === 0)
    val exactTop = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", 1)
      .collect().head.getLong(2)
    // kCand wide enough to reach other clusters; λ low → diversity wins
    val mmr = Similarity.mmrTopK(emb, queries, "vec_id", "embedding",
        kCand = 50, kOut = 3, lambda = 0.3)
      .orderBy("rnk").collect()
    mmr.length shouldBe 3
    mmr.head.getLong(2) shouldBe exactTop // round 1 = pure relevance
    // with clusters of near-copies, MMR must not return 3 same-cluster ids
    mmr.map(_.getLong(2) % 3).distinct.length should be > 1
    // plain top-3 DOES return 3 same-cluster ids — the contrast MMR fixes
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(_.getLong(2) % 3).distinct.length shouldBe 1
  }

  it should "return ranks 1..k with no duplicate ids, deterministically" in {
    def run() = Similarity.mmrTopK(
        emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        kCand = 10, kOut = 3, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val out = run()
    out.groupBy(_._1).values.foreach { g =>
      g.map(_._2).sorted shouldBe (1 to 3)
      g.map(_._3).distinct.length shouldBe 3
    }
    out shouldBe run()
  }
}
