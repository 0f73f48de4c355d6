package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The persisted-IVF contract (the ANN half of r11 verdict #5):
  *
  *   1. queryIvf against the LOADED index is bit-identical to the
  *      in-memory [[Similarity.ivfTopK]] (same seeded quantizer, same
  *      ranks, same rounded sims);
  *   2. the query side never touches the corpus embeddings — proven by
  *      DELETING the corpus parquet between build and query;
  *   3. the load is deterministic across repeated queries.
  */
class AnnIndexSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "AnnIndex (persisted IVF)"

  it should "serve a new query batch from the loaded index, matching " +
    "the in-memory operator after the corpus is deleted" in {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_ann_idx_spec").toString
    val dim = 8
    def vec(seed: Long): Array[Double] = {
      var x = seed
      Array.fill(dim) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 16) % 1000).toDouble / 500.0 - 1.0
      }
    }
    val corpusRows = (1L to 200L).filter(_ % 5 != 0)
      .map(i => (i, vec(i).toSeq))
    val queryRows = Seq(5L, 10L, 15L).map(i => (i, vec(i).toSeq))
    corpusRows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$base/corpus")
    val corpusFromDisk = s.read.parquet(s"$base/corpus")

    AnnIndex.buildAndSaveIvf(corpusFromDisk, "vec_id", "embedding",
      s"$base/idx", nList = 8)
    // in-memory twin BEFORE the deletion (it needs the corpus)
    val fresh = Similarity.ivfTopK(corpusFromDisk,
        queryRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 5, nList = 8, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$base/corpus"))

    def queryOnce() = AnnIndex.queryIvf(s,
        queryRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", s"$base/idx", 5, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    val via = queryOnce()
    via shouldBe fresh
    via shouldBe queryOnce() // deterministic load
    via.map(_._1).distinct.sorted shouldBe Seq(5L, 10L, 15L)
    // every query got a full top-5 with ranks 1..5
    via.groupBy(_._1).values.foreach { rows =>
      rows.map(_._2).sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    }

    // append: fold new vectors into the cells (quantizer unchanged) —
    // a query identical to an appended vector must now find it at
    // rank 1 with sim 1.0
    val appended = Seq((1001L, vec(5L).toSeq))
    AnnIndex.appendToIvf(s, appended.toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$base/idx")
    val after = AnnIndex.queryIvf(s,
        Seq((5L, vec(5L).toSeq)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", s"$base/idx", 5, nProbe = 3)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    after.head shouldBe ((1L, 1001L, 1.0))

    // probe-batch fence (r12 verdict #3): queryIvf broadcasts the probed
    // query vectors, so an over-limit batch must fail loudly
    val fence = intercept[IllegalArgumentException] {
      AnnIndex.queryIvf(s, queryRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", s"$base/idx", 5, nProbe = 3,
        maxQueryBatch = 2)
    }
    fence.getMessage should include("maxQueryBatch")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }

  it should "answer identically through a once-loaded quantizer and " +
    "re-pack fragmented cell files on compaction" in {
    // r13 optimization: loadCentroids + the *With variants let one
    // maintenance cycle or ingest loop pay the centroid read ONCE. The
    // contract is pure equality — same collected bytes, same answers —
    // plus the compaction re-pack: many per-batch appends fragment
    // cells/ into many small files, and compactIvf must shrink the file
    // count, not inherit it.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_ann_idx_with").toString
    val dim = 8
    def vec(seed: Long): Array[Double] = {
      var x = seed
      Array.fill(dim) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 16) % 1000).toDouble / 500.0 - 1.0
      }
    }
    val corpus = (1L to 100L).map(i => (i, vec(i).toSeq))
    AnnIndex.buildAndSaveIvf(corpus.toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$base/idx", nList = 8)
    val cents = AnnIndex.loadCentroids(s, s"$base/idx")
    val queries = Seq((500L, vec(7L).toSeq)).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    rows(AnnIndex.queryIvfWith(s, queries, "vec_id", "embedding",
      s"$base/idx", cents, 5, nProbe = 3)) shouldBe
      rows(AnnIndex.queryIvf(s, queries, "vec_id", "embedding",
        s"$base/idx", 5, nProbe = 3))
    // appendToIvfWith ≡ appendToIvf: both assign with the same quantizer
    (101L to 110L).foreach { i =>
      AnnIndex.appendToIvfWith(s, Seq((i, vec(i).toSeq))
        .toDF("vec_id", "embedding"), "vec_id", "embedding",
        s"$base/idx", cents)
    }
    def cellFiles() = new java.io.File(s"$base/idx/cells").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val fragmented = cellFiles()
    fragmented should be >= 10 // one+ file per appended batch
    val preCompact = rows(AnnIndex.queryIvfWith(s, queries, "vec_id",
      "embedding", s"$base/idx", cents, 5, nProbe = 8))
    AnnIndex.compactIvf(s, s"$base/idx")
    cellFiles() should be < fragmented // physically re-packed
    rows(AnnIndex.queryIvfWith(s, queries, "vec_id", "embedding",
      s"$base/idx", cents, 5, nProbe = 8)) shouldBe preCompact
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }

  it should "stop serving deleted vectors immediately and answer " +
    "identically after compaction (delete + compact cycle)" in {
    // r12 verdict #4. Unlike the dedup index, the coarse quantizer is
    // trained on the ORIGINAL corpus sample, so the contract is not
    // fresh-build equality (a rebuild may retrain different centroids)
    // but: (a) tombstoned ids never appear in results, (b) compaction
    // changes nothing a query can see, (c) the cell files physically
    // drop the dead ids, (d) centroids are untouched.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_ann_idx_maint").toString
    val dim = 8
    def vec(seed: Long): Array[Double] = {
      var x = seed
      Array.fill(dim) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 16) % 1000).toDouble / 500.0 - 1.0
      }
    }
    val corpus = (1L to 120L).map(i => (i, vec(i).toSeq))
    corpus.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$base/corpus")
    AnnIndex.buildAndSaveIvf(s.read.parquet(s"$base/corpus"),
      "vec_id", "embedding", s"$base/idx", nList = 8)
    val queries = Seq((500L, vec(7L).toSeq)).toDF("vec_id", "embedding")
    def top(k: Int) = AnnIndex.queryIvf(s, queries, "vec_id",
        "embedding", s"$base/idx", k, nProbe = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    // nProbe = nList → exhaustive: rank 1 must be vec 7 itself (sim 1.0)
    val before = top(5)
    before.head shouldBe ((1L, 7L, 1.0))
    // delete the top hit; it must vanish at once, later ranks promote
    AnnIndex.deleteFromIvf(s, Seq(7L).toDF("vec_id"), "vec_id",
      s"$base/idx")
    val afterDelete = top(4)
    afterDelete.map(_._2) should not contain 7L
    afterDelete.map(_._2) shouldBe before.filter(_._2 != 7L).map(_._2)
    val centsBefore = s.read.parquet(s"$base/idx/centroids")
      .orderBy("cell").collect().toSeq
    val (kept, dead) = AnnIndex.compactIvf(s, s"$base/idx")
    kept shouldBe 119L
    dead shouldBe 1L
    top(4) shouldBe afterDelete
    s.read.parquet(s"$base/idx/cells")
      .filter($"nid" === 7L).count() shouldBe 0L
    s.read.parquet(s"$base/idx/centroids")
      .orderBy("cell").collect().toSeq shouldBe centsBefore
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }
}
