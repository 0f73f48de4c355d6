package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class DedupSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text").withColumn("source",
      org.apache.spark.sql.functions.lit("s0"))
  }

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away today"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog and runs far away tonight"
  private val unrelated =
    "completely different words appear here with nothing shared at all now"

  behavior of "exactDupClasses"

  it should "group identical texts and keep the minimum id" in {
    val out = Dedup.exactDupClasses(
      docs((1L, base), (2L, base), (3L, unrelated)), "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    out should contain theSameElementsAs Seq((1L, 3L), (2L, 1L))
  }

  behavior of "ngramJaccardPairs"

  it should "rank a planted near-dup far above an unrelated doc" in {
    val out = Dedup.ngramJaccardPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)),
      "doc_id", "text", "source", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(p => (p._1, p._2)) should contain only ((1L, 2L))
    out.head._3 should be > 0.7
  }

  it should "return no pairs across different blocks" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, base, "a"), (2L, base, "b")).toDF(
      "doc_id", "text", "source")
    Dedup.ngramJaccardPairs(df, "doc_id", "text", "source", 3, 0.1)
      .count() shouldBe 0L
  }

  behavior of "containmentPairs"

  it should "flag a doc embedded in a much larger one that Jaccard misses" in {
    // `base` is wholly contained in a 4x-longer wrapper: J ~ 0.25 (below
    // a 0.5 jaccard bar) but containment(base -> wrapper) = 1.0.
    val wrapper = base + " plus a lot of surrounding boilerplate text " +
      "that goes on and on with many extra tokens " * 3
    val out = Dedup.containmentPairs(
      docs((1L, base), (2L, wrapper), (3L, unrelated)),
      "doc_id", "text", "source", 3, 0.9)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    out.map(p => (p._1, p._2)) should contain only ((1L, 2L))
    out.head._3 shouldBe 1.0 // cont(A->B): every base shingle in wrapper
    out.head._4 should be < 0.5
    Dedup.ngramJaccardPairs(
      docs((1L, base), (2L, wrapper), (3L, unrelated)),
      "doc_id", "text", "source", 3, 0.5).count() shouldBe 0L
  }

  it should "match the naive quadratic containment on random corpora" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def text() =
      Seq.fill(3 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    for (_ <- 1 to 3) {
      val rows = (1L to 30L).map(i => (i, text()))
      val df = rows.toDF("doc_id", "text").withColumn("source",
        org.apache.spark.sql.functions.lit("s0"))
      val got = Dedup.containmentPairs(df, "doc_id", "text", "source",
          3, 0.3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val want = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        sa = shingles(ta); sb = shingles(tb)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa intersect sb).size
        cab = BigDecimal(inter.toDouble / sa.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        cba = BigDecimal(inter.toDouble / sb.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if math.max(cab, cba) >= 0.3 && inter > 0
      } yield (ia, ib, cab, cba)).toSet
      got shouldBe want
    }
  }

  behavior of "minHashPairs"

  it should "find the planted near-dup pair (same definition as exact)" in {
    val out = Dedup.minHashPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)),
      "doc_id", "text", maxDistance = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out should contain((1L, 2L))
    out should not contain ((1L, 3L))
    out should not contain ((2L, 3L))
  }

  it should "be deterministic for a fixed seed" in {
    def run() = Dedup.minHashPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)),
      "doc_id", "text", maxDistance = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(p => (p._1, p._2))
    run() shouldBe run()
  }

  behavior of "dupClusters"

  it should "label connected components by minimum id with keep flags" in {
    val s = spark
    import s.implicits._
    // components: {1,2,3} (chain), {10,11}, pair-less docs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    out shouldBe Array((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false))
  }

  it should "converge on a long chain within the iteration cap" in {
    val s = spark
    import s.implicits._
    val pairs = (1L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out.length shouldBe 15
    all(out.map(_._2)) shouldBe 1L
  }

  it should "auto-extend past maxIterations on a chain with larger diameter" in {
    val s = spark
    import s.implicits._
    // diameter 11 > maxIterations 2, within the 10× hard cap; distributed
    // path forced so the propagation loop (not driver union-find) runs
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs, maxIterations = 2,
        driverEdgeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.length shouldBe 12
    all(out.map(_._2)) shouldBe 1L
  }

  it should "throw rather than return wrong labels past the hard cap" in {
    val s = spark
    import s.implicits._
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    an[IllegalStateException] should be thrownBy
      Dedup.dupClusters(pairs, maxIterations = 1, driverEdgeLimit = 0L)
  }

  it should "produce identical labels through the distributed path" in {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L))
      .toDF("id_a", "id_b")
    def labels(limit: Long) =
      Dedup.dupClusters(pairs, driverEdgeLimit = limit).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    labels(0L) shouldBe labels(1000L) // distributed ≡ driver union-find
  }

  behavior of "bandedMinHashPairs"

  it should "find the planted near-dup with exact jaccard, no noise" in {
    val out = Dedup.bandedMinHashPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)),
      "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(p => (p._1, p._2)) should contain only ((1L, 2L))
    // verification stage reports TRUE jaccard — same value the exact
    // inverted-index operator computes
    val exact = Dedup.ngramJaccardPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)),
      "doc_id", "text", "source", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.head._3 shouldBe exact.head._3 +- 1e-6
  }

  it should "be deterministic for a fixed seed" in {
    def run() = Dedup.bandedMinHashPairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base + " x")),
      "doc_id", "text", minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    run() shouldBe run()
  }

  it should "never emit identical-doc pairs below the threshold" in {
    val out = Dedup.bandedMinHashPairs(
      docs((1L, base), (2L, unrelated)), "doc_id", "text", minJaccard = 0.2)
      .collect()
    out shouldBe empty
  }

  behavior of "contaminationPairs"

  it should "flag the planted leak and nothing else" in {
    import spark.implicits._
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val trainDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog yesterday"), // leak
      (2L, "completely unrelated training text about spark plans here")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(trainDocs, evalDocs,
        "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe Seq((1L, 100L))
  }

  behavior of "duplicatedSpanStats"

  it should "cover exactly the shared span, in both sharing docs" in {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $shared a3 a4"),        // 12 tokens, 8 covered
      (2L, s"b1 $shared"),                 // 9 tokens, 8 covered
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9")   // no shared 8-gram
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanStats(docs, "doc_id", "text", 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    got(0) shouldBe ((1L, 12L, 8L, 0.666667))
    got(1) shouldBe ((2L, 9L, 8L, 0.888889))
    got(2) shouldBe ((3L, 9L, 0L, 0.0))
  }

  it should "give zero coverage to docs shorter than the shingle width" in {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanStats(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    got.foreach(_._2 shouldBe 0L)
  }

  behavior of "simHash"

  it should "hash identical token streams identically and near-dups closely" in {
    val sigs = Dedup.simHashSignatures(
      docs((1L, base), (2L, base), (3L, nearDup), (4L, unrelated)),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs(1L) shouldBe sigs(2L)
    java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) should be <= 12
    java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) should be > 12
  }

  behavior of "ngramJaccardPairs prefix filter"

  it should "produce exactly the full-join pair set on random corpora " +
    "(AllPairs prefix principle, high thresholds)" in {
    import spark.implicits._
    // random docs with planted near-dups and heavy shared boilerplate
    // (popular shingles are where the prefix filter must not cheat)
    val rnd = new scala.util.Random(97)
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val rows = (0 until 60).flatMap { i =>
      val body = (0 until 20).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      val doc = s"$boiler $body"
      // every 4th doc gets a near-identical twin
      if (i % 4 == 0)
        Seq((i.toLong * 2, doc), (i.toLong * 2 + 1, doc + " tail" + i))
      else Seq((i.toLong * 2, doc))
    }
    val df = rows.toDF("doc_id", "text").withColumn("source",
      org.apache.spark.sql.functions.lit("s0"))
    Seq(0.5, 0.7, 0.9).foreach { t =>
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source",
          3, t, prefixFilter = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      val want = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source",
          3, t) // default full-join path
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      withClue(s"t=$t: ") { got shouldBe want }
    }
  }

  behavior of "cdcSharedChunkStats"

  it should "cover exact duplicates fully and leave unique docs at zero" in {
    val out = Dedup.cdcSharedChunkStats(
      docs((1L, base), (2L, base), (3L, unrelated)), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out(1L)._3 shouldBe 1.0
    out(2L)._3 shouldBe 1.0
    out(3L)._3 shouldBe 0.0
    out(1L)._1 shouldBe base.split(" ").length.toLong
  }

  it should "catch a long repeated substring planted mid-document " +
    "regardless of its length (no fixed n)" in {
    // 40-token boilerplate block shared by two otherwise-different docs:
    // CDC must attribute substantial coverage to both, while the purely
    // unique doc stays at 0.
    val boiler = (1 to 40).map(i => s"w$i").mkString(" ")
    val d1 = s"alpha beta gamma $boiler delta epsilon"
    val d2 = s"one two three four five $boiler six seven"
    val out = Dedup.cdcSharedChunkStats(
      docs((1L, d1), (2L, d2), (3L, unrelated)), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out(1L) should be >= 0.5
    out(2L) should be >= 0.5
    out(3L) shouldBe 0.0
  }

  it should "be stable across partitionings" in {
    val d = docs((1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
    def run(parts: Int) = Dedup.cdcSharedChunkStats(
        d.repartition(parts), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    run(1) shouldBe run(7)
  }

  behavior of "cdcStripShared"

  it should "remove exactly the shared chunks and preserve token order" in {
    val boiler = (1 to 40).map(i => s"w$i").mkString(" ")
    val d1 = s"alpha beta gamma $boiler delta epsilon"
    val d2 = s"one two three four five $boiler six seven"
    val d = docs((1L, d1), (2L, d2), (3L, unrelated))
    val stats = Dedup.cdcSharedChunkStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stripped = Dedup.cdcStripShared(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    stripped.foreach { case (id, (cleaned, nTok, nKept)) =>
      nKept shouldBe (nTok - stats(id)._2)
      val kept = if (cleaned.isEmpty) 0 else cleaned.split(" ").length
      kept.toLong shouldBe nKept
    }
    // kept tokens of doc 1 must be a subsequence of the original
    val keep1 = stripped(1L)._1.split(" ").filter(_.nonEmpty)
    val orig1 = d1.split(" ")
    keep1.foldLeft(0) { (from, tok) =>
      val idx = orig1.indexOf(tok, from)
      idx should be >= 0
      idx + 1
    }
    // the unique doc is untouched
    stripped(3L)._1 shouldBe unrelated
  }

  behavior of "substrDupSpanStats"

  it should "merge overlapping duplicated windows into spans and " +
    "zero-fill clean docs" in {
    // docs 0/1 share the exact run "a b c d": at w=3 that is windows
    // "a b c" and "b c d" at starts {1,2} (doc 0) / {3,4} (doc 1), each
    // merging into ONE 4-token span; doc 2 is clean.
    val out = Dedup.substrDupSpanStats(
      docs((0L, "a b c d e f"), (1L, "x y a b c d z"), (2L, "p q r s")),
      "doc_id", "text", w = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    out(0L) shouldBe ((6L, 2L, 1L, 4L, 0.666667))
    out(1L) shouldBe ((7L, 2L, 1L, 4L, 0.571429))
    out(2L) shouldBe ((4L, 0L, 0L, 0L, 0.0))
  }

  it should "catch a WITHIN-doc repeat and cover the whole doc when " +
    "everything repeats" in {
    val out = Dedup.substrDupSpanStats(
      docs((0L, "m n o m n o m n o"), (1L, "p q r s t u")),
      "doc_id", "text", w = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getDouble(5)))).toMap
    // every 3-window of the periodic doc recurs -> one span covers all 9
    out(0L) shouldBe ((9L, 9L, 1.0))
    out(1L)._2 shouldBe 0L
  }

  behavior of "substrStripShared"

  it should "strip exactly the tokens covered by duplicated windows" in {
    val out = Dedup.substrStripShared(
      docs((0L, "a b c d e f"), (1L, "x y a b c d z"), (2L, "p q r s")),
      "doc_id", "text", w = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    out(0L) shouldBe (("e f", 6L, 2L))
    out(1L) shouldBe (("x y z", 7L, 3L))
    out(2L) shouldBe (("p q r s", 4L, 4L))
  }
}
