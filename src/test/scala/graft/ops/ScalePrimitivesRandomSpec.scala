package graft.ops

import graft.SparkTestBase
import graft.functions.TopK
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Randomized (seeded, deterministic) cross-checks of the scale
  * primitives against exhaustive driver-side oracles — skew, duplicates
  * in the order column, tiny groups, and ragged partition counts all
  * arise from the generators rather than hand-picked fixtures.
  */
class ScalePrimitivesRandomSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  behavior of "TopK.topKPerGroup (randomized)"

  it should "match the driver-side sort oracle on random skewed data" in {
    for (seed <- 1 to 4) {
      val r = rng(seed)
      val n = 50 + r.nextInt(150)
      // few groups + heavy value ties exercise the heap's tie ordering
      val data = (0 until n).map { i =>
        (s"g${r.nextInt(4)}", i.toLong, (r.nextInt(8) * 10).toDouble)
      }
      val k = 1 + r.nextInt(4)
      val got = TopK.topKPerGroup(
          data.toDF("g", "id", "v").repartition(1 + r.nextInt(6)),
          Seq("g"), "v", "id", k)
        .select("g", "rnk", "id", "v")
        .collect()
        .map(x => (x.getString(0), x.getLong(1).toInt, x.getLong(2),
          x.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val want = data.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(t => (-t._3, -t._2)).take(k).zipWithIndex
          .map { case ((_, id, v), i) => (g, i + 1, id, v) }
      }.sortBy(t => (t._1, t._2))
      got.toSeq shouldBe want
    }
  }

  behavior of "PrefixSum.withExclusivePrefix (randomized)"

  it should "match the driver-side running sum on random integer data" in {
    for (seed <- 1 to 4) {
      val r = rng(seed)
      val n = 50 + r.nextInt(200)
      val keys = r.shuffle((0 until n).toList)
      val data = keys.map(k => (k.toLong, (1 + r.nextInt(100)).toDouble))
      val got = PrefixSum.withExclusivePrefix(
          data.toDF("k", "v").repartition(1 + r.nextInt(6)), Seq("k"), "v")
        .select("k", "prefix")
        .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
      var run = 0.0
      val want = data.sortBy(_._1).map { case (k, v) =>
        val p = run; run += v; (k, p)
      }
      got.toSeq shouldBe want
    }
  }

  behavior of "RowIndex.withContiguousIndex (randomized)"

  it should "always produce the dense rank of the key" in {
    for (seed <- 1 to 4) {
      val r = rng(seed)
      val n = 30 + r.nextInt(150)
      val keys = r.shuffle((0 until 5 * n).toList).take(n)
      val got = RowIndex.withContiguousIndex(
          keys.map(_.toLong).toDF("k").repartition(1 + r.nextInt(6)),
          Seq("k"))
        .select("row_idx", "k")
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._2)
      val want = keys.map(_.toLong).sorted.zipWithIndex
        .map { case (k, i) => (i.toLong, k) }
      got.toSeq shouldBe want
    }
  }
}
