package graft.stats

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class MutualInformationSpec extends AnyFunSuite with Matchers {

  private val eps = 1e-12

  /** Naive dense oracle: full contingency over every position. */
  private def naiveMI(a: Array[Double], b: Array[Double]): Double =
    MutualInformation.fromPairCounts(
      a.zip(b).groupBy(identity).map { case ((x, y), g) =>
        (x, y, g.length.toLong)
      })

  private def randomPairs(seed: Int, n: Int, levels: Int)
  : (Array[Double], Array[Double]) = {
    val rnd = new Random(seed)
    (Array.fill(n)(rnd.nextInt(levels).toDouble),
      Array.fill(n)(rnd.nextInt(levels).toDouble))
  }

  test("independent variables have zero MI") {
    // P(x,y) = P(x)P(y) exactly: a 2x2 uniform contingency
    val mi = MutualInformation.fromContingency(
      Array(Array(25L, 25L), Array(25L, 25L)))
    mi shouldBe 0.0 +- eps
  }

  test("identical variables: MI equals entropy") {
    // X == Y, two levels with counts 30/70 => MI = H = -Σ p ln p
    val mi = MutualInformation.fromContingency(
      Array(Array(30L, 0L), Array(0L, 70L)))
    val h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    mi shouldBe h +- eps
  }

  test("zero cells are skipped, empty matrix gives 0") {
    MutualInformation.fromContingency(Array(Array(0L, 0L))) shouldBe 0.0
    MutualInformation.fromPairCounts(Seq.empty[(Int, Int, Long)]) shouldBe 0.0
  }

  test("known value: perfectly dependent 3-level uniform = ln 3") {
    val m = Array.tabulate(3, 3)((i, j) => if (i == j) 10L else 0L)
    MutualInformation.fromContingency(m) shouldBe math.log(3.0) +- eps
  }

  test("vector MI matches naive dense oracle on random dense vectors") {
    for (seed <- 1 to 50) {
      val (a, b) = randomPairs(seed, 40, 4)
      val got = MutualInformation.fromVectors(
        Vectors.dense(a), Vectors.dense(b))
      got shouldBe naiveMI(a, b) +- 1e-9
    }
  }

  test("vector MI: sparse/dense equivalence incl. inferred (0,0) cell") {
    val a = Array(0.0, 0.0, 1.0, 0.0, 2.0, 0.0, 0.0, 1.0)
    val b = Array(0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 1.0, 1.0)
    val dense = MutualInformation.fromVectors(
      Vectors.dense(a), Vectors.dense(b))
    val sparse = MutualInformation.fromVectors(
      Vectors.dense(a).toSparse, Vectors.dense(b).toSparse)
    val mixed = MutualInformation.fromVectors(
      Vectors.dense(a).toSparse, Vectors.dense(b))
    dense shouldBe naiveMI(a, b) +- eps
    sparse shouldBe dense +- eps
    mixed shouldBe dense +- eps
  }

  test("sparse vector with explicit zero values") {
    // explicit stored zeros must behave exactly like implicit zeros
    val a = Vectors.sparse(6, Array(0, 2, 4), Array(1.0, 0.0, 2.0))
    val b = Vectors.sparse(6, Array(1, 2, 5), Array(1.0, 3.0, 0.0))
    val da = Vectors.dense(a.toArray)
    val db = Vectors.dense(b.toArray)
    MutualInformation.fromVectors(a, b) shouldBe
      naiveMI(da.toArray, db.toArray) +- eps
  }

  test("MI is symmetric") {
    for (seed <- 1 to 30) {
      val (a, b) = randomPairs(seed, 30, 5)
      val va = Vectors.dense(a); val vb = Vectors.dense(b)
      MutualInformation.fromVectors(va, vb) shouldBe
        MutualInformation.fromVectors(vb, va) +- 1e-9
    }
  }

  test("MI is non-negative and MI(a,a) is the entropy of a") {
    for (seed <- 1 to 30) {
      val (a, _) = randomPairs(seed, 30, 5)
      val v = Vectors.dense(a)
      val mi = MutualInformation.fromVectors(v, v)
      mi should be >= -eps
      val h = -a.groupBy(identity).values
        .map(g => g.size / 30.0).map(p => p * math.log(p)).sum
      mi shouldBe h +- 1e-9
    }
  }

  test("MI invariant under level relabeling") {
    val a = Array(0.0, 1.0, 2.0, 1.0, 0.0, 2.0, 2.0, 1.0)
    val b = Array(1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0)
    val relabel = Map(0.0 -> 7.0, 1.0 -> 3.0, 2.0 -> 11.0)
    MutualInformation.fromVectors(
      Vectors.dense(a.map(relabel)), Vectors.dense(b)) shouldBe
      MutualInformation.fromVectors(Vectors.dense(a), Vectors.dense(b)) +- eps
  }

  test("mismatched vector lengths are rejected") {
    an[IllegalArgumentException] should be thrownBy
      MutualInformation.fromVectors(
        Vectors.dense(1.0, 2.0), Vectors.dense(1.0))
  }

  test("mRMR combine: empty selected set means pure relevance") {
    MRMR.score(0.8, Nil) shouldBe 0.8
    MRMR.score(0.8, Seq(0.2, 0.4)) shouldBe (0.8 - 0.3) +- eps
  }
}
