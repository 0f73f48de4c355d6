package graft.stats

import org.apache.spark.ml.linalg.Vectors
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite for the MI core (SURVEY.md §5 item 2):
  * symmetry, non-negativity, self-MI = entropy, level-relabeling
  * invariance, and vector-MI ≡ contingency-MI, over arbitrary categorical
  * vectors including explicit zeros (the sparse-handling edge).
  */
object MutualInformationProps extends Properties("MutualInformation") {

  private val eps = 1e-9

  private val vecPair: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(1, 60)
    levels <- Gen.choose(1, 5)
    a <- Gen.listOfN(n, Gen.choose(0, levels - 1).map(_.toDouble))
    b <- Gen.listOfN(n, Gen.choose(0, levels - 1).map(_.toDouble))
  } yield (a.toArray, b.toArray)

  private def mi(a: Array[Double], b: Array[Double]): Double =
    MutualInformation.fromVectors(Vectors.dense(a), Vectors.dense(b))

  /** Naive exhaustive contingency oracle. */
  private def naive(a: Array[Double], b: Array[Double]): Double =
    MutualInformation.fromPairCounts(
      a.zip(b).groupBy(identity).map { case ((x, y), g) =>
        (x, y, g.length.toLong)
      })

  property("symmetry") = Prop.forAll(vecPair) { case (a, b) =>
    math.abs(mi(a, b) - mi(b, a)) < eps
  }

  property("non-negativity") = Prop.forAll(vecPair) { case (a, b) =>
    mi(a, b) > -eps
  }

  property("self-MI equals entropy") = Prop.forAll(vecPair) { case (a, _) =>
    val h = -a.groupBy(identity).values
      .map(g => g.length.toDouble / a.length)
      .map(p => p * math.log(p)).sum
    math.abs(mi(a, a) - h) < eps
  }

  property("invariant under level relabeling") =
    Prop.forAll(vecPair) { case (a, b) =>
      // bijective relabel x -> 7 - x keeps co-occurrence structure
      val a2 = a.map(7.0 - _)
      math.abs(mi(a, b) - mi(a2, b)) < eps
    }

  property("vector-MI equals contingency-MI") =
    Prop.forAll(vecPair) { case (a, b) =>
      math.abs(mi(a, b) - naive(a, b)) < eps
    }

  property("sparse and dense representations agree") =
    Prop.forAll(vecPair) { case (a, b) =>
      val sa = Vectors.dense(a).toSparse
      val sb = Vectors.dense(b).toSparse
      math.abs(MutualInformation.fromVectors(sa, sb) - mi(a, b)) < eps
    }
}
