package graft.stats

import org.apache.spark.ml.linalg.Vector

/** Pluggable scoring criteria for iterative feature selection.
  *
  * Mirrors the reference's two score traits (SURVEY.md §2 O6/O7, citing
  * `reference:src/main/scala/ifs/ml/stats/ColumnWiseScore.scala:9-53` and
  * `RowWiseScore.scala:10-64`) re-expressed over plain MI values:
  * because MI is computed distributedly by the new engine (the score never
  * sees raw contingency matrices on the driver at scale), the trait takes
  * `relevance = MI(candidate, label)` and
  * `redundancies = MI(candidate, s) for s in selected`.
  *
  * `higherIsBetter` fixes the argmax direction; ties break toward the
  * lowest feature index/id (documented deviation from the reference's
  * hash-order ties, SURVEY.md §2.4 Q1).
  */
trait SelectionScore extends Serializable {
  def score(relevance: Double, redundancies: Seq[Double]): Double
  def higherIsBetter: Boolean = true
}

/** mRMR: `MI(cand, label) − (1/|S|)·Σ_{s∈S} MI(cand, s)`.
  * With S empty the score is pure relevance
  * (`reference:ColumnWiseScore.scala:41-52`, `RowWiseScore.scala:47-64`).
  */
object MRMR extends SelectionScore {
  override def score(relevance: Double, redundancies: Seq[Double]): Double =
    if (redundancies.isEmpty) relevance
    else relevance - redundancies.sum / redundancies.size
}

/** Row-wise (alternate-encoding) scoring over feature vectors; used by the
  * executor-side scoring path where each candidate row carries its full
  * value vector. Kept as a separate trait so user-supplied row scores can
  * see the raw vectors, like the reference's `RowWiseScore`.
  */
trait RowScore extends Serializable {
  def score(feature: Vector, labelRow: Vector, selected: Seq[Vector]): Double
  def higherIsBetter: Boolean = true
}

object RowMRMR extends RowScore {
  override def score(feature: Vector, labelRow: Vector,
                     selected: Seq[Vector]): Double = {
    val rel = MutualInformation.fromVectors(feature, labelRow)
    if (selected.isEmpty) rel
    else rel - selected.map(MutualInformation.fromVectors(feature, _)).sum /
      selected.size
  }
}
