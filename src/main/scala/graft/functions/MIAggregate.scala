package graft.functions

import graft.stats.MutualInformation
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Typed `Aggregator` computing the mutual information (nats) of a pair of
  * categorical columns — the SURVEY.md §7.4 "contingency aggregation as a
  * custom aggregate" realized: pair counts accumulate MAP-SIDE into the
  * aggregation buffer (partial aggregation bounds the shuffle by distinct
  * levels², not rows — the same property the explode→groupBy MI path gets
  * from Catalyst, here packaged as a reusable group-aware aggregate), and
  * the tiny count map folds to one double per group in `finish`.
  *
  * Usable anywhere an aggregate goes: `df.groupBy(g).agg(MIAggregate.mi(x,
  * y))` — grouped MI was impossible in the reference (one global matrix
  * per job, `reference:IterativeFeatureSelection.scala:97`).
  */
object MIAggregate {

  /** Buffer key "x|y" keeps the buffer a natively-encoded Map[String,Long]
    * (no Kryo), so partial merges stay Tungsten-friendly.
    */
  private def key(x: Double, y: Double): String = s"$x|$y"

  /** Inputs are boxed so a NULL in either column is representable: a null
    * pair contributes nothing (SQL-aggregate convention — `corr`, `covar`
    * etc. likewise skip rows with any null operand) instead of failing the
    * whole aggregation with a non-nullable-field encoder error.
    */
  val aggregator: Aggregator[(java.lang.Double, java.lang.Double),
      Map[String, Long], Double] =
    new Aggregator[(java.lang.Double, java.lang.Double),
        Map[String, Long], Double] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(b: Map[String, Long],
          a: (java.lang.Double, java.lang.Double)): Map[String, Long] = {
        if (a._1 == null || a._2 == null) b
        else {
          val k = key(a._1.doubleValue, a._2.doubleValue)
          b.updated(k, b.getOrElse(k, 0L) + 1L)
        }
      }

      override def merge(b1: Map[String, Long],
                         b2: Map[String, Long]): Map[String, Long] = {
        val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
        small.foldLeft(large) { case (acc, (k, c)) =>
          acc.updated(k, acc.getOrElse(k, 0L) + c)
        }
      }

      override def finish(b: Map[String, Long]): Double =
        MutualInformation.fromPairCounts(b.iterator.map { case (k, c) =>
          val i = k.indexOf('|')
          (k.substring(0, i).toDouble, k.substring(i + 1).toDouble, c)
        }.toSeq)

      override def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: `mi(x, y)` as an aggregate expression; null-skipping. */
  def mi(x: Column, y: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(aggregator, Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE))
      .apply(x.cast("double"), y.cast("double"))
  }
}
