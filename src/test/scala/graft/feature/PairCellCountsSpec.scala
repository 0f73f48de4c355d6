package graft.feature

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Differential lock on the imperative contingency counter: on randomized
  * matrices — including NULLs, NaN, ±0.0 and heavy ties — the cell
  * counts must equal the Catalyst spelling it replaced
  * (`crossJoin(pairs) → groupBy().count()`), cell for cell. This is the
  * equivalence the whole ifs_* family rests on after the round-8 rework.
  */
class PairCellCountsSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  private def oldSpelling(src: org.apache.spark.sql.DataFrame,
                          pairs: Seq[(Int, Int)]) = {
    val s = src.sparkSession
    import s.implicits._
    val pairsDf = pairs.toDF("cand", "other")
    src.crossJoin(broadcast(pairsDf))
      .select(col("cand"), col("other"),
        try_element_at(col("f"), col("cand") + 1).as("cv"),
        when(col("other") < 0, col("label"))
          .otherwise(try_element_at(col("f"), col("other") + 1)).as("ov"))
      .groupBy("cand", "other", "cv", "ov")
      .agg(count(lit(1)).as("c"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map { r =>
      def d(i: Int): String =
        if (r.isNullAt(i)) "null"
        else {
          val v = r.getDouble(i)
          // ±0.0 merge and NaN canonicalization, as Spark's grouping does
          if (v == 0.0) "0.0"
          else if (v.isNaN) "NaN"
          else v.toString
        }
      s"${r.getInt(0)}|${r.getInt(1)}|${d(2)}|${d(3)}|${r.getLong(4)}"
    }.toSet

  it should "match the Catalyst spelling on randomized matrices" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nF = 2 + rnd.nextInt(3)
      val rows = (0 until 2000).map { _ =>
        def v(): java.lang.Double = rnd.nextInt(6) match {
          case 0 => null
          case 1 => Double.NaN
          case 2 => if (rnd.nextBoolean()) 0.0 else -0.0
          case _ => rnd.nextInt(4).toDouble
        }
        (rnd.nextInt(3).toDouble, Seq.fill(nF)(v()).map(
          x => if (x == null) null.asInstanceOf[java.lang.Double] else x))
      }
      val src = rows.toDF("label", "f")
        .select(col("label"), col("f").cast("array<double>"))
        .repartition(5)
      val pairs = (0 until nF).map(i => (i, -1)) ++
        (for (i <- 0 until nF; j <- 0 until i) yield (i, j))
      val got = canon(IterativeFeatureSelection.pairCellCounts(src, pairs))
      val want = canon(oldSpelling(src, pairs))
      withClue(s"trial $trial (nF=$nF): ") { got shouldBe want }
    }
  }
}
