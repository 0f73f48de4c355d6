package graft.stats

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.{Column, DataFrame}

/** Pairwise Pearson correlation over a set of numeric columns, computed
  * from EXACT decimal moment sums so the result is reproducible across
  * engines and partitionings.
  *
  * Why not `corr(...)`: both Spark's and DuckDB's native corr are
  * one-pass floating-point recurrences whose output depends on
  * partition/accumulation order — fine for analytics, unusable for a
  * hash-compared contract. Here every moment (Σx, Σx², Σxy) is summed as
  * DECIMAL(38,8) — exact, order-insensitive — and only the final scalar
  * formula runs in doubles, written in one fixed association so any
  * engine computing it from the same sums lands on the same bits.
  *
  * Scale shape: ALL pairs come out of ONE aggregation job over a single
  * scan — 1 + 2·c + c·(c−1)/2 partially-aggregatable sums collapsing to
  * one row (map-side combine), then a `stack` unpivot to (x, y, corr)
  * rows. No shuffle of row data, no second pass, no collect.
  */
object Correlation {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 8))

  /** (x, y, corr) for every unordered column pair, x < y lexically,
    * corr rounded to `scale` decimals.
    *
    * NULL policy: listwise deletion — a row with a NULL in ANY of `cols`
    * is excluded from every moment, so `n` and the NULL-skipping sums
    * always describe the same row set. (Without the filter, `count(*)`
    * counts rows the sums skipped and every moment-based term is
    * silently skewed.) The oracle spelling applies the same WHERE.
    */
  def pairwiseCorr(df: DataFrame, cols: Seq[String],
                   scale: Int = 6): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val sorted = cols.sorted
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val aggs =
      sorted.flatMap(c => Seq(
        sum(dec(col(c))).cast(DoubleType).as(s"s_$c"),
        sum(dec(col(c) * col(c))).cast(DoubleType).as(s"ss_$c"))) ++
        pairs.map { case (x, y) =>
          sum(dec(col(x) * col(y))).cast(DoubleType).as(s"p_${x}_$y")
        }
    val moments = df.na.drop(sorted).agg(
      count(lit(1)).cast(DoubleType).as("n"), aggs: _*)
    def corrCol(x: String, y: String): Column = round(
      (col("n") * col(s"p_${x}_$y") - col(s"s_$x") * col(s"s_$y")) /
        (sqrt(col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x")) *
          sqrt(col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y"))),
      scale)
    val stacked = pairs.map { case (x, y) =>
      s"'$x', '$y', `c_${x}_$y`"
    }.mkString(", ")
    moments
      .select(col("n") +: pairs.map { case (x, y) =>
        corrCol(x, y).as(s"c_${x}_$y")
      }: _*)
      .selectExpr(
        s"stack(${pairs.size}, $stacked) AS (x, y, corr)")
      .orderBy("x", "y")
  }

  /** Oracle-side spelling of [[pairwiseCorr]] for a DuckDB `FROM $table`
    * query — the same decimal sums and the same fixed-association double
    * formula.
    */
  def pairwiseCorrSql(table: String, cols: Seq[String],
                      scale: Int = 6): String = {
    val sorted = cols.sorted
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val sums =
      sorted.flatMap(c => Seq(
        s"CAST(sum(CAST($c AS DECIMAL(38,8))) AS DOUBLE) AS s_$c",
        s"CAST(sum(CAST($c * $c AS DECIMAL(38,8))) AS DOUBLE) AS ss_$c")) ++
        pairs.map { case (x, y) =>
          s"CAST(sum(CAST($x * $y AS DECIMAL(38,8))) AS DOUBLE) AS p_${x}_$y"
        }
    val rows = pairs.map { case (x, y) =>
      s"""SELECT '$x' AS x, '$y' AS y,
         |  round((n * p_${x}_$y - s_$x * s_$y) /
         |    (sqrt(n * ss_$x - s_$x * s_$x) *
         |     sqrt(n * ss_$y - s_$y * s_$y)), $scale) AS corr
         |FROM m""".stripMargin
    }
    val notNull = sorted.map(c => s"$c IS NOT NULL").mkString(" AND ")
    s"""WITH m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM $table
       |  WHERE $notNull)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY x, y""".stripMargin
  }
}
