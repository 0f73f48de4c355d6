package graft.stats

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.{Column, DataFrame}

/** Pairwise Pearson correlation over a set of numeric columns, computed
  * from EXACT scaled-integer moment sums so the result is reproducible
  * across engines and partitionings.
  *
  * Why not `corr(...)`: both Spark's and DuckDB's native corr are
  * one-pass floating-point recurrences whose output depends on
  * partition/accumulation order — fine for analytics, unusable for a
  * hash-compared contract.
  *
  * Why scaled integers, not a DECIMAL(38,8) cast per term: a double→
  * wide-decimal cast allocates a BigDecimal EVERY ROW per moment (15
  * casts/row for 4 columns) — measured 4–5 s for 600k rows vs 0.4 s in
  * plain doubles. Instead each value is rounded once to `inputScale`
  * decimals as an integer-valued double (v = round(x·10^k)); products of
  * those integers stay ≤ ~1e14, far below 2^53, so every v·v is EXACT in
  * double; they cast to long (free in codegen) and sum as DECIMAL(38,0)
  * whose long-backed compact path skips BigDecimal until a partial sum
  * exceeds 2^63 — measured 0.8–1.2 s, 4–5× faster, still exact and
  * order-insensitive. Pearson r is scale-invariant, so the 10^k factors
  * cancel ALGEBRAICALLY in the final formula — no rescaling, and the
  * result is bit-identical to the wide-decimal spelling whenever the
  * data really has ≤ `inputScale` decimals (more decimals are ROUNDED
  * identically on both engines: the grain is part of the contract).
  * Only the final scalar formula runs in doubles, written in one fixed
  * association so any engine computing it from the same sums lands on
  * the same bits.
  *
  * Scale shape: ALL pairs come out of ONE aggregation job over a single
  * scan — 1 + 2·c + c·(c−1)/2 partially-aggregatable sums collapsing to
  * one row (map-side combine), then a `stack` unpivot to (x, y, corr)
  * rows. No shuffle of row data, no second pass, no collect.
  *
  * Exactness bound: |x|·10^inputScale must stay ≤ ~3·10^7 so the
  * products stay under 2^53 (TPC-H money columns at k=2 peak at 10^7).
  */
object Correlation {

  /** (x, y, corr) for every unordered column pair, x < y lexically,
    * corr rounded to `scale` decimals; values rounded to `inputScale`
    * decimals before the moments (see object doc).
    *
    * NULL policy: listwise deletion — a row with a NULL in ANY of `cols`
    * is excluded from every moment, so `n` and the NULL-skipping sums
    * always describe the same row set. (Without the filter, `count(*)`
    * counts rows the sums skipped and every moment-based term is
    * silently skewed.) The oracle spelling applies the same WHERE.
    */
  def pairwiseCorr(df: DataFrame, cols: Seq[String],
                   scale: Int = 6, inputScale: Int = 2): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val factor = math.pow(10.0, inputScale)
    def v(c: String): Column = round(col(c) * factor, 0)
    def decSum(c: Column): Column =
      sum(c.cast("long").cast(DecimalType(38, 0))).cast(DoubleType)
    val sorted = cols.sorted
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val aggs =
      sorted.flatMap(c => Seq(
        decSum(v(c)).as(s"s_$c"),
        decSum(v(c) * v(c)).as(s"ss_$c"))) ++
        pairs.map { case (x, y) =>
          decSum(v(x) * v(y)).as(s"p_${x}_$y")
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
    * query — the same scaled-integer sums and the same fixed-association
    * double formula (DuckDB's SUM(BIGINT) is exact HUGEINT; both engines
    * convert the identical exact integer to double once).
    */
  def pairwiseCorrSql(table: String, cols: Seq[String],
                      scale: Int = 6, inputScale: Int = 2): String = {
    val f = "1" + ("0" * inputScale) + ".0"
    def v(c: String) = s"round($c * $f, 0)"
    val sorted = cols.sorted
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val sums =
      sorted.flatMap(c => Seq(
        s"CAST(sum(CAST(${v(c)} AS BIGINT)) AS DOUBLE) AS s_$c",
        s"CAST(sum(CAST(${v(c)} * ${v(c)} AS BIGINT)) AS DOUBLE) AS ss_$c")) ++
        pairs.map { case (x, y) =>
          s"CAST(sum(CAST(${v(x)} * ${v(y)} AS BIGINT)) AS DOUBLE) " +
            s"AS p_${x}_$y"
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
