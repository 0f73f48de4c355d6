package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for the query registry.
  *
  * Every query here is paired with an ANSI-SQL oracle run by the driver in
  * DuckDB against the same parquet tables, and the comparison is an exact
  * hash match on values. Two rules make that robust:
  *
  *   1. Sums of doubles go through exact decimal arithmetic
  *      (`sum(cast(x as decimal(18,s)))`) and only the final total is cast
  *      back to double. Decimal addition is associative, so the result is
  *      independent of partitioning / evaluation order — the same value to
  *      the bit in Spark and DuckDB. A plain double `sum()` differs between
  *      engines by ~1e-3 absolute at 60k rows, which no amount of rounding
  *      can reliably hide.
  *   2. Everything else double-valued (MI scores, averages, similarities)
  *      is rounded to a fixed number of decimals on BOTH sides; cross-engine
  *      deltas there are ~1e-12 relative, far below the rounding grain.
  *
  * At 100 TB the same queries run unchanged: decimal sums are
  * codegen-friendly, partial-aggregated map-side, and shuffle only
  * (group-keys × 1) rows.
  */
object Q {
  /** Load one of the driver's parquet tables. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Load `events`, whose `ts` column is NANOS-precision parquet — which
    * Spark refuses to read as a timestamp. Read it as nanos-since-epoch
    * (legacy conf) and truncate to microseconds, exactly what DuckDB's
    * `CAST(ts AS TIMESTAMP)` does on the oracle side, so both engines see
    * the identical microsecond value.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Oracle-side spelling of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"
}
