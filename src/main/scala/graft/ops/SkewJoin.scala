package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Hot-key mitigation for shuffled equi-joins: salting.
  *
  * AQE's skew-join splitting handles most skew at runtime, but it only
  * fires for sort-merge joins whose partition stats cross its thresholds;
  * salting is the explicit, planner-independent fallback production
  * pipelines keep for pathological keys (one user with 10⁸ events, one
  * null-ish join key, …).
  *
  * Shape: the big side's join key is extended with a deterministic salt in
  * `[0, salts)`; the small side is exploded ×`salts` so every (key, salt)
  * bucket has its build rows. The join RESULT is identical to the plain
  * equi-join — only the shuffle distribution changes: each hot key spreads
  * over `salts` reducers instead of melting one. Cost: the small side is
  * duplicated `salts`× (it shuffles `salts`× more rows — keep `salts`
  * proportional to the skew, not "big to be safe").
  */
object SkewJoin {

  /** Inner equi-join `big.bigKey == small.smallKey`, salted.
    *
    * @param saltBy deterministic expression over the BIG side used to
    *               derive the salt (any column with per-row variety under
    *               a hot key — a line number, an event id). Using a
    *               deterministic source instead of `rand()` keeps query
    *               results reproducible run-to-run.
    */
  def salted(big: DataFrame, small: DataFrame, bigKey: String,
             smallKey: String, salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, b("__salt") === s("__salt") &&
        col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
