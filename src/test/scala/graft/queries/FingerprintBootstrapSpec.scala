package graft.queries

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Properties of the two newest exact-arithmetic gates.
  *
  * q_table_fingerprint's whole point is partition-order freedom (an
  * associative integer SUM of row hashes), so the spec runs the GATE
  * itself under three different partitioning regimes (default, tiny
  * input splits, a different shuffle width) and requires bit-identical
  * results — the same invariance proof style as PcaDeterminismSpec.
  *
  * q_poisson_bootstrap's weights claim to follow Poisson(1) through
  * exact integer thresholds on the md5 16-bit grid; the spec recomputes
  * the weight of 40k (key, replica) pairs JVM-side and requires the
  * empirical pmf within 1.5 percentage points of Poisson(1) — a
  * distributional check no oracle row can express.
  */
class FingerprintBootstrapSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  "q_table_fingerprint" should "be invariant to partitioning" in {
    val s = spark
    def run(): Seq[String] = {
      val rows = graft.SparkEntry.queries("q_table_fingerprint")(s, dir)
        .collect().map(_.toString).toSeq
      graft.Bench.resetState(s)
      rows
    }
    val base = run()
    val oldShuffle = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      s.conf.set("spark.sql.shuffle.partitions", "7")
      run() shouldBe base
      s.conf.set("spark.sql.shuffle.partitions", "13")
      run() shouldBe base
    } finally {
      s.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
      s.conf.set("spark.sql.shuffle.partitions", oldShuffle)
    }
    base should not be empty
  }

  "q_poisson_bootstrap weights" should "follow Poisson(1)" in {
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(key: Long, b: Int): Int = {
      val hex = md.digest(s"${key}_$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val h = java.lang.Long.parseLong(hex, 16)
      if (h < 24109) 0 else if (h < 48219) 1 else if (h < 60281) 2
      else if (h < 64299) 3 else 4
    }
    val n = 40000
    val counts = new Array[Int](5)
    for (k <- 0 until (n / 4); b <- 0 until 4)
      counts(weight(k.toLong, b)) += 1
    val pmf = counts.map(_.toDouble / n)
    val expected = {
      val e = math.exp(-1.0)
      Array(e, e, e / 2, e / 6, 1 - e - e - e / 2 - e / 6)
    }
    pmf.zip(expected).foreach { case (got, want) =>
      math.abs(got - want) should be < 0.015
    }
    // mean weight ≈ 1 (the property that makes each replica unbiased)
    val mean = counts.zipWithIndex.map { case (c, w) => c.toLong * w }
      .sum.toDouble / n
    math.abs(mean - 1.0) should be < 0.03
  }
}
