package graft.queries

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The PCA pair's whole claim is hash-exactness: all-integer arithmetic
  * means the result cannot depend on partitioning or scheduling. Prove it
  * by running the gates under different shuffle-partition counts and
  * demanding bit-identical rows.
  */
class PcaDeterminismSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    graft.SparkEntry.queries(name)(spark, dir)
      .collect().toSeq.map(_.toSeq)

  it should "produce identical output under different partitionings" in {
    val s = spark
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    try {
      Seq("q_emb_pca_power", "q_emb_pca_project").foreach { name =>
        s.conf.set(key, "3")
        val a = rows(name)
        s.conf.set(key, "17")
        val b = rows(name)
        withClue(s"$name: ") { a shouldBe b }
      }
    } finally s.conf.set(key, old)
  }
}
