package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class RowIndexSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  import spark.implicits._

  behavior of "withContiguousIndex"

  it should "assign dense 0-based ids in sort order across partitions" in {
    // ids arrive shuffled and skewed over many partitions
    val df = Seq(50L, 3L, 999L, 1L, 42L, 7L, 100L, 0L)
      .toDF("k").repartition(5)
    val got = RowIndex.withContiguousIndex(df, Seq("k"))
      .select("row_idx", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    got.map(_._1).toSeq shouldBe (0L until 8L)
    got.map(_._2).toSeq shouldBe Seq(0L, 1L, 3L, 7L, 42L, 50L, 100L, 999L)
  }

  it should "be stable across reruns and input partitionings" in {
    val a = RowIndex.withContiguousIndex(
      (0L until 500L).map(i => (i * 37 % 1000, i)).toDF("k", "v")
        .repartition(7), Seq("k"))
      .select("row_idx", "k", "v").collect().map(_.toSeq).sortBy(_.toString)
    val b = RowIndex.withContiguousIndex(
      (0L until 500L).map(i => (i * 37 % 1000, i)).toDF("k", "v")
        .repartition(3), Seq("k"))
      .select("row_idx", "k", "v").collect().map(_.toSeq).sortBy(_.toString)
    a shouldBe b
  }
}
