package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The DSv2 write half's commit-protocol contracts: atomic visibility
  * (nothing readable before the job commit), overwrite = replace (not
  * append), and byte-faithful read-back through the connector's own
  * read path.
  */
class MemTableSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "MemTableSource"

  it should "publish rows atomically at commit and replace on overwrite" in {
    val s = spark
    import s.implicits._
    val tbl = "memtable_spec"
    MemTableSource.drop(tbl)
    MemTableSource.committedRows(tbl) shouldBe 0

    val a = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    a.repartition(4).write.format("graft-mem").option("table", tbl)
      .mode("overwrite").save()
    MemTableSource.committedRows(tbl) shouldBe 100

    val back = s.read.format("graft-mem").option("table", tbl).load()
    back.count() shouldBe 100
    back.agg(sum("id")).collect()(0).getLong(0) shouldBe 5050L

    // overwrite REPLACES the published snapshot
    val b = (1 to 7).map(i => (i.toLong, "x")).toDF("id", "v")
    b.write.format("graft-mem").option("table", tbl)
      .mode("overwrite").save()
    MemTableSource.committedRows(tbl) shouldBe 7
    s.read.format("graft-mem").option("table", tbl).load()
      .count() shouldBe 7
    MemTableSource.drop(tbl)
  }

  it should "fail loudly when reading a table with no committed rows " +
    "in this JVM" in {
    val s = spark
    val tbl = "memtable_absent"
    MemTableSource.drop(tbl)
    // schema passed explicitly so inferSchema doesn't trip first — this
    // exercises the READER's absent-key path (the wrong-JVM symptom on a
    // non-local deployment), which must throw instead of returning 0 rows
    val ex = intercept[Exception] {
      s.read.format("graft-mem").option("table", tbl)
        .schema("id LONG, v STRING").load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("no committed rows in this JVM")))
  }

  it should "round-trip all column types it is handed" in {
    val s = spark
    import s.implicits._
    val tbl = "memtable_types"
    MemTableSource.drop(tbl)
    val df = Seq((1L, "a", 1.5, true), (2L, null: String, -0.25, false))
      .toDF("id", "s", "d", "b")
    df.write.format("graft-mem").option("table", tbl)
      .mode("overwrite").save()
    val back = s.read.format("graft-mem").option("table", tbl).load()
      .orderBy("id").collect()
    back.map(_.toSeq).toSeq shouldBe df.orderBy("id").collect()
      .map(_.toSeq).toSeq
    MemTableSource.drop(tbl)
  }
}
