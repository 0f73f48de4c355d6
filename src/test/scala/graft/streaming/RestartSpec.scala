package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Checkpoint-restart / exactly-once contract of the production ETL shape
  * (file source → transform → checkpointed file sink, the q_stream_etl
  * plan): a restarted query resumes from the checkpoint's source offsets
  * and sink log — new files are processed exactly once, already-processed
  * files never again, and a restart with no new data writes nothing.
  * This is THE property that makes a 100 TB streaming backfill safe to
  * kill and resume at any point.
  */
class RestartSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "checkpointed file-sink streaming restart"

  it should "process each input file exactly once across restarts" in {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_restart").toString
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    new java.io.File(src).mkdirs()

    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, s"ev_$i")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema).parquet(src)
        .withColumn("tag2", upper(col("tag")))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    try {
      writeBatch(0 until 100)
      runOnce()
      s.read.parquet(out).count() shouldBe 100

      // restart with NEW data: only the new file is processed
      writeBatch(100 until 150)
      runOnce()
      val after = s.read.parquet(out)
      after.count() shouldBe 150
      after.select(countDistinct(col("id"))).head().getLong(0) shouldBe 150

      // restart with NO new data: nothing is reprocessed or duplicated
      runOnce()
      s.read.parquet(out).count() shouldBe 150
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
