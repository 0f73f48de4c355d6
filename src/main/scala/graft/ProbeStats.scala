package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timer for the PrefixSum machinery (dev-only). */
object ProbeStats {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmScale(spark, dir)
    Bench.resetState(spark)
    def ph[A](n: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"  [$n%-28s] ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val frame = ph("domain frame agg+ckpt") {
        queries.Q.t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            col("l_extendedprice").as("v"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
      }
      println("  frame rows: " + frame.count())
      val bucketed = ph("rangeRepart+pid+ckpt") {
        frame.repartitionByRange(32, col("flag"), col("v"))
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint(true)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__pid").orderBy(col("flag"), col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val local = bucketed.withColumn("__local",
        coalesce(sum(col("cnt").cast("double")).over(w), lit(0.0)))
      ph("window pass (count)")(local.count())
      val out = ph("full withExclusivePrefix") {
        graft.ops.PrefixSum.withExclusivePrefix(frame, Seq("flag", "v"), "cnt")
      }
      println("  out rows: " + out.count())
      ph("2nd withExclusivePrefix") {
        graft.ops.PrefixSum.withExclusivePrefix(frame, Seq("flag", "v"), "cnt")
      }
      Bench.resetState(spark)
    }
    spark.stop()
  }
}
