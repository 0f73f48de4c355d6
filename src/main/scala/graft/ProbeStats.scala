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
      println(f"  [$n%-34s] ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      def rawFrame = queries.Q.t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"))
        .agg(count(lit(1)).as("cnt"))
      ph("frame agg alone (count)")(rawFrame.count())
      ph("prefix on UNPINNED (gate shape)") {
        graft.ops.PrefixSum
          .withExclusivePrefix(rawFrame, Seq("flag", "v"), "cnt").count()
      }
      ph("prefix on UNPINNED pin=false") {
        graft.ops.PrefixSum.withExclusivePrefix(rawFrame, Seq("flag", "v"),
          "cnt", pin = false).count()
      }
      val pinned = ph("pin input (ckpt)")(rawFrame.localCheckpoint(true))
      ph("prefix on PINNED") {
        graft.ops.PrefixSum
          .withExclusivePrefix(pinned, Seq("flag", "v"), "cnt").count()
      }
      ph("prefix on PINNED pin=false") {
        graft.ops.PrefixSum.withExclusivePrefix(pinned, Seq("flag", "v"),
          "cnt", pin = false).count()
      }
      Bench.resetState(spark)
    }
    spark.stop()
  }
}
