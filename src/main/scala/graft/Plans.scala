package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper (optimization guide §1.3): writes
  * `.explain("formatted")` for named gates to `<outDir>/<gate>_<tag>.txt`
  * on a Bench-identical session, so plan-shape claims (Exchange count,
  * join strategy, PushedFilters) are checkable without running Spark.
  * Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Plans <outDir> <tag> q_x q_y ..."
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args(0)
    val tag = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmScale(spark, sfDir)
    Bench.resetState(spark)
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plans] no such gate: $name")
        case Some(fn) =>
          val plan = try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
          } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
          val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
          java.nio.file.Files.write(p,
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plans] wrote $p")
          Bench.resetState(spark)
      }
    }
    spark.stop()
  }
}
