package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-gate profiler (optimization guide §1): runs named gates
  * solo on a Bench-identical session and prints every Spark job's wall
  * time with its call site, so a gate's cost decomposes into its
  * constituent actions (range-partition sampling, checkpoint
  * materializations, streaming micro-batches, ...). Not part of the
  * driver contract; the bench's timing methodology is unchanged.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile q_x q_y"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), s"$desc | $site"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, d) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, d)); ()
        }
      }
    })
    // Experiment knob: override shuffle partitions AFTER session build
    // (streaming state-store layout follows it) to measure sensitivity.
    sys.env.get("SPARK_GRAFT_PROFILE_SHUFFLE")
      .foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    Bench.warmScale(spark, sfDir)
    Bench.resetState(spark)
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] no such gate: $name")
        case Some(fn) =>
          done.clear()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"\n=== $name: $dt%.2f s, ${done.size} jobs ===")
          import scala.jdk.CollectionConverters._
          val jobs = done.asScala.toSeq.sortBy(_._1)
          jobs.foreach { case (id, d, desc) =>
            println(f"  job $id%4d  $d%6.2f s  ${desc.take(140)}")
          }
          println(f"  [sum of job walls: ${jobs.map(_._2).sum}%.2f s — " +
            "overlap/driver time not included]")
          Bench.resetState(spark)
      }
    }
    spark.stop()
  }
}
