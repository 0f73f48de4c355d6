package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch phase-timer for the streaming gates (dev-only): runs each
  * named gate twice (round 2 = warm) with a StreamingQueryListener that
  * prints every micro-batch's durationMs decomposition (triggerExecution,
  * queryPlanning, addBatch, walCommit, commitOffsets, getBatch,
  * latestOffset) plus state-operator commit times — the numbers that
  * attribute the per-gate micro-batch floor to its parts.
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"  [stream started ${e.name}]")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        val stateStr = p.stateOperators.map { so =>
          s"${so.operatorName}(commit=${so.commitTimeMs}ms rows=${so.numRowsTotal})"
        }.mkString(",")
        println(s"  [batch ${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")}ms " +
          s"plan=${d.get("queryPlanning")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latest=${d.get("latestOffset")} " +
          s"wal=${d.get("walCommit")} offs=${d.get("commitOffsets")} " +
          s"state[$stateStr]")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    Bench.warmScale(spark, dir)
    Bench.resetState(spark)
    val gates = if (args.nonEmpty) args.toSeq
      else Seq("q_stream_hourly", "q_stream_session", "q_stream_join")
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      gates.foreach { g =>
        val t0 = System.nanoTime()
        SparkEntry.queries(g)(spark, dir).count()
        println(f"[$g%-28s] ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        Bench.resetState(spark)
      }
    }
    spark.stop()
  }
}
