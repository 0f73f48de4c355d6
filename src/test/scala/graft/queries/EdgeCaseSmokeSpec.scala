package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The round-4→5 lesson, run proactively: the driver REGENERATES testdata
  * between rounds, and a query that silently assumes "many users", "no
  * empty documents", or "no timestamp ties" breaks the day the generator
  * changes. This spec executes EVERY registered query against a tiny
  * edge-case-rich copy of the tables — truncated real data plus injected
  * degenerate rows (empty/one-token/unicode text, duplicate timestamps,
  * a user with a single event) — asserting each query EXECUTES. It is a
  * crash sweep, not a correctness check (the DuckDB oracle gate owns
  * correctness); what it buys is one named failure per fragile query
  * instead of a silent round-wide breakage.
  */
class EdgeCaseSmokeSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  private val src = "/root/testdata/sf0.001"

  private def buildEdgeDir(): String = {
    val s = spark
    val base = java.nio.file.Files
      .createTempDirectory("graft_edge").toString
    val keep = Map(
      "region" -> 10000, "nation" -> 10000, "customer" -> 60,
      "supplier" -> 20, "part" -> 40, "orders" -> 120, "lineitem" -> 300,
      "events" -> 400, "documents" -> 80, "embeddings" -> 60)
    keep.foreach { case (name, n) =>
      val t = s.read.parquet(s"$src/$name.parquet").limit(n)
      val mutated = name match {
        case "documents" =>
          // empty text, single token, unicode, exact duplicate pair
          val extra = t.limit(4).collect()
          val rows = s.createDataFrame(
            java.util.Arrays.asList(extra: _*), t.schema)
          t.unionByName(rows
            .withColumn("doc_id", col("doc_id") + 1000000L)
            .withColumn("text",
              when(col("doc_id") % 4 === 0, lit(""))
                .when(col("doc_id") % 4 === 1, lit("solo"))
                .when(col("doc_id") % 4 === 2, lit("日本語 テキスト 混在 λ ∑"))
                .otherwise(lit("dup dup dup dup dup dup dup dup dup")))
            .withColumn("n_chars",
              org.apache.spark.sql.functions.length(col("text"))
                .cast("long")))
        case "events" =>
          // duplicate timestamps (ties) + a lonely single-event user
          val extra = t.limit(3).collect()
          val rows = s.createDataFrame(
            java.util.Arrays.asList(extra: _*), t.schema)
          t.unionByName(rows
            .withColumn("event_id", col("event_id") + 1000000L)
            .withColumn("user_id", lit(999999L))
            .withColumn("ts", lit(java.sql.Timestamp.valueOf(
              "2024-06-01 12:00:00"))))
        case _ => t
      }
      mutated.coalesce(1).write.mode("overwrite")
        .parquet(s"$base/$name.parquet")
    }
    base
  }

  it should "execute every registered query on edge-case tables" in {
    val s = spark
    val dir = buildEdgeDir()
    try {
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
        case (name, fn) =>
          try { fn(s, dir).count(); () }
          catch { case e: Throwable =>
            failures += s"$name: ${String.valueOf(e).take(200)}"
          }
          graft.Bench.resetState(s)
      }
      withClue(failures.mkString("\n")) { failures shouldBe empty }
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
