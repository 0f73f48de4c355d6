package graft.queries

import graft.ops.Pin
import graft.queries.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink format and table-layout gates: the JSONL corpus format
  * (the lingua franca of LLM training data interchange) and hive-style
  * partitioned layout with partition pruning — the physical-layout
  * levers that decide how much of 100 TB a query actually reads.
  *
  * Both gates write a temporary copy of `documents`, read it back
  * through the alternate source, and aggregate; the oracle runs the
  * same aggregate on the ORIGINAL parquet — so a pass proves the full
  * write→read round trip was lossless, not just that the query ran.
  * Temp dirs are deleted in `finally` after the tiny aggregate is
  * pinned (the q_stream_etl pattern; nothing accumulates across runs).
  */
object SourceQueries {

  private def withTempDir[A](prefix: String)(f: String => A): A = {
    val base = java.nio.file.Files.createTempDirectory(prefix).toString
    try f(base)
    finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
      ()
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // JSONL round trip: write documents as line-delimited JSON, read
    // back with the EXPLICIT original schema (never schema inference —
    // inference is a second full pass over 100 TB), and prove content
    // fidelity per source: row counts, exact char sums, and the number
    // of distinct text md5s all survive the format hop.
    "q_jsonl_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      withTempDir("graft_jsonl") { base =>
        docs.write.mode("overwrite").json(s"$base/out")
        Pin.pin(s.read.schema(docs.schema).json(s"$base/out")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            count_distinct(md5(col("text"))).as("n_distinct_texts"))
          .orderBy("source"))
      }
    },

    // Hive-partitioned layout + partition pruning: write documents
    // partitioned by `lang`, then read ONLY lang='de'. The filter is a
    // partition filter — the scan lists one directory and touches no
    // other partition's files (PlanQualitySpec asserts the pruned scan
    // shape). This is the layout decision that turns "scan 100 TB,
    // filter to 2 TB" into "read 2 TB".
    "q_partitioned_scan" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      withTempDir("graft_part") { base =>
        docs.write.mode("overwrite").partitionBy("lang")
          .parquet(s"$base/out")
        Pin.pin(s.read.parquet(s"$base/out")
          .filter(col("lang") === "de")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("source"))
      }
    })

  val oracles: Map[String, String] = Map(
    "q_jsonl_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS n_distinct_texts
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_partitioned_scan" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE lang = 'de'
        |GROUP BY source
        |ORDER BY source""".stripMargin)
}
