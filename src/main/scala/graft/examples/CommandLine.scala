package graft.examples

import graft.feature.{FeatureSelector, RowSelector}
import graft.util.Gen
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.io.Source

/** CLI parity shim for the reference's `CommandLine`
  * (`reference:src/main/scala/ifs/examples/CommandLine.scala:180-245`,
  * SURVEY.md §2 S15) — same two subcommands over headerless integer CSVs,
  * with plain-args parsing (the reference's scallop dependency is not
  * available offline; the flag surface is preserved).
  *
  * {{{
  *   runMain graft.examples.CommandLine gen --rows R --cols C \
  *     [--file conv.csv] [--alt-file alt.csv --labels lab.csv] [--seed S]
  *   runMain graft.examples.CommandLine select --num-features N \
  *     [--file conv.csv] [--alt-file alt.csv --labels lab.csv]
  * }}}
  *
  * `select` with both encodings also prints the reference's own
  * cross-encoding check banner (`reference:CommandLine.scala:167-169`).
  */
object CommandLine {

  private def parseFlags(args: Seq[String]): Map[String, String] =
    args.grouped(2).collect {
      case Seq(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = args.toSeq match {
    case "gen" +: rest => gen(parseFlags(rest))
    case "select" +: rest => select(parseFlags(rest))
    case _ =>
      System.err.println(
        "usage: gen --rows R --cols C [--file F] [--alt-file A --labels L]" +
          " [--seed S] | select --num-features N [--file F]" +
          " [--alt-file A --labels L]")
      sys.exit(2)
  }

  private def gen(f: Map[String, String]): Unit = {
    val alt = (f.get("alt-file"), f.get("labels")) match {
      case (Some(a), Some(l)) => Some((a, l))
      case (None, None) => None
      case _ => sys.error("--alt-file and --labels are codependent")
    }
    require(f.contains("file") || alt.nonEmpty,
      "at least one of --file / --alt-file+--labels is required")
    Gen.randomMatricesToCsv(f("rows").toInt, f("cols").toInt,
      f.get("file"), alt, f.get("seed").map(_.toLong))
  }

  private def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("inferSchema", "true").csv(path)

  private def select(f: Map[String, String]): Unit = {
    val k = f.getOrElse("num-features", "10").toInt
    require(f.contains("file") || f.contains("alt-file"),
      "at least one of --file / --alt-file+--labels is required")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // conventional: col _c0 is the label, the rest are features
    val conv = f.get("file").map { path =>
      val df = readCsv(spark, path).withColumnRenamed("_c0", "label")
      val featureCols = df.columns.filter(_ != "label")
      val assembled = new VectorAssembler()
        .setInputCols(featureCols).setOutputCol("features").transform(df)
      val t0 = System.nanoTime()
      val model = new FeatureSelector()
        .setNumTopFeatures(k)
        .setLabelCol("label").setFeaturesCol("features")
        .setOutputCol("selected")
        .fit(assembled)
      val ms = (System.nanoTime() - t0) / 1e6
      // CSV column i+1 (_c{i+1}) is feature index i
      println(f"conventional selection: " +
        s"${model.selectedFeatures.mkString(", ")}  [${math.round(ms)} ms]")
      model.selectedFeatures.toSeq.map(_.toLong)
    }

    // alternate: one CSV row per feature + a driver-side labels file
    // (read with scala.io.Source, like reference:CommandLine.scala:119-124)
    val alt = f.get("alt-file").map { path =>
      val labelsPath = f.getOrElse("labels",
        sys.error("--alt-file and --labels are codependent"))
      val src = Source.fromFile(labelsPath)
      val labels =
        try src.mkString.trim.split(",").map(_.trim.toDouble)
        finally src.close()
      val df = readCsv(spark, path)
        .withColumn("id", monotonically_increasing_id())
      val assembled = new VectorAssembler()
        .setInputCols(df.columns.filter(_ != "id")).setOutputCol("features")
        .transform(df)
      val t0 = System.nanoTime()
      val model = new RowSelector()
        .setNumTopRows(k).setIdCol("id").setFeaturesCol("features")
        .setLabelVector(labels).setOutputCol("picked")
        .fit(assembled)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"alternate    selection: " +
        s"${model.selectedRows.mkString(", ")}  [${math.round(ms)} ms]")
      model.selectedRows.toSeq
    }

    for (c <- conv; a <- alt) {
      println(if (c == a) "SELECTED FEATURES ARE IDENTICAL"
      else "SELECTED FEATURES DIFFER")
    }
    spark.stop()
  }
}
