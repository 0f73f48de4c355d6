package graft.util

import java.io.FileWriter
import scala.util.Random

/** Random dataset generator — functional parity with the reference's CSV
  * generator (`reference:src/main/scala/ifs/util/functions.scala:53-75`,
  * SURVEY.md §2 S13): an R×C matrix of single-digit integers written as
  *
  *   - conventional CSV: the matrix as-is (column 0 is the label);
  *   - alternate CSV: the transposed matrix minus its first row;
  *   - labels CSV: the first row of the transposed matrix (the label
  *     column of the conventional matrix, as one comma-separated line).
  *
  * Pure JVM — runs without Spark, like the reference (`README.md:72`).
  * Deviation (documented): the RNG is seedable for reproducible fixtures;
  * the reference uses the global unseeded `Random`.
  */
object Gen {

  def randomMatrix(rows: Int, cols: Int, seed: Option[Long] = None)
  : Vector[Vector[Int]] = {
    val rnd = seed.map(new Random(_)).getOrElse(Random)
    Vector.fill(rows, cols)(rnd.nextInt(10))
  }

  def randomMatricesToCsv(rows: Int, cols: Int,
                          convFile: Option[String],
                          altFiles: Option[(String, String)],
                          seed: Option[Long] = None): Unit = {
    val data = randomMatrix(rows, cols, seed)
    convFile.foreach { file =>
      write(file, data.map(_.mkString(",")).mkString("\n"))
    }
    altFiles.foreach { case (matrixFile, labelFile) =>
      val alt = data.transpose.map(_.mkString(","))
      write(matrixFile, alt.drop(1).mkString("\n"))
      write(labelFile, alt.head)
    }
  }

  private def write(path: String, content: String): Unit = {
    val w = new FileWriter(path)
    try w.write(content) finally w.close()
  }
}
