package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** pageRankInt vs a driver-side reference implementation of the same
  * integer recurrence — the distributed join-aggregate loop must be
  * bit-identical to the sequential spelling (that equality is what the
  * DuckDB-oracle gate relies on), plus structural properties.
  */
class GraphSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val Scale = 1000000000000L

  /** Sequential reference: same floor divisions, same dropped dangling
    * mass, same teleport term.
    */
  private def refRanks(edges: Seq[(Long, Long)],
                       iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size
    val init = Scale / n
    val teleport = (15L * init) / 100L
    var ranks = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, d) => d -> ranks(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ranks = nodes.map { v =>
        v -> (teleport + (85L * contrib.getOrElse(v, 0L)) / 100L)
      }.toMap
    }
    ranks
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankInt(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap
  }

  behavior of "Graph.pageRankInt"

  it should "match the sequential integer recurrence exactly" in {
    // a cycle with a chord, a dangling sink, and a source-only node
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (3, 5))
    run(edges, 3) shouldBe refRanks(edges, 3)
    run(edges, 1) shouldBe refRanks(edges, 1)
  }

  it should "give symmetric nodes identical ranks" in {
    // 1↔2 and 3↔4 are isomorphic pairs
    val edges = Seq[(Long, Long)]((1, 2), (2, 1), (3, 4), (4, 3))
    val r = run(edges, 3)
    r(1L) shouldBe r(2L)
    r(3L) shouldBe r(4L)
    r(1L) shouldBe r(3L)
  }

  it should "rank the hub of a star above its leaves" in {
    val edges = (2L to 20L).map(i => (i, 1L))
    val r = run(edges, 3)
    val hub = r(1L)
    (2L to 20L).foreach { leaf => hub should be > r(leaf) }
  }

  it should "never exceed total mass of one unit and stay positive" in {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 1), (2, 4))
    val r = run(edges, 3)
    all(r.values) should be > 0L
    r.values.sum should be <= Scale
  }

  it should "reject an empty iteration count" in {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRankInt(Seq((1L, 2L)).toDF("src", "dst"), 0)
  }

  behavior of "Graph.triangleCount"

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Graph.triangleCount(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  it should "count K4's four triangles exactly once each" in {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val (n, e, w, t) = tri(k4)
    (n, e, t) shouldBe ((4L, 6L, 4L))
    w should be >= t
  }

  it should "find no triangles in paths and stars" in {
    tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))._4 shouldBe 0L
    tri((2L to 10L).map(i => (1L, i)))._4 shouldBe 0L
  }

  it should "count edge-sharing triangles separately" in {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val (_, e, _, t) =
      tri(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    e shouldBe 5L
    t shouldBe 2L
  }

  it should "ignore self-loops, duplicates, and edge direction" in {
    val (n, e, _, t) = tri(Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L)))
    (n, e, t) shouldBe ((3L, 3L, 1L))
  }
}
