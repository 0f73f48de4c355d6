package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over an edge list — the web-graph quality signals
  * a crawl-derived training corpus is curated with (PageRank-family
  * centrality as a document-quality prior, as in Common Crawl ranking).
  *
  * The iteration is the classic rank ⋈ edges ⋈ outdegree join-aggregate:
  * every join is equi-keyed on the node id, the contribution sum is
  * partial-aggregated map-side, and each iteration's result is pinned
  * (eager localCheckpoint) so lineage — and with it the plan — stays
  * constant-depth no matter how many iterations run. At 100 TB the edge
  * list shuffles once per iteration on `src`; nothing is ever collected
  * to the driver except the node count (one scalar).
  *
  * All arithmetic is EXACT integer math: ranks are maintained as longs in
  * units of 1/`scale`, the damping factor is the rational
  * `dampNum/dampDen`, and every division is integral (floor — operands
  * are non-negative). Floating-point PageRank is order-dependent (a sum
  * over in-neighbors whose grouping differs per engine and per
  * partitioning); the integer form makes three-iteration results
  * bit-identical across engines and across runs, which is what lets the
  * gate hash-match a DuckDB oracle. The deliberate semantic simplification
  * vs canonical PageRank: dangling-node mass is dropped rather than
  * redistributed (ranks then need no global renormalization step), and
  * the teleport term uses the same floor-divided 1/N unit as the initial
  * rank. Both choices are mirrored exactly in any oracle.
  */
object Graph {

  /** Ranks after `iters` synchronous iterations over `edges` (columns
    * `src`, `dst`; must be pre-deduplicated — multi-edges would weight
    * contributions). Returns (node, rank) with rank in units of
    * 1/`scale`.
    */
  def pageRankInt(edges: DataFrame, iters: Int,
                  scale: Long = 1000000000000L,
                  dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = Pin.pin(edges.select(col("src"), col("dst")))
    val nodes = Pin.pin(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val outdeg = Pin.pin(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val n = nodes.count()
    require(n > 0, "pageRankInt over an empty edge list")
    val init = scale / n
    val teleport = ((dampDen - dampNum) * init) / dampDen

    var ranks = nodes.withColumn("rank", lit(init))
    for (_ <- 1 to iters) {
      // Each node's rank splits evenly over its out-edges (floor division
      // — the dropped remainder is the same in every engine), then the
      // incoming shares are summed per destination. Long sums cannot
      // overflow: total mass ≤ scale, and dampNum·scale ≪ 2^63.
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = Pin.pin(nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(c, CAST(0 AS BIGINT))) " +
              s"div $dampDen")).as("rank")))
    }
    ranks
  }
}
