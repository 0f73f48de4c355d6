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

    var ranks: DataFrame = nodes.withColumn("rank", lit(init))
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

  /** Exact triangle count via DEGREE-ORDERED edge orientation — the
    * standard bound that makes distributed triangle counting survive
    * skew: orienting every undirected edge from its (degree, id)-smaller
    * endpoint to the larger caps each node's out-degree at O(√m) on any
    * graph (arboricity bound), so the wedge self-join generates
    * O(m^1.5) candidates worst-case instead of Σ deg² — a celebrity
    * node with 10⁸ neighbors contributes no wedges at all as a
    * destination. Orientation by a TOTAL order also makes the count
    * exact-once: in each triangle exactly one vertex precedes both
    * others, so exactly one wedge per triangle is generated, then
    * confirmed with one semi-join against the canonical edge set. Every
    * join is equi-keyed; nothing is collected.
    *
    * Returns one row: (n_nodes, n_edges, n_wedges, n_triangles) —
    * `n_wedges` exposes the candidate volume the orientation is
    * bounding, the number to watch at scale.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = Pin.pin(edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct())
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = Pin.pin(und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("d")))
          .otherwise(struct(col("b").as("s"), col("a").as("d"))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst")))
    // wedges keyed by the triangle's unique source vertex; the dst pair
    // is emitted in id order so it matches the canonical edge key
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("a"), col("e2.dst").as("b"))
    val nW = wedges.agg(count(lit(1)).as("n_wedges"))
    val nT = wedges.join(und, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nN = deg.agg(count(lit(1)).as("n_nodes"))
    val nE = und.agg(count(lit(1)).as("n_edges"))
    nN.crossJoin(nE).crossJoin(nW).crossJoin(nT)
  }
}
