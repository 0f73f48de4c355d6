package graft.queries

import graft.ops.Similarity
import graft.queries.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Similarity-search queries over `embeddings` (64-dim float vectors):
  * exact brute-force cosine top-k (DuckDB-oracled via list_dot_product),
  * per-label centroids, and the ANN/LSH approximate paths.
  *
  * The approximate queries are HASH-CHECKABLE gates, not rows-only: each
  * runs its ANN machinery, measures recall against the exact top-k
  * computed in the same query, and emits the exact rows (SQL-expressible)
  * plus a `recall_ok` boolean — constant TRUE while the seeded machinery
  * meets its bound (measured with ≥15% margin across sf0.001/0.01/0.1 via
  * graft.examples.ContractProbe), flipping the hash compare red if recall
  * ever regresses. The oracle side is plain exact-kNN SQL + literal TRUE.
  */
object EmbeddingQueries {

  private val K = 5
  private val NQueries = 5
  private val NearDupCosine = 0.45
  private val SemClusters = 16
  private val PcaScale = 1000L
  private val PcaIters = 3

  /** Shared engine core of the PCA pair: the leading direction by
    * integer power iteration over `embQ` (rows carry a `vi` long-array
    * column = round(v·PcaScale)). Each iteration is one scan + a
    * dim-grouped DECIMAL(38,0) aggregate; the driver holds `d` BigInts
    * and re-quantizes as sign(y)·((|y|·PcaScale) div max|y|) — exact,
    * no floating point anywhere (see q_emb_pca_power's gate doc).
    */
  private def powerDirection(embQ: DataFrame, d: Int): Array[BigInt] = {
    var x = Array.fill(d)(BigInt(PcaScale))
    for (_ <- 1 to PcaIters) {
      val xlit = array(x.map(v => lit(v.toLong)): _*)
      val y = embQ
        .withColumn("dot", aggregate(zip_with(col("vi"), xlit,
          (a, b) => a * b), lit(0L), (acc, v) => acc + v))
        .select(col("dot"), posexplode(col("vi")).as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(sum((col("v") * col("dot"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("y"))
        .collect()
        .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
        .toMap
      val ys = (0 until d).map(i => y.getOrElse(i, BigInt(0)))
      val m = ys.map(_.abs).max
      if (m > 0)
        x = ys.map(v => (if (v < 0) -BigInt(1) else BigInt(1)) *
          ((v.abs * PcaScale) / m)).toArray
    }
    x
  }

  /** round(v·PcaScale) long-array projection of `embeddings`. */
  private def quantized(df: DataFrame, extraCols: Column*): DataFrame =
    graft.ops.Pin.pin(df.select(extraCols :+
      transform(col("embedding"),
        v => round(v.cast("double") * PcaScale, 0).cast("long"))
        .as("vi"): _*))

  /** Shared oracle core: the WITH-clause body (e/flat/x0/x1..x3 CTEs)
    * of the unrolled HUGEINT power method; `eExtra` adds columns to the
    * quantized-rows CTE (e.g. label for the projection gate).
    */
  private def pcaCtes(eExtra: String): String = {
    def iter(k: Int): String = {
      val prev = s"x${k - 1}"
      s"""d$k AS (
         |  SELECT f.rid, SUM(f.v * x.xv) AS dot
         |  FROM flat f JOIN $prev x ON f.i = x.dim + 1
         |  GROUP BY f.rid),
         |y$k AS (
         |  SELECT f.i - 1 AS dim, SUM(f.v * d.dot) AS y
         |  FROM flat f JOIN d$k d ON f.rid = d.rid
         |  GROUP BY 1),
         |m$k AS (SELECT max(abs(y)) AS m FROM y$k),
         |x$k AS (
         |  SELECT dim,
         |    (CASE WHEN y < 0 THEN -1 ELSE 1 END) *
         |      ((abs(y) * $PcaScale) // m) AS xv
         |  FROM y$k, m$k)""".stripMargin
    }
    s"""e AS (
       |  SELECT row_number() OVER () AS rid,$eExtra
       |    list_transform(embedding,
       |      v -> CAST(round(CAST(v AS DOUBLE) * $PcaScale, 0) AS BIGINT))
       |      AS vi
       |  FROM embeddings),
       |flat AS (
       |  SELECT rid, i, vi[i] AS v
       |  FROM e, unnest(range(1, len(vi) + 1)) AS u(i)),
       |x0 AS (
       |  SELECT DISTINCT i - 1 AS dim, CAST($PcaScale AS HUGEINT) AS xv
       |  FROM flat),
       |${(1 to PcaIters).map(iter).mkString(",\n")}""".stripMargin
  }

  /** Fixed-size deterministic audit sample for the exact near-dup truth:
    * the `AuditSample` vectors with the smallest md5(vec_id) — the same
    * rows in any engine, and a BOUNDED quadratic (≤ AuditSample² pairs)
    * no matter the corpus size.
    */
  private val AuditSample = 1000

  /** Exact top-K rows for the first NQueries vectors, plus one constant
    * `recall_ok` column: overall recall of `ann`'s (qid, id) pairs over
    * the exact rows (optionally restricted to rows with sim ≥ simFloor —
    * for candidate generators whose radius excludes weak true neighbors)
    * is ≥ `pctBound`/100. Integer arithmetic on both sides of the
    * comparison, so no FP boundary can flip the boolean.
    */
  private def exactKnnWithRecall(s: SparkSession, dir: String,
                                 ann: DataFrame, annIdCol: String,
                                 pctBound: Int,
                                 simFloor: Option[Double] = None,
                                 okCol: String = "recall_ok"): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // Pinned: `exact` is referenced twice (recall join via `must`, final
    // emit) — without the pin the brute-force kNN executes per reference.
    val exact = graft.ops.Pin.pin(Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < NQueries), "vec_id", "embedding", K))
    val found = ann
      .select(col("qid").as("fq"), col(annIdCol).cast("long").as("fi"))
      .distinct()
    val must = simFloor.map(f => exact.filter(col("sim") >= f))
      .getOrElse(exact)
    val flag = must
      .join(found, col("qid") === col("fq") && col("vec_id") === col("fi"),
        "left")
      .agg((sum(when(col("fi").isNotNull, 1).otherwise(0)) * 100 >=
        count(lit(1)) * pctBound).as(okCol))
    exact.crossJoin(broadcast(flag))
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"), col(okCol))
      .orderBy("qid", "rnk")
  }

  /** Exact-kNN oracle SQL with a constant contract column appended. */
  private def knnOracle(okCol: String): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM e WHERE vec_id < $NQueries),
       |p AS (
       |  SELECT q.qid, e.vec_id,
       |    round(list_dot_product(e.e, q.qe) /
       |      (sqrt(list_dot_product(e.e, e.e)) *
       |       sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
       |  FROM e, q WHERE e.vec_id <> q.qid),
       |r AS (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid
       |                       ORDER BY sim DESC, vec_id) AS rnk
       |  FROM p)
       |SELECT qid, rnk, vec_id, sim, TRUE AS $okCol FROM r
       |WHERE rnk <= $K
       |ORDER BY qid, rnk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Leading principal direction by INTEGER power iteration — PCA's
    // workhorse step, made hash-exact: embeddings quantize once to
    // round(v·1000) longs; each of the 3 iterations computes
    // y = Xᵀ(X·x) with integer dots (zip_with + aggregate, codegen'd)
    // and DECIMAL(38,0) sums (exact at any row count), then re-quantizes
    // the direction on the driver as sign(y)·((|y|·1000) div max|y|) —
    // all-integer, so both engines land on identical bits with NO
    // floating-point mirroring anywhere. Per iteration the cluster work
    // is one scan + a 64-group aggregate; the driver holds 64 longs
    // (the IFS driver-loop pattern, not a data collect). The oracle
    // unrolls the 3 iterations over HUGEINT arithmetic.
    "q_emb_pca_power" -> { (s, dir) =>
      val embQ = quantized(t(s, dir, "embeddings"))
      val d = embQ.select(size(col("vi"))).head().getInt(0)
      val x = powerDirection(embQ, d)
      import s.implicits._
      x.zipWithIndex
        .map { case (w, i) => (i.toLong, w.toLong) }.toSeq
        .toDF("dim", "weight")
        .orderBy("dim")
    },

    // PCA projection — the feature-extraction half of q_emb_pca_power:
    // every vector's integer dot with the 3-iteration principal
    // direction, rolled up per label (count, exact integer sum, min/max
    // of the projection). Separated label means along the top component
    // is the classic "is this embedding space linearly separable"
    // screen. Same all-integer arithmetic: one more scan with a
    // zip_with dot against the broadcast direction literal.
    "q_emb_pca_project" -> { (s, dir) =>
      val embQ = quantized(t(s, dir, "embeddings"),
        col("vec_id"), col("label"))
      val d = embQ.select(size(col("vi"))).head().getInt(0)
      val x = powerDirection(embQ, d)
      val xlit = array(x.map(v => lit(v.toLong)): _*)
      embQ
        .withColumn("proj", aggregate(zip_with(col("vi"), xlit,
          (a, b) => a * b), lit(0L), (acc, v) => acc + v))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("proj")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("decimal(38,0)").cast("double").as("sum_proj"),
          min(col("proj")).as("min_proj"),
          max(col("proj")).as("max_proj"))
        .select(col("label").cast("long").as("label"), col("n"),
          col("sum_proj"), col("min_proj"), col("max_proj"))
        .orderBy("label")
    },

    // Exact cosine top-5 neighbors for the first 5 vectors.
    "q_emb_knn" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < NQueries), "vec_id", "embedding", K)
        .orderBy("qid", "rnk")
    },

    // Int8 quantization fidelity: per-label counts of quantized vectors,
    // total quantized mass and worst per-vector scale — checks the whole
    // quantize pipeline (per-vector max-abs scaling, half-up rounding,
    // tinyint range) against the oracle's identical arithmetic.
    "q_emb_quantize" -> { (s, dir) =>
      val q = Similarity.quantizeInt8(
        t(s, dir, "embeddings").select(col("vec_id"), col("label"),
          col("embedding")), "vec_id", "embedding")
      q.join(t(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
        .select(col("label"), col("scale"),
          aggregate(col("q"), lit(0L), (acc, x) =>
            acc + abs(x.cast("long"))).as("mass"),
          array_max(col("q")).cast("long").as("qmax"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("mass")).cast("long").as("total_mass"),
          max(col("qmax")).as("max_q"),
          round(max(col("scale")), 9).as("max_scale"))
        .orderBy("label")
    },

    // Per-label centroid norm + cohesion stats.
    "q_emb_centroid" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("label"), col("embedding").cast("array<double>").as("e"))
      val dims = e.select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(avg(col("v")).as("m"))
        .groupBy("label")
        .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
      val counts = e.groupBy("label").agg(count(lit(1)).as("n"))
      counts.join(dims, "label")
        .select("label", "n", "centroid_norm")
        .orderBy("label")
    },

    // Embedding-cosine near-duplicate detection (dedup family), BOUNDED
    // at any corpus size: everything runs on a fixed-size md5-ordered
    // audit sample (deterministic, SQL-expressible), never the unbounded
    // O(n²) full-corpus join the r3 gate had. Output = the sample's exact
    // pairs + lsh_recall_ok: the random-projection-LSH path re-finds ≥80%
    // of them on the same sample (measured 86–100% across sfs).
    //
    // Why the LSH is NOT run full-corpus here: this corpus's near-dups
    // sit at cosine ≈ 0.5 over a random tail reaching 0.45, so at the
    // 0.45 threshold the dup:random per-projection collision ratio is
    // ~1.3 — no LSH/ANN family is selective at that contrast (measured:
    // full-corpus LSH candidates degrade toward all-pairs, 421 s at 20k
    // vectors) and "all pairs ≥ τ-in-the-noise-tail" is inherently Θ(n²).
    // At production dedup thresholds (τ ≥ 0.8, where near-dups are truly
    // near) the full-corpus LSH shape is selective and linear — that
    // regime is exercised in SimilaritySpec.
    "q_emb_cosine_neardup" -> { (s, dir) =>
      // Pinned ×2 (the q_ann_* audit-twin accounting): the sample feeds
      // both the exact and the LSH side, and the exact all-pairs truth
      // is consumed by the recall flag AND the emitted rows — unpinned,
      // the quadratic audit join executed twice per run.
      val sample = graft.ops.Pin.pin(t(s, dir, "embeddings")
        .orderBy(md5(col("vec_id").cast("string")))
        .limit(AuditSample))
      val truth = graft.ops.Pin.pin(Similarity.cosineNearDupPairs(sample,
        "vec_id", "embedding", minCosine = NearDupCosine))
      val lsh = Similarity.cosineNearDupLsh(sample, "vec_id", "embedding",
          minCosine = NearDupCosine)
        .select(col("id_a").as("fa"), col("id_b").as("fb")).distinct()
      val flag = truth
        .join(lsh, col("id_a") === col("fa") && col("id_b") === col("fb"),
          "left")
        .agg((sum(when(col("fa").isNotNull, 1).otherwise(0)) * 100 >=
          count(lit(1)) * 80).as("lsh_recall_ok"))
      truth.crossJoin(broadcast(flag))
        .select(col("id_a"), col("id_b"), col("sim"), col("lsh_recall_ok"))
        .orderBy("id_a", "id_b")
    },

    // SemDeDup semantic dedup (cluster → prune within cluster): per-
    // cluster member counts and how many a keep-lowest-id pass at the
    // near-dup threshold drops. Centroids are FIXED (unit vectors with
    // id < SemClusters) so the oracle reproduces assignment relationally;
    // at 100 TB the driver-trained spherical-KMeans quantizer (k ≈ √n)
    // slots in and the within-cluster equi-join — the part that bounds
    // the quadratic — is unchanged.
    "q_semantic_dedup" -> { (s, dir) =>
      graft.ops.SemanticDedup.semanticDedupStats(t(s, dir, "embeddings"),
        "vec_id", "embedding", SemClusters, NearDupCosine)
    },

    // Embedding-space source drift: cosine of each label's centroid
    // against the global centroid — the embedding twin of
    // q_js_divergence's token-distribution drift, and the statistic that
    // catches a domain whose vectors have wandered from the corpus mean.
    // Everything is dimension-keyed aggregation (labels×dims rows, never
    // corpus-sized intermediate); the 64-row global centroid broadcasts.
    "q_emb_label_drift" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("label"), col("embedding").cast("array<double>").as("e"))
      val d = e.select(col("label"),
        posexplode(col("e")).as(Seq("pos", "v")))
      val ld = d.groupBy("label", "pos").agg(avg("v").as("m"))
      val gd = d.groupBy("pos").agg(avg("v").as("g"))
      val mom = ld.join(broadcast(gd), "pos")
        .groupBy("label")
        .agg(sum(col("m") * col("g")).as("smg"),
          sum(col("m") * col("m")).as("smm"),
          sum(col("g") * col("g")).as("sgg"))
      e.groupBy("label").agg(count(lit(1)).as("n"))
        .join(mom, "label")
        .select(col("label"), col("n"),
          round(col("smg") / (sqrt(col("smm")) * sqrt(col("sgg"))), 6)
            .as("drift_cosine"))
        .orderBy("label")
    },

    // Cluster-quality audit: simplified (centroid-based) silhouette per
    // cluster over the same fixed centroid set as q_semantic_dedup — the
    // statistic that tells a curation pipeline whether its semantic
    // clusters are tight enough to trust before dedup/splitting on them.
    // O(n·k) broadcast cross, never the O(n²) full silhouette.
    "q_emb_silhouette" -> { (s, dir) =>
      graft.ops.SemanticDedup.simplifiedSilhouette(t(s, dir, "embeddings"),
        "vec_id", "embedding", SemClusters)
    },

    // MMR diverse top-3 out of the 10 nearest candidates (λ = 0.7): the
    // de-redundancy selection a training-data sampler runs where plain
    // top-k returns near-copies. Oracle unrolls the 3 greedy rounds as
    // chained CTEs (same technique as the ifs_select_topk oracle).
    "q_emb_mmr" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.mmrTopK(emb,
        emb.filter(col("vec_id") < NQueries), "vec_id", "embedding",
        kCand = 10, kOut = 3, lambda = 0.7)
    },

    // Per-dimension profiling: top-5 highest-variance dimensions — the
    // quick feature-quality diagnostic before selection/quantization.
    "q_emb_dim_stats" -> { (s, dir) =>
      // moments through exact SCALED-LONG sums (the graft.stats
      // .Correlation trick): a plain double avg() is partition-order
      // dependent, and here the FP value decides which rows survive the
      // LIMIT — the one place a boundary flip would change the emitted
      // ROWS, not just a decimal. Each value rounds ONCE to 1e-6 grain
      // as an integer-valued double (|v|≤~30 ⇒ scaled ≤3e7, squares
      // ≤9e14 < 2^53, exact); longs sum on DECIMAL(38,0)'s compact
      // path — no BigDecimal per element, 3-4× faster than the former
      // DECIMAL(28,12) casts. The 10^6 factors divide back out in ONE
      // fixed association mirrored by the oracle, and round(·) on
      // doubles is HALF_UP away-from-zero in both engines, so the sums
      // — and therefore the LIMIT boundary — are bit-identical.
      val sv = round(col("v") * 1e6, 0)
      t(s, dir, "embeddings")
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum(sv.cast("long")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double").as("s1"),
          sum((sv * sv).cast("long")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double").as("s2"))
        .withColumn("m", col("s1") / col("n") / lit(1e6))
        .select(col("dim").cast("long").as("dim"), col("n"),
          round(col("m"), 6).as("mean"),
          round(col("s2") / col("n") / lit(1e12) - col("m") * col("m"), 6)
            .as("variance"))
        .orderBy(col("variance").desc, col("dim"))
        .limit(5)
    },

    // IVF ANN gate: probe 8 of 16 cells (the probe ratio is the accuracy
    // knob — it holds as nList grows with the corpus), measure recall of
    // the exact top-5 in the probed results, emit exact rows + the bound
    // (≥60%; measured 76–92% across sfs — the corpus is near-random, the
    // ANN worst case).
    "q_emb_ivf_ann" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      exactKnnWithRecall(s, dir,
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < NQueries),
          "vec_id", "embedding", K, nProbe = 8),
        "vec_id", pctBound = 60)
    },

    // PERSISTED-INDEX ANN serving (r11 verdict #5, the ANN half of the
    // incremental-corpus story): (a) build + SAVE the IVF index over the
    // corpus split (vec_id % 5 != 0) — centroids + inverted cells as
    // parquet; (b) answer a NEW query batch (vec_id % 5 == 0) against
    // the LOADED index, never touching the corpus embeddings
    // (AnnIndexSpec proves it by deleting the corpus input between
    // build and query); (c) pin the loaded answer against the in-memory
    // operator's (`loaded_agrees` — bit-identical ranks and sims, same
    // seeded quantizer) AND the exact cross-split top-K recall bound
    // (≥60% at the 8/16 probe ratio, q_emb_ivf_ann's contract). The
    // oracle emits the exact cross brute-force rows with both flags
    // pinned TRUE.
    "q_ann_index_reuse" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 5 =!= 0)
      val batch = emb.filter(col("vec_id") % 5 === 0 &&
        col("vec_id") < NQueries * 5)
      val idxPath = System.getProperty("java.io.tmpdir") +
        "/graft_ivf_idx_" + Integer.toHexString(dir.hashCode)
      graft.ops.AnnIndex.buildAndSaveIvf(corpus, "vec_id", "embedding",
        idxPath)
      val via = graft.ops.AnnIndex.queryIvf(s, batch, "vec_id",
        "embedding", idxPath, K, nProbe = 8)
      val fresh = Similarity.ivfTopK(corpus, batch, "vec_id",
        "embedding", K, nProbe = 8)
      // exact multiset equality: every (qid, rnk, id, sim) row must
      // appear in BOTH the loaded-index and the in-memory answer
      val agree = via.union(fresh)
        .groupBy("qid", "rnk", "vec_id", "sim").count()
        .filter(col("count") =!= 2).isEmpty
      val exact = graft.ops.Pin.pin(Similarity.bruteForceTopK(
        corpus, batch, "vec_id", "embedding", K))
      val found = via.select(col("qid").as("fq"),
        col("vec_id").cast("long").as("fi")).distinct()
      val flag = exact
        .join(found,
          col("qid") === col("fq") && col("vec_id") === col("fi"), "left")
        .agg((sum(when(col("fi").isNotNull, 1).otherwise(0)) * 100 >=
          count(lit(1)) * 60).as("recall_ok"))
      exact.crossJoin(broadcast(flag))
        .select(col("qid"), col("rnk"), col("vec_id"), col("sim"),
          col("recall_ok"), lit(agree).as("loaded_agrees"))
        .orderBy("qid", "rnk")
    },

    // ANN INDEX MAINTENANCE (r12 verdict #4, the IVF sibling of
    // q_dedup_maintenance): BUILD the persisted IVF on one corpus split
    // (vec_id % 5 ∈ {1,2}), APPEND a second ({3,4} — FAISS add(), the
    // quantizer stays as trained), DELETE a slice (% 10 == 1,
    // tombstones), query, COMPACT (physical reclaim + cell-file
    // re-pack), query again. Output rows are the EXACT brute-force
    // top-K over the SURVIVING corpus (full SQL oracle); the
    // maintained-index answers ride in as flags: `tombstones_honored`
    // (no deleted id served, before AND after compaction),
    // `compact_preserves` (post ≡ pre, bit-exact), `recall_ok` (≥60%
    // of exact top-K at the 8/16 probe ratio), plus the compaction
    // ledger (kept/dead) cross-checked against SQL counts.
    "q_ann_maintenance" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val part1 = emb.filter((col("vec_id") % 5).isin(1L, 2L))
      val part2 = emb.filter((col("vec_id") % 5).isin(3L, 4L))
      val batch = emb.filter(col("vec_id") % 5 === 0 &&
        col("vec_id") < NQueries * 5)
      val idxPath = System.getProperty("java.io.tmpdir") +
        "/graft_ivf_maint_" + Integer.toHexString(dir.hashCode)
      val A = graft.ops.AnnIndex
      A.buildAndSaveIvf(part1, "vec_id", "embedding", idxPath)
      // Centroids are written once by the build and never touched by
      // append/delete/compact — load the quantizer ONCE for the whole
      // cycle instead of per step (answers provably identical).
      val cents = A.loadCentroids(s, idxPath)
      A.appendToIvfWith(s, part2, "vec_id", "embedding", idxPath, cents)
      A.deleteFromIvf(s,
        emb.filter(col("vec_id") % 10 === 1).select("vec_id"),
        "vec_id", idxPath)
      // materialized before the compact mutates the index on disk (the
      // q_dedup_maintenance lesson — Pin is disabled under plan audits)
      val pre = A.queryIvfWith(s, batch, "vec_id", "embedding", idxPath,
        cents, K, nProbe = 8).localCheckpoint(true)
      val (kept, dead) = A.compactIvf(s, idxPath)
      val post = A.queryIvfWith(s, batch, "vec_id", "embedding", idxPath,
        cents, K, nProbe = 8)
      val compactPreserves = post.union(pre)
        .groupBy("qid", "rnk", "vec_id", "sim").count()
        .filter(col("count") =!= 2).isEmpty
      val tombstonesHonored =
        pre.filter(col("vec_id") % 10 === 1).isEmpty &&
          post.filter(col("vec_id") % 10 === 1).isEmpty
      val survivors = emb.filter(col("vec_id") % 5 =!= 0 &&
        col("vec_id") % 10 =!= 1)
      val exact = graft.ops.Pin.pin(Similarity.bruteForceTopK(
        survivors, batch, "vec_id", "embedding", K))
      val found = post.select(col("qid").as("fq"),
        col("vec_id").cast("long").as("fi")).distinct()
      val flag = exact
        .join(found,
          col("qid") === col("fq") && col("vec_id") === col("fi"), "left")
        .agg((sum(when(col("fi").isNotNull, 1).otherwise(0)) * 100 >=
          count(lit(1)) * 60).as("recall_ok"))
      exact.crossJoin(broadcast(flag))
        .select(col("qid"), col("rnk"), col("vec_id"), col("sim"),
          col("recall_ok"),
          lit(compactPreserves).as("compact_preserves"),
          lit(tombstonesHonored).as("tombstones_honored"),
          lit(kept).as("kept_vecs"), lit(dead).as("dead_vecs"))
        .orderBy("qid", "rnk")
    },

    // STREAMING ANN ingest — the vector-side twin of
    // q_stream_ingest_dedup, closing the nightly cycle for BOTH
    // persisted indexes as one Structured Streaming job each: new
    // vector batches arrive as an ordered file stream (pinned
    // modification times, maxFilesPerTrigger=1) and each micro-batch is
    // QUERIED against the loaded IVF index BEFORE being appended to it
    // (queryIvf → appendToIvf inside foreachBatch, append guarded per
    // batchId). Batch 2's retrieved neighbors can include batch 1's
    // vectors ONLY if the mid-stream append took effect, and the
    // emitted rows are the exact per-scope kNN truth — each query's
    // neighbors drawn from strictly-older ranks (0 = corpus %5∈{1,2},
    // 1 = first batch %5=3, 2 = second %5=4) — with
    // `stream_recall_ok` (≥60% of that truth retrieved at the 8/16
    // probe ratio) and `ingest_order_ok` (no neighbor from the query's
    // own or a newer rank) pinned in-row.
    "q_stream_ann_ingest" -> { (s, dir) =>
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter((col("vec_id") % 5).isin(1L, 2L))
      val bound = NQueries * 10
      val b1 = emb.filter(col("vec_id") % 5 === 3 &&
        col("vec_id") < bound)
      val b2 = emb.filter(col("vec_id") % 5 === 4 &&
        col("vec_id") < bound)
      val tmp = System.getProperty("java.io.tmpdir")
      val tag = Integer.toHexString(dir.hashCode)
      val idxPath = s"$tmp/graft_ivf_stream_idx_$tag"
      val streamDir = s"$tmp/graft_ivf_stream_in_$tag"
      val ckptDir = s"$tmp/graft_ivf_stream_ckpt_$tag"
      val A = graft.ops.AnnIndex
      val hconf = s.sparkContext.hadoopConfiguration
      def rmrf(p: String): Unit = {
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(hconf)
        if (fs.exists(hp)) { fs.delete(hp, true); () }
      }
      Seq(streamDir, ckptDir).foreach(rmrf)
      A.buildAndSaveIvf(corpus, "vec_id", "embedding", idxPath)
      def writeIngestFile(batch: DataFrame, name: String,
                          modTime: Long): Unit = {
        val staging = s"$streamDir/_stage_$name"
        batch.coalesce(1).write.mode("overwrite").parquet(staging)
        val sp = new org.apache.hadoop.fs.Path(staging)
        val fs = sp.getFileSystem(hconf)
        val part = fs.listStatus(sp).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"no parquet part written under $staging"))
        val dest = new org.apache.hadoop.fs.Path(s"$streamDir/$name")
        fs.rename(part, dest)
        fs.delete(sp, true)
        fs.setTimes(dest, modTime, -1)
        ()
      }
      val cols = emb.select("vec_id", "embedding")
      writeIngestFile(b1.select("vec_id", "embedding"),
        "ingest1.parquet", 1000000L)
      writeIngestFile(b2.select("vec_id", "embedding"),
        "ingest2.parquet", 2000000L)
      val found = new java.util.concurrent.ConcurrentHashMap[
        java.lang.Long, Array[(Long, Long)]]()
      val appended = java.util.concurrent.ConcurrentHashMap
        .newKeySet[java.lang.Long]()
      val stream = s.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", streamDir)
        .parquet(s"$streamDir/*.parquet")
      // Quantizer never changes after the build (append only grows the
      // cells) — load it ONCE outside the stream instead of twice per
      // micro-batch (query + append each paid the read+collect).
      val idxCents = A.loadCentroids(s, idxPath)
      val q = stream.writeStream
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val got = A.queryIvfWith(s, df, "vec_id", "embedding", idxPath,
              idxCents, K, nProbe = 8)
            .select(col("qid"), col("vec_id").cast("long"))
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          found.put(batchId, got) // idempotent: replace, not append
          if (appended.add(batchId)) // fold in exactly once per batchId
            A.appendToIvfWith(s, df, "vec_id", "embedding", idxPath,
              idxCents)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      val foundPairs = found.values().asScala.flatten.toSeq
        .toDF("fq", "fi").distinct()
      def rank(c: org.apache.spark.sql.Column) =
        when((c % 5).isin(1L, 2L), 0).when(c % 5 === 3, 1).otherwise(2)
      val orderOk = foundPairs
        .filter(rank(col("fi")) >= rank(col("fq"))).isEmpty
      // exact per-scope truth: batch 1 against the corpus, batch 2
      // against corpus + batch 1 — the rows the stream must recall
      val exact = graft.ops.Pin.pin(
        Similarity.bruteForceTopK(corpus, b1, "vec_id", "embedding", K)
          .union(Similarity.bruteForceTopK(corpus.union(b1), b2,
            "vec_id", "embedding", K)))
      val flag = exact
        .join(foundPairs,
          col("qid") === col("fq") &&
            col("vec_id").cast("long") === col("fi"), "left")
        .agg((sum(when(col("fi").isNotNull, 1).otherwise(0)) * 100 >=
          count(lit(1)) * 60).as("stream_recall_ok"))
      exact.crossJoin(broadcast(flag))
        .select(col("qid"), col("rnk"), col("vec_id"), col("sim"),
          col("stream_recall_ok"), lit(orderOk).as("ingest_order_ok"))
        .orderBy("qid", "rnk")
    },

    // PQ ANN gate: 16 subspaces × 256 codes → 16 bytes per vector (32×
    // compression vs float64), ADC scan over-fetching top-20 candidates
    // for exact re-rank (the standard recall@k-in-top-k' serving shape).
    // Bound ≥80% of exact top-5 among the 20 (measured 96–100%).
    "q_emb_pq_ann" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      exactKnnWithRecall(s, dir,
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < NQueries),
          "vec_id", "embedding", 4 * K, m = 16, kCode = 256),
        "vec_id", pctBound = 80)
    },

    // IVF-PQ gate: coarse-cell pruning over the PQ-coded corpus — the
    // FAISS-style layout billion-vector serving uses. Probe 8 cells,
    // top-20 over-fetch; bound ≥50% (measured 64–84%: cell misses and
    // code distortion compound on near-random data).
    "q_emb_ivfpq_ann" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      exactKnnWithRecall(s, dir,
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < NQueries),
          "vec_id", "embedding", 4 * K, nProbe = 8, kCode = 256),
        "vec_id", pctBound = 50)
    },

    // LSH candidate-generation gate: recall measured over exact neighbors
    // within the radius' reach (sim ≥ 0.16 ⇔ L2 < 1.3 on unit vectors,
    // with margin off the boundary); bound ≥80% (measured 96–100%).
    "q_emb_lsh_ann" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      exactKnnWithRecall(s, dir,
        Similarity.lshCandidates(emb, emb.filter(col("vec_id") < NQueries),
          "vec_id", "embedding", maxL2 = 1.3),
        "nid", pctBound = 80, simFloor = Some(0.16))
    },

    // Hybrid retrieval — reciprocal-rank fusion of a LEXICAL ranking
    // (the frozen q_bm25_topk scoring, term probes per query) with a
    // VECTOR ranking (exact cosine top-50, query = the embedding of
    // doc qid), the fusion every RAG stack runs when neither BM25 nor
    // embeddings alone suffice. RRF(d) = Σ_list 1/(60 + rank_d) over
    // exact integer ranks, so the fused score is a sum of two exact
    // rationals — deterministic without any rounding of intermediate
    // scores; the fused top-10 carries a doc_id tiebreak. Both input
    // rankings use their long-green spellings (9-dp comp sums for
    // BM25, 6-dp cosine); fusion adds one full-outer join of two
    // ≤50-row-per-query lists — driver-free and constant-size.
    "q_hybrid_rrf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val probes = s.createDataFrame(Seq(
        (1L, "data"), (1L, "scan"), (1L, "slow"),
        (2L, "order"), (2L, "fast"),
        (3L, "query"), (3L, "column"), (3L, "stream"), (3L, "merge")))
        .toDF("qid", "term")
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val tot = dl.agg(count(lit(1)).as("n_docs"),
        sum("dl").as("tot_len"))
      val terms = probes.select("term").distinct()
      val tf = toks.join(broadcast(terms), col("tok") === col("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val wb = Window.partitionBy("qid")
        .orderBy(desc("score"), col("doc_id"))
      val bm25 = tf.join(broadcast(probes), "term")
        .join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(tot))
        .withColumn("idf", log(
          (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("norm", lit(0.25) + lit(0.75) *
          (col("dl").cast("double") * col("n_docs") / col("tot_len")))
        .withColumn("comp", round(
          col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * col("norm")), 9))
        .groupBy("qid", "doc_id")
        .agg(dsumPre(col("comp"), 9).as("sum_comp"))
        .withColumn("score", round(col("sum_comp"), 6))
        .withColumn("rb", row_number().over(wb))
        .filter(col("rb") <= 50)
        .select(col("qid"), col("doc_id"), col("rb").cast("long").as("rb"))
      val emb = t(s, dir, "embeddings")
      val vec = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id").isin(1L, 2L, 3L)),
          "vec_id", "embedding", 50)
        .select(col("qid"), col("vec_id").as("doc_id"),
          col("rnk").as("rv"))
      val wf = Window.partitionBy("qid")
        .orderBy(desc("rrf"), col("doc_id"))
      bm25.join(vec, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0)))
        .withColumn("rnk", row_number().over(wf))
        .filter(col("rnk") <= 10)
        .select(col("qid"), col("rnk").cast("long").as("rnk"),
          col("doc_id"),
          col("rb").isNotNull.as("in_bm25"),
          col("rv").isNotNull.as("in_vec"),
          round(col("rrf"), 9).as("rrf"))
        .orderBy("qid", "rnk")
    },
  )

  def oracles: Map[String, String] = Map(
    // Both input rankings reuse their long-green spellings; fusion is
    // exact-integer ranks through CAST(1 AS DOUBLE)/(60+rank) — the
    // explicit DOUBLE cast matters: DuckDB's bare 1.0 literal is
    // DECIMAL and would divide in decimal arithmetic.
    "q_hybrid_rrf" ->
      """WITH probes(qid, term) AS (
        |  VALUES (1, 'data'), (1, 'scan'), (1, 'slow'),
        |         (2, 'order'), (2, 'fast'),
        |         (3, 'query'), (3, 'column'), (3, 'stream'),
        |         (3, 'merge')),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tok2 AS (SELECT * FROM tok WHERE tok <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
        |tot AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_len
        |  FROM dl),
        |tf AS (
        |  SELECT t.doc_id, t.tok AS term, count(*) AS tf
        |  FROM tok2 t
        |  JOIN (SELECT DISTINCT term FROM probes) q ON t.tok = q.term
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |comp AS (
        |  SELECT p.qid, f.doc_id,
        |    round(
        |      ln((t.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
        |      (f.tf * 2.2) /
        |      (f.tf + 1.2 * (0.25 + 0.75 *
        |        (CAST(l.dl AS DOUBLE) * t.n_docs / t.tot_len))), 9)
        |      AS comp
        |  FROM tf f
        |  JOIN probes p ON f.term = p.term
        |  JOIN dfreq d ON f.term = d.term
        |  JOIN dl l ON f.doc_id = l.doc_id
        |  CROSS JOIN tot t),
        |sc AS (
        |  SELECT qid, doc_id,
        |    round(CAST(sum(CAST(comp AS DECIMAL(18,9))) AS DOUBLE), 6)
        |      AS score
        |  FROM comp GROUP BY qid, doc_id),
        |rb AS (
        |  SELECT * FROM (
        |    SELECT qid, doc_id,
        |      CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, doc_id) AS BIGINT) AS rb
        |    FROM sc)
        |  WHERE rb <= 50),
        |e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM e
        |      WHERE vec_id IN (1, 2, 3)),
        |p AS (
        |  SELECT q.qid, e.vec_id AS doc_id,
        |    round(list_dot_product(e.e, q.qe) /
        |      (sqrt(list_dot_product(e.e, e.e)) *
        |       sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
        |  FROM e, q WHERE e.vec_id <> q.qid),
        |rv AS (
        |  SELECT * FROM (
        |    SELECT qid, doc_id,
        |      CAST(row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, doc_id) AS BIGINT) AS rv
        |    FROM p)
        |  WHERE rv <= 50),
        |f AS (
        |  SELECT COALESCE(rb.qid, rv.qid) AS qid,
        |    COALESCE(rb.doc_id, rv.doc_id) AS doc_id, rb.rb, rv.rv
        |  FROM rb FULL OUTER JOIN rv
        |    ON rb.qid = rv.qid AND rb.doc_id = rv.doc_id),
        |g AS (
        |  SELECT qid, doc_id, rb, rv,
        |    COALESCE(CAST(1 AS DOUBLE) / (60 + rb), 0.0) +
        |    COALESCE(CAST(1 AS DOUBLE) / (60 + rv), 0.0) AS rrf
        |  FROM f),
        |r AS (
        |  SELECT qid, doc_id, rb, rv, rrf,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rrf DESC, doc_id) AS rnk
        |  FROM g)
        |SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS BIGINT) AS rnk,
        |  doc_id, rb IS NOT NULL AS in_bm25, rv IS NOT NULL AS in_vec,
        |  round(rrf, 9) AS rrf
        |FROM r WHERE rnk <= 10
        |ORDER BY qid, rnk""".stripMargin,
    // Unrolled integer power method over HUGEINT arithmetic (exact —
    // DuckDB SUM(BIGINT) widens losslessly); quantization is
    // sign(y)·((|y|·PcaScale) // max|y|), floor division on non-negative
    // operands exactly as the engine's BigInt driver step.
    "q_emb_pca_power" ->
      s"""WITH ${pcaCtes("")}
         |SELECT dim, CAST(xv AS BIGINT) AS weight FROM x$PcaIters
         |ORDER BY dim""".stripMargin,

    // Same unrolled power method as q_emb_pca_power, plus one projection
    // join; HUGEINT throughout, cast at the output boundary.
    "q_emb_pca_project" ->
      s"""WITH ${pcaCtes(" label,")},
         |proj AS (
         |  SELECT f.rid, SUM(f.v * x.xv) AS p
         |  FROM flat f JOIN x$PcaIters x ON f.i = x.dim + 1
         |  GROUP BY f.rid)
         |SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n,
         |  CAST(SUM(p) AS DOUBLE) AS sum_proj,
         |  CAST(min(p) AS BIGINT) AS min_proj,
         |  CAST(max(p) AS BIGINT) AS max_proj
         |FROM e JOIN proj ON e.rid = proj.rid
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_emb_knn" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT vec_id AS qid, e AS qe FROM e WHERE vec_id < $NQueries),
         |p AS (
         |  SELECT q.qid, e.vec_id,
         |    round(list_dot_product(e.e, q.qe) /
         |      (sqrt(list_dot_product(e.e, e.e)) *
         |       sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
         |  FROM e, q WHERE e.vec_id <> q.qid),
         |r AS (
         |  SELECT qid, vec_id, sim,
         |    row_number() OVER (PARTITION BY qid
         |                       ORDER BY sim DESC, vec_id) AS rnk
         |  FROM p)
         |SELECT qid, rnk, vec_id, sim FROM r
         |WHERE rnk <= $K
         |ORDER BY qid, rnk""".stripMargin,

    "q_emb_cosine_neardup" ->
      s"""WITH s AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $AuditSample),
         |e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM s),
         |u AS (
         |  SELECT vec_id,
         |    list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
         |  FROM e)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.u, b.u), 6) AS sim,
         |  TRUE AS lsh_recall_ok
         |FROM u a, u b
         |WHERE a.vec_id < b.vec_id
         |  AND round(list_dot_product(a.u, b.u), 6) >= $NearDupCosine
         |ORDER BY id_a, id_b""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (
         |  SELECT vec_id,
         |    list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
         |  FROM e),
         |c AS (SELECT vec_id AS cid, u AS cu FROM u
         |      WHERE vec_id < $SemClusters),
         |p AS (
         |  SELECT u.vec_id, c.cid,
         |    round(list_dot_product(u.u, c.cu), 6) AS sim
         |  FROM u, c),
         |r AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |                       ORDER BY sim DESC, cid) AS rnk
         |  FROM p),
         |asg AS (SELECT vec_id, cid AS cluster FROM r WHERE rnk = 1),
         |uu AS (
         |  SELECT a.cluster, u.vec_id, u.u
         |  FROM u JOIN asg a ON u.vec_id = a.vec_id),
         |dup AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM uu a JOIN uu b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.u, b.u), 6) >= $NearDupCosine)
         |SELECT uu.cluster, count(*) AS n_vecs,
         |  CAST(count(d.vec_id) AS BIGINT) AS n_dropped
         |FROM uu LEFT JOIN dup d ON uu.vec_id = d.vec_id
         |GROUP BY uu.cluster
         |ORDER BY uu.cluster""".stripMargin,

    "q_emb_label_drift" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |d AS (
        |  SELECT label, i - 1 AS pos, e[i] AS v
        |  FROM e, unnest(range(1, len(e) + 1)) AS u(i)),
        |ld AS (SELECT label, pos, avg(v) AS m FROM d GROUP BY 1, 2),
        |gd AS (SELECT pos, avg(v) AS g FROM d GROUP BY 1),
        |mom AS (
        |  SELECT label, sum(m * g) AS smg, sum(m * m) AS smm,
        |    sum(g * g) AS sgg
        |  FROM ld JOIN gd USING (pos) GROUP BY 1),
        |c AS (SELECT label, count(*) AS n FROM e GROUP BY 1)
        |SELECT c.label, c.n,
        |  round(smg / (sqrt(smm) * sqrt(sgg)), 6) AS drift_cosine
        |FROM c JOIN mom USING (label)
        |ORDER BY c.label""".stripMargin,

    "q_emb_silhouette" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (
         |  SELECT vec_id,
         |    list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
         |  FROM e),
         |c AS (SELECT vec_id AS cid, u AS cu FROM u
         |      WHERE vec_id < $SemClusters),
         |p AS (
         |  SELECT u.vec_id, c.cid,
         |    1.0 - round(list_dot_product(u.u, c.cu), 6) AS d
         |  FROM u, c),
         |r AS (
         |  SELECT vec_id, cid, d,
         |    row_number() OVER (PARTITION BY vec_id
         |                       ORDER BY d, cid) AS rnk
         |  FROM p),
         |s AS (
         |  SELECT a.vec_id, a.cid AS cluster,
         |    CASE WHEN b.d > 0 THEN round((b.d - a.d) / b.d, 9)
         |         ELSE 0.0 END AS sil
         |  FROM r a JOIN r b
         |    ON a.vec_id = b.vec_id AND a.rnk = 1 AND b.rnk = 2)
         |SELECT cluster, count(*) AS n_vecs,
         |  round(CAST(sum(CAST(sil AS DECIMAL(18,12))) AS DOUBLE) /
         |    count(*), 6) AS mean_sil
         |FROM s GROUP BY cluster
         |ORDER BY cluster""".stripMargin,

    "q_emb_ivf_ann" -> knnOracle("recall_ok"),

    // the cross-split exact kNN with both contract flags pinned TRUE
    "q_ann_index_reuse" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |c AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
         |q AS (SELECT vec_id AS qid, e AS qe FROM e
         |      WHERE vec_id % 5 = 0 AND vec_id < ${NQueries * 5}),
         |p AS (
         |  SELECT q.qid, c.vec_id,
         |    round(list_dot_product(c.e, q.qe) /
         |      (sqrt(list_dot_product(c.e, c.e)) *
         |       sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
         |  FROM c, q),
         |r AS (
         |  SELECT qid, vec_id, sim,
         |    row_number() OVER (PARTITION BY qid
         |                       ORDER BY sim DESC, vec_id) AS rnk
         |  FROM p)
         |SELECT qid, rnk, vec_id, sim, TRUE AS recall_ok,
         |  TRUE AS loaded_agrees
         |FROM r WHERE rnk <= $K
         |ORDER BY qid, rnk""".stripMargin,
    // exact kNN over the SURVIVING corpus (build+append minus deleted),
    // flags pinned TRUE; kept/dead recomputed from the id arithmetic
    "q_ann_maintenance" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |c AS (SELECT * FROM e
         |      WHERE vec_id % 5 <> 0 AND vec_id % 10 <> 1),
         |q AS (SELECT vec_id AS qid, e AS qe FROM e
         |      WHERE vec_id % 5 = 0 AND vec_id < ${NQueries * 5}),
         |p AS (
         |  SELECT q.qid, c.vec_id,
         |    round(list_dot_product(c.e, q.qe) /
         |      (sqrt(list_dot_product(c.e, c.e)) *
         |       sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
         |  FROM c, q),
         |r AS (
         |  SELECT qid, vec_id, sim,
         |    row_number() OVER (PARTITION BY qid
         |                       ORDER BY sim DESC, vec_id) AS rnk
         |  FROM p)
         |SELECT qid, rnk, vec_id, sim, TRUE AS recall_ok,
         |  TRUE AS compact_preserves, TRUE AS tombstones_honored,
         |  (SELECT count(*) FROM embeddings
         |   WHERE vec_id % 5 <> 0 AND vec_id % 10 <> 1) AS kept_vecs,
         |  (SELECT count(*) FROM embeddings
         |   WHERE vec_id % 10 = 1) AS dead_vecs
         |FROM r WHERE rnk <= $K
         |ORDER BY qid, rnk""".stripMargin,

    // per-scope exact kNN: each ingest batch's neighbors drawn from
    // strictly-older ranks (0 = corpus %5 IN (1,2), 1 = %5=3 batch,
    // 2 = %5=4 batch), both streaming flags pinned TRUE
    "q_stream_ann_ingest" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |u AS (
         |  SELECT vec_id, e,
         |    CASE WHEN vec_id % 5 IN (1, 2) THEN 0
         |         WHEN vec_id % 5 = 3 THEN 1 ELSE 2 END AS r
         |  FROM e
         |  WHERE vec_id % 5 IN (1, 2)
         |     OR (vec_id % 5 IN (3, 4) AND vec_id < ${NQueries * 10})),
         |q AS (SELECT vec_id AS qid, e AS qe, r AS qr FROM u
         |      WHERE r > 0),
         |p AS (
         |  SELECT q.qid, u.vec_id,
         |    round(list_dot_product(u.e, q.qe) /
         |      (sqrt(list_dot_product(u.e, u.e)) *
         |       sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
         |  FROM u JOIN q ON u.r < q.qr),
         |r2 AS (
         |  SELECT qid, vec_id, sim,
         |    row_number() OVER (PARTITION BY qid
         |                       ORDER BY sim DESC, vec_id) AS rnk
         |  FROM p)
         |SELECT qid, rnk, vec_id, sim, TRUE AS stream_recall_ok,
         |  TRUE AS ingest_order_ok
         |FROM r2 WHERE rnk <= $K
         |ORDER BY qid, rnk""".stripMargin,
    "q_emb_pq_ann" -> knnOracle("recall_ok"),
    "q_emb_ivfpq_ann" -> knnOracle("recall_ok"),
    "q_emb_lsh_ann" -> knnOracle("recall_ok"),

    "q_emb_quantize" ->
      """WITH q AS (
        |  SELECT label,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> abs(x))) / 127.0 AS raw_scale,
        |    CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |v AS (
        |  -- zero-vector guard mirrors Similarity.quantizeInt8 (scale = 0
        |  -- quantizes to all-zero); unguarded 0/0 would be NaN and
        |  -- CAST(NaN AS BIGINT) errors in DuckDB.
        |  SELECT label, round(raw_scale, 9) AS scale,
        |    list_transform(e, x -> CASE WHEN raw_scale = 0 THEN 0
        |      ELSE CAST(round(x / raw_scale, 0) AS BIGINT) END) AS qv
        |  FROM q)
        |SELECT label, count(*) AS n,
        |  CAST(sum(list_sum(list_transform(qv, x -> abs(x)))) AS BIGINT)
        |    AS total_mass,
        |  max(list_max(qv)) AS max_q,
        |  round(max(scale), 9) AS max_scale
        |FROM v
        |GROUP BY label
        |ORDER BY label""".stripMargin,

    "q_emb_mmr" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (
         |  SELECT vec_id,
         |    list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
         |  FROM e),
         |q AS (SELECT vec_id AS qid, u AS qu FROM u WHERE vec_id < $NQueries),
         |rel AS (
         |  SELECT q.qid, u.vec_id, u.u,
         |    round(list_dot_product(u.u, q.qu), 6) AS rel
         |  FROM u, q WHERE u.vec_id <> q.qid),
         |cand AS (
         |  SELECT qid, vec_id, u, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel DESC, vec_id) AS crnk FROM rel)
         |  WHERE crnk <= 10),
         |s1 AS (
         |  SELECT qid, vec_id, u, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel DESC, vec_id) AS rn FROM cand)
         |  WHERE rn = 1),
         |x2 AS (
         |  -- score in EXACT decimal arithmetic (rel/ms are 6-decimal
         |  -- values): double 0.7·rel − 0.3·ms differs from Spark in the
         |  -- 6th decimal on rounding boundaries; decimal never does
         |  SELECT c.qid, c.vec_id, c.u, c.rel,
         |    CAST(0.7 AS DECIMAL(18,6)) * CAST(c.rel AS DECIMAL(18,6))
         |      - CAST(0.3 AS DECIMAL(18,6)) *
         |        CAST(round(list_dot_product(c.u, s1.u), 6)
         |             AS DECIMAL(18,6)) AS score
         |  FROM cand c JOIN s1 ON c.qid = s1.qid AND c.vec_id <> s1.vec_id),
         |s2 AS (
         |  SELECT qid, vec_id, u, rel, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, vec_id) AS rn FROM x2)
         |  WHERE rn = 1),
         |x3 AS (
         |  SELECT c.qid, c.vec_id, c.rel,
         |    CAST(0.7 AS DECIMAL(18,6)) * CAST(c.rel AS DECIMAL(18,6))
         |      - CAST(0.3 AS DECIMAL(18,6)) * CAST(greatest(
         |          round(list_dot_product(c.u, s1.u), 6),
         |          round(list_dot_product(c.u, s2.u), 6))
         |        AS DECIMAL(18,6)) AS score
         |  FROM cand c
         |  JOIN s1 ON c.qid = s1.qid
         |  JOIN s2 ON c.qid = s2.qid
         |  WHERE c.vec_id <> s1.vec_id AND c.vec_id <> s2.vec_id),
         |s3 AS (
         |  SELECT qid, vec_id, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, vec_id) AS rn FROM x3)
         |  WHERE rn = 1)
         |SELECT qid, 1 AS rnk, vec_id, round(rel, 6) AS score FROM s1
         |UNION ALL SELECT qid, 2, vec_id,
         |  CAST(round(score, 6) AS DOUBLE) FROM s2
         |UNION ALL SELECT qid, 3, vec_id,
         |  CAST(round(score, 6) AS DOUBLE) FROM s3
         |ORDER BY qid, rnk""".stripMargin,

    // Same scaled-long moments as the engine: round once to 1e-6 grain,
    // exact BIGINT sums, factors divided out in the identical
    // association.
    "q_emb_dim_stats" ->
      """WITH d AS (
        |  SELECT i AS dim, CAST(round(v * 1000000.0, 0) AS BIGINT) AS sv
        |  FROM (
        |    SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
        |           unnest(range(len(embedding))) AS i
        |    FROM embeddings)),
        |a AS (
        |  SELECT dim, count(*) AS n,
        |    CAST(SUM(sv) AS DOUBLE) AS s1,
        |    CAST(SUM(sv * sv) AS DOUBLE) AS s2
        |  FROM d GROUP BY dim)
        |SELECT dim, n, round(s1 / n / 1000000.0, 6) AS mean,
        |  round(s2 / n / 1000000000000.0 -
        |    (s1 / n / 1000000.0) * (s1 / n / 1000000.0), 6) AS variance
        |FROM a
        |ORDER BY variance DESC, dim
        |LIMIT 5""".stripMargin,

    "q_emb_centroid" ->
      """WITH dims AS (
        |  SELECT label, i, avg(v) AS m FROM (
        |    SELECT label,
        |      unnest(CAST(embedding AS DOUBLE[])) AS v,
        |      unnest(range(len(embedding))) AS i
        |    FROM embeddings)
        |  GROUP BY label, i),
        |norms AS (
        |  SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm
        |  FROM dims GROUP BY label),
        |counts AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
        |SELECT c.label, c.n, norms.centroid_norm
        |FROM counts c JOIN norms ON c.label = norms.label
        |ORDER BY c.label""".stripMargin,
  )
}
