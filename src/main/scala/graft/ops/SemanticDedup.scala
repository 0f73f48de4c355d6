package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): partition the embedding space into clusters, then
  * prune near-duplicate pairs only WITHIN each cluster. The cluster step
  * is what makes embedding-level dedup tractable at corpus scale — the
  * quadratic verification is bounded to cluster-sized blocks instead of
  * the full corpus, and each block is an independent shuffle partition.
  *
  * The gate-facing entry point uses a FIXED centroid set (the unit
  * vectors with id < k) so a relational oracle can reproduce the cluster
  * assignment exactly. The production path at 100 TB swaps in the
  * driver-trained spherical-KMeans quantizer from [[Similarity]] with
  * k ≈ √n — assignment and the within-cluster join below are identical;
  * only where the centroids come from changes.
  *
  * Scale shape: centroids ride as a broadcast table (k rows), assignment
  * is a map-side argmax collapsed by partial aggregation (one narrow row
  * per vector reaches the shuffle), and the pair join is an equi-join on
  * the cluster id — never an unbounded cross product.
  */
object SemanticDedup {

  /** Cluster assignment for every vector: (vid, cluster) where cluster is
    * the centroid id with the highest 6-decimal-rounded cosine; ties break
    * on the lowest centroid id. `centroids` must be (cid, cu) unit
    * vectors, small enough to broadcast.
    */
  private[graft] def assign(u: DataFrame, centroids: DataFrame): DataFrame =
    u.crossJoin(broadcast(centroids))
      // 1 - sim (not -sim) keeps the sort key non-negative, dodging any
      // -0.0-vs-0.0 ordering question; monotone because rounded sims
      // differ by >= 1e-6 >> ulp(1).
      .select(col("vid"),
        struct((lit(1.0) - round(Similarity.dot(col("u"), col("cu")), 6))
          .as("ns"), col("cid")).as("sk"))
      .groupBy("vid")
      .agg(min(col("sk")).as("m"))
      .select(col("vid"), col("m.cid").as("cluster"))

  /** Per-cluster dedup stats over `emb`: one row per cluster with the
    * member count and how many members a semantic dedup pass would drop.
    * Drop rule (the same pairwise keep-lowest-id contract as the other
    * near-dup ops here): a vector is dropped iff some LOWER-id vector in
    * the same cluster has cosine ≥ `threshold` with it.
    */
  def semanticDedupStats(emb: DataFrame, idCol: String, embCol: String,
                         k: Int, threshold: Double): DataFrame = {
    val u = Similarity.unitVectors(emb, idCol, embCol, "vid", "u")
    val centroids = u.filter(col("vid") < k)
      .select(col("vid").as("cid"), col("u").as("cu"))
    statsWithCentroids(u, centroids, threshold)
  }

  /** The production-path entry: identical stats, but the cluster step
    * uses a TRAINED spherical-KMeans quantizer (fit driver-side on a
    * bounded hash-ordered sample, like the IVF coarse quantizer) instead
    * of the oracle-reproducible fixed centroid set. Every within-cluster
    * drop satisfies the exact pairwise criterion regardless of how the
    * clusters were formed — clustering quality only decides RECALL of the
    * cross-cluster pairs — so swapping quantizers can never introduce a
    * false drop; `SemanticDedupSpec` asserts the recall relationship
    * against the exact pass.
    */
  def semanticDedupStatsTrained(emb: DataFrame, idCol: String,
                                embCol: String, k: Int, threshold: Double,
                                sampleSize: Int = 4096,
                                seed: Long = 42L): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val u = Similarity.unitVectors(emb, idCol, embCol, "vid", "u")
    val sample = Similarity.trainSample(
      u.select(col("vid").as("nid"), col("u").as("nu")), sampleSize)
    val cents = Similarity.sphericalKMeans(sample, k, iters = 5, seed = seed)
    val centroids = cents.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }
      .toDF("cid", "cu")
    statsWithCentroids(u, centroids, threshold)
  }

  /** Simplified (centroid-based) silhouette — the standard O(n·k)
    * cluster-quality statistic (full silhouette is O(n²); the simplified
    * form replaces mean-to-members with distance-to-centroid and is the
    * only variant that survives corpus scale). Per vector: a = cosine
    * distance to its own (nearest) centroid, b = distance to the
    * second-nearest; s = (b − a) / b (b ≥ a ≥ 0 by construction, and
    * max(a,b) = b). Emits one row per cluster: member count and mean s.
    *
    * Same fixed-centroid convention as [[semanticDedupStats]] (unit
    * vectors with id < k, rounded-cosine argmin, ties to the lowest
    * centroid id) so a relational oracle reproduces it exactly; the
    * production path swaps in the trained quantizer. Scale shape: one
    * broadcast cross of n×k narrow rows collapsed by partial
    * aggregation; per-row s is rounded to 9 decimals so the exact
    * decimal mean is engine- and partitioning-independent.
    */
  def simplifiedSilhouette(emb: DataFrame, idCol: String, embCol: String,
                           k: Int): DataFrame = {
    val u = Similarity.unitVectors(emb, idCol, embCol, "vid", "u")
    val centroids = u.filter(col("vid") < k)
      .select(col("vid").as("cid"), col("u").as("cu"))
    val d = u.crossJoin(broadcast(centroids))
      .select(col("vid"), struct(
        (lit(1.0) - round(Similarity.dot(col("u"), col("cu")), 6)).as("d"),
        col("cid")).as("dk"))
    val two = d.groupBy("vid")
      .agg(sort_array(collect_list(col("dk"))).as("ds"))
      .select(col("vid"), element_at(col("ds"), 1).as("m1"),
        element_at(col("ds"), 2).as("m2"))
    two
      .select(col("m1.cid").as("cluster"),
        when(col("m2.d") > 0,
          round((col("m2.d") - col("m1.d")) / col("m2.d"), 9))
          .otherwise(lit(0.0)).as("sil"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("sil").cast("decimal(18,12)")).cast("double") /
          count(lit(1)), 6).as("mean_sil"))
      .orderBy("cluster")
  }

  private def statsWithCentroids(u: DataFrame, centroids: DataFrame,
                                 threshold: Double): DataFrame = {
    val uu = u.join(assign(u, centroids), "vid")
    val left = uu.select(col("cluster"), col("vid").as("id_a"),
      col("u").as("ua"))
    val right = uu.select(col("cluster"), col("vid").as("id_b"),
      col("u").as("ub"))
    val dropped = left.join(right, "cluster")
      .where(col("id_a") < col("id_b") &&
        round(Similarity.dot(col("ua"), col("ub")), 6) >= threshold)
      .select(col("id_b").as("vid")).distinct()
      .withColumn("dup", lit(1))
    uu.join(dropped, Seq("vid"), "left")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        count(col("dup")).cast("long").as("n_dropped"))
      .orderBy("cluster")
  }
}
