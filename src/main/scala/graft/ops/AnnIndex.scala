package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTED IVF index for approximate-nearest-neighbor serving — the
  * ANN half of the incremental-corpus story ([[DedupIndex]] is the dedup
  * half, r11 verdict #5): train the coarse quantizer and assign the
  * corpus into inverted cells ONCE, persist, then serve every future
  * query batch against the LOADED cells without touching the corpus
  * embeddings again. This is the layout a billion-vector serving tier
  * actually deploys: the index build is the nightly batch job; queries
  * only ever read centroids (tiny) plus ~nProbe/nList of the cell data.
  *
  * Artifacts at `path`:
  *
  *   - `meta/`      — (n_list, seed, sample_size): the build config;
  *   - `centroids/` — (cell, c: array&lt;double&gt;): the coarse
  *     quantizer, ≤ nList rows — collected to the driver at query time
  *     exactly like the in-memory operator broadcasts it;
  *   - `cells/`     — (cell, nid, nu: array&lt;double&gt;): the
  *     inverted file — unit-normalized corpus vectors keyed by their
  *     nearest-centroid cell. Parquet, so a query's probed cells reach
  *     the join as an equi-key read.
  *
  * Query semantics are EXACTLY [[Similarity.ivfTopK]] (same training
  * sample, same seeded spherical k-means, same argmax-dot assignment,
  * same probe order and tie rules), so the loaded-index answer must be
  * bit-identical to the in-memory operator's — the gate pins that
  * equality, plus the usual exact-recall contract.
  */
object AnnIndex {

  /** Build the IVF index over `emb` and persist it at `path`
    * (overwriting a previous index — the nightly-rebuild spelling).
    */
  def buildAndSaveIvf(emb: DataFrame, idCol: String, embCol: String,
                      path: String, nList: Int = 16, seed: Long = 42L,
                      sampleSize: Int = 4096): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    locally { // a rebuild starts with no dead ids
      val tomb = new org.apache.hadoop.fs.Path(s"$path/tombstones")
      val fs = tomb.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(tomb)) { fs.delete(tomb, true); () }
    }
    val corpus = Similarity.unitVectors(emb, idCol, embCol, "nid", "nu")
      .cache()
    try {
      val sample = Similarity.trainSample(corpus, sampleSize)
      val cents = Similarity.sphericalKMeans(sample, nList, iters = 5,
        seed = seed)
      val bc = s.sparkContext.broadcast(cents)
      // Scale-adaptive cell-file width (the DedupIndex signing fix):
      // inheriting the scan's partition count leaves one near-empty file
      // per scan split at small corpus sizes — files every query
      // re-opens. Derive the width from the input's own split count,
      // capped at cluster width; a big corpus still spreads fully.
      val width = math.max(1, math.min(
        emb.sparkSession.sparkContext.defaultParallelism,
        emb.rdd.getNumPartitions))
      // Three independent artifact writes — concurrent (guide §2.6).
      Par.run(
        () => Seq((nList, seed, sampleSize))
          .toDF("n_list", "seed", "sample_size")
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/meta"),
        () => cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("cell", "c")
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/centroids"),
        () => corpus.as[(Long, Array[Double])]
          .map { case (id, u) =>
            (Similarity.argmaxDot(u, bc.value), id, u)
          }
          .toDF("cell", "nid", "nu")
          .repartition(width)
          .write.mode("overwrite").parquet(s"$path/cells"))
    } finally { corpus.unpersist(); () }
  }

  /** Fold NEW corpus vectors into the existing index: assign each to
    * its nearest persisted centroid and APPEND to the inverted cells.
    * The quantizer is NOT retrained (the FAISS add() contract — retrain
    * on drift is a rebuild); existing cells are neither read nor
    * rewritten; cost is O(batch).
    */
  def appendToIvf(spark: SparkSession, newEmb: DataFrame, idCol: String,
                  embCol: String, path: String): Unit =
    appendToIvfWith(spark, newEmb, idCol, embCol, path,
      loadCentroids(spark, path))

  /** [[appendToIvf]] with an already-loaded quantizer ([[loadCentroids]]):
    * a caller folding several batches into one index (the maintenance
    * cycle, a streaming ingest loop) skips the per-step centroid
    * read+collect — the centroids are written once per index lifetime
    * and never change after the build, so the answers are unchanged.
    */
  def appendToIvfWith(spark: SparkSession, newEmb: DataFrame,
                      idCol: String, embCol: String, path: String,
                      cents: Array[Array[Double]]): Unit = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    // One file per appended batch unless the batch itself is wide
    // (adaptive width, as in the build): appends fragment the cell
    // files, and every later query re-opens each of them.
    val width = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, newEmb.rdd.getNumPartitions))
    Similarity.unitVectors(newEmb, idCol, embCol, "nid", "nu")
      .as[(Long, Array[Double])]
      .map { case (id, u) => (Similarity.argmaxDot(u, bc.value), id, u) }
      .toDF("cell", "nid", "nu")
      .repartition(width)
      .write.mode("append").parquet(s"$path/cells")
  }

  /** Tombstone DELETED corpus vectors (r12 verdict #4 — FAISS
    * `remove_ids`): appends ids to `tombstones/`; [[queryIvf]]
    * anti-joins the probed cells against live tombstones so deleted
    * vectors stop being served immediately, while the cell files stay
    * append-only. Ids are global: a tombstoned id stays dead until
    * [[compactIvf]] reclaims it — reuse ids only after a compact.
    * Cost is O(delete batch).
    */
  def deleteFromIvf(spark: SparkSession, ids: DataFrame, idCol: String,
                    path: String): Unit = {
    ids.select(col(idCol).cast("long").as("nid")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")
  }

  private def tombstones(spark: SparkSession, path: String)
  : Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  private def minusTombstones(spark: SparkSession, df: DataFrame,
                              path: String): DataFrame =
    tombstones(spark, path).fold(df)(ts =>
      df.join(ts, Seq("nid"), "left_anti"))

  /** Physically reclaim tombstoned vectors and re-pack the cell files
    * fragmented by [[appendToIvf]] (one small file per appended batch):
    * rewrite `cells/` without dead ids, then clear `tombstones/`.
    * Returns (vectors kept, vectors reclaimed). Centroids are never
    * touched — retraining the quantizer on drift is a REBUILD
    * ([[buildAndSaveIvf]]), the FAISS contract; compact when the dead
    * fraction or file count crosses the caller's threshold.
    */
  def compactIvf(spark: SparkSession, path: String): (Long, Long) = {
    val cells = spark.read.parquet(s"$path/cells")
    val nAll = cells.count()
    val live = minusTombstones(spark, cells, path)
    val src = new org.apache.hadoop.fs.Path(s"$path/cells")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/cells.compact")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Re-packing IS compaction's purpose (one file per appended batch):
    // size the rewrite from the artifact's actual bytes (~128 MB per
    // output file) instead of inheriting split-per-small-file
    // fragmentation — the DedupIndex.rewriteMinusTombstones fix.
    val nFiles = math.max(1L,
      fs.getContentSummary(src).getLength / (128L << 20) + 1).toInt
    live.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(src, true)
    if (!fs.rename(tmp, src))
      throw new java.io.IOException(s"compactIvf: rename $tmp -> $src failed")
    val nKept = spark.read.parquet(src.toString).count()
    val tomb = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    if (fs.exists(tomb)) { fs.delete(tomb, true); () }
    (nKept, nAll - nKept)
  }

  /** Top-k cosine neighbors of each `queries` row against the INDEXED
    * corpus, reading only the persisted centroids and cells (provable by
    * deleting the corpus input after the build — AnnIndexSpec does).
    * Output contract matches [[Similarity.ivfTopK]]:
    * (qid, rnk, idCol, sim).
    */
  /** The persisted coarse quantizer, collected ONCE (≤ nList rows — the
    * same driver-side footprint the in-memory operator's broadcast has).
    * Centroids are written once per index lifetime (build only; append/
    * delete/compact never touch them), so a caller running several
    * query/append steps against one index can load here once and pass
    * the array to the `*With` variants — identical bytes, identical
    * answers.
    */
  def loadCentroids(spark: SparkSession, path: String)
  : Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  def queryIvf(spark: SparkSession, queries: DataFrame, idCol: String,
               embCol: String, path: String, k: Int,
               nProbe: Int = 2,
               maxQueryBatch: Int = Similarity.DefaultMaxQueryBatch)
  : DataFrame =
    queryIvfWith(spark, queries, idCol, embCol, path,
      loadCentroids(spark, path), k, nProbe, maxQueryBatch)

  /** [[queryIvf]] with an already-loaded quantizer ([[loadCentroids]]). */
  def queryIvfWith(spark: SparkSession, queries: DataFrame, idCol: String,
                   embCol: String, path: String,
                   cents: Array[Array[Double]], k: Int,
                   nProbe: Int = 2,
                   maxQueryBatch: Int = Similarity.DefaultMaxQueryBatch)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // Probe-batch fence (r12 verdict #3): this path broadcasts the
    // probed query vectors (O(batch · nProbe · dim)), which is correct
    // only for probe-batch-sized query sets. limit(max+1).count() reads
    // at most max+1 rows, so the fence itself is O(maxQueryBatch).
    val nQ = queries.limit(maxQueryBatch + 1).count()
    require(nQ <= maxQueryBatch,
      s"queryIvf: query batch exceeds maxQueryBatch=$maxQueryBatch — " +
        "this path broadcasts the probed query vectors; shard the batch " +
        "or raise maxQueryBatch deliberately")
    val bc = spark.sparkContext.broadcast(cents)
    val nP = nProbe
    val probed = Similarity.unitVectors(queries, idCol, embCol,
        "qid", "qu")
      .as[(Long, Array[Double])]
      .flatMap { case (qid, qu) =>
        val cs = bc.value
        cs.indices.map(c => (c, Similarity.dotArr(qu, cs(c))))
          .sortBy { case (c, d) => (-d, c) }
          .take(nP).map { case (c, _) => (qid, qu, c) }
      }
      .toDF("qid", "qu", "cell")
    val rankW = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("nid"))
    minusTombstones(spark, spark.read.parquet(s"$path/cells"), path)
      .join(broadcast(probed), "cell")
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim",
        round(Similarity.dot(col("nu"), col("qu")), 6))
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"),
        col("nid").as(idCol), col("sim"))
      .transform(Pin.pin) // small: ≤ k rows per query
  }
}
