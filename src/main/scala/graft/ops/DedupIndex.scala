package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, MinHashLSHModel}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTED-index near-duplicate detection — the incremental-corpus
  * operation a 100 TB pipeline actually runs nightly (r11 verdict #5):
  * build the MinHash index over the corpus ONCE, persist it, then dedup
  * each new ingest batch against the LOADED index without ever touching
  * the original corpus text again. Every other dedup operator here
  * recomputes its index per run, which is the right shape for a one-off
  * sweep and the wrong one for "dedup tonight's batch against
  * yesterday's corpus".
  *
  * The index is three parquet artifacts plus the fitted model:
  *
  *   - `meta/`  — the [[DedupIndex.MinHashConfig]] that built it (one
  *     row), so the query side shingles/hashes batches identically;
  *   - `model/` — the seeded `MinHashLSHModel` (ML persistence), so the
  *     batch side signs with the exact hash functions the corpus used;
  *   - `bands/` — the corpus band table (id, tbl, h): one narrow row
  *     per (doc, hash table) — the LSH join side;
  *   - `idx/`   — each corpus doc's tf non-zero index set (sorted), the
  *     exact-verify side.
  *
  * Query cost is O(batch) + the band join: the corpus contributes only
  * its (bounded-width) band and index rows, both read from parquet with
  * the band join's equi-keys — no corpus text scan, no corpus
  * re-shingling, no quadratic anything. Same similarity definition as
  * [[Dedup.minHashPairs]] (token n-gram shingle Jaccard, exact-verified
  * on the tf index sets), so recall contracts measured against the
  * exact truth transfer unchanged.
  */
object DedupIndex {

  /** Shingle/hash configuration persisted with the index. Defaults
    * mirror [[Dedup.minHashPairs]].
    */
  case class MinHashConfig(n: Int = 3, numHashTables: Int = 4,
                           seed: Long = 42L, numFeatures: Int = 1 << 18)

  /** (id, toks) with empty shingle sets dropped (MinHashLSH requires at
    * least one non-zero entry), then the binary HashingTF features —
    * the signing pipeline both build and query sides share.
    */
  private def featured(df: DataFrame, idCol: String, textCol: String,
                       cfg: MinHashConfig): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Scale-ADAPTIVE signing parallelism (was a flat defaultParallelism):
    // shingling is CPU-bound, so spread a LARGE corpus across the whole
    // cluster — but a small ingest batch fanned to 32 near-empty
    // partitions costs a sorted round-robin exchange, 32-way task
    // overhead on every downstream stage, and 32 tiny files per
    // band/idx write (which every later query re-opens). Derive the
    // width from the scan's own split count (8 signing partitions per
    // input split ≈ 16 MB of text per task at the default 128 MB
    // split), capped at cluster width.
    val target = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, df.rdd.getNumPartitions * 8))
    val docs = df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .repartition(target)
      .map { case (id, text) =>
        (id, TextAnalysis.shingleSetOf(text, cfg.n).toSeq)
      }
      .toDF("id", "toks")
      .filter(size(col("toks")) > 0)
    new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(cfg.numFeatures).setBinary(true)
      .transform(docs)
  }

  /** Sorted tf non-zero index sets: (id, idx) — the exact-verify side. */
  private def indexSets(signed: DataFrame): DataFrame = {
    val spark = signed.sparkSession
    import spark.implicits._
    signed.select(col("id"), col("tf"))
      .as[(Long, org.apache.spark.ml.linalg.Vector)]
      .map { case (id, v) =>
        val sv = v match {
          case s: org.apache.spark.ml.linalg.SparseVector => s
          case d => d.toSparse
        }
        (id, sv.indices)
      }
      .toDF("id", "idx")
  }

  /** Build the MinHash index over `corpus` and persist it at `path`
    * (overwriting a previous index — the nightly-rebuild spelling;
    * incremental APPEND of new corpus rows is the same write with
    * mode("append") on bands/idx, left to the caller's orchestration).
    */
  def buildAndSave(corpus: DataFrame, idCol: String, textCol: String,
                   path: String,
                   cfg: MinHashConfig = MinHashConfig()): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    clearTombstones(spark, path) // a rebuild starts with no dead ids
    val f = featured(corpus, idCol, textCol, cfg).cache()
    try {
      val model = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
        .setNumHashTables(cfg.numHashTables).setSeed(cfg.seed)
        .fit(f)
      val signed = model.transform(f).select(col("id"), col("tf"),
        col("sig"))
      // Four independent artifact writes (model, meta, bands, idx — all
      // derived from the fitted model + the cached feature frame):
      // concurrent so each write's straggler tail is back-filled (§2.6).
      Par.run(
        () => model.write.overwrite().save(s"$path/model"),
        () => Seq((cfg.n, cfg.numHashTables, cfg.seed, cfg.numFeatures))
          .toDF("n", "num_hash_tables", "seed", "num_features")
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/meta"),
        () => Similarity.lshBucketRows(signed, "id", "sig")
          .write.mode("overwrite").parquet(s"$path/bands"),
        () => indexSets(signed)
          .write.mode("overwrite").parquet(s"$path/idx"))
    } finally { f.unpersist(); () }
  }

  private def clearTombstones(spark: SparkSession, path: String): Unit = {
    val tomb = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tomb)) { fs.delete(tomb, true); () }
  }

  /** Fold a NEW batch of corpus documents into the existing index —
    * the step after [[dedupNewBatch]] has cleared tonight's batch: sign
    * the batch with the index's OWN persisted model/config and APPEND
    * its band and index-set rows. The existing corpus is neither read
    * nor re-signed; cost is O(batch). (The caller decides id
    * uniqueness — the index is a multiset keyed by id, exactly like
    * the corpus it mirrors.)
    */
  def appendToIndex(spark: SparkSession, newDocs: DataFrame,
                    idCol: String, textCol: String, path: String): Unit = {
    val (cfg, model) = loadModel(spark, path)
    appendSigned(signBatch(newDocs, idCol, textCol, cfg, model), path)
  }

  /** Tombstone DELETED corpus docs (r12 verdict #4 — the FAISS
    * `remove_ids` analogue, the missing third of the nightly
    * build/append/delete cycle): appends the ids to `tombstones/`;
    * every query-side read ([[dedupNewBatch]]) anti-joins the corpus
    * band/index rows against the live tombstones, so deleted docs stop
    * matching IMMEDIATELY while the (immutable, append-friendly)
    * band/idx files stay untouched. Cost is O(delete batch).
    *
    * Semantics are global by id, like FAISS: a tombstoned id stays dead
    * until [[compactIndex]] physically reclaims it — re-adding the same
    * id before compacting would still read as deleted, so reuse ids
    * only after a compact.
    */
  def deleteFromIndex(spark: SparkSession, ids: DataFrame, idCol: String,
                      path: String): Unit = {
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** Live tombstone ids, or None when nothing was ever deleted. */
  private def tombstones(spark: SparkSession, path: String)
  : Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** `df` minus tombstoned ids (left-anti on `idName`); identity when no
    * tombstones exist.
    */
  private def minusTombstones(spark: SparkSession, df: DataFrame,
                              idName: String, path: String): DataFrame =
    tombstones(spark, path).fold(df) { ts =>
      df.join(ts.withColumnRenamed("id", idName), Seq(idName), "left_anti")
    }

  /** Physically reclaim tombstoned docs and consolidate append
    * fragmentation: rewrite `bands/` and `idx/` without dead ids (one
    * pass each — appends leave one small file per batch; the rewrite
    * re-packs them), then clear `tombstones/`. Returns
    * (docs kept, docs reclaimed). The model/config are never touched —
    * retraining on drift is a REBUILD ([[buildAndSave]]), exactly the
    * FAISS contract. Run it when the tombstone fraction or the file
    * count crosses the caller's threshold.
    */
  def compactIndex(spark: SparkSession, path: String): (Long, Long) = {
    val idxAll = spark.read.parquet(s"$path/idx")
    // One pass for both ledger counts: distinct ids, flagged dead via a
    // left join against the (small) tombstone set — the previous
    // distinct+count / distinct+semi-join+count pair scanned idx twice.
    val (nAll, nDead) = tombstones(spark, path) match {
      case None => (idxAll.select("id").distinct().count(), 0L)
      case Some(ts) =>
        // distinct BEFORE the join: deleteFromIndex distincts only within
        // a call, so deleting the same id in two calls (legal — deletes
        // are documented idempotent) leaves duplicate tombstone rows that
        // would multiply this left join and over-report the reclaimed
        // count (the old left_semi spelling was immune).
        val r = idxAll.select("id").distinct()
          .join(broadcast(ts.select("id").distinct()
            .withColumn("__dead", lit(1))), Seq("id"),
            "left")
          .agg(count(lit(1)),
            coalesce(sum(coalesce(col("__dead"), lit(0))), lit(0L)))
          .head()
        (r.getLong(0), r.getLong(1))
    }
    // Independent artifacts (different dirs, both anti-joining the same
    // tiny tombstone set): rewrite concurrently so the second rewrite
    // back-fills the first's straggler tail (guide §2.6).
    Par.run(
      () => rewriteMinusTombstones(spark, s"$path/bands", "id", path),
      () => rewriteMinusTombstones(spark, s"$path/idx", "id", path))
    val tomb = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tomb)) { fs.delete(tomb, true); () }
    (nAll - nDead, nDead)
  }

  /** Rewrite one parquet artifact minus tombstones via tmp-dir + rename
    * (a direct overwrite would delete its own input mid-read).
    */
  private def rewriteMinusTombstones(spark: SparkSession, dir: String,
                                     idName: String, path: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Re-packing IS this function's purpose (appends leave one file per
    // batch), so size the output explicitly from the artifact's actual
    // bytes (~128 MB per output file, guide-standard): without the
    // repartition the write inherits the scan's split-per-small-file
    // fragmentation and compaction never reduces the file count.
    val nFiles = math.max(1L,
      fs.getContentSummary(src).getLength / (128L << 20) + 1).toInt
    minusTombstones(spark, spark.read.parquet(dir), idName, path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(src, true)
    if (!fs.rename(tmp, src))
      throw new java.io.IOException(s"compactIndex: rename $tmp -> $src failed")
  }

  /** The persisted config of the index at `path`. */
  def loadConfig(spark: SparkSession, path: String): MinHashConfig = {
    val r = spark.read.parquet(s"$path/meta").head()
    MinHashConfig(r.getAs[Int]("n"), r.getAs[Int]("num_hash_tables"),
      r.getAs[Long]("seed"), r.getAs[Int]("num_features"))
  }

  /** Config + fitted model of the index at `path`, loaded ONCE. The model
    * is written exactly once per index lifetime ([[buildAndSave]]; append/
    * delete/compact never touch it), so a caller running several
    * query/append steps against one index (the maintenance cycle, a
    * streaming ingest loop) can load here once instead of paying the ML
    * reader's multi-job parquet+JSON round trip per step — the loads are
    * provably of identical bytes, so every answer is unchanged.
    */
  def loadModel(spark: SparkSession, path: String)
  : (MinHashConfig, MinHashLSHModel) =
    (loadConfig(spark, path), MinHashLSHModel.load(s"$path/model"))

  /** Sign a batch with an already-loaded index model: shingle, hash, and
    * attach MinHash signatures — the (id, tf, sig) frame both
    * [[dedupSignedBatch]] and [[appendSigned]] consume. Signing is the
    * dominant per-batch cost; computing it once per batch instead of once
    * per STEP (query, then append) halves the batch-side work of an
    * ingest cycle without touching what either step computes.
    */
  def signBatch(batch: DataFrame, idCol: String, textCol: String,
                cfg: MinHashConfig, model: MinHashLSHModel): DataFrame =
    model.transform(featured(batch, idCol, textCol, cfg))
      .select(col("id"), col("tf"), col("sig"))

  /** [[dedupNewBatch]] over a batch already signed by [[signBatch]] with
    * this index's own model: reads the persisted band/index artifacts
    * (minus live tombstones) fresh per call — a growing index is re-read,
    * never memoized — and runs the same candidate join + exact verify.
    */
  def dedupSignedBatch(spark: SparkSession, signedBatch: DataFrame,
                       path: String, maxDistance: Double): DataFrame = {
    val corpusBands =
      minusTombstones(spark, spark.read.parquet(s"$path/bands"), "id", path)
    val corpusIdx =
      minusTombstones(spark, spark.read.parquet(s"$path/idx"), "id", path)
    crossVerify(signedBatch, corpusBands, corpusIdx, maxDistance)
  }

  /** [[appendToIndex]] for a batch already signed by [[signBatch]].
    *
    * The two appends stay SEQUENTIAL, bands first (not Par.run): append
    * mode is not atomic, so if a concurrent bands append failed after
    * the idx append committed, a caller retry would append idx rows
    * twice — and duplicate idx rows yield duplicate output pairs in
    * crossVerify (bands duplicates are absorbed by cands.distinct();
    * idx duplicates are not). Bands-then-idx makes a retry after a
    * partial failure benign.
    */
  def appendSigned(signed: DataFrame, path: String): Unit = {
    val s = signed.cache()
    try {
      Similarity.lshBucketRows(s, "id", "sig")
        .write.mode("append").parquet(s"$path/bands")
      indexSets(s)
        .write.mode("append").parquet(s"$path/idx")
    } finally { s.unpersist(); () }
  }

  /** Near-duplicates of a NEW batch against the indexed corpus, reading
    * ONLY the index artifacts on the corpus side (never the corpus
    * text — provable by deleting the corpus input after buildAndSave,
    * which DedupIndexSpec does). Returns (batch_id, corpus_id,
    * jaccard_dist) at jaccard distance strictly below `maxDistance`,
    * rounded half-up to 6 decimals — [[Dedup.minHashPairs]]' exact
    * contract restricted to cross-set pairs.
    */
  def dedupNewBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                    textCol: String, path: String,
                    maxDistance: Double): DataFrame = {
    val (cfg, model) = loadModel(spark, path)
    dedupSignedBatch(spark, signBatch(batch, idCol, textCol, cfg, model),
      path, maxDistance)
  }

  /** [[buildAndSave]] + [[crossPairsFresh]] from ONE corpus signing
    * (r12 verdict #7): the incremental-dedup gate runs both — persist
    * the index AND derive the in-memory twin the loaded answer is pinned
    * against — and signing the corpus twice was the gate's dominant
    * cost. The returned frame is the fresh cross-pair twin computed from
    * the exact in-memory band/index frames that were just persisted, so
    * equality with [[dedupNewBatch]]'s answer still proves precisely the
    * persistence layer (write + read round trip); the from-scratch refit
    * path stays covered by [[crossPairsFresh]] and DedupIndexSpec's
    * determinism contract.
    */
  def buildSaveAndCrossFresh(corpus: DataFrame, batch: DataFrame,
                             idCol: String, textCol: String, path: String,
                             maxDistance: Double,
                             cfg: MinHashConfig = MinHashConfig())
  : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    clearTombstones(spark, path) // a rebuild starts with no dead ids
    val f = featured(corpus, idCol, textCol, cfg).cache()
    try {
      val model = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
        .setNumHashTables(cfg.numHashTables).setSeed(cfg.seed)
        .fit(f)
      model.write.overwrite().save(s"$path/model")
      Seq((cfg.n, cfg.numHashTables, cfg.seed, cfg.numFeatures))
        .toDF("n", "num_hash_tables", "seed", "num_features")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$path/meta")
      val signed = model.transform(f)
        .select(col("id"), col("tf"), col("sig")).cache()
      try {
        val bands = Similarity.lshBucketRows(signed, "id", "sig")
        bands.write.mode("overwrite").parquet(s"$path/bands")
        val idx = indexSets(signed)
        idx.write.mode("overwrite").parquet(s"$path/idx")
        crossVerify(
          model.transform(featured(batch, idCol, textCol, cfg))
            .select(col("id"), col("tf"), col("sig")),
          bands, idx, maxDistance)
      } finally { signed.unpersist(); () }
    } finally { f.unpersist(); () }
  }

  /** The recompute-from-scratch twin of [[dedupNewBatch]]: the same
    * batch-vs-corpus near-dup set derived fully in memory (fit, sign,
    * band-join, verify — no disk round trip). The fit is seed-
    * deterministic, so a divergence between this and the loaded-index
    * answer means exactly one thing: the persistence layer corrupted
    * signatures, bands, or index sets — which is why the gate pins
    * their equality.
    */
  def crossPairsFresh(corpus: DataFrame, batch: DataFrame, idCol: String,
                      textCol: String, maxDistance: Double,
                      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val fc = featured(corpus, idCol, textCol, cfg).cache()
    try {
      val model = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
        .setNumHashTables(cfg.numHashTables).setSeed(cfg.seed)
        .fit(fc)
      val corpusSigned = model.transform(fc)
        .select(col("id"), col("tf"), col("sig"))
      crossVerify(
        model.transform(featured(batch, idCol, textCol, cfg))
          .select(col("id"), col("tf"), col("sig")),
        Similarity.lshBucketRows(corpusSigned, "id", "sig"),
        indexSets(corpusSigned), maxDistance)
    } finally { fc.unpersist(); () }
  }

  /** LSH candidate join + exact verify of a signed batch against corpus
    * band/index tables: only (id, tbl, h) rows cross the candidate
    * shuffle; the surviving pairs (orders of magnitude fewer than docs)
    * fetch both index sets once for the exact Jaccard merge — the
    * [[Dedup.minHashPairs]] join discipline, cross-set.
    */
  private def crossVerify(batchSigned: DataFrame, corpusBands: DataFrame,
                          corpusIdx: DataFrame,
                          maxDistance: Double): DataFrame = {
    val spark = batchSigned.sparkSession
    import spark.implicits._
    val batchCached = batchSigned.cache()
    try {
      val batchBands = Similarity.lshBucketRows(batchCached, "id", "sig")
        .select(col("id").as("batch_id"), col("tbl"), col("h"))
      val cands = batchBands
        .join(corpusBands.select(col("id").as("corpus_id"),
            col("tbl").as("tbl_c"), col("h").as("h_c")),
          col("tbl") === col("tbl_c") && col("h") === col("h_c"))
        .select("batch_id", "corpus_id").distinct()
      val batchIdx = indexSets(batchCached)
      cands
        .join(batchIdx, col("batch_id") === col("id")).drop("id")
        .withColumnRenamed("idx", "idx_b")
        .join(corpusIdx, col("corpus_id") === col("id")).drop("id")
        .withColumnRenamed("idx", "idx_c")
        .as[(Long, Long, Array[Int], Array[Int])]
        .flatMap { case (b, c, ib, ic) =>
          var i = 0; var j = 0; var inter = 0
          while (i < ib.length && j < ic.length) {
            if (ib(i) == ic(j)) { inter += 1; i += 1; j += 1 }
            else if (ib(i) < ic(j)) i += 1
            else j += 1
          }
          val d = 1.0 - inter.toDouble / (ib.length + ic.length - inter)
          if (d < maxDistance)
            Iterator.single((b, c,
              java.math.BigDecimal.valueOf(d)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
          else Iterator.empty
        }
        .toDF("batch_id", "corpus_id", "jaccard_dist")
        .transform(Pin.pin) // small: only passing pairs
    } finally { batchCached.unpersist(); () }
  }
}
