package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines, in increasing
  * tolerance of difference:
  *
  *   - exact: hash-groupBy on md5(text) — one shuffle bounded by
  *     #distinct texts; the only correct O(n) exact method at 100 TB.
  *   - n-gram Jaccard (brute force): quadratic within a blocking key —
  *     the accuracy baseline, usable when blocks are small.
  *   - MinHash + LSH: the scale path — per-doc signature is O(tokens),
  *     candidate generation is an equi-join on (band, hash) buckets, so
  *     total cost is near-linear and fully shuffled-parallel. Built on
  *     Spark ML's MinHashLSH (seeded → deterministic).
  *   - SimHash: 64-bit signed projection; near-dups differ in few bits.
  *     Bucketing on the top 16 bits gives an O(n) candidate filter.
  *
  * All operators take the canonical whitespace tokenization from
  * [[TextAnalysis]].
  */
object Dedup {

  /** Exact-duplicate classes: (text_hash, n_docs, min_doc_id). */
  def exactDupClasses(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Exact token-n-gram Jaccard near-dup pairs within a blocking key.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Computed inverted-index style: explode distinct shingles, equi-join on
    * (block, shingle), count shared shingles per pair, derive jaccard from
    * the per-doc set sizes. Identical output to the naive quadratic
    * `array_intersect` formulation (shingles are distinct per doc, so the
    * match count IS the intersection size; zero-overlap pairs have
    * jaccard 0 and can never pass a positive threshold), but the work is
    * proportional to actual shingle collisions, not block², and every step
    * is a shuffled hash join/agg — the shape that survives 100 TB.
    */
  /** Cached posting list: one (id, blk, sz, g) row per (doc, distinct
    * shingle). Built via a typed flatMap (see TextAnalysis.shingleSetOf
    * for why not the HOF expression); repartitioned first because
    * shingling is the CPU-bound stage, so its parallelism must come from
    * an explicit shuffle, not from however many file splits the scan
    * happened to produce (a single small parquet file otherwise
    * serializes the whole stage on one core). Linear in corpus size, far
    * smaller than the raw text at 100 TB. Caller unpersists.
    */
  private def postingLists(df: DataFrame, idCol: String, textCol: String,
                           blockCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sparkContext.defaultParallelism
    df.select(col(idCol).cast("long").as("id"),
        col(blockCol).cast("string").as("blk"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String, String)]
      .repartition(nPart)
      .flatMap { case (id, blk, text) =>
        val sh = TextAnalysis.shingleSetOf(text, n)
        sh.iterator.map(g => (id, blk, sh.length, g))
      }
      .toDF("id", "blk", "sz", "g")
      .cache()
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, minJaccard: Double,
                        prefixFilter: Boolean = false): DataFrame = {
    val ex = postingLists(df, idCol, textCol, blockCol, n)
    try {
      // Both paths are exact (pairwise-equal on random corpora incl.
      // heavy boilerplate, DedupSpec). Default is the full posting join:
      // on corpora whose posting lists lack heavy hitters it is strictly
      // faster (measured 1.6-2.5x at sf0.1 AND at 10x that — the prefix
      // machinery's freq join + per-doc rank sort + verify joins cost
      // more than the collisions they avoid). Opt into `prefixFilter`
      // when a high threshold meets boilerplate-dominated posting lists
      // (few very popular shingles) — the regime where the full join's
      // hot keys go quadratic and the prefix bound caps them.
      if (prefixFilter && minJaccard >= 0.5) prefixFilteredPairs(ex, minJaccard)
      else fullPostingPairs(ex, minJaccard)
    } finally { ex.unpersist(); () }
  }

  /** Asymmetric n-gram CONTAINMENT pairs within a blocking key: for each
    * pair, C(A→B) = |A∩B| / |A| and C(B→A) = |A∩B| / |B|; a pair passes
    * when the LARGER containment (= |A∩B| / min(|A|,|B|)) clears
    * `minContainment`. This is the near-SUPERSET detector Jaccard
    * structurally misses: a document wholly embedded in a 10× larger one
    * has J ≈ 0.1 but containment 1.0 — the quote/aggregation/boilerplate-
    * wrapper dup class of web corpora.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] (explode distinct
    * shingles, equi-join on (block, shingle), count shared shingles), but
    * WITHOUT the Jaccard size-ratio prune — size-mismatched pairs are
    * exactly the ones this operator exists to find, so the only join
    * predicates are the block, the shingle, and id_a < id_b. Returns
    * (id_a, id_b, cont_ab, cont_ba), both rounded to 6 decimals before
    * the threshold (the engine-independent cutoff rule).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       blockCol: String, n: Int,
                       minContainment: Double): DataFrame = {
    val ex = postingLists(df, idCol, textCol, blockCol, n)
    try {
      val a = ex.select(col("id").as("id_a"), col("blk"),
        col("sz").as("sz_a"), col("g"))
      val b = ex.select(col("id").as("id_b"), col("blk").as("blk_b"),
        col("sz").as("sz_b"), col("g").as("g_b"))
      a.join(b, col("blk") === col("blk_b") && col("g") === col("g_b") &&
          col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(count(lit(1)).as("inter"))
        .withColumn("cont_ab",
          round(col("inter").cast("double") / col("sz_a"), 6))
        .withColumn("cont_ba",
          round(col("inter").cast("double") / col("sz_b"), 6))
        .filter(greatest(col("cont_ab"), col("cont_ba")) >= minContainment)
        .select("id_a", "id_b", "cont_ab", "cont_ba")
        .transform(Pin.pin) // small: only passing pairs
    } finally { ex.unpersist(); () }
  }

  /** Full posting-list self-join: every shared shingle becomes a join row.
    * Right at LOW thresholds, where the prefix filter would keep most of
    * each set anyway.
    */
  private def fullPostingPairs(ex: DataFrame,
                               minJaccard: Double): DataFrame = {
    val a = ex.select(col("id").as("id_a"), col("blk"), col("sz").as("sz_a"),
      col("g"))
    val b = ex.select(col("id").as("id_b"), col("blk").as("blk_b"),
      col("sz").as("sz_b"), col("g").as("g_b"))
    val inter = col("inter").cast("double")
    val union = (col("sz_a") + col("sz_b")).cast("double") - inter
    // exact length pruning: J(A,B) ≥ t forces t·|A| ≤ |B| ≤ |A|/t
    // (|A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|) and |A∩B| ≤ min(|A|,|B|)), so
    // size-mismatched pairs can be dropped inside the join with zero
    // false negatives — on skewed corpora this is most of the pairs.
    // Pruned with a 1e-6 slack because the FINAL filter compares the
    // 6-decimal ROUNDED jaccard: a pair whose true J sits just under t
    // but rounds up to t must survive the prune too.
    val tSlack = minJaccard - 1e-6
    a.join(b, col("blk") === col("blk_b") && col("g") === col("g_b") &&
        col("id_a") < col("id_b") &&
        col("sz_a") >= col("sz_b") * tSlack &&
        col("sz_b") >= col("sz_a") * tSlack)
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(inter / union, 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
      .transform(Pin.pin) // small: only passing pairs
  }

  /** Prefix-filtered exact pair generation (the AllPairs/PPJoin principle)
    * for HIGH thresholds: order every document's shingles by global
    * rarity (frequency asc, shingle asc — one total order corpus-wide);
    * a pair with J ≥ t must share a shingle inside BOTH documents'
    * prefixes of length `|d| − ⌈t·|d|⌉ + 1` (if all shared shingles sat
    * in a suffix of length ⌈t·|d|⌉ − 1 < ⌈t·|d|⌉ ≤ |A∩B|, the suffix
    * couldn't hold them), so the candidate join touches only the rarest
    * ~(1−t) of each posting list — at t = 0.8 that is ~25× less join
    * volume than the full self-join, and popular boilerplate shingles
    * (the quadratic hot keys at corpus scale) land OUTSIDE the prefixes.
    * Survivors are verified with their exact intersection size from the
    * full (cached) posting lists, so output is IDENTICAL to
    * [[fullPostingPairs]] (asserted pairwise on random corpora in
    * DedupSpec).
    */
  private def prefixFilteredPairs(ex: DataFrame,
                                  minJaccard: Double): DataFrame = {
    val tSlack = minJaccard - 1e-6
    // global rarity order; ties on the shingle string keep it total
    val freq = ex.groupBy("g").agg(count(lit(1)).as("fcnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("fcnt"), col("g"))
    val prefixLen = (col("sz") - ceil(col("sz") * tSlack) + 1).cast("int")
    val pre = ex.join(freq, "g")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= prefixLen)
      .select("id", "blk", "sz", "g")
    // candidates: prefix × prefix on (block, shingle) + length pruning
    val cands = pre.select(col("id").as("id_a"), col("blk"),
        col("sz").as("sz_a"), col("g"))
      .join(pre.select(col("id").as("id_b"), col("blk").as("blk_b"),
          col("sz").as("sz_b"), col("g").as("g_b")),
        col("blk") === col("blk_b") && col("g") === col("g_b") &&
          col("id_a") < col("id_b") &&
          col("sz_a") >= col("sz_b") * tSlack &&
          col("sz_b") >= col("sz_a") * tSlack)
      .select("id_a", "id_b", "sz_a", "sz_b").distinct()
    // exact verify: true intersection size from the full posting lists
    val inter = col("inter").cast("double")
    val union = (col("sz_a") + col("sz_b")).cast("double") - inter
    val pa = ex.select(col("id").as("ja"), col("g").as("ga"))
    val pb = ex.select(col("id").as("jb"), col("g").as("gb"))
    cands
      .join(pa, col("id_a") === col("ja"))
      .join(pb, col("id_b") === col("jb") && col("ga") === col("gb"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(inter / union, 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
      .transform(Pin.pin) // small: only passing pairs
  }

  /** MinHash-LSH near-duplicate candidate pairs at Jaccard distance ≤
    * `maxDistance`, over token `n`-gram shingle sets (the same similarity
    * definition as [[ngramJaccardPairs]], so LSH recall is directly
    * measurable against the exact quadratic baseline). Deterministic for a
    * fixed seed. Returns (id_a, id_b, jaccard_dist) with id_a < id_b.
    *
    * Signatures come from Spark ML's seeded `MinHashLSH`, but the
    * candidate join is done by hand instead of `approxSimilarityJoin`:
    * that method joins the exploded (×numHashTables) rows WITH their full
    * 2^18-dim tf vectors attached, so the shuffle carries every doc's
    * sparse vector numHashTables times — measured as the dominant cost at
    * every scale. Here the join sees only (id, table, hash) rows; the
    * surviving candidate pairs (orders of magnitude fewer than docs) fetch
    * the tf index sets once for an exact-distance verify. Same output —
    * `keyDistance` is 1 − |∩|/|∪| over the tf non-zero index sets, which
    * is what the typed merge below computes.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDistance: Double, n: Int = 3, numHashTables: Int = 4,
                   seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sparkContext.defaultParallelism
    // Typed shingling for the same reasons as in ngramJaccardPairs:
    // codegen-immune HOFs + single-split scans serialize the hot stage.
    val docs = df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .repartition(nPart)
      .map { case (id, text) =>
        (id, TextAnalysis.shingleSetOf(text, n).toSeq)
      }
      .toDF("id", "toks")
      .filter(size(col("toks")) > 0) // MinHashLSH requires ≥1 non-zero entry
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(docs)
    val mh = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = mh.fit(featured)
    // One cached materialization of the shingle→TF→minhash pipeline; both
    // narrow derivations below read it from memory.
    val signed = model.transform(featured)
      .select(col("id"), col("tf"), col("sig")).cache()
    try {
      // (1) candidates: docs sharing any hash table's value. Only
      // (id, table, hash) crosses the shuffle.
      val sigRows = Similarity.lshBucketRows(signed, "id", "sig")
      val cands = sigRows.select(col("id").as("id_a"), col("tbl"), col("h"))
        .join(sigRows.select(col("id").as("id_b"), col("tbl").as("tbl_b"),
            col("h").as("h_b")),
          col("tbl") === col("tbl_b") && col("h") === col("h_b") &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      // (2) exact verify: Jaccard distance over the tf non-zero index sets
      // (indices of a SparseVector are sorted → linear merge intersection).
      val idx = signed.select(col("id"), col("tf"))
        .as[(Long, org.apache.spark.ml.linalg.Vector)]
        .map { case (id, v) =>
          val sv = v match {
            case s: org.apache.spark.ml.linalg.SparseVector => s
            case d => d.toSparse
          }
          (id, sv.indices)
        }
        .toDF("sid", "idx")
      cands
        .join(idx, col("id_a") === col("sid")).drop("sid")
        .withColumnRenamed("idx", "idx_a")
        .join(idx, col("id_b") === col("sid")).drop("sid")
        .withColumnRenamed("idx", "idx_b")
        .as[(Long, Long, Array[Int], Array[Int])]
        .flatMap { case (a, b, ia, ib) =>
          var i = 0; var j = 0; var inter = 0
          while (i < ia.length && j < ib.length) {
            if (ia(i) == ib(j)) { inter += 1; i += 1; j += 1 }
            else if (ia(i) < ib(j)) i += 1
            else j += 1
          }
          val d = 1.0 - inter.toDouble / (ia.length + ib.length - inter)
          // strict < on the raw distance (approxSimilarityJoin's exact
          // contract — Spark filters distCol < threshold), round half-up
          // for output
          if (d < maxDistance)
            Iterator.single((a, b,
              java.math.BigDecimal.valueOf(d)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
          else Iterator.empty
        }
        .toDF("id_a", "id_b", "jaccard_dist")
        .transform(Pin.pin)
    } finally { signed.unpersist(); () }
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    * of the pair graph, labeled by each component's minimum doc id — the
    * step that turns "these documents look alike" into per-document
    * keep/drop decisions (`keep = id == cluster_id`, the usual
    * keep-the-smallest-id policy).
    *
    * Distributed min-label propagation on the RDD API (iterative loop →
    * RDD, same rationale as the greedy selection): per iteration each
    * vertex takes the min of its own and its neighbors' labels
    * (`union` + `reduceByKey(min)` — map-side combined, one shuffle per
    * iteration bounded by |E|), converging in O(component diameter)
    * iterations. Near-dup components are cliques or near-cliques, so 2–3
    * iterations in practice; `maxIterations` caps adversarial chains.
    *
    * Only docs appearing in ≥1 pair are emitted (singletons are trivially
    * their own cluster). Returns (doc_id, cluster_id, keep).
    */
  def dupClusters(pairs: DataFrame, aCol: String = "id_a",
                  bCol: String = "id_b",
                  maxIterations: Int = 20,
                  driverEdgeLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Persisted before the size probe: count() executes the full upstream
    // pair pipeline, and without a shared materialization the chosen path
    // (collect() or .rdd) would re-execute it — doubling the dominant cost
    // for any caller that didn't checkpoint its pairs.
    val edgeDf = pairs
      .select(col(aCol).cast("long"), col(bCol).cast("long"))
      .persist()
    try {
    // Adaptive: below `driverEdgeLimit` edges (16 bytes each — ≤16 MB)
    // union-find on the driver beats ~5 scheduler round-trips per
    // propagation iteration by orders of magnitude; above it, the
    // distributed min-label loop is the only thing that fits. Both paths
    // produce identical labels (min id per component).
    val nEdges = edgeDf.count()
    if (nEdges <= driverEdgeLimit) {
      val es = edgeDf.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min root so labels are min ids
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      return parent.keys.toSeq.sorted
        .map(id => (id, find(id), id == find(id)))
        .toDF("doc_id", "cluster_id", "keep")
    }
    val edges = edgeDf.as[(Long, Long)].rdd
    // Everything in the loop is pinned to ONE fixed partitioner: without
    // it, each union grows the partition count, compounding into
    // thousand-task stages by iteration ~10 (observed) — with it, the
    // neighbor join is narrow (co-partitioned, no shuffle) and each
    // iteration shuffles exactly |E| rows into P reducers.
    val part = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    // both directions, keyed by the label SOURCE vertex
    val byNeighbor = edges
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part)
      .cache()
    var lbl = byNeighbor.keys.distinct(part.numPartitions)
      .map(v => (v, v)).partitionBy(part).cache()
    // Convergence needs O(component diameter) iterations; `maxIterations`
    // is a soft target, auto-extended (each extra pass is one cheap
    // co-partitioned shuffle) up to a 10× hard cap so long chain-shaped
    // components (diameter > 20, e.g. template-heavy corpora) still get
    // correct labels instead of a silent wrong answer.
    val hardCap = maxIterations * 10
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < hardCap) {
      if (iter == maxIterations)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"dupClusters: not converged after $maxIterations iterations " +
            s"($changed labels still changing); extending to $hardCap")
      val msgs = byNeighbor.join(lbl, part)
        .map { case (_, (dst, l)) => (dst, l) }
      val next = lbl.union(msgs)
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b)).cache()
      changed = next.join(lbl, part)
        .filter { case (_, (n, o)) => n != o }.count()
      lbl.unpersist()
      lbl = next
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters: min-label propagation did not converge after " +
          s"$hardCap iterations ($changed labels still changing) — " +
          "component diameter exceeds the cap; raise maxIterations")
    val out = lbl
      .map { case (id, c) => (id, c, id == c) }
      .toDF("doc_id", "cluster_id", "keep")
      .transform(Pin.pin) // small: one row per paired doc
    lbl.unpersist()
    byNeighbor.unpersist()
    out
    } finally { edgeDf.unpersist(); () }
  }

  /** Banded MinHash near-dup pairs — the b-bands × r-rows LSH scheme
    * production text-dedup pipelines use (AND-amplification within a band,
    * OR across bands: P[candidate] = 1 − (1 − J^r)^b), which Spark ML's
    * `MinHashLSH` cannot express (its hash tables are single-row → OR-only,
    * so low-similarity pairs collide constantly and the candidate join
    * explodes on template-heavy corpora).
    *
    * Pipeline, all near-linear and fully shuffled-parallel:
    *   1. per doc (typed flatMap, JIT-tight): distinct shingles → 64-bit
    *      base hashes → b·r seeded universal minhashes → one (bandIdx,
    *      bandSig, id) row per band;
    *   2. equi-self-join on (bandIdx, bandSig), distinct (id_a < id_b)
    *      candidate pairs;
    *   3. exact verification: candidates join back to the shingle sets and
    *      a typed map computes true Jaccard — output contract is identical
    *      to [[ngramJaccardPairs]] (id_a, id_b, jaccard ≥ minJaccard), just
    *      with LSH recall instead of exhaustive candidates.
    *
    * Seeded → deterministic. Returns (id_a, id_b, jaccard).
    */
  def bandedMinHashPairs(df: DataFrame, idCol: String, textCol: String,
                         minJaccard: Double, n: Int = 3, bands: Int = 16,
                         rowsPerBand: Int = 4,
                         seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sparkContext.defaultParallelism
    val k = bands * rowsPerBand
    // Universal-hash parameters off a splitmix64 stream: deterministic for
    // a fixed seed, odd multipliers so no hash collapses.
    val coefs: Array[(Long, Long)] = {
      var x = seed
      def next(): Long = {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      Array.fill(k)((next() | 1L, next()))
    }
    val bCoefs = spark.sparkContext.broadcast(coefs)

    def shingleHashes(text: String): Array[Long] = {
      val sh = TextAnalysis.shingleSetOf(text, n)
      val out = new Array[Long](sh.length)
      var i = 0
      while (i < sh.length) {
        // FNV-1a 64 over the shingle chars
        var h = 0xcbf29ce484222325L
        val s = sh(i)
        var j = 0
        while (j < s.length) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
        out(i) = h
        i += 1
      }
      out
    }

    val docs = df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .repartition(nPart)

    // (1) one (bandIdx, bandSig, id) row per band per doc
    val bandRows = docs.flatMap { case (id, text) =>
      val hs = shingleHashes(text)
      if (hs.isEmpty) Iterator.empty
      else {
        val cs = bCoefs.value
        val sig = new Array[Long](k)
        var i = 0
        while (i < k) {
          val (a, b) = cs(i)
          var mn = Long.MaxValue
          var j = 0
          while (j < hs.length) {
            val v = a * hs(j) + b
            if (v < mn) mn = v
            j += 1
          }
          sig(i) = mn
          i += 1
        }
        (0 until bands).iterator.map { bi =>
          var h = 0xcbf29ce484222325L
          var r = 0
          while (r < rowsPerBand) {
            val v = sig(bi * rowsPerBand + r)
            var s = 0
            while (s < 64) { h ^= ((v >>> s) & 0xffL); h *= 0x100000001b3L; s += 8 }
            r += 1
          }
          (bi, h, id)
        }
      }
    }.toDF("band", "sig", "id")

    // (2) candidates: pairs sharing any band signature
    val l = bandRows.select(col("band"), col("sig"), col("id").as("id_a"))
    val r = bandRows.select(col("band").as("band_b"), col("sig").as("sig_b"),
      col("id").as("id_b"))
    val cands = l.join(r,
        col("band") === col("band_b") && col("sig") === col("sig_b") &&
          col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // (3) exact verify: fetch both shingle sets, true Jaccard in a typed map
    val sets = docs.map { case (id, text) =>
      (id, TextAnalysis.shingleSetOf(text, n).toSeq)
    }.toDF("sid", "sh")
    cands
      .join(sets, col("id_a") === col("sid")).drop("sid")
      .withColumnRenamed("sh", "sh_a")
      .join(sets, col("id_b") === col("sid")).drop("sid")
      .withColumnRenamed("sh", "sh_b")
      .as[(Long, Long, Seq[String], Seq[String])]
      .map { case (a, b, sa, sb) =>
        val set = sa.toSet
        var inter = 0
        sb.foreach(g => if (set.contains(g)) inter += 1)
        val j = inter.toDouble / (sa.size + sb.size - inter)
        (a, b, math.rint(j * 1e6) / 1e6)
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter(col("jaccard") >= minJaccard)
  }

  /** Cross-corpus contamination: TRAIN documents whose n-gram Jaccard
    * similarity to some EVAL document reaches `minJaccard` — the
    * decontamination sweep every training corpus runs against its
    * benchmark/eval sets before training. Same inverted-index shape as
    * [[ngramJaccardPairs]] but across two datasets (no blocking key: an
    * eval doc must be found wherever it leaked), so cost is proportional
    * to actual shingle collisions between the corpora, never
    * |train|×|eval|. A broadcast Bloom filter of the eval shingles
    * pre-drops non-colliding train postings before the shuffle (no
    * false negatives, so the exact join still sees every true match).
    *
    * Returns (train_id, eval_id, jaccard) — every contaminated pair, the
    * caller anti-joins train against it to drop flagged docs.
    */
  def contaminationPairs(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int, minJaccard: Double,
                         bloomFpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val nPart = spark.sparkContext.defaultParallelism
    def postings(df: DataFrame, idOut: String, szOut: String,
                 gOut: String): DataFrame =
      df.select(col(idCol).cast("long").as("id"),
          col(textCol).cast("string").as("text"))
        .as[(Long, String)]
        .repartition(nPart)
        .flatMap { case (id, text) =>
          val sh = TextAnalysis.shingleSetOf(text, n)
          sh.iterator.map(g => (id, sh.length, g))
        }
        .toDF(idOut, szOut, gOut)
    val t = postings(train, "train_id", "sz_t", "g")
    val e = postings(eval, "eval_id", "sz_e", "g_e").cache()
    try {
      // Bloom pre-filter on the big side: the eval corpus is tiny next to
      // train, so almost every train posting matches nothing — a
      // broadcast Bloom filter of the eval shingles drops those BEFORE
      // the shuffle, cutting the exchanged volume to (collisions +
      // fpp·postings). No false negatives → the exact join below sees
      // every true match; false positives are discarded by the join.
      // This is the sketch-accelerated semi-join shape used at 100 TB.
      val nEvalPostings = math.max(e.count(), 1L)
      val bloom = e.stat.bloomFilter("g_e", nEvalPostings, bloomFpp)
      val bBloom = spark.sparkContext.broadcast(bloom)
      val mightMatch = udf((g: String) => bBloom.value.mightContainString(g))
      val inter = col("inter").cast("double")
      val union = (col("sz_t") + col("sz_e")).cast("double") - inter
      // length pruning with rounding slack — see ngramJaccardPairs
      val tSlack = minJaccard - 1e-6
      t.filter(mightMatch(col("g")))
        .join(e, col("g") === col("g_e") &&
          col("sz_t") >= col("sz_e") * tSlack &&
          col("sz_e") >= col("sz_t") * tSlack)
        .groupBy("train_id", "eval_id", "sz_t", "sz_e")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", round(inter / union, 6))
        .filter(col("jaccard") >= minJaccard)
        .select("train_id", "eval_id", "jaccard")
        .transform(Pin.pin) // small: only flagged pairs
    } finally { e.unpersist(); () }
  }

  /** Duplicated-span coverage: per document, the fraction of its token
    * positions covered by at least one `n`-gram that also occurs in some
    * OTHER document — the boilerplate/memorization diagnostic
    * training-data audits run before substring-level dedup (a doc whose
    * text is mostly shared spans is template noise even when no single
    * near-dup pair crosses a Jaccard threshold).
    *
    * Shape, all shuffled-parallel: positions explode linearly (one row
    * per (doc, shingle position)); duplicated shingles come from one
    * hash aggregation (distinct-doc count > 1); coverage is a join back
    * on shingle + a distinct over covered positions. No pairwise
    * comparisons anywhere — cost is O(total tokens), independent of how
    * many documents share a span.
    *
    * Returns (idCol, n_tokens, n_covered, dup_frac) per document —
    * dup_frac rounded to 6 decimals; docs shorter than `n` tokens have
    * zero coverage.
    */
  def duplicatedSpanStats(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sparkContext.defaultParallelism
    val base = df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .repartition(nPart)
    // (id, pos, shingle) — positions matter here, so this is the
    // positional sibling of shingleSetOf (typed flatMap, JIT-tight)
    val sh = base.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 to toks.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        (id, i, sb.toString)
      }
    }.toDF("id", "pos", "g")
    val dup = sh.groupBy("g")
      .agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") > 1)
      .select("g")
    val covered = sh.join(dup, "g")
      .select(col("id").as("cid"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
      .groupBy("cid")
      .agg(count(lit(1)).as("n_covered"))
    val nToks = base.map { case (id, text) => (id, text.split(" ", -1).length) }
      .toDF("id", "n_tokens")
    nToks.join(covered, col("id") === col("cid"), "left")
      .select(col("id").as(idCol), col("n_tokens").cast("long"),
        coalesce(col("n_covered"), lit(0L)).cast("long").as("n_covered"),
        round(coalesce(col("n_covered"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_frac"))
  }

  // ---- substring-level dedup: content-defined chunking -------------------

  /** Per-token content-defined chunk ids — the primitive under
    * substring-level dedup (the span family's q_dup_span catches FIXED
    * n-token spans; CDC catches repeated substrings of ANY length).
    *
    * Chunking rule, deterministic and engine-reproducible: each token
    * hashes to the first 8 hex digits of its md5 (an exact 32-bit integer
    * in any engine); a chunk BOUNDARY falls after token i when the
    * rolling hash of the 3-token window ending at i
    * (`th(i−2)·961 + th(i−1)·31 + th(i)`) is ≡ 0 mod `d` — so boundaries
    * depend only on a 3-token suffix of content, and an edit shifts
    * boundaries only locally (the CDC property fixed-width shingles lack;
    * same recipe as content-defined chunking in dedup storage systems,
    * with the token stream in place of bytes). Mean chunk length ≈ `d`
    * tokens; documents shorter than 3 tokens form one chunk.
    *
    * Everything is Catalyst window/agg expressions (codegen'd, no UDF);
    * cost is one shuffle by document for the windows — linear, the shape
    * that survives 100 TB.
    *
    * Returns one row per (id, pos, tok, chunk_id).
    */
  private def cdcTokens(df: DataFrame, idCol: String, textCol: String,
                        d: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val th = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val wh = lag(col("th"), 2).over(w) * 961L +
      lag(col("th"), 1).over(w) * 31L + col("th")
    df.select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("th", th)
      .withColumn("boundary",
        when(wh.isNotNull && wh % d === 0, 1L).otherwise(0L))
      .withColumn("chunk_id",
        coalesce(sum(col("boundary")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .select("id", "pos", "tok", "chunk_id")
  }

  /** Content-defined chunks per document: (id, chunk_id, chunk_text,
    * n_toks, chash) — `chash` is the md5 of the space-joined chunk text,
    * the identity used for cross-document matching.
    */
  private def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                        d: Int): DataFrame =
    cdcTokens(df, idCol, textCol, d)
      .groupBy("id", "chunk_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"),
          col("tok")))), x => x.getField("tok")), " ").as("chunk_text"),
        count(lit(1)).as("n_toks"))
      .withColumn("chash", md5(col("chunk_text")))

  /** Substring-level duplication stats per document: the fraction of each
    * document's tokens that sit inside a content-defined chunk whose text
    * also occurs in at least one OTHER document. The variable-length
    * sibling of [[duplicatedSpanStats]] — a long boilerplate block counts
    * once however long it is, and chunks shared at any length are caught
    * without choosing an n.
    *
    * Shape: chunking is linear (window functions by doc); shared-chunk
    * detection is one hash aggregation on `chash` (distinct-doc count ≥
    * 2) + a join back — no pairwise work anywhere.
    *
    * Returns (idCol, n_tokens, n_shared_tokens, cdc_dup_frac) per doc,
    * `cdc_dup_frac` rounded to 6 decimals.
    */
  def cdcSharedChunkStats(df: DataFrame, idCol: String, textCol: String,
                          d: Int = 8): DataFrame = {
    val chunks = cdcChunks(df, idCol, textCol, d)
    val shared = chunks.groupBy("chash")
      .agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("chash").as("sh_hash"))
    chunks
      .join(shared, col("chash") === col("sh_hash"), "left")
      .groupBy("id")
      .agg(sum(col("n_toks")).as("n_tokens"),
        sum(when(col("sh_hash").isNotNull, col("n_toks")).otherwise(0L))
          .as("n_shared_tokens"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_shared_tokens"),
        round(col("n_shared_tokens").cast("double") / col("n_tokens"), 6)
          .as("cdc_dup_frac"))
  }

  /** Substring-level dedup REMOVAL: each document's text with its shared
    * content-defined chunks stripped (token order preserved) — the
    * cleanup step after [[cdcSharedChunkStats]] flags boilerplate.
    * Returns (idCol, cleaned_text, n_tokens, n_kept_tokens).
    */
  def cdcStripShared(df: DataFrame, idCol: String, textCol: String,
                     d: Int = 8): DataFrame = {
    val chunks = cdcChunks(df, idCol, textCol, d)
    val shared = chunks.groupBy("chash")
      .agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("chash").as("sh_hash"))
    chunks
      .join(shared, col("chash") === col("sh_hash"), "left")
      .groupBy("id")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("chunk_id"),
            when(col("sh_hash").isNull, col("chunk_text"))
              .otherwise(lit(null)).as("kept")))),
          x => x.getField("kept")), " ").as("cleaned_text"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("sh_hash").isNull, col("n_toks")).otherwise(0L))
          .as("n_kept_tokens"))
      .select(col("id").as(idCol), col("cleaned_text"), col("n_tokens"),
        col("n_kept_tokens"))
  }

  /** ExactSubstr-style suffix-window dedup: per document, the merged
    * token spans covered by a `w`-token window whose exact text occurs at
    * ≥ 2 sites in the corpus (within- or cross-document) — the fixed-
    * granularity complement of [[cdcSharedChunkStats]]: a repeated run
    * that straddles a CDC chunk boundary is only partially caught there,
    * while every length-≥`w` repeat is fully covered by overlapping
    * `w`-windows here (the sliding-window spelling of the suffix-array
    * ExactSubstr pass).
    *
    * Shape, in scale order: (1) token hashing is a projection; (2) the
    * candidate key per window start — (Σ token-hash over the window,
    * first hash, last hash) — is a sliding windowed sum, O(tokens) rows
    * through one by-doc sort; (3) ONE corpus-wide hash shuffle counts key
    * sites, and only keys at ≥ 2 sites survive; (4) window TEXT is
    * materialized for survivors only (the O(candidates·w) cost lands on
    * the tiny candidate set, never the corpus) and verified by exact
    * md5 equality; (5) span merge is a by-doc gaps-and-islands window.
    * No pairwise work anywhere; every stage is a hash shuffle or a by-doc
    * window.
    *
    * Returns per doc: (idCol, n_tokens, n_dup_windows, n_spans,
    * dup_tokens, substr_dup_frac) — zero-filled for clean docs,
    * `substr_dup_frac` rounded to 6 decimals.
    */
  def substrDupSpanStats(df: DataFrame, idCol: String, textCol: String,
                         w: Int = 50): DataFrame = {
    require(w >= 2, "window must be >= 2 tokens")
    val toks = df.select(col(idCol).as("id"),
      split(col(textCol), " ").as("t"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("s")
    // (2) start-anchored candidate key over tokens s..s+w-1
    val keyed = toks
      .select(col("id"), size(col("t")).cast("long").as("n_tokens"),
        posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("id"), col("n_tokens"), (col("p0") + 1).as("s"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          .as("th"))
      .select(col("id"), col("n_tokens"), col("s"),
        sum(col("th")).over(byDoc.rowsBetween(0, w - 1)).as("whs"),
        col("th").as("th_first"),
        lead(col("th"), w - 1).over(byDoc).as("th_last"))
      .filter(col("s") <= col("n_tokens") - w + 1)
    // (3) corpus-wide pre-filter: candidate keys seen at >= 2 sites
    val cand = keyed
      .withColumn("nk", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("whs", "th_first", "th_last")))
      .filter(col("nk") >= 2)
    // (4) exact verify on survivors: window text occurs at >= 2 sites
    val dup = cand
      .join(toks, "id")
      .select(col("id"), col("n_tokens"), col("s"),
        md5(array_join(slice(col("t"), col("s"), lit(w)), " ")).as("h"))
      .withColumn("nsites",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("h")))
      .filter(col("nsites") >= 2)
    // (5) merge overlapping windows ([s, s+w-1] runs with gap <= w) into
    // spans; coverage per island = last_start - first_start + w
    val spans = dup
      .withColumn("ni",
        when(col("s") - lag(col("s"), 1).over(byDoc) <= w, 0L)
          .otherwise(1L))
      .withColumn("isl", sum(col("ni")).over(byDoc))
      .groupBy("id", "n_tokens", "isl")
      .agg(min(col("s")).as("s0"), max(col("s")).as("s1"),
        count(lit(1)).as("nw"))
      .groupBy("id")
      .agg(sum(col("nw")).as("n_dup_windows"),
        count(lit(1)).as("n_spans"),
        sum(col("s1") - col("s0") + w).as("dup_tokens"))
    toks.select(col("id"), size(col("t")).cast("long").as("n_tokens"))
      .join(spans, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("substr_dup_frac"))
  }

  /** Removal twin of [[substrDupSpanStats]]: each document's text with
    * the tokens inside duplicated-window spans stripped (token order
    * preserved) — the cleanup step after the stats pass flags repeats.
    * Keeps ONE copy semantics out of scope on purpose (like
    * [[cdcStripShared]], every site of a repeated span is stripped; the
    * keep-lowest-id policy belongs to doc-level dedup).
    * Returns (idCol, cleaned_text, n_tokens, n_kept_tokens).
    */
  def substrStripShared(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 50): DataFrame = {
    // A token at 1-based position p is stripped iff some duplicated
    // window start s has s <= p <= s + w - 1; duplicated starts are
    // found exactly as in [[substrDupSpanStats]] and collected per doc
    // (bounded by tokens-per-doc), then the strip is one per-token
    // array filter.
    val toks = df.select(col(idCol).as("id"), split(col(textCol), " ")
      .as("t"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("s")
    val keyed = toks
      .select(col("id"), size(col("t")).cast("long").as("n_tokens"),
        posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("id"), col("n_tokens"), (col("p0") + 1).as("s"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          .as("th"))
      .select(col("id"), col("n_tokens"), col("s"),
        sum(col("th")).over(byDoc.rowsBetween(0, w - 1)).as("whs"),
        col("th").as("th_first"),
        lead(col("th"), w - 1).over(byDoc).as("th_last"))
      .filter(col("s") <= col("n_tokens") - w + 1)
    val cand = keyed
      .withColumn("nk", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("whs", "th_first", "th_last")))
      .filter(col("nk") >= 2)
    val dupStarts = cand
      .join(toks, "id")
      .select(col("id"), col("s"),
        md5(array_join(slice(col("t"), col("s"), lit(w)), " ")).as("h"))
      .withColumn("nsites",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("h")))
      .filter(col("nsites") >= 2)
      .groupBy("id")
      .agg(collect_set(col("s")).as("starts"))
    toks
      .join(dupStarts, Seq("id"), "left")
      .select(col("id").as(idCol),
        array_join(filter(col("t"), (tok, i) =>
          col("starts").isNull ||
            !exists(col("starts"), st =>
              st <= i + 1 && i + 1 <= st + (w - 1))), " ")
          .as("cleaned_text"),
        size(col("t")).cast("long").as("n_tokens"),
        size(filter(col("t"), (tok, i) =>
          col("starts").isNull ||
            !exists(col("starts"), st =>
              st <= i + 1 && i + 1 <= st + (w - 1)))).cast("long")
          .as("n_kept_tokens"))
  }

  /** 64-bit SimHash of a token array (deterministic: token hash is a
    * 64-bit FNV-1a, bit-vote aggregation). Column-level UDF.
    */
  val simHash64: Column => Column = {
    val f = udf { toks: Seq[String] =>
      val votes = new Array[Int](64)
      toks.foreach { t =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) {
          h ^= t.charAt(i).toLong
          h *= 0x100000001b3L
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    toks => f(toks)
  }

  /** SimHash signatures per doc: (id, simhash, bucket16) — bucket16 is the
    * top-16-bit LSH bucket used as the candidate-blocking key at scale.
    */
  def simHashSignatures(df: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        simHash64(TextAnalysis.tokens(col(textCol))).as("simhash"))
      .withColumn("bucket16", shiftrightunsigned(col("simhash"), 48))
}
