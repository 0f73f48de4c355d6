package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Embedding-similarity search operators.
  *
  * Brute-force cosine top-k is the exactness baseline: one pass of the
  * full table per query batch (queries broadcast, so the big side never
  * shuffles — at 100 TB this is a single map-side scan). The LSH variant
  * is the scale path: signatures are linear to compute and candidate
  * generation is an equi-join on hash buckets, trading a controllable
  * recall loss for avoiding the full scan per query.
  *
  * All arithmetic is done in doubles (`zip_with` product + `aggregate`
  * sum — codegen'd higher-order functions, no UDF), and similarities are
  * rounded to 6 decimals before ranking so that ordering is deterministic
  * across engines and partitionings; ties break on neighbor id.
  */
object Similarity {

  /** dot(a, b) over two array<double> columns — a native codegen'd
    * Catalyst expression (see [[graft.functions.ArrayMath.dotProduct]]);
    * the `zip_with`+`aggregate` spelling costs an interpreted lambda per
    * element, ~50× slower in the O(n²) pair stages.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayMath.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns, rounded to 6
    * decimals.
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** L2-normalized copies of an embedding column as (idOut: long, uOut:
    * array<double>) — a typed tight-loop map rather than the
    * `transform(e, x => x / nrm)` HOF spelling: interpreted higher-order
    * lambdas fall out of codegen and degrade ~15× once a warm JVM makes
    * `Expression.eval` call sites megamorphic (measured; see
    * TextAnalysis.shingleSetOf for the same pattern). Arithmetic is
    * identical (sequential sum-of-squares, sqrt, per-element divide), so
    * results match the HOF form and the DuckDB oracles bit-for-bit.
    */
  private[graft] def unitVectors(df: DataFrame, idCol: String,
                                 embCol: String, idOut: String,
                                 uOut: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long"), col(embCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, e) =>
        var ss = 0.0
        var i = 0
        while (i < e.length) { ss += e(i) * e(i); i += 1 }
        val n = math.sqrt(ss)
        val u = new Array[Double](e.length)
        i = 0
        while (i < e.length) { u(i) = e(i) / n; i += 1 }
        (id, u)
      }
      .toDF(idOut, uOut)
  }

  private[graft] def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Narrow LSH bucket rows (idName, tbl, h) from a hashed dataset: one
    * row per (input row, hash table) carrying only the 1-element hash
    * value — the join-side shape every LSH candidate generator here
    * shares (vs `approxSimilarityJoin`'s exploded rows with the full
    * vectors attached). One implementation so the three call sites
    * (minHashPairs, cosineNearDupLsh, lshCandidates) cannot drift.
    */
  private[graft] def lshBucketRows(df: DataFrame, idName: String,
                                   hashCol: String): DataFrame = {
    val hv = org.apache.spark.ml.functions.vector_to_array(col("hv"))
    df.select(col(idName), posexplode(col(hashCol)).as(Seq("tbl", "hv")))
      .select(col(idName), col("tbl"),
        // Current Spark LSH models emit exactly one value per hash table;
        // if a model ever emits more, equality on element 0 alone would
        // silently WEAKEN the candidate join to first-element equality —
        // fail loudly instead.
        when(size(hv) === 1, hv.getItem(0))
          .otherwise(raise_error(lit(
            "lshBucketRows: expected a 1-element hash vector per table")))
          .as("h"))
  }

  /** Probe-batch fence for the query-collecting ANN paths (r12 verdict
    * #3, mirroring `IterativeFeatureSelection.DefaultMaxInstances`):
    * [[pqTopK]]/[[ivfPqTopK]] collect the query batch and broadcast
    * per-query ADC tables (~1 KB each at m=8,kCode=16), and
    * [[AnnIndex.queryIvf]] broadcasts the probed query vectors — all
    * correct ONLY for probe-batch-sized query sets. The fence turns a
    * silent driver/broadcast blow-up at 1000× batch size into a loud,
    * named error; callers with bigger batches shard them (or use the
    * join-based [[ivfTopK]] path, which never collects queries).
    */
  val DefaultMaxQueryBatch: Int = 32768

  /** The collected, unit-normalized query batch, fenced at
    * `maxQueryBatch` rows — `take(max+1)` so an over-limit batch fails
    * the size check without ever materializing more than max+1 rows on
    * the driver.
    */
  private[graft] def collectQueryBatch(queries: DataFrame, idCol: String,
                                       embCol: String, op: String,
                                       maxQueryBatch: Int)
  : Array[(Long, Array[Double])] = {
    val s = queries.sparkSession
    import s.implicits._
    val qs = unitVectors(queries, idCol, embCol, "qid", "qu")
      .as[(Long, Array[Double])].take(maxQueryBatch + 1)
    require(qs.length <= maxQueryBatch,
      s"$op: query batch exceeds maxQueryBatch=$maxQueryBatch — this " +
        "path collects the batch and broadcasts per-query state; shard " +
        "the batch or raise maxQueryBatch deliberately")
    qs
  }

  /** Bounded deterministic UNBIASED training sample of unit vectors:
    * rows ordered by a hash of the id, not by the id itself — low ids
    * usually correlate with one ingestion source/time slice, and a
    * prefix sample would collapse the quantizer onto a single content
    * cluster. Hash order is reproducible across runs and partitionings;
    * cost is one top-K job regardless of corpus size.
    */
  private[graft] def trainSample(corpus: DataFrame,
                                 sampleSize: Int): Array[Array[Double]] = {
    val s = corpus.sparkSession
    import s.implicits._
    corpus.orderBy(xxhash64(col("nid")), col("nid")).limit(sampleSize)
      .select("nid", "nu").as[(Long, Array[Double])].collect().map(_._2)
  }

  /** Per-subspace PQ codebooks trained on the sample's subvector slices
    * (shared by [[pqTopK]] and [[ivfPqTopK]] — one implementation so the
    * two operators can never drift).
    */
  private def trainBooks(sample: Array[Array[Double]], m: Int, dsub: Int,
                         kCode: Int, iters: Int,
                         seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(m) { sub =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(
        v, sub * dsub, (sub + 1) * dsub))
      l2KMeans(pts, kCode, iters, seed + sub)
    }

  /** m byte codes for one unit vector under `books`. */
  private def encodePq(u: Array[Double], books: Array[Array[Array[Double]]],
                       m: Int, dsub: Int): Array[Byte] = {
    val cs = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      cs(sub) = argminL2(u, sub * dsub, books(sub)).toByte
      sub += 1
    }
    cs
  }

  /** ADC lookup table for one query: table(sub)(code) = ‖q_sub − c‖². */
  private def adcTable(qu: Array[Double],
                       books: Array[Array[Array[Double]]], m: Int,
                       dsub: Int): Array[Array[Double]] =
    Array.tabulate(m) { sub =>
      Array.tabulate(books(sub).length) { c =>
        val ce = books(sub)(c)
        var d = 0.0
        var i = 0
        while (i < ce.length) {
          val t = qu(sub * dsub + i) - ce(i)
          d += t * t
          i += 1
        }
        d
      }
    }

  private[graft] def argmaxDot(u: Array[Double],
                               cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val d = dotArr(u, cents(c))
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Driver-side spherical k-means over unit vectors: seeded distinct
    * starts, Lloyd iterations with cosine (= dot) assignment, re-normalized
    * mean update, empty cells keep their previous centroid. Deterministic
    * for a fixed seed. Input is a bounded SAMPLE (a coarse quantizer needs
    * a rough Voronoi partition, not a converged clustering over the full
    * corpus — the standard IVF training recipe), so this is O(sample · k ·
    * dim · iters) on the driver regardless of corpus size.
    */
  private[graft] def sphericalKMeans(points: Array[Array[Double]], k: Int,
                                     iters: Int,
                                     seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "sphericalKMeans: empty training sample")
    val n = points.length
    val kk = math.min(k, n)
    val dim = points(0).length
    var x = seed
    def nextLong(): Long = { // splitmix64
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val chosen = scala.collection.mutable.LinkedHashSet.empty[Int]
    while (chosen.size < kk) chosen += math.floorMod(nextLong(), n.toLong).toInt
    val cents = chosen.toArray.map(i => points(i).clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var p = 0
      while (p < n) {
        val u = points(p)
        val c = argmaxDot(u, cents)
        val sc = sums(c)
        var i = 0
        while (i < dim) { sc(i) += u(i); i += 1 }
        counts(c) += 1
        p += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          val sc = sums(c)
          var ss = 0.0
          var i = 0
          while (i < dim) { ss += sc(i) * sc(i); i += 1 }
          val nn = math.sqrt(ss)
          if (nn > 0) {
            i = 0
            while (i < dim) { sc(i) /= nn; i += 1 }
            cents(c) = sc
          }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Exact top-k cosine neighbors for each query row.
    *
    * @param emb     (idCol, embCol: array<numeric>) corpus
    * @param queries (idCol, embCol) query rows (small — gets broadcast)
    * @return (qid, rnk, idCol, sim) — k rows per query
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    val corpus = emb.select(col(idCol).as("nid"),
      col(embCol).cast("array<double>").as("ne"))
    val qs = queries.select(col(idCol).as("qid"),
      col(embCol).cast("array<double>").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    corpus.join(broadcast(qs), col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("ne"), col("qe")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nid").as(idCol), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: a seeded KMeans coarse
    * quantizer splits the corpus into `nList` cells; each query probes its
    * `nProbe` nearest centroids and exact-ranks only those cells' members.
    *
    * The scale shape: centroids are tiny and broadcast; the corpus is
    * scanned once at build time (assignment) and thereafter each query
    * touches ~nProbe/nList of the data. The probed (qid, cell) table is
    * broadcast into the cell-equi-join, so the big assigned corpus never
    * shuffles. Recall vs [[bruteForceTopK]] is asserted in SimilaritySpec.
    *
    * Output contract matches [[bruteForceTopK]]: (qid, rnk, idCol, sim).
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, nList: Int = 16, nProbe: Int = 2,
              seed: Long = 42L, sampleSize: Int = 4096): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val corpus = unitVectors(emb, idCol, embCol, "nid", "nu").cache()
    // Coarse quantizer trained driver-side on a bounded deterministic
    // hash-ordered sample: one collect job instead of an ML KMeans fit
    // (~10 scheduler round-trips — measured as the dominant fixed cost of
    // this operator at any scale factor). At 100 TB the sample is still
    // `sampleSize` rows; training cost does not grow with the corpus.
    val sample = trainSample(corpus, sampleSize)
    val cents = sphericalKMeans(sample, nList, iters = 5, seed = seed)
    val bc = s.sparkContext.broadcast(cents)
    // Assignment: one map-side pass over the corpus, argmax-dot against
    // the broadcast centroids — never shuffles the big side.
    val assigned = corpus.as[(Long, Array[Double])]
      .map { case (id, u) => (id, u, argmaxDot(u, bc.value)) }
      .toDF("nid", "nu", "cell")
    // Each query probes its nProbe nearest cells (ties → lowest cell id).
    val nP = nProbe
    val probed = unitVectors(queries, idCol, embCol, "qid", "qu")
      .as[(Long, Array[Double])]
      .flatMap { case (qid, qu) =>
        val cs = bc.value
        cs.indices.map(c => (c, dotArr(qu, cs(c))))
          .sortBy { case (c, d) => (-d, c) }
          .take(nP).map { case (c, _) => (qid, qu, c) }
      }
      .toDF("qid", "qu", "cell")
    val rankW = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    val out = assigned.join(broadcast(probed), "cell")
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", round(dot(col("nu"), col("qu")), 6))
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nid").as(idCol), col("sim"))
      .transform(Pin.pin) // small: ≤ k rows per query
    corpus.unpersist()
    out
  }

  /** Plain L2 Lloyd k-means on the driver (PQ codebook training): seeded
    * distinct starts, nearest-centroid assignment by squared L2, mean
    * update, empty cells keep their centroid. Deterministic.
    */
  private[graft] def l2KMeans(points: Array[Array[Double]], k: Int,
                              iters: Int,
                              seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "l2KMeans: empty training sample")
    val n = points.length
    val kk = math.min(k, n)
    val dim = points(0).length
    var x = seed
    def nextLong(): Long = { // splitmix64
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val chosen = scala.collection.mutable.LinkedHashSet.empty[Int]
    while (chosen.size < kk) chosen += math.floorMod(nextLong(), n.toLong).toInt
    val cents = chosen.toArray.map(i => points(i).clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var p = 0
      while (p < n) {
        val u = points(p)
        val c = argminL2(u, 0, cents)
        val sc = sums(c)
        var i = 0
        while (i < dim) { sc(i) += u(i); i += 1 }
        counts(c) += 1
        p += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          val sc = sums(c)
          var i = 0
          while (i < dim) { sc(i) /= counts(c); i += 1 }
          cents(c) = sc
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Index of the centroid nearest (squared L2) to `v[off, off+dsub)`;
    * ties → lowest index.
    */
  private[graft] def argminL2(v: Array[Double], off: Int,
                              cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      var d = 0.0
      var i = 0
      while (i < ce.length) {
        val t = v(off + i) - ce(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Product-quantization approximate top-k: unit vectors are split into
    * `m` subvectors; each subspace gets a `kCode`-centroid codebook
    * (driver-trained on a bounded deterministic sample, like [[ivfTopK]]'s
    * quantizer); the corpus is encoded to `m` byte codes per vector
    * (m bytes vs 4·dim float32 — 32× compression at m=8/dim=64); queries
    * scan codes with an ADC (asymmetric distance computation) lookup
    * table — m table lookups per corpus row instead of a dim-length dot
    * product.
    *
    * The scale story: the PQ-coded corpus fits in a fraction of the
    * memory/IO of raw vectors (the enabler for billion-vector ANN —
    * IVF-PQ is exactly this plus [[ivfTopK]]'s cell pruning), and the scan
    * is one map-side pass with the tiny codebooks+tables broadcast.
    * Results are approximate; recall vs [[bruteForceTopK]] is asserted in
    * SimilaritySpec. Seeded → deterministic.
    *
    * Returns (qid, rnk, idCol, adc_dist): per query the `k` corpus rows
    * with smallest approximate squared-L2 distance (ties → lowest id),
    * `adc_dist` rounded to 6 decimals.
    */
  def pqTopK(emb: DataFrame, queries: DataFrame, idCol: String,
             embCol: String, k: Int, m: Int = 8, kCode: Int = 16,
             trainIters: Int = 8, seed: Long = 42L,
             sampleSize: Int = 4096,
             maxQueryBatch: Int = DefaultMaxQueryBatch): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val corpus = unitVectors(emb, idCol, embCol, "nid", "nu").cache()
    val sample = trainSample(corpus, sampleSize)
    require(sample.nonEmpty, "pqTopK: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books = trainBooks(sample, m, dsub, kCode, trainIters, seed)
    val bcBooks = s.sparkContext.broadcast(books)
    // encode: m codes per corpus vector — one map-side pass
    val codes = corpus.as[(Long, Array[Double])].map { case (id, u) =>
      (id, encodePq(u, bcBooks.value, m, dsub))
    }
    // per-query ADC tables: table(sub)(code) = ||q_sub − centroid||²
    val qs = collectQueryBatch(queries, idCol, embCol, "pqTopK",
      maxQueryBatch)
    val tables: Map[Long, Array[Array[Double]]] = qs.map { case (qid, qu) =>
      qid -> adcTable(qu, books, m, dsub)
    }.toMap
    val bcTables = s.sparkContext.broadcast(tables)
    val scored = codes.flatMap { case (id, cs) =>
      bcTables.value.iterator.collect {
        case (qid, tbl) if qid != id =>
          var d = 0.0
          var sub = 0
          while (sub < m) { d += tbl(sub)(cs(sub) & 0xff); sub += 1 }
          (qid, id, round6(d))
      }
    }.toDF("qid", "nid", "adc_dist")
    val w = Window.partitionBy("qid").orderBy(col("adc_dist"), col("nid"))
    val out = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nid").as(idCol), col("adc_dist"))
      .transform(Pin.pin) // small: ≤ k rows per query
    corpus.unpersist()
    out
  }

  /** IVF-PQ approximate top-k — [[ivfTopK]]'s coarse-cell pruning composed
    * with [[pqTopK]]'s compressed ADC scan, the layout billion-vector ANN
    * serving actually uses (FAISS IVFx,PQy): the corpus is stored as
    * (cell, m byte codes) — a fraction of raw-vector IO — and each query
    * touches only its `nProbe` probed cells, scanning codes with an
    * m-lookup ADC table instead of dim-length dot products.
    *
    * This is the "no-residual" IVF-PQ variant (codes quantize the raw unit
    * vector, not the cell residual): one codebook set serves every cell,
    * so the per-query ADC table is built once rather than per probed cell.
    * Seeded → deterministic; recall vs [[bruteForceTopK]] is asserted in
    * SimilaritySpec.
    *
    * Returns (qid, rnk, idCol, adc_dist), `adc_dist` = approximate squared
    * L2 rounded to 6 decimals, ties → lowest id.
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                embCol: String, k: Int, nList: Int = 16, nProbe: Int = 2,
                m: Int = 8, kCode: Int = 16, trainIters: Int = 8,
                seed: Long = 42L, sampleSize: Int = 4096,
                maxQueryBatch: Int = DefaultMaxQueryBatch): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val corpus = unitVectors(emb, idCol, embCol, "nid", "nu").cache()
    val sample = trainSample(corpus, sampleSize)
    require(sample.nonEmpty, "ivfPqTopK: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    // driver-trained on the bounded sample: coarse quantizer + codebooks
    val cents = sphericalKMeans(sample, nList, iters = 5, seed = seed)
    val books = trainBooks(sample, m, dsub, kCode, trainIters, seed)
    val bcCents = s.sparkContext.broadcast(cents)
    val bcBooks = s.sparkContext.broadcast(books)
    // one map-side pass: assign cell + encode codes
    val coded = corpus.as[(Long, Array[Double])].map { case (id, u) =>
      (id, argmaxDot(u, bcCents.value), encodePq(u, bcBooks.value, m, dsub))
    }.toDF("nid", "cell", "codes")
    // queries: probe nProbe nearest cells; ADC table per query (codes are
    // raw-vector quantized → cell-independent)
    val nP = nProbe
    val qs = collectQueryBatch(queries, idCol, embCol, "ivfPqTopK",
      maxQueryBatch)
    val probed = qs.flatMap { case (qid, qu) =>
      bcCents.value.indices.map(c => (c, dotArr(qu, cents(c))))
        .sortBy { case (c, d) => (-d, c) }
        .take(nP).map { case (c, _) => (qid, c) }
    }.toSeq
    val tables: Map[Long, Array[Array[Double]]] = qs.map { case (qid, qu) =>
      qid -> adcTable(qu, books, m, dsub)
    }.toMap
    val bcTables = s.sparkContext.broadcast(tables)
    val probedDf = probed.toDF("qid", "qcell")
    val w = Window.partitionBy("qid").orderBy(col("adc_dist"), col("nid"))
    val out = coded.join(broadcast(probedDf), col("cell") === col("qcell"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), col("codes"))
      .as[(Long, Long, Array[Byte])]
      .map { case (qid, nid, cs) =>
        val tbl = bcTables.value(qid)
        var d = 0.0
        var sub = 0
        while (sub < m) { d += tbl(sub)(cs(sub) & 0xff); sub += 1 }
        (qid, nid, round6(d))
      }
      .toDF("qid", "nid", "adc_dist")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nid").as(idCol), col("adc_dist"))
      .transform(Pin.pin) // small: ≤ k rows per query
    corpus.unpersist()
    out
  }

  /** Round to 6 decimals, half away from zero — the same rule as Spark's
    * `round()` and DuckDB's `round()`, for use inside typed loops.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Maximal-marginal-relevance diverse top-k: per query, greedily pick
    * `kOut` of the `kCand` most-similar candidates, each round maximizing
    * `λ·rel(c,q) − (1−λ)·max_{s∈selected} sim(c,s)` (round 1 is pure
    * relevance; ties → lowest id) — the standard de-redundancy step when
    * sampling training data near a query/centroid, where plain top-k
    * returns k near-copies.
    *
    * Scale shape: candidate generation is [[bruteForceTopK]]'s broadcast
    * scan (swap in [[ivfTopK]] cells at 100 TB — same contract); the
    * greedy loop then runs per-query inside `flatMapGroups` over ≤ kCand
    * rows, so the quadratic term is kCand² per query, never corpus-sized,
    * and queries parallelize across the cluster.
    *
    * Returns (qid, rnk, idCol, score) with score rounded to 6 decimals.
    */
  def mmrTopK(emb: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, kCand: Int, kOut: Int,
              lambda: Double): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val corpus = unitVectors(emb, idCol, embCol, "nid", "nu")
    val qs = unitVectors(queries, idCol, embCol, "qid", "qu")
    val w = Window.partitionBy("qid").orderBy(col("rel").desc, col("nid"))
    val cands = corpus.join(broadcast(qs), col("nid") =!= col("qid"))
      .withColumn("rel", round(dot(col("nu"), col("qu")), 6))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") <= kCand)
      .select(col("qid"), col("nid"), col("rel"), col("nu"))
    val lam = lambda
    val out = cands.as[(Long, Long, Double, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Double])]) =>
        // Score combination in EXACT decimal arithmetic: rel and ms are
        // already 6-decimal values, so λ·rel − (1−λ)·ms is exactly
        // representable — double arithmetic here differs from the SQL
        // oracle's in the 6th decimal on round-to-even boundaries
        // (observed at sf0.01), while decimal arithmetic is identical in
        // any engine.
        import java.math.BigDecimal
        val bdLam = BigDecimal.valueOf(lam)
        val bdRem = BigDecimal.ONE.subtract(bdLam)
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val n = cs.length
        val k = math.min(kOut, n)
        val sel = new Array[Int](k)
        val chosen = new Array[Boolean](n)
        val res = new Array[(Long, Int, Long, Double)](k)
        var r = 0
        while (r < k) {
          var best = -1
          var bestScore: BigDecimal = null
          var i = 0
          while (i < n) {
            if (!chosen(i)) {
              val sc: BigDecimal =
                if (r == 0) BigDecimal.valueOf(cs(i)._3)
                else {
                  var ms = Double.NegativeInfinity
                  var j = 0
                  while (j < r) {
                    val d = round6(dotArr(cs(i)._4, cs(sel(j))._4))
                    if (d > ms) ms = d
                    j += 1
                  }
                  bdLam.multiply(BigDecimal.valueOf(cs(i)._3))
                    .subtract(bdRem.multiply(BigDecimal.valueOf(ms)))
                }
              val cmp = if (bestScore == null) 1 else sc.compareTo(bestScore)
              if (cmp > 0 ||
                  (cmp == 0 && (best < 0 || cs(i)._2 < cs(best)._2))) {
                best = i
                bestScore = sc
              }
            }
            i += 1
          }
          sel(r) = best
          chosen(best) = true
          res(r) = (qid, r + 1, cs(best)._2,
            bestScore.setScale(6, java.math.RoundingMode.HALF_UP)
              .doubleValue())
          r += 1
        }
        res.iterator
      }
      .toDF("qid", "rnk", idCol, "score")
    out.orderBy("qid", "rnk")
  }

  /** Symmetric int8 quantization of an embedding column: each vector is
    * scaled by its own max-abs onto [−127, 127] and rounded half-up —
    * 4× smaller at rest than float32 (8× vs float64), the standard
    * storage/IO lever for 100 TB embedding corpora. Returns (idCol,
    * `scale` = maxabs/127, `q` = array<tinyint>); dequantize as q·scale.
    * Pure codegen'd column arithmetic; deterministic.
    */
  def quantizeInt8(emb: DataFrame, idCol: String,
                   embCol: String): DataFrame = {
    val e = col(embCol).cast("array<double>")
    val maxabs = array_max(transform(e, x => abs(x)))
    emb.select(col(idCol),
        e.as("e"), (maxabs / lit(127.0)).as("scale"))
      .select(col(idCol), round(col("scale"), 9).as("scale"),
        transform(col("e"), x =>
          when(col("scale") === 0.0, lit(0))
            .otherwise(round(x / col("scale"), 0))
            .cast("tinyint")).as("q"))
  }

  /** Exact embedding-cosine near-duplicate pairs: every (id_a < id_b) pair
    * with cosine ≥ `minCosine`. Norms are computed once per row *before*
    * the pair join, so the O(n²) pair stage does one codegen'd dot product
    * per pair and nothing else. This is the accuracy baseline for the
    * dedup family; at 100 TB use [[cosineNearDupLsh]], which replaces the
    * quadratic join with bucketed candidate generation at the same output
    * contract.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, embCol: String,
                         minCosine: Double): DataFrame = {
    def unit(id: String) = unitVectors(emb, idCol, embCol, id, s"u_$id")
    unit("id_a").join(unit("id_b"), col("id_a") < col("id_b"))
      .withColumn("sim", round(dot(col("u_id_a"), col("u_id_b")), 6))
      .filter(col("sim") >= minCosine)
      .select("id_a", "id_b", "sim")
  }

  /** Scale-path cosine near-dup: random-projection LSH self-join over unit
    * vectors at L2 radius √(2 − 2·minCosine) (exact algebraic equivalent of
    * the cosine threshold on the unit sphere), then an exact re-rank —
    * near-linear candidate generation instead of the quadratic join. Recall
    * vs [[cosineNearDupPairs]] is asserted in SimilaritySpec.
    *
    * CONTRAST CAVEAT (measured, BENCH_SF1.md): near-linear holds only
    * when `minCosine` sits well above the corpus's random-pair
    * similarity tail. If the threshold is inside the tail (dup:random
    * per-projection collision ratio ≈ 1), bucket collisions degrade the
    * candidate join toward all-pairs — 421 s at 20k near-random vectors
    * with minCosine 0.45 vs linear behavior at production thresholds
    * (τ ≥ 0.8). That regime is inherent to the problem, not this
    * implementation; cap the input (audit sample) when the threshold is
    * weak.
    */
  def cosineNearDupLsh(emb: DataFrame, idCol: String, embCol: String,
                       minCosine: Double, bucketLength: Double = 0.5,
                       numHashTables: Int = 4, seed: Long = 42L): DataFrame = {
    val corpus = unitVectors(emb, idCol, embCol, "id", "u")
      .select(col("id"), array_to_vector(col("u")).as("nv"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val maxL2 = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine))
    val model = lsh.fit(corpus)
    // Materialize hashes once; the candidate join below sees only narrow
    // (id, table, hash) rows instead of approxSimilarityJoin's exploded
    // rows with the full vector attached ×numHashTables (the dominant
    // shuffle at every scale — see Dedup.minHashPairs for the same
    // rewrite). Surviving pairs fetch their two vectors once for the
    // exact-distance verify; output is identical.
    val hashed = model.transform(corpus).cache()
    try {
      val s = emb.sparkSession
      import s.implicits._
      val hRows = lshBucketRows(hashed, "id", "hashes")
      val cands = hRows.select(col("id").as("id_a"), col("tbl"), col("h"))
        .join(hRows.select(col("id").as("id_b"), col("tbl").as("tbl_b"),
            col("h").as("h_b")),
          col("tbl") === col("tbl_b") && col("h") === col("h_b") &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val vecs = hashed.select(col("id").as("vid"), col("nv"))
      cands
        .join(vecs, col("id_a") === col("vid")).drop("vid")
        .withColumnRenamed("nv", "va")
        .join(vecs, col("id_b") === col("vid")).drop("vid")
        .withColumnRenamed("nv", "vb")
        .as[(Long, Long, org.apache.spark.ml.linalg.Vector,
          org.apache.spark.ml.linalg.Vector)]
        .flatMap { case (a, b, va, vb) =>
          // same op sequence as keyDistance + the old column expression:
          // sqrt(sqdist) first, strict < (approxSimilarityJoin filters
          // distCol < threshold), sim from l2·l2 — bit-identical output
          val l2 = math.sqrt(
            org.apache.spark.ml.linalg.Vectors.sqdist(va, vb))
          if (l2 < maxL2) {
            val sim = java.math.BigDecimal.valueOf(1.0 - l2 * l2 / 2.0)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            if (sim >= minCosine) Iterator.single((a, b, sim))
            else Iterator.empty
          } else Iterator.empty
        }
        .toDF("id_a", "id_b", "sim")
        .transform(Pin.pin)
    } finally { hashed.unpersist(); () }
  }

  /** Approximate neighbors via random-projection LSH over L2-normalized
    * vectors (cosine distance ≡ scaled Euclidean distance on the unit
    * sphere). Seeded → deterministic. Returns candidate pairs within
    * `maxL2` of a query; callers re-rank with exact [[cosine]].
    */
  def lshCandidates(emb: DataFrame, queries: DataFrame, idCol: String,
                    embCol: String, maxL2: Double,
                    bucketLength: Double = 0.5, numHashTables: Int = 4,
                    seed: Long = 42L): DataFrame = {
    def normalized(df: DataFrame, id: String): DataFrame =
      unitVectors(df, idCol, embCol, id, "u")
        .select(col(id), array_to_vector(col("u")).as("nv"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val corpus = normalized(emb, "nid")
    val model = lsh.fit(corpus)
    // Narrow candidate join + exact verify instead of approxSimilarityJoin
    // (which shuffles the full vectors ×numHashTables) — same rewrite as
    // [[cosineNearDupLsh]]; the query side is small and broadcasts.
    val hashed = model.transform(corpus).cache()
    try {
      val s = emb.sparkSession
      import s.implicits._
      val qHashed = model.transform(normalized(queries, "qid"))
      val cands = lshBucketRows(hashed, "nid", "hashes")
        .join(broadcast(lshBucketRows(qHashed, "qid", "hashes")
            .select(col("qid"), col("tbl").as("tbl_b"), col("h").as("h_b"))),
          col("tbl") === col("tbl_b") && col("h") === col("h_b"))
        .select("nid", "qid").distinct()
      val qVecs = qHashed.select(col("qid").as("qvid"), col("nv").as("qv"))
      cands
        .join(hashed.select(col("nid").as("nvid"), col("nv")),
          col("nid") === col("nvid")).drop("nvid")
        .join(broadcast(qVecs), col("qid") === col("qvid")).drop("qvid")
        .as[(Long, Long, org.apache.spark.ml.linalg.Vector,
          org.apache.spark.ml.linalg.Vector)]
        .flatMap { case (nid, qid, nv, qv) =>
          if (nid == qid) Iterator.empty
          else {
            val l2 = math.sqrt(
              org.apache.spark.ml.linalg.Vectors.sqdist(nv, qv))
            if (l2 < maxL2) // strict, matching approxSimilarityJoin
              Iterator.single((nid, qid,
                java.math.BigDecimal.valueOf(l2)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
            else Iterator.empty
          }
        }
        .toDF("nid", "qid", "l2")
        .transform(Pin.pin)
    } finally { hashed.unpersist(); () }
  }
}
