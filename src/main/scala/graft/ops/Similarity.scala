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

  /** dot(a, b) over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns, rounded to 6
    * decimals.
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

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
      .select(col("qid"), col("rnk"), col("nid").as(idCol), col("sim"))
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
      df.select(col(idCol).as(id), col(embCol).cast("array<double>").as("e"))
        .withColumn("nrm", norm(col("e"))) // computed once per row
        .select(col(id),
          array_to_vector(transform(col("e"), x => x / col("nrm"))).as("nv"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val corpus = normalized(emb, "nid")
    val model = lsh.fit(corpus)
    model.approxSimilarityJoin(corpus, normalized(queries, "qid"), maxL2,
        "l2")
      .select(col("datasetA.nid").as("nid"), col("datasetB.qid").as("qid"),
        round(col("l2"), 6).as("l2"))
      .filter(col("nid") =!= col("qid"))
  }
}
