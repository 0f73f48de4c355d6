package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding — the final step of a
  * training-data pipeline: after dedup/filter/mixing, rows are dealt
  * into `nShards` output shards in a pseudo-random but fully
  * reproducible order (seeded hash), so a training run reading the
  * shards sequentially sees a well-mixed stream and a re-run of the
  * pipeline reproduces byte-identical shards.
  *
  * Mechanics: shard = seeded md5 of the id mod `nShards`; position
  * within the shard = rank of the full md5 hex (ties broken by id).
  * Everything is a pure column expression over one hash shuffle on the
  * shard key plus one per-shard sort — exactly the plan a distributed
  * shard writer wants: at 100 TB / 10k shards each sort is
  * (rows / nShards) log(rows / nShards) per task, no global order, no
  * driver involvement, and `df.repartition(col("shard")).sortWithin
  * Partitions(...)` would stream straight into per-shard files.
  */
object Sharding {

  /** (idCol, shard, pos) for every input row: shard in [0, nShards),
    * pos 1-based within the shard in seeded-hash order.
    */
  def trainShards(df: DataFrame, idCol: String, nShards: Int,
                  seed: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // 15 hex chars = 60 bits: always positive as a long, so the mod is
    // the same value both engines compute without pmod gymnastics.
    val h = md5(concat(col(idCol).cast("string"), lit(seed)))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 15), 16, 10).cast("long")
          % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("h"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
