package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing: pre-shuffle fact tables once at write time so
  * every subsequent equi-join / aggregation on the bucket key runs with NO
  * exchange.
  *
  * This is the canonical 100 TB co-location strategy: a fact table joined
  * daily on the same key should pay its shuffle once, at ingest. Both
  * sides bucketed by the same key into the same bucket count → Catalyst
  * plans a zip-partition join (`.explain` shows no Exchange above either
  * scan); one side bucketed → only the other side shuffles.
  *
  * Bucketed writes go through the session catalog (`saveAsTable` — plain
  * parquet + bucket metadata; no Hive needed).
  */
object BucketedTables {

  /** LAST tag that validated or wrote each (session, table). A memo keyed
    * on (session, table, tag) is wrong in multi-scale sessions (ADVICE r11
    * #1): after a DIFFERENT tag rewrites the physical table, the old
    * (table, tag) key is still memoized, so a revisit of the first tag
    * would no-op against the other scale's data. Remembering only the last
    * tag makes any tag change re-validate — and re-ingest when the
    * contents don't match.
    */
  private val lastTag =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Idempotent ingest: (re)write the bucketed table only when the session
    * catalog already holds a copy WRITTEN UNDER THE SAME TAG — recorded as
    * the `graft.tag` table property at write time (ADVICE r12: the old
    * row-count-equality revalidation would serve another scale's data to
    * the join gate whenever two datasets coincidentally matched counts).
    * The pay-the-shuffle-once-at-ingest contract means a gate query that
    * joins the bucketed tables must not re-pay the write on every
    * execution; callers run this from an untimed setup step (Bench
    * warm-up) and the join gate re-invokes it as a no-op guard. A tag
    * change (another scale warmed in between) always re-validates.
    */
  def ensureBucketed(df: DataFrame, table: String, bucketCol: String,
                     buckets: Int, tag: String): Unit = synchronized {
    val spark = df.sparkSession
    if (!lastTag.get((spark, table)).contains(tag)) {
      val reusable = spark.catalog.tableExists(table) &&
        scala.util.Try(writtenTag(spark, table)).toOption.flatten
          .contains(tag)
      if (!reusable) {
        writeBucketed(df, table, bucketCol, buckets)
        spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
          s"('graft.tag' = '${tag.replace("'", "''")}')")
        ()
      }
      lastTag((spark, table)) = tag
    }
  }

  /** The `graft.tag` property the table was written under, if any. */
  private def writtenTag(spark: SparkSession,
                         table: String): Option[String] =
    spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .find(_.getString(0) == "graft.tag").map(_.getString(1))

  /** Write `df` as a bucketed parquet table registered in the session
    * catalog, replacing any previous version.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // A fresh (in-memory) catalog can forget a table whose directory still
    // exists on disk from a previous session; saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS. Managed-table replace means clearing both.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
    // Pre-shuffle into the bucket layout: bucketBy writes one file per
    // (task, bucket) pair, so N input tasks × B buckets explodes into
    // N·B small files — repartitioning on the bucket key with the bucket
    // count (Spark's repartition hash IS the bucket hash) gives exactly
    // one file per bucket and a faster write + scan.
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — plans without a
    * shuffle when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                   rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
