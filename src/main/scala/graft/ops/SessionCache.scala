package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Session-scoped cache of small derived DATASETS (pinned DataFrames),
  * the RDD-backed sibling of the driver-side MI/chi2 stats caches: a
  * derivation several gates share (e.g. the referral edge list every
  * graph query starts from) is computed once per (session, data
  * identity) and served pinned thereafter.
  *
  * Interplay with [[graft.Bench.resetState]]: resetState unpersists every
  * persistent RDD between queries so one gate's leaked blocks never skew
  * the next gate's measurement — but a SessionCache entry is exactly the
  * state that SHOULD survive across queries (a session-level materialized
  * view; unpersisting a localCheckpoint also destroys it, since its
  * lineage is truncated). Entries therefore record their checkpoint RDD
  * ids in [[protectedRddIds]] and resetState skips those.
  *
  * Scale note: entries are pinned via [[Pin.pin]] (localCheckpoint,
  * MEMORY_AND_DISK) — a cluster-side materialization that spills, never a
  * driver collect. Cache BOUNDED derivations (an edge list is O(distinct
  * pairs), orders of magnitude below its event input, and is precisely
  * the thing each graph query would otherwise recompute) — or a shared
  * O(corpus) INPUT FIXTURE whose size the caller has sized explicitly
  * (the ifs transpose matrices: materializing once per scale as plain
  * row blocks replaced six per-gate columnar cache rebuilds whose
  * builder churn OOM'd the default heap). Multi-scale drivers evict
  * between scales via [[clear]] (Bench's paired loop does).
  *
  * When [[Pin.disabled]] is set (test-only plan inspection), the cache is
  * bypassed entirely — a pinned entry's truncated plan would hide the
  * derivation's joins from exactly the assertions that flag wants to see.
  */
object SessionCache {

  private val entries = TrieMap.empty[String, DataFrame]
  private val protectedIds = TrieMap.empty[Int, Unit]
  private val lock = new Object

  /** RDD ids that [[graft.Bench.resetState]] must not unpersist. */
  def protectedRddIds: Set[Int] = protectedIds.keySet.toSet

  /** The pinned result of `derive` for `key` under `s`'s session, derived
    * at most once per (session, key). `key` must already carry the data
    * identity (compose it from [[PlanKey.of]]).
    */
  def getOrElsePin(s: SparkSession, key: String)(derive: => DataFrame)
  : DataFrame = {
    if (Pin.disabled) return derive
    val full = System.identityHashCode(s) + "|" + key
    entries.get(full) match {
      case Some(df) => df
      case None => lock.synchronized {
        entries.getOrElse(full, {
          // Snapshot-diff the persistent-RDD registry around the pin: the
          // localCheckpoint's internal RDD id is not exposed, and Verify/
          // Bench derive sequentially so the diff is race-free there.
          val before = s.sparkContext.getPersistentRDDs.keySet
          val pinned = Pin.pin(derive)
          val after = s.sparkContext.getPersistentRDDs.keySet
          (after -- before).foreach(id => protectedIds.put(id, ()))
          entries.put(full, pinned)
          pinned
        })
      }
    }
  }

  /** Drop all entries and protection; the formerly protected RDDs become
    * ordinary persistent RDDs and the next resetState unpersists them.
    */
  def clear(): Unit = {
    entries.clear()
    protectedIds.clear()
  }
}
