package org.apache.spark.sql.execution.streaming.state

/** Package-placed shim: [[StateStore.unloadAll]] is `private[sql]`, but a
  * long-running multi-tenant host needs exactly this hook — unload the
  * state-store providers (and their on-heap/native state) left behind by
  * STOPPED streaming queries, instead of waiting for the 60 s maintenance
  * task that short-lived queries never reach. Called only from
  * [[graft.Bench.resetState]] at barriers where no query is in flight; an
  * unloaded provider reloads from its checkpoint on demand, so this is
  * residency-only and cannot change any result.
  */
object GraftStateStoreReset {
  def unloadAll(): Unit = StateStore.unloadAll()
}
