package graft.ops

import org.apache.spark.sql.DataFrame

/** Durable data-identity key for a DataFrame whose every leaf is a
  * file-backed scan — the shared foundation of the session-scoped caches
  * (the MI/chi2 stats caches in `graft.feature`, the derived-dataset
  * cache in [[SessionCache]]).
  *
  * A canonicalized plan alone is NOT a safe key: two different in-memory
  * datasets (LocalRelation / LogicalRDD) canonicalize to the same tree —
  * only file-backed scans carry a durable data identity, so `of` returns
  * None unless every leaf is a file relation.
  *
  * Key composition, each part closing a distinct staleness/collision
  * hole:
  *  - per-leaf root paths + file count + max file modificationTime + total
  *    byte size: an overwritten parquet dir at the SAME path within one
  *    session changes the file metadata, so stale entries are never
  *    served (files are listed from the scan's own FileIndex — no extra
  *    filesystem RPC);
  *  - `semanticHash` of the canonicalized plan PLUS the full output
  *    schema (`catalogString`): `canonicalized.toString` is truncated at
  *    `spark.sql.debug.maxToStringFields` fields, so two wide plans
  *    differing only in elided columns would collide — the hash +
  *    untruncated schema pair has no such cliff.
  */
object PlanKey {

  def of(data: DataFrame): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val leafIds = data.queryExecution.analyzed.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val fileId = fs.location match {
            case pa: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =>
              val files = pa.allFiles()
              val maxMod = if (files.isEmpty) 0L
                           else files.map(_.getModificationTime).max
              s"n=${files.length},mt=$maxMod,sz=${files.map(_.getLen).sum}"
            // Other FileIndex impls don't expose the cached listing; byte
            // size alone still catches a same-path overwrite in practice.
            case other => s"sz=${other.sizeInBytes}"
          }
          Some(fs.location.rootPaths.mkString(",") + s"#$fileId")
        case _ => None
      }
      case _ => None
    }
    if (leafIds.nonEmpty && leafIds.forall(_.isDefined)) {
      val analyzed = data.queryExecution.analyzed
      Some(leafIds.flatten.mkString(";") + "|" +
        analyzed.canonicalized.semanticHash() + "|" +
        analyzed.schema.catalogString)
    } else None
  }
}
