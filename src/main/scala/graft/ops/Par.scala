package graft.ops

/** Run independent Spark ACTIONS concurrently (optimization guide §2.6):
  * actions are only sequential because driver code calls them
  * sequentially, and a job's straggler tail leaves executors idle that
  * the next independent job could back-fill. Used for pairs of
  * independent writes (an index's band file and its exact-verify file,
  * both writing to fresh/overwritten locations) — NOT for dependent
  * steps, and NOT for append-mode writes (a later task's side effects
  * still commit after an earlier task fails, so a caller retry can
  * double-append; see DedupIndex.appendSigned). Exceptions propagate:
  * the first failure is rethrown after all tasks finish — only the
  * THROWN exception matches the sequential spelling, not the side
  * effects of the other tasks.
  */
object Par {
  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_.apply()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = tasks.map { t =>
      val th = new Thread(() =>
        try t() catch { case e: Throwable => errs.add(e); () })
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val it = errs.iterator()
    if (it.hasNext) throw it.next()
  }
}
