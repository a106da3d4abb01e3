package graft.llmops

/** Run independent Spark actions from a small driver thread pool so a
  * later job's tasks back-fill executors freed by an earlier job's
  * straggler tail (the guide's §2.6 overlap pattern — actions are only
  * sequential because driver code calls them sequentially). Results
  * come back in task order; the first failure propagates with its
  * original cause. Spark's scheduler runs concurrent jobs FIFO, which
  * is exactly the back-fill behaviour wanted here.
  */
private[graft] object Par {
  def run[A](tasks: Seq[() => A], slots: Int = 4): Seq[A] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.size == 1) return Seq(tasks.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(slots, tasks.size)))
    try {
      val futs = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        }))
      futs.map { f =>
        try f.get()
        catch {
          // unwrap so callers see the real failure, not the pool's
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }
}
