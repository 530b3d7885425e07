package graft.io

/** Run independent Spark actions as CONCURRENT jobs on the shared session
  * (optimization guide §2.6): Spark's scheduler happily runs several jobs
  * at once inside one application — actions are only sequential because
  * driver code calls them sequentially. For a sequence of small
  * independent writes (delta segments, compaction folds, bucketed stores)
  * each job's tail leaves most of local[N] idle; submitting them from a
  * bounded pool lets the next job's tasks back-fill the freed slots.
  *
  * Same pattern as the derived-CDM staging pool and the corpus
  * artifact-store build — factored out so query bodies stop re-inlining
  * the executor/Future boilerplate.
  */
object Jobs {
  def concurrently(thunks: Seq[() => Unit], maxParallel: Int = 8): Unit = {
    if (thunks.size <= 1) thunks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxParallel, thunks.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          thunks.map(t => scala.concurrent.Future(t.apply()))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }
  }
}
