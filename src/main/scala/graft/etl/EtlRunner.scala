package graft.etl

import graft.model.CdmModel
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Stage-1 of the "two-stage rocket": level-barrier scheduling of per-table
  * ETL work (`/root/reference/src/riab/etl/etl.py:82-175`).
  *
  * The FK-dependency DAG resolves into levels ([[CdmModel.dependencyLevels]]);
  * tables inside one level share no FK edges, so they run in parallel —
  * Scala `Future`s submitting concurrent Spark jobs on one SparkSession,
  * the analogue of the reference's `ThreadPoolExecutor(max_parallel_tables
  * = 9)` (`etl_base.py:29`). A barrier sits between levels because level
  * N+1's FK-swap joins read the swap tables level N materialized.
  *
  * `onlyTables` reproduces `--table` (`etl.py:109-129`): restrict to the
  * given tables while preserving level order. Spark's scheduler interleaves
  * the concurrent jobs across executors; on a cluster, set a FAIR pool per
  * level if strict sharing is wanted.
  */
final case class EtlRunner(model: CdmModel, maxParallelTables: Int = 9) {

  /** Run `process` for every table, level by level. Returns per-table
    * results in completion order within levels. Any failure aborts the run
    * (fail-fast like the reference's future.result()).
    */
  def run[T](
      universe: Seq[String],
      onlyTables: Option[Set[String]] = None)(process: String => T): Map[String, T] = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxParallelTables))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      model.dependencyLevels(universe).foldLeft(Map.empty[String, T]) { (acc, level) =>
        val tables = level.filter(t => onlyTables.forall(_.contains(t)))
        val futures = tables.map(t => Future(t -> process(t)))
        // the barrier: level N+1 must not start before level N finished
        acc ++ Await.result(Future.sequence(futures), Duration.Inf).toMap
      }
    } finally pool.shutdown()
  }
}
