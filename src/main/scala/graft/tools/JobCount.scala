package graft.tools

import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Run named registered queries and print the number of Spark jobs /
  * stages / tasks each one submitted plus its wall seconds — the evidence
  * artifact for I/O-protocol optimizations (swap-by-rename, append-by-move)
  * whose *final read* plan is unchanged but whose per-statement job count
  * drops (optimization guide §1: measure the thing you changed).
  *
  * Usage: runMain graft.tools.JobCount <sfDir> q1,q2,...
  * Prints one line per query: `name jobs=N stages=N tasks=N sec=S`.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    names.split(",").foreach { q =>
      graft.SparkEntry.queries.get(q) match {
        case Some(fn) =>
          val jobs = new AtomicInteger
          val stages = new AtomicInteger
          val tasks = new AtomicLong
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
            override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
              stages.incrementAndGet()
            override def onTaskStart(t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
              tasks.incrementAndGet()
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            val sec = (System.nanoTime() - t0) / 1e9
            Thread.sleep(2000) // let the async listener bus drain
            println(f"$q jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} sec=$sec%.2f")
          } catch {
            case e: Throwable => println(s"$q FAILED: ${e.getMessage}")
          } finally spark.sparkContext.removeSparkListener(listener)
        case None => println(s"no such query: $q")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
