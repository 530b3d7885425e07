package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention/GC for the zone warehouse (r17). Long-lived warehouses
  * accumulate SUPERSEDED store generations: every versioned run-once
  * store bumps its purpose key when its semantics change (`ohdsicdm8` →
  * `ohdsicdm9`, `ohdsires8_285` → `ohdsires9_288`, the warm-zone
  * staleness convention), which orphans the previous generation's
  * directories forever — the standard failure mode of a log-structured
  * store. The vacuum drops exactly the zone roots that belong to a
  * REGISTERED versioned family but are not its CURRENT generation, plus
  * declared ephemeral soak scratch; everything else (current stores,
  * un-versioned purposes, stream scratch a live memo may point at) is
  * untouched by construction — an unregistered purpose can never match.
  *
  * The family registry lives beside the writers' own generation
  * constants ([[graft.queries.LifecycleQueries.storeFamilies]]), so a
  * generation bump updates ONE constant and the vacuum follows.
  */
object StoreVacuum {
  /** A versioned store family: directory purposes look like
    * `<prefix><digits>[_<suffix>]`; `current` is the full
    * current-generation purpose prefix (e.g. `ohdsires9_288`). A purpose
    * belongs to the family iff it starts with `prefix` followed by a
    * digit; it is CURRENT iff it equals `current` or extends it with
    * `_<suffix>` (per-dataset keys).
    */
  final case class Family(prefix: String, current: String) {
    require(current.startsWith(prefix) &&
      current.drop(prefix.length).headOption.exists(_.isDigit),
      s"current generation '$current' must extend family prefix '$prefix' with a version")
    def owns(purpose: String): Boolean =
      purpose.startsWith(prefix) &&
        purpose.drop(prefix.length).headOption.exists(_.isDigit)
    def isCurrent(purpose: String): Boolean =
      purpose == current || purpose.startsWith(current + "_")
  }

  private val DirPrefix = "graft_zones_"

  /** All zone purposes present under `root`, sorted. */
  def listPurposes(spark: SparkSession, root: String): Seq[String] = {
    val dir = new Path(root)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(DirPrefix))
      .map(_.stripPrefix(DirPrefix))
      .sorted.toSeq
  }

  /** Dry-run: the purposes [[vacuum]] would drop — superseded generations
    * of a registered family, plus ephemeral scratch. Pure function of the
    * listing, so the spec pins the verdict table.
    */
  def plan(purposes: Seq[String], families: Seq[Family],
      ephemeral: Seq[String] = Seq.empty): Seq[String] =
    purposes.filter { p =>
      families.exists(f => f.owns(p) && !f.isCurrent(p)) ||
        ephemeral.exists(e => p == e || p.startsWith(e + "_"))
    }.sorted

  /** Drop the superseded zone roots under `root`; returns the dropped
    * purposes, sorted. Idempotent — a second run drops nothing.
    */
  def vacuum(spark: SparkSession, root: String, families: Seq[Family],
      ephemeral: Seq[String] = Seq.empty): Seq[String] = {
    val doomed = plan(listPurposes(spark, root), families, ephemeral)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach { p => fs.delete(new Path(s"$root/$DirPrefix$p"), true) }
    doomed
  }

  /** Recursive file count under every zone root of `family` — the soak's
    * flat-across-generations evidence metric.
    */
  def familyFileCount(spark: SparkSession, root: String, family: Family): Long = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: Path): Long = {
      val st = fs.listStatus(p)
      st.count(_.isFile).toLong + st.filter(_.isDirectory).map(s => files(s.getPath)).sum
    }
    listPurposes(spark, root).filter(family.owns)
      .map(p => files(new Path(s"$root/$DirPrefix$p"))).sum
  }
}
