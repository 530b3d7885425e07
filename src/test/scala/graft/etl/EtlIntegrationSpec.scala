package graft.etl

import graft.SparkSpec
import graft.io.Zones
import graft.model.TpchModel
import graft.operators.{MergeOps, Swap}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end stage-1 run: the EtlRunner schedules real per-table Spark
  * work in dependency order — each table builds its PK swap into the work
  * zone, then rewrites its FK columns through the swap tables its
  * dependencies materialized in EARLIER levels (which is exactly why the
  * level barrier exists), and lands the result in the omop zone through
  * the atomic writer.
  */
class EtlIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("runner + swaps + fk rewrite + zones compose into a full stage-1 run") {
    val m = TpchModel.model
    val zones = Zones(Files.createTempDirectory("graft-etl").toString)

    val raw = Map(
      "region" -> Seq((10L, "EMEA"), (20L, "APAC")).toDF("r_regionkey", "r_name"),
      "nation" -> Seq((100L, "FR", 10L), (200L, "JP", 20L)).toDF("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq((1000L, "acme", 100L), (2000L, "globex", 200L))
        .toDF("c_custkey", "c_name", "c_nationkey"))
    val universe = raw.keys.toSeq

    EtlRunner(m, maxParallelTables = 4).run(universe) { table =>
      val df = raw(table)
      val pk = m.pk(table).get
      // build this table's dense PK swap into the work zone
      val swap = Swap.denseIds(
        df.select(col(pk).cast("string").as("x")).distinct(), Seq("x"), 0L)
      zones.write(swap, "work", s"${pk}_swap")
      // rewrite FK columns through the swaps earlier levels materialized
      val fks = m.fks(table).map { case (c, target) => c -> m.pk(target).get }
      val rewritten = fks.foldLeft(df) { case (acc, (fkCol, targetPk)) =>
        val fkSwap = zones.read(spark, "work", s"${targetPk}_swap")
        MergeOps.fkSwapJoin(
          acc.withColumn(fkCol, col(fkCol).cast("string")), fkSwap, fkCol, required = true)
      }
      // swap this table's own PK and land in the omop zone atomically
      val landed = MergeOps.fkSwapJoin(
        rewritten.withColumn(pk, col(pk).cast("string")),
        zones.read(spark, "work", s"${pk}_swap"), pk, required = true)
      zones.write(landed, "omop", table)
      table
    }

    // the work zone holds one swap per table; omop holds every table
    assert(zones.listTables(spark, "work") ==
      Seq("c_custkey_swap", "n_nationkey_swap", "r_regionkey_swap"))
    assert(zones.listTables(spark, "omop") == Seq("customer", "nation", "region"))
    // referential integrity after the swap: customer's nation FK equals the
    // surrogate id the nation table itself received
    val nation = zones.read(spark, "omop", "nation")
      .select(col("n_name"), col("n_nationkey")).as[(String, Long)].collect().toMap
    val cust = zones.read(spark, "omop", "customer")
      .select(col("c_name"), col("c_nationkey")).as[(String, Long)].collect().toMap
    assert(cust("acme") == nation("FR"))
    assert(cust("globex") == nation("JP"))
    // dense ids start at 1 per swap
    assert(nation.values.toSet == Set(1L, 2L))
  }
}
