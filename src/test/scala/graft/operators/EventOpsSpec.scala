package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-2 event-step semantics: data-dependent discovery, discriminator
  * CASE map, collision re-keying (W4).
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("discoverEventTables (U4) unions distinct non-null table refs, sorted") {
    val work = Seq(
      (Some("person"), Some("note")),
      (Some("person"), None),
      (None, Some("measurement"))).toDF("e1_table", "e2_table")
    assert(EventOps.discoverEventTables(work, Seq("e1_table", "e2_table")) ==
      Seq("measurement", "note", "person"))
  }

  test("tableConceptCase maps known tables to vendored concept ids, else null") {
    val df = Seq("person", "measurement", "nope").toDF("t")
      .select(EventOps.tableConceptCase(col("t")).as("cid"))
    assert(df.as[Option[Long]].collect().toSeq ==
      Seq(Some(1147026L), Some(1147138L), None))
  }

  test("rekeyCollisions (W4): rank-1 keeps pk, overflow gets fresh ids past maxPk") {
    val df = Seq(
      (1L, "person"), (1L, "note"), // collision on pk=1
      (2L, "person")).toDF("pk", "ev")
    val out = EventOps.rekeyCollisions(df, "pk", Seq("ev"), maxPk = 100L)
      .as[(Long, String)].collect().toSet
    // rank 1 within pk=1 ordered by ev => "note" keeps pk 1; "person" re-keyed to 101
    assert(out == Set((1L, "note"), (101L, "person"), (2L, "person")))
  }

  test("rekeyCollisions output pks are globally unique") {
    val df = (1L to 50L).flatMap(pk => Seq((pk, "a"), (pk, "b"), (pk, "c"))).toDF("pk", "ev")
    val out = EventOps.rekeyCollisions(df, "pk", Seq("ev"), maxPk = 50L)
    assert(out.count() == 150)
    assert(out.select("pk").distinct().count() == 150)
  }
}
