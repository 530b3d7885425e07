package graft.io

import graft.SparkSpec
import java.nio.file.Files

/** S11 atomic table replace + zone namespace behavior. */
class AtomicWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-atomic").toString

  test("replace round-trips and fully swaps content") {
    val path = freshDir() + "/t"
    AtomicWrite.replace(Seq(1, 2, 3).toDF("v"), path)
    assert(AtomicWrite.readTable(spark, path).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    AtomicWrite.replace(Seq(9).toDF("v"), path)
    assert(AtomicWrite.readTable(spark, path).as[Int].collect().toSeq == Seq(9))
  }

  test("a stale tmp dir from a crashed writer is ignored and cleaned") {
    val path = freshDir() + "/t"
    AtomicWrite.replace(Seq(1).toDF("v"), path)
    // crash sim: a writer died mid-write, leaving a half-written tmp
    val tmp = new java.io.File(path + ".__tmp")
    tmp.mkdirs()
    Files.writeString(new java.io.File(tmp, "part-garbage").toPath, "not parquet")
    AtomicWrite.replace(Seq(2).toDF("v"), path)
    assert(AtomicWrite.readTable(spark, path).as[Int].collect().toSeq == Seq(2))
    assert(!tmp.exists())
  }

  test("recover restores a table interrupted between demote and promote") {
    val path = freshDir() + "/t"
    AtomicWrite.replace(Seq(7).toDF("v"), path)
    // crash sim: demote happened (path -> path.__old) but promote never ran
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".__old")))
    assert(AtomicWrite.recover(spark, path))
    assert(AtomicWrite.readTable(spark, path).as[Int].collect().toSeq == Seq(7))
    // recovery is idempotent
    assert(!AtomicWrite.recover(spark, path))
  }

  test("writeClustered co-locates and sorts rows by the model's cluster keys") {
    val z = Zones(freshDir())
    val df = Seq((3L, 30L), (1L, 10L), (2L, 20L), (1L, 5L)).toDF("gender_concept_id", "person_id")
    val cluster = graft.model.Cdm54.model.clustering("person")
      .filter(df.columns.contains) // the fixture carries a 2-column subset
    z.writeClustered(df, cluster, "omop", "person")
    // within every partition file, rows are sorted by the cluster keys
    import org.apache.spark.sql.functions._
    val perFile = z.read(spark, "omop", "person")
      .withColumn("f", input_file_name())
      .collect()
      .groupBy(_.getAs[String]("f"))
    perFile.values.foreach { rows =>
      val keys = rows.map(r => (r.getAs[Long]("gender_concept_id"), r.getAs[Long]("person_id"))).toSeq
      assert(keys == keys.sorted)
    }
    assert(perFile.values.map(_.length).sum == 4)
  }

  test("zones namespace tables, list the work zone, and refill omop from work") {
    val z = Zones(freshDir())
    z.write(Seq(1).toDF("v"), "work", "vocabulary")
    z.write(Seq(2).toDF("v"), "work", "person__upload__q1")
    assert(z.listTables(spark, "work") == Seq("person__upload__q1", "vocabulary"))
    assert(z.listTables(spark, "omop").isEmpty)
    z.refill(spark, "vocabulary")
    assert(z.read(spark, "omop", "vocabulary").as[Int].collect().toSeq == Seq(1))
    z.drop(spark, "work", "person__upload__q1")
    assert(z.listTables(spark, "work") == Seq("vocabulary"))
    intercept[IllegalArgumentException](z.tablePath("nope", "t"))
  }
}
