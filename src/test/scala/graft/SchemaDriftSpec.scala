package graft

import org.apache.spark.sql.types._

/** Generator-drift fixtures for the non-event tables — the events.ts
  * lesson generalized: the driver may re-encode testdata between scored
  * rounds, and the loader must normalize every encoding it could plausibly
  * ship (or fail loudly), never silently hand operators a changed type.
  */
class SchemaDriftSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_drift").toString

  test("embeddings normalize from float64 vectors / int ids to the canonical schema") {
    import spark.implicits._
    val dir = tmp()
    Seq((1, Seq(1.5d, 2.5d), 3L), (2, Seq(0.5d, -1.0d), 4L))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val loaded = Tables.load(spark, dir, "embeddings")
    assert(loaded.schema("vec_id").dataType === LongType)
    assert(loaded.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    assert(loaded.schema("label").dataType === IntegerType)
    val r = loaded.orderBy("vec_id").collect()
    assert(r(0).getLong(0) === 1L)
    assert(r(0).getSeq[Float](1) === Seq(1.5f, 2.5f))
    assert(r(1).getInt(2) === 4)
  }

  test("a non-numeric embedding encoding fails loudly") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, Seq("a", "b"), 3)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.load(spark, dir, "embeddings")
    }
    assert(e.getMessage.contains("unsupported on-disk embedding type"))
  }

  test("documents ids and counters normalize to long") {
    import spark.implicits._
    val dir = tmp()
    Seq((7, "some text", "en", "src0", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val loaded = Tables.load(spark, dir, "documents")
    assert(loaded.schema("doc_id").dataType === LongType)
    assert(loaded.schema("n_chars").dataType === LongType)
    assert(loaded.head().getLong(0) === 7L)
  }
}
