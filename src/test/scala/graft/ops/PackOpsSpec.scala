package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackOpsSpec extends SparkSpec {

  test("packSequences cuts bins at the cumulative token budget, per shard") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c"), // 3 tokens, cum-before 0 -> bin 0
      (2L, "d e"),   // 2 tokens, cum-before 3 -> bin 0
      (3L, "f g"),   // 2 tokens, cum-before 5 -> bin 1
      (4L, "h")      // 1 token,  cum-before 7 -> bin 1
    ).toDF("doc_id", "text")
    val out = PackOps.packSequences(docs, "doc_id", "text", budget = 5L, nShards = 1)
      .select("doc_id", "bin", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 1L, 1L), (4L, 1L, 2L)))
  }

  test("packSequences reuses one shard exchange for both windows") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"w$i x y z q")).toDF("doc_id", "text")
    val plan = PackOps.packSequences(docs, "doc_id", "text", budget = 10L, nShards = 4)
      .queryExecution.executedPlan.toString
    // HashPartitioning(shard) satisfies the (shard, bin) window's
    // clustering, so the position window must NOT add a second exchange
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size === 1, plan)
  }

  test("property: packing conserves documents and fills bins in order") {
    val s = spark
    import s.implicits._
    val prop = org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.chooseNum(1L, 40L), org.scalacheck.Gen.chooseNum(3L, 20L)) {
      (nDocs: Long, budget: Long) =>
        val docs = (1L to nDocs).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
          .toDF("doc_id", "text")
        val out = PackOps.packSequences(docs, "doc_id", "text", budget, nShards = 4)
          .select("doc_id", "shard", "n_tokens", "bin", "pos")
          .as[(Long, Long, Long, Long, Long)].collect()
        val conserved = out.length == nDocs
        val binsInOrder = out.groupBy(_._2).values.forall { shard =>
          val byId = shard.sortBy(_._1)
          // bins are nondecreasing in doc order, and positions restart at 1
          byId.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)) &&
            byId.groupBy(_._4).values.forall(b =>
              b.map(_._5).sorted.toSeq == (1L to b.length).toSeq)
        }
        conserved && binsInOrder
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("decontaminate never returns a benchmark doc and is a subset of training docs") {
    val s = spark
    import s.implicits._
    val docs = (1L to 30L).map(i =>
      (i, s"document number $i with shared vocabulary token$i filler words here"))
      .toDF("doc_id", "text")
    val out = PackOps.decontaminate(docs, "doc_id", "text", col("doc_id") % 5 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(out.forall(_ % 5 != 0))
    assert(out.subsetOf((1L to 30L).filter(_ % 5 != 0).toSet))
  }

  test("decontaminate drops near-matches of the benchmark set and keeps the rest") {
    val s = spark
    import s.implicits._
    val evalText = "spark shuffle partition broadcast join window aggregate scan"
    val docs = Seq(
      (1L, evalText),                                              // benchmark
      (2L, evalText),                                              // identical -> dropped
      (3L, "completely different words entirely unrelated corpus text here"),
      (4L, "another separate document with its own private vocabulary set")
    ).toDF("doc_id", "text")
    val out = PackOps.decontaminate(docs, "doc_id", "text", col("doc_id") === 1)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(3L, 4L))
  }

  test("chunkDocuments: short doc -> one clamped chunk; long doc -> overlapping windows") {
    val s = spark
    import s.implicits._
    val words = (1 to 130).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "tiny doc"), (2L, words)).toDF("doc_id", "text")
    val out = PackOps.chunkDocuments(docs, "doc_id", "text", chunkSize = 64, overlap = 8)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    val short = out.filter(_._1 == 1L)
    assert(short.length == 1 && short.head._3 == 2L && short.head._4 == "tiny doc")
    val long = out.filter(_._1 == 2L)
    // 130 tokens, starts 0/56/112 -> 3 chunks of 64/64/18
    assert(long.map(_._3).toSeq == Seq(64L, 64L, 18L))
    // consecutive chunks overlap by exactly 8 tokens
    val c0 = long(0)._4.split(" ")
    val c1 = long(1)._4.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    // losslessness: stepping each chunk by its start offset rebuilds the doc
    val rebuilt = long.zipWithIndex.flatMap { case ((_, _, _, txt), i) =>
      txt.split(" ").drop(if (i == 0) 0 else 8)
    }
    assert(rebuilt.toSeq == words.split(" ").toSeq)
  }

  test("chunkDocuments chunk-count formula matches the closed form at every length") {
    val s = spark
    import s.implicits._
    val docs = (1 to 140).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = PackOps.chunkDocuments(docs, "doc_id", "text", chunkSize = 64, overlap = 8)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    for (n <- 1 to 140) {
      val expected = if (n <= 64) 1L else 1L + (n - 64 + 55) / 56
      assert(got(n.toLong) == expected, s"n=$n")
    }
  }

  test("contaminationReport counts distinct shared n-grams and flags overlap") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // benchmark
      (2L, "zzz alpha beta gamma delta qqq alpha beta gamma"), // shares "alpha beta gamma" (twice) + "beta gamma delta"
      (3L, "beta gamma delta unrelated tail words"),   // shares 1
      (4L, "totally disjoint vocabulary only here")    // shares 0
    ).toDF("doc_id", "text")
    val out = PackOps.contaminationReport(docs, "doc_id", "text", col("doc_id") === 1)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((2L, true)))  // repeated gram counts once: DISTINCT shared grams only
    assert(out(3L) == ((1L, true)))
    assert(out(4L) == ((0L, false)))
    assert(!out.contains(1L)) // benchmark rows never appear in the report
  }
}
