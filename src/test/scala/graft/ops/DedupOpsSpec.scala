package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup family: exact, MinHash+LSH, SimHash, Jaccard — bucketed semantics. */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different content here entirely")).toDF("doc_id", "text")

  test("exactDuplicates groups identical content and keeps the min id") {
    val out = DedupOps.exactDuplicates(docs, "doc_id", "text")
    val dup = out.filter($"n_docs" > 1).as[(String, Long, Long)].collect()
    assert(dup.length == 1 && dup.head._2 == 1L && dup.head._3 == 2L)
  }

  test("exactDedup keeps exactly one survivor per content, the min id") {
    val out = DedupOps.exactDedup(docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("minhash signatures: identical docs have identical signatures") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", k = 8)
    val s1 = sigs.filter($"doc_id" === 1L).orderBy("j").select("minhash").as[Long].collect()
    val s2 = sigs.filter($"doc_id" === 2L).orderBy("j").select("minhash").as[Long].collect()
    assert(s1.toSeq == s2.toSeq && s1.length == 8)
  }

  test("minhash near-dups collide on more bands than unrelated docs") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", k = 8)
    val bands = DedupOps.lshBands(sigs, "doc_id", rows = 2)
    val buckets = DedupOps.lshCandidateBuckets(bands, "doc_id")
    // exact dups 1,2 must share all 4 band buckets
    assert(buckets.filter($"n_docs" >= 2).count() >= 4)
  }

  test("map-side array banding is bit-identical to the row-form lshBands path") {
    val rowForm = DedupOps.lshBands(
      DedupOps.minhashSignatures(docs, "doc_id", "text", k = 8), "doc_id", rows = 2)
    val arrForm = DedupOps.lshBandsFromSigArray(
      DedupOps.minhashSignatureArray(docs, "doc_id", "text", k = 8), "doc_id", k = 8, rows = 2)
    val a = rowForm.orderBy("doc_id", "band").as[(Long, Long, String)].collect().toSeq
    val b = arrForm.orderBy("doc_id", "band").as[(Long, Long, String)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("shingle-less short docs produce no minhash signature (cannot be candidates)") {
    val short = Seq((9L, "only two")).toDF("doc_id", "text")
    assert(DedupOps.minhashSignatures(short, "doc_id", "text", k = 4, w = 3).count() == 0)
  }

  test("simhash: identical docs equal, near-dups within small hamming distance") {
    val sh = DedupOps.simhash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val hammingFar = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(hamming < hammingFar)
  }

  test("jaccardPairs finds near-dup pairs above threshold, ordered pairs only") {
    val out = DedupOps.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L))) // exact dup: jaccard 1.0
    assert(out.forall(p => p._1 < p._2)) // no mirrored duplicates
  }

  test("connectedComponents matches brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // brute-force union-find reference
      val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        val members = nodes.filter(u => find(u) == find(v))
        v -> members.min
      }.toMap
      val got = DedupOps.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected)
    }
  }

  test("connectedComponents converges on a long chain (log-diameter rounds via pointer jumping)") {
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = DedupOps.connectedComponents(chain.toDF("id_a", "id_b"), "id_a", "id_b", maxIter = 10)
      .as[(Long, Long)].collect()
    assert(got.length == 40 && got.forall(_._2 == 0L))
  }

  test("incrementalDedup admits a batch against the corpus band index") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),
      (2L, base + " lambda mu"),                  // near family of 1
      (3L, "totally different words here about ships and harbors and tides"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, base),                                // exact copy -> dup of 1 (j=1)
      (101L, base + " lambda"),                    // near-dup of 1 AND 2
      (102L, "unrelated novel content mentioning volcanoes and glaciers today"))
      .toDF("doc_id", "text")
    val bands = DedupOps.lshBandsFromSigArray(
      DedupOps.minhashSignatureArray(corpus, "doc_id", "text", k = 8, w = 3),
      "doc_id", k = 8, rows = 4)
    val r = DedupOps.incrementalDedup(corpus, bands, batch, "doc_id", "text", 0.2)
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)).map(_.asInstanceOf[Long]), Option(x.get(2)))).toMap
    assert(r.size === 3)                           // one verdict per batch doc
    assert(r(100L)._1 === Some(1L))
    assert(r(100L)._2 === Some(1.0))
    // 101 matches both 1 and 2; the best (highest jaccard) wins —
    // vs 1: 10/11 = 0.909, vs 2 (superset): 11/12 = 0.917
    assert(r(101L)._1 === Some(2L))
    assert(r(102L)._1 === None)                    // novel
    assert(r(102L)._2 === None)
  }

  test("incrementalDedup equals the cross-pair slice of jaccardPairs on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val docs = (0L until 30L).map { i =>
      val n = 4 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    // reference: the banded-verified pair graph over the UNION, sliced to
    // cross (batch, corpus) pairs, best per batch doc
    val cross = DedupOps.jaccardPairs(docs, "doc_id", "text", threshold = 0.2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (a % 3 == 0, b % 3 == 0) match {
          case (true, false) => Seq((a, b, j))
          case (false, true) => Seq((b, a, j))
          case _ => Nil
        }
      }
    val expected = cross.groupBy(_._1).map { case (id, ms) =>
      val bestJ = ms.map(_._3).max
      id -> (ms.filter(_._3 == bestJ).map(_._2).min, bestJ)
    }
    val bands = DedupOps.lshBandsFromSigArray(
      DedupOps.minhashSignatureArray(corpus, "doc_id", "text", k = 8, w = 3),
      "doc_id", k = 8, rows = 4)
    val got = DedupOps.incrementalDedup(corpus, bands, batch, "doc_id", "text", 0.2)
      .collect()
      .flatMap(r => Option(r.get(1)).map(d =>
        r.getLong(0) -> (d.asInstanceOf[Long], r.getDouble(2))))
      .toMap
    assert(got === expected)
  }
}
