package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** As-of and bucketed interval joins: match semantics (backward inclusive,
  * left-join nulls), pair-exactness of the bucket decomposition, and the
  * no-nested-loop plan shape.
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, 10L, 100L), // before any order for key 10
    (2L, 10L, 200L), // exactly at an order time -> inclusive match
    (3L, 10L, 250L), // between orders -> earlier one
    (4L, 10L, 900L), // after the last order
    (5L, 99L, 500L)  // key with no right rows at all
  ).toDF("event_id", "k", "t")

  private def orders = Seq(
    (10L, 200L, "a"),
    (10L, 300L, "b"),
    (20L, 100L, "z") // key never queried
  ).toDF("k2", "t2", "payload")

  test("asofJoin picks the latest right row at-or-before each left time") {
    val out = JoinOps.asofJoin(events, "k", "t", orders, "k2", "t2")
      .select($"event_id", $"payload").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty)          // nothing at-or-before t=100
    assert(out(2L).contains("a"))    // inclusive: t == order time
    assert(out(3L).contains("a"))    // backward: 200 < 250 < 300
    assert(out(4L).contains("b"))    // latest order wins
    assert(out(5L).isEmpty)          // unmatched key -> left-join null
  }

  test("asofJoin preserves every left row exactly once") {
    val out = JoinOps.asofJoin(events, "k", "t", orders, "k2", "t2")
    assert(out.count() == events.count())
    assert(out.select("event_id").distinct().count() == events.count())
  }

  test("asofJoin rejects payload column collisions") {
    val bad = orders.withColumnRenamed("payload", "event_id")
    intercept[IllegalArgumentException] {
      JoinOps.asofJoin(events, "k", "t", bad, "k2", "t2")
    }
  }

  test("intervalJoin emits each qualifying pair exactly once, across bucket widths") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 23L)).toDF("pid", "p")
    val ivs = Seq(
      (100L, 0L, 10L),   // [0,10): p=5
      (200L, 5L, 25L),   // [5,25): p=5,10,17,23
      (300L, 17L, 18L),  // [17,18): p=17
      (400L, 30L, 30L)   // empty (e <= s) -> dropped
    ).toDF("iid", "s", "e")
    val expected = Set((1L, 100L), (1L, 200L), (2L, 200L), (3L, 200L), (4L, 200L), (3L, 300L))
    for (w <- Seq(1L, 2L, 7L, 64L)) {
      val got = JoinOps.intervalJoin(points, "p", ivs, "s", "e", w)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.distinct.length, s"duplicate pairs at width $w")
      assert(got.toSet == expected, s"wrong pairs at width $w")
    }
  }

  test("property: intervalJoin equals the naive BETWEEN join on random data") {
    val point = Gen.choose(-20L, 40L)
    val bound = Gen.choose(-20L, 40L)
    val prop = Prop.forAll(
      Gen.listOfN(15, point), Gen.listOfN(10, Gen.zip(bound, bound)), Gen.oneOf(1L, 3L, 16L)) {
      (ps: List[Long], ivs: List[(Long, Long)], width: Long) =>
        val pdf = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
        val idf = ivs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }.toDF("iid", "s", "e")
        val got = JoinOps.intervalJoin(pdf, "p", idf, "s", "e", width)
          .select($"pid", $"iid").as[(Long, Long)].collect().toSet
        val expected = (for {
          (p, pi) <- ps.zipWithIndex
          ((a, b), ii) <- ivs.zipWithIndex
          if a <= p && p < b
        } yield (pi.toLong, ii.toLong)).toSet
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("intervalJoin plans an equi-join on the bucket key (no nested loop)") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((100L, 0L, 10L)).toDF("iid", "s", "e")
    val plan = JoinOps.intervalJoin(points, "p", ivs, "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degenerated to a nested loop:\n$plan")
  }

  test("property: asofJoin equals the brute-force latest-at-or-before lookup") {
    val key = Gen.choose(1L, 4L)
    val time = Gen.choose(0L, 50L)
    val leftGen = Gen.listOfN(12, Gen.zip(key, time))
    val rightGen = Gen.listOfN(8, Gen.zip(key, time)).map(_.distinct) // unique (k, t)
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val r = rs.map { case (k, t) => (k, t, s"p$k-$t") }.toDF("k2", "t2", "payload")
      val got = JoinOps.asofJoin(l, "k", "t", r, "k2", "t2")
        .select($"event_id", $"payload").as[(Long, Option[String])].collect().toMap
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val expected = rs.filter(rt => rt._1 == k && rt._2 <= t)
          .sortBy(_._2).lastOption.map { case (rk, rt) => s"p$rk-$rt" }
        got(i.toLong) == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofJoinBucketed matches asofJoin on the hand-built fixture, across widths") {
    val expected = JoinOps.asofJoin(events, "k", "t", orders, "k2", "t2")
      .select($"event_id", $"payload").as[(Long, Option[String])].collect().toMap
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val got = JoinOps.asofJoinBucketed(events, "k", "t", orders, "k2", "t2", w)
        .select($"event_id", $"payload").as[(Long, Option[String])].collect().toMap
      assert(got == expected, s"bucketed as-of diverged at width $w")
    }
  }

  test("property: asofJoinBucketed equals asofJoin on random data and widths") {
    val key = Gen.choose(1L, 3L)
    val time = Gen.choose(-25L, 25L) // negative times: floorDiv must stay exact
    val leftGen = Gen.listOfN(14, Gen.zip(key, time))
    val rightGen = Gen.listOfN(9, Gen.zip(key, time)).map(_.distinct)
    val prop = Prop.forAll(leftGen, rightGen, Gen.oneOf(1L, 4L, 13L, 100L)) {
      (ls, rs, width) =>
        val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("event_id", "k", "t")
        val r = rs.map { case (k, t) => (k, t, s"p$k-$t") }.toDF("k2", "t2", "payload")
        val base = JoinOps.asofJoin(l, "k", "t", r, "k2", "t2")
          .select($"event_id", $"payload").as[(Long, Option[String])].collect().toMap
        val got = JoinOps.asofJoinBucketed(l, "k", "t", r, "k2", "t2", width)
          .select($"event_id", $"payload").as[(Long, Option[String])].collect().toMap
        got == base
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofJoinBucketed's main window partitions by (key, bucket), not key alone") {
    val plan = JoinOps.asofJoinBucketed(events, "k", "t", orders, "k2", "t2", 10L)
      .queryExecution.executedPlan.toString
    // the hot-key remedy: the row-level window must carry both partition keys
    assert(plan.contains("windowspecdefinition(__k#") || plan.contains("windowspecdefinition(__k"),
      s"no window found in plan:\n$plan")
    val rowWindow = plan.linesIterator.find(l =>
      l.contains("windowspecdefinition") && l.contains("__tag")).getOrElse("")
    assert(rowWindow.contains("__b"),
      s"row-level as-of window is not bucket-partitioned:\n$rowWindow")
  }

  test("both joins reject reserved internal column names on either input") {
    intercept[IllegalArgumentException] {
      JoinOps.asofJoin(events.withColumn("__m", lit(1)), "k", "t", orders, "k2", "t2")
    }
    intercept[IllegalArgumentException] {
      JoinOps.asofJoin(events, "k", "t", orders.withColumn("__tag", lit(1)), "k2", "t2")
    }
    intercept[IllegalArgumentException] {
      JoinOps.intervalJoin(events.withColumn("__b", lit(1)), "t",
        orders.withColumnRenamed("t2", "e2"), "t2", "e2", 2L)
    }
  }

  test("intervalJoin buckets exactly beyond 2^53 (double floor would misplace)") {
    // 2^53+3 is not double-representable: floor((2^53+3)/2.0) = 2^52+2, but the
    // true floor is 2^52+1. Exact integer bucket math must keep every
    // qualifying pair; compare against the naive BETWEEN reference.
    val base = (1L << 53) + 1L
    val ps = (0L until 8L).map(i => (i, base + i))
    val ivs = (0L until 8L).map(i => (i, base + i, base + i + 3L))
    val pdf = ps.toDF("pid", "p")
    val idf = ivs.toDF("iid", "s", "e")
    val expected = (for {
      (pid, p) <- ps; (iid, s, e) <- ivs; if s <= p && p < e
    } yield (pid, iid)).toSet
    for (w <- Seq(1L, 2L, 3L)) {
      val got = JoinOps.intervalJoin(pdf, "p", idf, "s", "e", w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"pairs lost/invented past 2^53 at width $w")
    }
  }

  test("asofJoin plans a single hash exchange on the key") {
    val out = JoinOps.asofJoin(events, "k", "t", orders, "k2", "t2")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // union-window formulation: no join operator at all, one window
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"asofJoin should be join-free (union + window):\n$plan")
  }
}
