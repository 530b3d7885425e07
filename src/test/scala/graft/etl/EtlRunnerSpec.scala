package graft.etl

import graft.model.TpchModel
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

/** Level-barrier scheduling semantics (etl.py:82-175 analogue). */
class EtlRunnerSpec extends AnyFunSuite {
  private val m = TpchModel.model

  test("every table starts only after all its FK dependencies finished (barrier)") {
    val started = new ConcurrentHashMap[String, Long]()
    val finished = new ConcurrentHashMap[String, Long]()
    EtlRunner(m).run(m.tables) { t =>
      started.put(t, System.nanoTime())
      Thread.sleep(5)
      finished.put(t, System.nanoTime())
      t
    }
    for (t <- m.tables; (_, dep) <- m.fks(t) if dep != t)
      assert(finished.get(dep) < started.get(t), s"$t started before its dependency $dep finished")
  }

  test("tables inside one level genuinely run in parallel") {
    // customer and supplier share a level; each waits for the other to have
    // started — only possible if the runner executes them concurrently
    val latch = new CountDownLatch(2)
    val out = EtlRunner(m, maxParallelTables = 4).run(m.tables) { t =>
      if (t == "customer" || t == "supplier") {
        latch.countDown()
        assert(latch.await(10, TimeUnit.SECONDS), s"$t never saw its level peer start")
      }
      s"done-$t"
    }
    assert(out.keySet == m.tables.toSet)
    assert(out("lineitem") == "done-lineitem")
  }

  test("onlyTables restricts work but preserves level order") {
    val order = new java.util.concurrent.CopyOnWriteArrayList[String]()
    EtlRunner(m).run(m.tables, onlyTables = Some(Set("nation", "orders"))) { t =>
      order.add(t); t
    }
    assert(order.size == 2)
    assert(order.get(0) == "nation" && order.get(1) == "orders")
  }

  test("a failing table aborts the run") {
    intercept[RuntimeException] {
      EtlRunner(m).run(m.tables) { t =>
        if (t == "nation") throw new RuntimeException("boom")
        t
      }
    }
  }

  test("--only-query runs just the named queries' tables, each with its event step") {
    val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val flags = EtlFlags(onlyQueries = Some(Seq(
      "orders/load_a.sql", "orders/load_b.sql", "nation/load.sql")))
    val out = EtlRunner(m).runFlow(m.tables, flags)(
      processTable = (t, qs) => qs.sorted.mkString("+"),
      eventStep = events.add(_))
    assert(out == Map(
      "nation" -> "nation/load.sql",
      "orders" -> "orders/load_a.sql+orders/load_b.sql"))
    assert(events.toArray.toSet == Set("nation", "orders"))
  }

  test("--skip-event-fks-step suppresses the event step in every mode") {
    val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    EtlRunner(m).runFlow(
      m.tables,
      EtlFlags(onlyTables = Some(Set("region")), skipEventFksStep = true))(
      processTable = (t, _) => t,
      eventStep = events.add(_))
    assert(events.isEmpty)
  }

  test("--process-semi-approved-mappings widens the accepted usagi statuses") {
    assert(EtlFlags().approvedStatuses === Seq("APPROVED"))
    assert(EtlFlags(processSemiApprovedMappings = true).approvedStatuses
      === Seq("APPROVED", "SEMI-APPROVED"))
  }

  test("pipelined: prepares run barrier-free, finalize gates on own+parent prepares") {
    val prepDone = new ConcurrentHashMap[String, Long]()
    val finStart = new ConcurrentHashMap[String, Long]()
    // region (level 0) blocks until lineitem (deepest level) has PREPARED —
    // impossible under a level barrier, required here
    val lineitemPrepared = new CountDownLatch(1)
    val out = EtlRunner(m).runFlowPipelined(m.tables)(
      prepareTable = (t, _) => {
        if (t == "lineitem") lineitemPrepared.countDown()
        if (t == "region")
          assert(lineitemPrepared.await(10, TimeUnit.SECONDS),
            "barrier-free prepares: lineitem's prepare never ran while region's was blocked")
        prepDone.put(t, System.nanoTime())
        Some(() => { finStart.put(t, System.nanoTime()); s"done-$t" })
      })
    assert(out.keySet == m.tables.toSet)
    for (t <- m.tables; (_, dep) <- m.fks(t) if dep != t)
      assert(prepDone.get(dep) < finStart.get(t),
        s"$t finalized before its parent $dep prepared")
  }

  test("pipelined: skipped tables absent; cleanup on full flow only; events after finalizes") {
    val finalized = new ConcurrentHashMap[String, Boolean]()
    val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    var cleanups = 0
    val runner = EtlRunner(m)
    val out = runner.runFlowPipelined(m.tables)(
      prepareTable = (t, _) =>
        if (t == "part") None
        else Some(() => { finalized.put(t, true); t }),
      eventStep = t => {
        assert(finalized.keySet().size == m.tables.size - 1,
          s"event step for $t ran before all finalizes drained")
        events.add(t); ()
      },
      postEtlCleanup = () => cleanups += 1)
    assert(!out.contains("part") && out.size == m.tables.size - 1)
    assert(cleanups == 1)
    assert(events.toArray.toSet == m.tables.toSet)
    runner.runFlowPipelined(m.tables, EtlFlags(onlyTables = Some(Set("region"))))(
      prepareTable = (t, _) => Some(() => t),
      postEtlCleanup = () => cleanups += 1)
    assert(cleanups == 1)
  }

  test("pipelined: restricted --only-query path stays sequential with event steps") {
    val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val flags = EtlFlags(onlyQueries = Some(Seq(
      "orders/load_a.sql", "orders/load_b.sql", "nation/load.sql")))
    val out = EtlRunner(m).runFlowPipelined(m.tables, flags)(
      prepareTable = (t, qs) => Some(() => qs.sorted.mkString("+")),
      eventStep = events.add(_))
    assert(out == Map(
      "nation" -> "nation/load.sql",
      "orders" -> "orders/load_a.sql+orders/load_b.sql"))
    assert(events.toArray.toSet == Set("nation", "orders"))
  }

  test("post-etl cleanup runs only on a FULL etl (etl.py:126-129)") {
    var cleanups = 0
    val runner = EtlRunner(m)
    runner.runFlow(m.tables)((t, _) => t, postEtlCleanup = () => cleanups += 1)
    assert(cleanups == 1)
    runner.runFlow(m.tables, EtlFlags(onlyTables = Some(Set("region"))))(
      (t, _) => t, postEtlCleanup = () => cleanups += 1)
    runner.runFlow(m.tables, EtlFlags(onlyQueries = Some(Seq("region/q.sql"))))(
      (t, _) => t, postEtlCleanup = () => cleanups += 1)
    assert(cleanups == 1)
  }
}
