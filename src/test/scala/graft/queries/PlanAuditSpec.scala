package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Physical-plan regression guards: the scale properties the engine argues
  * for (no all-pairs joins on candidate paths, parquet column pruning,
  * bounded shuffle counts) asserted mechanically against the real executed
  * plans, so a future edit that re-introduces a scale-killer fails a test
  * instead of a bench round.
  */
class PlanAuditSpec extends SparkSpec {
  private val Sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  test("store-build entries sort before every consumer in bench order") {
    // the bench runs queries alphabetically; a *_store_build entry owns
    // its stores' build cost ONLY if it runs before every consumer — the
    // r14 admission query initially sorted before its build entry and
    // silently re-absorbed the cost this guard now pins
    val names = SparkEntry.queries.keys.toSeq.sorted
    def idx(n: String): Int = {
      val i = names.indexOf(n); assert(i >= 0, s"unknown query $n"); i
    }
    def firstWith(prefix: String): Int = {
      val i = names.indexWhere(_.startsWith(prefix))
      assert(i >= 0, s"no query starts with $prefix"); i
    }
    assert(idx("achilles_cdm_store_build") < idx("dqd_cohort_battery"))
    assert(idx("achilles_cdm_store_build") < firstWith("ohdsi_"))
    assert(idx("bpe_artifact_store_build") < firstWith("bpe_encode"))
    assert(idx("corpus_artifact_store_build") < idx("corpus_batch_admit"))
    assert(idx("corpus_artifact_store_build") < idx("corpus_batch_admit_compact"))
    assert(idx("corpus_artifact_store_build") < idx("corpus_batch_admit_sequential"))
    assert(idx("corpus_artifact_store_build") < idx("corpus_curation_funnel"))
    assert(idx("corpus_artifact_store_build") < firstWith("dedup_"))
    assert(idx("corpus_artifact_store_build") < firstWith("stream_corpus"))
    assert(idx("corpus_artifact_store_build") < idx("corpus_batch_admit_bloom_sharded"))
  }

  test("bloom admission paths broadcast the filter state, never sort-merge") {
    // the Bloom pre-filter's 100 TB rationale is that the bounded
    // (word, bits) state BROADCASTS to every probe — a sort-merge join on
    // `word` would re-shuffle the batch and void the design (r17, the
    // sharded entry's bit_or merge included)
    for (q <- Seq("corpus_batch_admit_bloom", "corpus_batch_admit_bloom_sharded")) {
      val p = plan(q)
      // the STATE join keys on `word` — batch-side assembly joins on
      // doc_id may legitimately shuffle (batch x batch at scale)
      assert(!raw"SortMergeJoin \[word".r.findFirstIn(p).isDefined &&
        !raw"ShuffledHashJoin \[word".r.findFirstIn(p).isDefined,
        s"$q shuffles the bloom state join:\n$p")
      assert(raw"BroadcastHashJoin \[word".r.findFirstIn(p).isDefined,
        s"$q lost its broadcast state join:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q grew an all-pairs path")
    }
    // the STORED-index serve (r18) must read the persisted inverted
    // lists, not re-run the corpus-wide assignment: the plan scans the
    // ivf_index zone table and joins it by centroid_id — and (r19,
    // VERDICT #1) the list join must key on the PERSISTED __salt beside
    // centroid_id, the skew armor that bounds hot-list task width when
    // the probe side outgrows the broadcast threshold
    locally {
      val p = plan("sim_ivf_stored_serve")
      assert(p.contains("ivf_index_"),
        s"stored serve lost its persisted-index scan:\n$p")
      assert(raw"Join \[centroid_id#\d+L?, __salt#\d+".r.findFirstIn(p).isDefined,
        s"stored serve lost the salted list-join key:\n$p")
    }
    // the stored IVF-PQ serve (r19) keys its candidate join the same way
    locally {
      val p = plan("sim_ivfpq_stored_serve")
      assert(raw"Join \[centroid_id#\d+L?, __salt#\d+".r.findFirstIn(p).isDefined,
        s"PQ stored serve lost the salted candidate-join key:\n$p")
    }
    // the ROUTED entry (r19, VERDICT #6): the probe is a PURE PROJECTION
    // through the shard-major serving array — NO state join of any kind
    // remains in the plan (the r18 form broadcast the whole multi-shard
    // state per query, ×nShards the flat budget per exchange)
    locally {
      val p = plan("corpus_batch_admit_bloom_routed")
      for (j <- Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
        assert(!raw"$j \[(shard|word)".r.findFirstIn(p).isDefined,
          s"routed entry re-grew a bloom state join ($j):\n$p")
      assert(p.contains("bloom_might_contain"),
        s"routed entry lost its serving-form projection:\n$p")
      assert(!p.contains("CartesianProduct"), "routed entry grew an all-pairs path")
    }
  }

  test("no dedup/ANN candidate path contains an all-pairs join") {
    // brute-force top-k legitimately crossJoins a BROADCAST query batch;
    // every other candidate generator must stay an equi-join
    for (q <- Seq("dedup_minhash_bands", "dedup_jaccard_pairs", "dedup_simhash",
        "dedup_embed_cosine", "sim_lsh_topk", "dedup_exact",
        // r15: the index-growth admission — both batches' candidate
        // generation must stay banded equi-joins against base ∪ delta
        "corpus_batch_admit_sequential")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plan has a nested-loop join")
    }
  }

  test("the fused ohdsi batteries stay near two passes per domain table") {
    // the literal catalog's analyses ride ~144 exchanges (two grouping-sets
    // passes per domain table + the fixed person/obs-period/cost branches
    // + the care-network tier's ~15 small-dimension aggregates + the r9
    // additions + the r10 additions: three more x91 cumulative histograms,
    // the 509/510 death DQ joins, the 504/511-514 death-time dists + the
    // r11 additions: era month series, 205/2109, and the payer
    // 1400-1402 series, 1400/1401 fused into one pass) — the unfused
    // one-scan-per-analysis shape costs 200+. The caps (measured + ~10%
    // margin) fail if a family falls out of its shared pass.
    // audit the RAW battery plans — the registered queries now read the
    // stored report (run-once-store), whose plan is a trivial parquet scan
    val load = OhdsiCdmQueries.materialized(spark, Sf)
    val pc = graft.operators.OhdsiAchilles
      .cdmCoreResults(OhdsiCdmQueries.derivedModel, load)
      .queryExecution.executedPlan.toString
    // r15 re-measure: 169 counts exchanges after the catalog 235 -> 285
    // growth (+11 for ~25 new count analyses: the note domain passes,
    // payer mirrors with 1410/1417 sharing one explode, cost fk/revenue
    // rows, two new x91 histograms — the care-site check broadcast-rides
    // the visit fused scan at zero exchanges); cap = measured + ~10%
    val cx = pc.linesIterator.count(_.contains("- Exchange"))
    assert(cx <= 186, s"ohdsi_core_counts exchanges grew to $cx — a family left its fused pass")
    val pd = graft.operators.OhdsiAchilles
      .cdmCoreDistResults(OhdsiCdmQueries.derivedModel, load)
      .queryExecution.executedPlan.toString
    // r15 measured: 157 dist exchanges after the x93/x94 density block
    // (one person-keyed pre-aggregate per table feeding two histograms)
    // + 2203/2206/2511 + the 1509-1511 cost block; cap = measured + ~10%
    val dx = pd.linesIterator.count(_.contains("- Exchange"))
    assert(dx <= 173, s"ohdsi_core_dist exchanges grew to $dx")
  }

  test("semantic dedup pair join carries the hash-block keys (bounded task width)") {
    // the within-cluster self-join is blocked: oversized clusters split
    // into hash blocks on BOTH sides, so one hot centroid can never put
    // its whole occupancy-squared comparison into a single task (the
    // salting lesson from the IVF inverted lists, applied to the pair
    // join). The blocked keys must survive into the physical join.
    val p = plan("dedup_semantic")
    assert(p.contains("__ba") && p.contains("__bb"),
      s"dedup_semantic pair join lost its hash-block keys:\n$p")
    assert(!p.contains("CartesianProduct"), "dedup_semantic has a cartesian")
  }

  test("semantic admission candidates meet on centroid_id, never all-pairs") {
    // assignment crossJoins a BROADCAST bounded centroid set (legitimate);
    // the batch-vs-kept candidate join must be a centroid-keyed equi-join
    val p = plan("dedup_semantic_incremental")
    assert(!p.contains("CartesianProduct"), "semantic admission has a cartesian")
    // any HASH-KEYED equi-join form qualifies — with the r18 inlined
    // assignment the corpus side's stats allow a broadcast, which is
    // still the centroid-keyed meet (the audit guards against all-pairs,
    // not against Spark picking the cheaper physical join)
    val joins = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")).toSeq
    assert(joins.exists(_.contains("centroid_id")),
      s"candidate join lost its centroid key:\n${joins.mkString("\n")}")
  }

  test("text analysis scans prune to the referenced columns only") {
    val p = plan("text_token_stats")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unpruned scan: $readSchema")
  }

  test("minhash banding shuffles at most 4x (spread, sig agg, bucket agg, verify sort)") {
    // the operator itself costs 3 exchanges; the 4th is the orderBy the
    // correctness harness needs for deterministic output
    val p = plan("dedup_minhash_bands")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 4, s"expected <=4 shuffles, got $exchanges:\n$p")
  }

  test("generated count battery fuses to per-table passes, not per-analysis scans") {
    // r21: the count families stack into ONE scan + ONE aggregate per
    // (table, pass) — a sum pass and, in the full battery, a distinct
    // pass (plus one pair pass in mergedResults). The unfused shape cost
    // one scan per ANALYSIS (~40 for the full battery, ~54 for the
    // two-half incremental). Scan counts bound from the model so adding
    // a table grows the cap automatically.
    val m = graft.model.TpchModel.modelWithEvents
    val pInc = plan("achilles_incremental")
    val incScans = pInc.linesIterator.count(_.contains("Scan parquet"))
    assert(incScans <= 2 * m.tables.size,
      s"achilles_incremental scans grew to $incScans — an analysis left its fused per-table pass:\n$pInc")
    val raw = graft.operators.AchillesGen
      .mergedResults(m, tb => graft.Tables.load(spark, Sf, tb))
      .queryExecution.executedPlan.toString
    // r22 stage-2 fusion: the pair stack folded into the sum pass, so the
    // merged battery scans each table at most TWICE (count pass + distinct
    // pass), down from three
    val rawScans = raw.linesIterator.count(_.contains("Scan parquet"))
    assert(rawScans <= 2 * m.tables.size,
      s"full generated battery scans grew to $rawScans:\n$raw")
    assert(!raw.contains("CartesianProduct"))
  }

  test("generated dist battery shuffles histograms, not raw rows") {
    // the r7 histogram path: one map-side-combinable pre-aggregate
    // exchange per table with measure columns (value-histogram groupBy —
    // collapses at the scan), then ONE window exchange over the tiny
    // UNION of histograms (the rank window never sees raw rows), then the
    // final deterministic-order range exchange: measureTables + 2 total.
    // One more would mean a branch stopped going through the stacked
    // single-pass histogram shape. The bound is derived from the model so
    // adding a table grows it automatically.
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val m = graft.model.TpchModel.modelWithEvents
    val measureTables = m.tables.count { tb =>
      val keyCols = m.pk(tb).toSet ++ m.fks(tb).keySet
      m.sparkSchema(tb).fields.exists(f =>
        (f.dataType == LongType || f.dataType == DoubleType) && !keyCols(f.name))
    }
    val p = plan("achilles_dist_generated")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= measureTables + 2,
      s"expected <=${measureTables + 2} shuffles, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("the analytics tier prunes events scans and keeps equi-joins") {
    // funnel touches only (user_id, ts, event_type); the sketch only
    // (event_id, event_type). The 1x1 stage-count joins in the funnel are
    // legitimately broadcast-nested-loop (no key); candidate-path
    // cartesians are still banned.
    val pf = plan("event_funnel_conversion")
    val fScans = pf.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(fScans.nonEmpty && fScans.forall(l =>
      !l.contains("props") && !l.contains("value")), s"unpruned funnel scan:\n$fScans")
    assert(!pf.contains("CartesianProduct"))
    val ph = plan("agg_hll_distinct")
    val hScans = ph.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(hScans.nonEmpty && hScans.forall(l =>
      !l.contains("props") && !l.contains("user_id")), s"unpruned sketch scan:\n$hScans")
    val pr = plan("event_retention_cohorts")
    val rScans = pr.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(rScans.nonEmpty && rScans.forall(l =>
      !l.contains("props") && !l.contains("value") && !l.contains("event_type")),
      s"unpruned retention scan:\n$rScans")
  }

  test("the resample fill rides per-user windows, never a global one") {
    val p = plan("event_resample_hourly")
    assert(!p.contains("CartesianProduct"), "resample has a cartesian")
    val wLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(wLines.nonEmpty && wLines.forall(_.contains("user_id")),
      s"resample window lost its user partitioning:\n${wLines.mkString("\n")}")
  }

  test("the event value filter is pushed down to the parquet scan") {
    val p = plan("event_fact_nonnull")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(value,0.0)"), s"filter not pushed: $pushed")
  }

  test("top-k ngrams uses TakeOrdered, never a global sort of all ngrams") {
    val p = plan("text_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("corpus split is a single stage: no shuffle before the deterministic order") {
    // the assignment itself is a pure projection; the only exchange allowed
    // is the harness's output orderBy
    val p = plan("corpus_split_assign")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 1, s"expected <=1 shuffle, got $exchanges:\n$p")
  }

  test("embedding centroid scan prunes to embedding+label only") {
    val p = plan("embed_label_centroids")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("embedding") && readSchema.contains("label"))
    assert(!readSchema.contains("vec_id"), s"unpruned scan: $readSchema")
  }

  test("image near-dup candidates ride the band equi-join, never all pairs") {
    val p = plan("image_neardup_pairs")
    assert(!p.contains("CartesianProduct"), "image near-dup has a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "image near-dup has a nested loop")
  }

  test("cluster formation queries keep equi-join candidate paths") {
    for (q <- Seq("dedup_cluster_components", "dedup_cluster_survivors")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plan has a nested-loop join")
    }
  }

  test("sequence packing costs one shard shuffle plus the output order") {
    // both windows (cumulative budget, per-bin position) must ride the
    // same HashPartitioning(shard) exchange; +1 for the harness orderBy
    val p = plan("corpus_pack_sequences")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 2, s"expected <=2 shuffles, got $exchanges:\n$p")
  }

  test("decontamination candidates stay equi-joins") {
    val p = plan("corpus_decontaminate")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
  }

  test("quantization calibration joins as a broadcast, never a sort-merge") {
    val p = plan("embed_quantize")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim table must broadcast:\n$p")
  }

  test("domain cap ranks inside per-source partitions") {
    val p = plan("corpus_domain_cap")
    assert(!p.contains("CartesianProduct"))
    // the rank window must declare a partition spec (a global window would
    // print an empty partitionBy and serialize the corpus)
    val windowLine = p.linesIterator.find(_.contains("row_number()")).getOrElse("")
    assert(windowLine.contains("windowspecdefinition(source"),
      s"rank window not partitioned by source: $windowLine")
  }

  test("repetition filters join gram families on doc_id with no all-pairs path") {
    val p = plan("text_repetition")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // both signal families scan only (doc_id, text)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"))
  }

  test("gopher repetition gate: equi-joins on doc_id only, pruned scans") {
    for (q <- Seq("text_rep_windows", "text_rep_topgram", "text_rep_dupgram",
        "corpus_gopher_gate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q plan has an all-pairs join")
      // every documents scan reads at most (doc_id, text) — the gate's
      // totality anchor (r12) is a doc_id-only scan, which is MORE pruned,
      // so assert the absence of wide columns on every scan line instead
      // of the presence of `text` on the first
      val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(scans.nonEmpty, s"$q has no scans in plan")
      scans.foreach { readSchema =>
        assert(readSchema.contains("doc_id") && !readSchema.contains("source") &&
          !readSchema.contains("n_chars"), s"$q scan not pruned: $readSchema")
      }
      // corpus_gopher_gate reads the STORED verdict table (r14: one
      // 13-rule scan per dataset, shared with the curation funnel), so
      // its plan never touches text; the profile queries still must
      if (q != "corpus_gopher_gate")
        assert(scans.exists(_.contains("text")), s"$q never scans text")
      else
        assert(scans.forall(rs => rs.contains("fails") || rs.contains("kept")),
          s"$q should read only the stored verdict table: ${scans.mkString("\n")}")
    }
  }

  test("mixture sampling is a pure scan-side filter: zero pre-order shuffles") {
    // only the final orderBy may exchange — the keep/drop decision itself
    // must not shuffle anything
    val p = plan("corpus_mixture_sample")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 1, s"corpus_mixture_sample plans $exchanges exchanges:\n$p")
  }

  test("real image decode scans only (doc_id) and never collects payloads") {
    val p = plan("multimodal_decode_real")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"decode fixture scan should prune to doc_id only: $readSchema")
  }

  test("as-of join is join-free: one union-window pass, no nested loop") {
    val p = plan("join_asof")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the match itself must be the union-window formulation, not a range join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"as-of match should not plan a join operator:\n$p")
    assert(p.contains("Window"), s"expected the as-of window:\n$p")
  }

  test("bucketed as-of join: row window carries the bucket key; only the stitch joins") {
    val p = plan("join_asof_bucketed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the hot-key remedy: the row-level as-of window partitions by
    // (key, bucket), so no task is bounded by a whole key's rows
    val rowWindow = p.linesIterator.find(l =>
      l.contains("windowspecdefinition") && l.contains("__tag")).getOrElse("")
    assert(rowWindow.contains("__b"),
      s"row-level as-of window is not bucket-partitioned:\n$rowWindow")
  }

  test("interval join stays an equi-join on the bucket key") {
    val p = plan("join_range")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
  }

  test("chunking is a pure projection + explode: only the output order shuffles") {
    val p = plan("corpus_chunk")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 1, s"corpus_chunk plans $exchanges exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("winnowing fuses into codegen and shuffles only for the output order") {
    val p = plan("doc_winnow")
    assert(p.contains("winnow_hashes(word_shingles("), s"native expression chain missing:\n$p")
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 1, s"doc_winnow plans $exchanges exchanges:\n$p")
  }

  test("PQ encode is the native projection — no codebook join of ANY kind left") {
    // r20: pq_encode evaluates the per-subspace pick in the scan
    // projection over the broadcast codebook MODEL; the m x ksub
    // expansion join and its (id, sub) exchange are gone entirely
    val p = plan("embed_pq_codes")
    assert(p.contains("pq_encode"), s"expected the native encode projection:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin") && !p.contains("BroadcastHashJoin"),
      s"PQ encode should not join at all:\n$p")
  }

  test("q1 exact-sum rewrite keeps the scan narrow and the shuffles tiny") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // only the 5 referenced lineitem columns reach the scan
    for (c <- Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"))
      assert(readSchema.contains(c), s"$c missing from ReadSchema: $readSchema")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"q1 scan reads unreferenced columns: $readSchema")
    // no per-row decimal work: the hot loop sums LONGs (ExactAgg contract)
    assert(!p.contains("cast(l_quantity") || !p.contains("as decimal"),
      "q1 plan casts rows to decimal again")
    // partial agg + two tiny exchanges (pid-group, final group) + sort
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 3, s"q1 plans $exchanges exchanges:\n$p")
  }

  test("IVF-PQ serving: distance table and rerank queries broadcast; codes drive the scan") {
    val p = plan("sim_ivfpq_rerank")
    // the ADC distance-table join and the rerank query-vector join must be
    // broadcasts — only (query,item)/item keys may shuffle
    assert(p.contains("BroadcastHashJoin"), s"no broadcast joins in ivfpq plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in ivfpq plan:\n$p")
    // r19: NO windows remain — the centroid assignments run through the
    // native argmax expressions and the pool/rerank top-k tails through
    // the k-bounded topk_pairs aggregate; a window reappearing here
    // means a full-candidate shuffle+sort crept back in
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.isEmpty,
      s"ivfpq plan re-grew a window:\n${windows.mkString("\n")}")
    assert(p.contains("topk_pairs"),
      s"ivfpq plan lost its k-bounded top-k aggregate:\n$p")
  }

  test("default IVF path joins inverted lists on the SALTED key") {
    // ivfTopK routes through ivfTopKSalted (r7): the inverted-list join
    // must carry the __salt column in its keys so no task exceeds maxList
    // items, and the salt-width estimate must join as a broadcast
    val p = plan("sim_ivf_topk")
    val joinLine = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("centroid_id") && l.contains("__salt"))
    assert(joinLine.isDefined,
      s"inverted-list join lost the __salt key — skew bound gone:\n$p")
    // the two salt-width lookups (LeftOuter onto the tiny estimate table)
    // must broadcast, never shuffle the corpus for them
    val widthJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("LeftOuter")).toSeq
    assert(widthJoins.nonEmpty && widthJoins.forall(_.contains("BroadcastHashJoin")),
      s"salt-width join not broadcast:\n${widthJoins.mkString("\n")}")
  }

  test("bucketed co-located join plans zero exchanges into the join") {
    val z = graft.io.Zones.forPurpose(
      s"bkt1_${graft.io.Zones.pathKey(Sf)}")
    val ot = z.writeBucketed(
      graft.Tables.load(spark, Sf, "orders"), "o_orderkey", 8, "work", "orders")
    val lt = z.writeBucketed(
      graft.Tables.load(spark, Sf, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey", 8, "work", "lineitem")
    // force the big-big shape (at the spec's tiny SF the planner would
    // broadcast and skip bucketing entirely — the layout exists for joins
    // too large to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val joined =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = spark.table(ot).join(spark.table(lt), "o_orderkey")
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"), p)
        val exchanges = p.linesIterator.count(_.contains("- Exchange"))
        assert(exchanges === 0,
          s"bucketed join should read pre-shuffled buckets, found $exchanges exchanges:\n$p")
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the bucketed layout changes NOTHING about the result
    val plain = graft.Tables.load(spark, Sf, "orders")
      .join(graft.Tables.load(spark, Sf, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(joined.count() === plain.count())
  }
}
