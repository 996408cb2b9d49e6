package graft

/** Plan-quality regression guard over the ENTIRE declared query surface:
  * no accidental cartesian products or nested-loop joins may appear in any
  * query plan — except where a cross join is the algorithm (exact brute
  * kNN / brute near-dup baselines, which are documented as oracle-scale
  * paths with LSH/IVF as the scale alternatives). */
class PlanSpec extends SparkSpec {

  /** Queries whose cross join is intentional. */
  private val intentionalCross = Set(
    "q15_knn",              // exact kNN baseline: corpus × broadcast queries
    "q40_search_latest",    // same exact-kNN shape over reconstructed corpus
    "q25_neardup_embedding", // exact brute near-dup baseline
    "q41_ann_pq_topk",      // ADC scan: codes × broadcast query LUTs — the
                            // per-pair cost is m lookups, not a d-dim dot;
                            // at scale composes with IVF cells (IVF-PQ)
    "q43_ann_pq_refine",    // stage 1 is the same ADC scan; stage 2 is a
                            // broadcast equi-join over survivors only
    "q56_ann_sq_topk",      // SQ8 decode-and-dot scan: same flat shape as
                            // the ADC scan, 4× compressed corpus; compose
                            // with IVF cells when candidates must shrink
    "q24b_simhash_pairs",   // banded join uses an additional id< condition
    "q23b_dedup_minhash_lsh",
    "q32_sql_surface",      // 5×5 pair demo
    "q59_hybrid_rrf",       // vector half is the exact-kNN baseline (the
                            // q15 shape); swap topK -> topKIvfPq at scale
    "q61_lm_score",         // 1-row vocab-size broadcast: the
                            // scalar-subquery plan shape (build side is
                            // one row — not a corpus cartesian)
    "q63_source_mixture",   // same: 1-row Σ-sqrt denominator broadcast
    "q66_bm25_postings",    // the q58 shape served lazily from the
                            // postings table (q58 hides it behind the
                            // checkpoint): 1-row corpus-stats broadcast
    "q67_hist_quantiles",   // nBuckets-row histogram × 4-row quantile
                            // frame — both sides bounded by construction
    "q80_adaptive_quality", // the q67 quantile shape inside the per-source
                            // cutoff derivation: histogram × 1-row q-frame,
                            // both bounded; the corpus joins stay equi/bcast
    "q91_semantic_decontam", // broadcast nested-loop on the corpus-≪ eval
                            // suite (the q15/q25 exact-cosine contract) —
                            // linear in corpus, never corpus × corpus
    "q95_ann_bq_refine"     // BQ Hamming stage: broadcast-query flat scan
                            // over 2-long packed words (the q15 contract
                            // at 1/32 the scan width) — linear in corpus
  )

  test("no unintentional cartesian/nested-loop joins in any declared query") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad && !intentionalCross(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"unintentional cross joins in: $offenders")
  }

  test("guarded semantic dedup: rep-collapsed pair join plans without " +
    "cartesian/nested-loop joins") {
    import spark.implicits._
    val emb = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(16)(j => if (j < 5) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    // forced-collapse pairs AND capped dedup: both guarded branches must
    // stay equi-join shaped (the whole point of the guard is the join)
    val pairsPlan = graft.operators.Dedup
      .semanticDupPairs(emb, nCells = 2, iters = 1, tau = 0.9,
        collapseIdentical = Some(true))
      .queryExecution.executedPlan.toString
    assert(!pairsPlan.contains("CartesianProduct") &&
      !pairsPlan.contains("BroadcastNestedLoopJoin"), pairsPlan.take(3000))
    val dedupPlan = graft.operators.Dedup
      .semanticDeduped(emb, nCells = 2, iters = 1, tau = 0.9,
        collapseIdentical = Some(true), maxCellSize = Some(5))
      .queryExecution.executedPlan.toString
    assert(!dedupPlan.contains("CartesianProduct") &&
      !dedupPlan.contains("BroadcastNestedLoopJoin"), dedupPlan.take(3000))
  }

  test("IVF q35: map-only assignment — exchanges are the two rank phases") {
    val plan = SparkEntry.queries("q35_ann_ivf_topk")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // corpus cell assignment must be a projection over centroid literals:
    // no shuffle reaches the corpus before the broadcast probe join, so
    // the only hash exchanges are the salted top-k's two window phases
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n" +
      plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("every approximate search path ranks with the salted two-phase " +
    "top-k (two row_number windows), never a single per-query window") {
    // q27 (LSH), q27b (LSH-multi), q35 (IVF), q41 (PQ), q44 (IVF-PQ): the
    // candidate-ranking stage must be TopK.perKeySalted's two phases —
    // rank within (query, salt), then rank the ≤ k·salts survivors — so a
    // hot query in a dense bucket/cell never sorts its whole candidate
    // set on one task. Exactly two row_number windows per plan.
    for (q <- Seq("q27_ann_lsh_topk", "q27b_ann_lsh_multi",
        "q35_ann_ivf_topk", "q41_ann_pq_topk", "q44_ann_ivfpq_topk",
        "q56_ann_sq_topk")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // count Window OPERATOR nodes (WindowGroupLimit helpers also print
      // "row_number()" — they are pushdown limits of the same windows)
      val windows = "Window \\[row_number\\(\\)".r.findAllIn(plan).length
      assert(windows == 2,
        s"$q: expected 2 row_number windows (salted two-phase rank), " +
          s"got $windows:\n" + plan.take(4000))
      assert(plan.contains("_salt"),
        s"$q: phase-1 window is not salted:\n" + plan.take(4000))
    }
  }

  test("q95 BQ refine: broadcast-only joins — the Hamming stage is a " +
    "broadcast flat scan and the bounded candidate set broadcasts back " +
    "into the exact stage, so every hash exchange is a rank phase") {
    val plan = SparkEntry.queries("q95_ann_bq_refine")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "BQ refine shuffled a join side:\n" + plan.take(4000))
    // 4 rank phases (two salted two-phase top-ks) — no other exchange
    // touches corpus-proportional data
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 4, s"expected 4 hash exchanges, got $exchanges:\n" +
      plan.take(4000))
  }

  test("PQ q41: map-only encode — exchanges are the two rank phases only") {
    val plan = SparkEntry.queries("q41_ann_pq_topk")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // corpus → byte codes is a projection over codebook literals (no
    // shuffle reaches the corpus before the ADC cross join); the only
    // hash exchanges are the salted top-k's two window phases
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n" +
      plan.take(4000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("IVF-PQ q44: cell equi-join, no cross join anywhere in the plan") {
    val plan = SparkEntry.queries("q44_ann_ivfpq_topk")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // the coarse quantizer turns the ADC scan's cross join into a
    // broadcast equi-join on the cell id; encode stays map-only, so the
    // hash exchanges are again just the two rank phases
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n" +
      plan.take(4000))
  }

  test("q53 decontamination: held-out gram keys broadcast — no shuffled " +
    "join ever reaches the train-side gram stream") {
    val plan = SparkEntry.queries("q53_decontaminate")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(2000))
  }

  test("q90 curation funnel plan: all joins broadcast at fixture scale, " +
    "no cartesian anywhere (gated on the un-pinned form — the public " +
    "operator checkpoints)") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val cand = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
    val eval = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val plan = graft.operators.Pipeline.curatePlan(cand, eval)
      .queryExecution.executedPlan.toString
    // gram probe + canonical pick + dirty anti-join: equi/broadcast only
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the language/margin gates run as a Filter on the scan side, ahead
    // of every join — no join input is the raw corpus
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("q92 funnel accounting plan: gate predicates + token counts ride " +
    "the scan projection; attribution joins are equi-only id frames " +
    "(gated on the un-pinned form — the public operator checkpoints)") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val cand = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
    val eval = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val plan = graft.operators.Pipeline.funnelStatsPlan(cand, eval)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the gram probe broadcasts the eval key set as in q53/q90
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the final rollup is a 5-row agg: partial aggregation must be
    // present ahead of its exchange (map-side combine on the stage key)
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      plan.take(2000))
  }

  test("q54 budget selection: threshold bucketing leaves exactly two " +
    "windows — the tiny bucket-totals cum and the boundary-bucket cum") {
    // the public operator checkpoints its result (freeing the scored
    // cache eagerly), which hides the internals — gate the un-pinned
    // pipeline, which q54 wraps
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = graft.operators.TextAnalysis
      .selectByTokenBudgetPlan(docs, 4000)
      .queryExecution.executedPlan.toString
    // neither window may see the corpus: the bucket-totals cum runs over
    // the tiny (stratum, quality-bucket) frame (duplicated into both
    // union branches here because the un-pinned pipeline re-derives it;
    // the public operator's persist collapses the duplicate), the
    // boundary cum over the single threshold bucket's docs
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 2 || windows == 3,
      s"expected 2-3 bounded windows, got $windows:\n" + plan.take(4000))
    // the corpus-grain branches themselves are window-free: every window
    // partition spec is keyed by the stratum alone (bucket/boundary
    // frames), never an unpartitioned global cumsum
    assert(!plan.contains("windowspecdefinition()"), plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("bm25 search plan: broadcast joins only, salted two-phase rank " +
    "(gated on the lazy over-postings form — the query entry checkpoints)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = {
      import spark.implicits._
      Seq((0L, "dup merge scan")).toDF("query_id", "qtext")
    }
    val plan = graft.operators.Retrieval
      .bm25OverPostings(graft.operators.Retrieval.postings(docs), qs, 10)
      .queryExecution.executedPlan.toString
    // every query-side join broadcasts; the only non-broadcast shuffles
    // are the postings agg, the per-(query, doc) agg and the rank phases
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val windows = "Window \\[row_number\\(\\)".r.findAllIn(plan).length
    assert(windows == 2, s"expected the salted two-phase rank, got " +
      s"$windows windows:\n" + plan.take(4000))
    assert(plan.contains("_salt"), plan.take(4000))
  }

  test("q85 priority sample: map-only priorities into " +
    "TakeOrderedAndProject — no global sort exchange") {
    val plan = SparkEntry.queries("q85_priority_sample")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange rangepartitioning"),
      plan.take(2000))
  }

  test("q87 phrase search: phrase-term joins broadcast — no shuffled " +
    "join reaches the postings stream") {
    val plan = SparkEntry.queries("q87_phrase_search")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(2000))
  }

  test("q88 proximity search: term selection broadcasts; the only " +
    "non-broadcast join is the (query, doc, bucket) equi-join") {
    val plan = SparkEntry.queries("q88_proximity_search")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the a-b position join may shuffle (both sides corpus-derived) but
    // must be an EQUI join — never a nested-loop range join
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q60 classifier: zero joins — hashed features + literal weights " +
    "reach one doc-keyed hash exchange") {
    val plan = SparkEntry.queries("q60_quality_classifier")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n" +
      plan.take(4000))
  }

  test("q63 mixture: corpus rows take one broadcast join + a map-side " +
    "threshold — the only hash exchange is the tiny source-stats agg") {
    val plan = SparkEntry.queries("q63_source_mixture")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n" +
      plan.take(4000))
  }

  test("q104 epoch plan: every join broadcasts (targets, bucket offsets, " +
    "source totals are all tiny frames) — the corpus never shuffles " +
    "for a join") {
    val plan = SparkEntry.queries("q104_epoch_plan")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("q102 pack manifest: broadcast-only joins (the q46 two-stage " +
    "running-sum shape) + a map-only explode") {
    val plan = SparkEntry.queries("q102_pack_sequences")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("q103 greedy pack: no join anywhere — one shard exchange + a " +
    "streaming per-partition pass") {
    val plan = SparkEntry.queries("q103_pack_greedy")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q31 as-of: union+window shape — one hash exchange, no join") {
    val plan = SparkEntry.queries("q31_asof_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges")
  }

  test("q76 CMS: probe join broadcasts the sketch, never shuffles it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 200).map(i => s"t${i % 40}").toDF("w")
    val sketch = graft.operators.Sketches.countMin(df, col("w"), 4, 64)
    val plan = graft.operators.Sketches
      .countMinEstimate(sketch, df, "w", 4, 64)
      .queryExecution.executedPlan.toString
    // the sketch is <= depth*width rows by construction: probing it must
    // never pay a sort-merge shuffle of the (corpus-scale) probe side
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("parquet-scan queries push filters and prune columns (q01 witness)") {
    val plan = SparkEntry.queries("q01_filter")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,45.0)]"), plan)
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      plan)
  }
}
