package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Physical-plan regression tests: the properties that make these
  * queries scale (scan pushdown, column pruning, broadcast joins,
  * partial-limit top-N, map-side partial aggregation) are asserted so
  * a refactor can't silently trade them away. */
class PlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** Every unpartitioned (global) window in the plan must sit above a
    * limit-bounded subtree — the WindowExec "moving all data to a single
    * partition" WARN is then benign by construction (the single
    * partition holds ≤ k rows). Returns how many global windows were
    * seen so callers can assert non-vacuity across a family. */
  private def globalWindowsLimitBounded(df: DataFrame, name: String): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
      case _ => p +: p.children.flatMap(expand)
    }
    val globals = expand(df.queryExecution.executedPlan)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    globals.foreach { w =>
      val below = w.child.toString
      assert(below.contains("TakeOrderedAndProject") || below.contains("Limit"),
        s"$name: global window WITHOUT a limit-bounded child:\n$w")
    }
    globals.size
  }

  test("ranked-retrieval family: every global (unpartitioned) window ranks a " +
      "limit-bounded frame — the single-partition WARN is benign by construction") {
    val family: Seq[(String, DataFrame)] = Seq(
      "q_bm25_search"   -> CurationQueries.qBm25Search(spark, dir),
      "q_chunk_search"  -> CurationQueries.qChunkSearch(spark, dir),
      "q_hybrid_search" -> CurationQueries.qHybridSearch(spark, dir),
      "q_phrase_search" -> CurationQueries.qPhraseSearch(spark, dir),
      "q_maxsim_search" -> SimilarityQueries.qMaxsimSearch(spark, dir))
    val seen = family.map { case (n, df) => globalWindowsLimitBounded(df, n) }.sum
    assert(seen >= 1, "vacuous: no global window found anywhere in the family")
  }

  test("q_filter_range pushes the half-open range into the parquet scan") {
    val p = plan(CoreQueries.qFilterRange(spark, dir))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(event_id,100)"), p)
    assert(p.contains("LessThan(event_id,5000)"), p)
  }

  test("q_scan_project prunes unused columns at the scan (no props/ts read when unused)") {
    val p = plan(CoreQueries.qScanProject(spark, dir))
    assert(!p.contains("props"), s"props not pruned:\n$p")
  }

  test("q_join_enrich broadcasts both dimension tables") {
    val p = plan(CoreQueries.qJoinEnrich(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"dimension join shuffled:\n$p")
  }

  test("q_join_semi_anti uses broadcast semi/anti joins (no shuffle of events)") {
    val p = plan(CoreQueries.qJoinSemiAnti(spark, dir))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_take_limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(CoreQueries.qTakeLimit(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), s"global sort present:\n$p")
  }

  test("q_topk ends in TakeOrderedAndProject over a partial+final agg") {
    val p = plan(CoreQueries.qTopk(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q_wordcount / q_agg_stats do map-side partial aggregation") {
    assert(plan(CoreQueries.qWordcount(spark, dir)).contains("partial_count"))
    val p = plan(CoreQueries.qAggStats(spark, dir))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("similarity kNN keeps the corpus side unshuffled (broadcast queries)") {
    val p = plan(SimilarityQueries.qSimilarityKnn(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_embed_neardup is an equi-join on IVF cells — no nested-loop all-pairs join") {
    val p = plan(SimilarityQueries.qEmbedNeardup(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"all-pairs join present:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q_asof_join plans as union+window — no inequality join, no global window") {
    val df = CoreQueries.qAsofJoin(spark, dir)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"inequality join present:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val windows = windowsOf(df)
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window in plan:\n$p"))
  }

  private def windowsOf(df: DataFrame) = {
    val root = df.queryExecution.executedPlan match {
      // AQE wraps the physical plan; collect inside it
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
  }

  test("q_pack_sequences has no data-sized unpartitioned window") {
    val df = TextQueries.qPackSequences(spark, dir)
    val windows = windowsOf(df)
    assert(windows.nonEmpty, s"expected a WindowExec:\n${plan(df)}")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window in plan:\n${plan(df)}"))
  }

  test("q_late_data windows are all partitioned (two-pass running max holds)") {
    val df = CoreQueries.qLateData(spark, dir)
    val windows = windowsOf(df)
    assert(windows.nonEmpty, s"expected a WindowExec:\n${plan(df)}")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window in plan:\n${plan(df)}"))
  }

  test("q_ngram_jaccard verify joins carry no mandatory broadcast hint (gram table shuffles at scale)") {
    val df = DedupQueries.qNgramJaccard(spark, dir)
    val hints = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.hint
    }
    assert(hints.nonEmpty, "expected joins in the ngram plan")
    hints.foreach { h =>
      assert(h.leftHint.forall(_.strategy.isEmpty) && h.rightHint.forall(_.strategy.isEmpty),
        s"mandatory broadcast hint in ngram plan: $h")
    }
  }

  test("q_similarity_ivf is an equi-join on cells with pair-dedup before the " +
      "per-query window — no nested-loop join") {
    val p = plan(SimilarityQueries.qSimilarityIvf(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // multi-assign/multi-probe duplicates collapse in an aggregate
    // BEFORE the rank window, or row_number would count them
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("row_number"), p)
  }

  test("q_drop_boilerplate: ONE corpus explode feeding the frequency agg, " +
      "per-row HOF cleaning, no cartesian, map-side partial df aggregation") {
    val p = plan(TextQueries.qDropBoilerplate(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // two nested-loops are fine and intentional: the corpus-count SCALAR
    // (1-row aggregate) cross-joined onto the word-df table, and the
    // folded single-row frequent-set array carried back onto the corpus —
    // data-sized sides must never nested-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, s"nested loop:\n$p")
    // the token stream is exploded exactly once (the frequency branch);
    // cleaning is a per-row HOF filter, not a second explode + anti-join
    assert("Generate".r.findAllIn(p).size === 1,
      s"expected exactly one explode:\n$p")
    assert(!p.contains("LeftAnti"), s"anti-join back:\n$p")
    assert(p.contains("partial_count"), s"df agg not partial:\n$p")
  }

  test("q_repetition is shuffle-free per-row projection") {
    val p = plan(TextQueries.qRepetition(spark, dir))
    assert(!p.contains("Exchange"), s"per-row quality op shuffled:\n$p")
  }

  test("q_decontaminate: gram equi-join, no cartesian, partial hit counting") {
    val p = plan(TextQueries.qDecontaminate(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(p.contains("partial_count"), s"hit count not partial:\n$p")
  }

  test("q_lm_bits: count-table equi-joins; the only nested-loop is the 1-row " +
      "vocabulary-size broadcast") {
    val p = plan(TextQueries.qLmBits(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, s"nested loop:\n$p")
    assert(p.contains("partial_count"), s"LM counts not partial:\n$p")
  }

  test("q_dup_spans: keyed counts with ONE rolling-hash kernel run — the " +
      "span stream is never recomputed for the multiplicity branch") {
    val p = plan(TextQueries.qDupSpans(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(p.contains("partial_count"), s"span counts not partial:\n$p")
    assert("MapPartitions".r.findAllIn(p).size === 1,
      s"rolling-hash kernel should appear exactly once:\n$p")
  }

  test("q_excise_spans: one span-kernel run, one rebuild kernel, no " +
      "cartesian, no per-char explode") {
    val p = plan(TextQueries.qExciseSpans(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert("MapPartitions".r.findAllIn(p).size === 2,
      s"expected span kernel + rebuild kernel, nothing recomputed:\n$p")
    assert(!p.contains("Generate explode"), s"per-char explode present:\n$p")
  }

  test("q_pii_redact is shuffle-free per-row projection") {
    val p = plan(TextQueries.qPiiRedact(spark, dir))
    assert(!p.contains("Exchange"), s"per-row redaction shuffled:\n$p")
  }

  test("q_shuffle_shards: one hash exchange on shard, never a global range sort") {
    val p = plan(CoreQueries.qShuffleShards(spark, dir))
    assert(!p.contains("Exchange rangepartitioning"), s"global sort present:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected exactly one hash exchange:\n$p")
  }

  test("q_line_dedup: keeper agg is map-side partial, equi-joins only") {
    val p = plan(TextQueries.qLineDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(p.contains("partial_min"), s"keeper min(struct) not partial:\n$p")
  }

  test("q_decontaminate_bloom prunes the corpus gram stream BEFORE its exchange") {
    val df = TextQueries.qDecontaminateBloom(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // the bloom mightContain UDF must sit on the MAP side of the gram
    // distinct's shuffle: some exchange must have a UDF filter in its
    // subtree (filter above every exchange = pruning after the shuffle
    // already paid for the full gram stream)
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val belowShuffle = root
      .collect { case e: ShuffleExchangeExec => e }
      .exists(_.collect {
        case f: FilterExec if f.condition.toString.contains("UDF") => f
      }.nonEmpty)
    assert(belowShuffle, s"bloom prefilter not below any shuffle:\n$p")
  }

  private def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    root.collect { case e: ShuffleExchangeExec => e }.size
  }

  test("q_best_of_n: ONE exchange total — rank window, pool-count window " +
      "and the re-agg all share the pool-key partitioning") {
    val df = RlQueries.qBestOfN(spark, dir)
    assert(shuffleCount(df) === 1, s"extra exchange:\n${plan(df)}")
    windowsOf(df).foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window:\n${plan(df)}"))
  }

  test("q_pass_at_k: one exchange, no window — pure post-agg arithmetic") {
    val df = RlQueries.qPassAtK(spark, dir)
    assert(shuffleCount(df) === 1, s"extra exchange:\n${plan(df)}")
    assert(windowsOf(df).isEmpty, s"unexpected window:\n${plan(df)}")
  }

  test("q_reward_drift: ONE exchange — both rank windows and the re-agg " +
      "share the pool-key partitioning") {
    val df = RlQueries.qRewardDrift(spark, dir)
    assert(shuffleCount(df) === 1, s"extra exchange:\n${plan(df)}")
    windowsOf(df).foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window:\n${plan(df)}"))
  }

  test("q_grpo_adv: pool stats re-join the candidates on the same key — " +
      "no window, candidates shuffle once") {
    val df = RlQueries.qGrpoAdv(spark, dir)
    assert(windowsOf(df).isEmpty, s"unexpected window:\n${plan(df)}")
    // two branches over the same scan: the stats agg's exchange and at
    // most one more to co-partition the join — never a third
    assert(shuffleCount(df) <= 2, s"extra exchange:\n${plan(df)}")
  }

  test("q_grouping_sets: Expand + ONE hash-aggregate exchange covers all " +
      "three subtotal levels") {
    val df = TemporalQueries.qGroupingSets(spark, dir)
    val p = plan(df)
    assert(p.contains("Expand"), s"no Expand (grouping sets rewritten?):\n$p")
    assert(shuffleCount(df) === 1, s"extra exchange:\n$p")
  }

  test("q_hard_negatives: anchors broadcast onto the corpus (the one " +
      "intended nested loop), top-k is WindowGroupLimit-bounded") {
    val df = RlQueries.qHardNegatives(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // exactly the label-mismatch broadcast, no second data-sized loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 1, p)
    assert(p.contains("WindowGroupLimit"), s"top-k not group-limited:\n$p")
    // the corpus reaches the scorer without shuffling: the only
    // exchange is the per-anchor rank's (id-derived key)
    assert(shuffleCount(df) === 1, s"corpus-side exchange:\n$p")
  }

  test("q_curriculum: no window anywhere; the corpus re-enters through a " +
      "broadcast stage lookup, never an exchange") {
    val df = RlQueries.qCurriculum(spark, dir)
    val p = plan(df)
    assert(windowsOf(df).isEmpty, s"window in curriculum plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"stage lookup not broadcast:\n$p")
    // allowed exchanges: the ≤64-row bin agg + its prefix/total re-aggs;
    // the corpus-scale side must contribute NONE — every shuffle in the
    // plan must sit above the first bin aggregation
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    root.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      assert(e.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"corpus-scale exchange (no aggregate below it):\n$p")
    }
  }

  test("q_similarity_pq: shortlist rerank joins are equi-joins — no cartesian, " +
      "no data-sized nested loop") {
    val p = plan(SimilarityQueries.qSimilarityPq(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // one nested-loop is fine: the Q-row broadcast of queries onto the
    // (tiny) shortlist; the CORPUS join must be hash/equi
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 0, s"nested loop:\n$p")
  }

  test("q_compress_ratio is shuffle-free (per-partition kernel + projection)") {
    val p = plan(TextQueries.qCompressRatio(spark, dir))
    assert(!p.contains("Exchange"), s"per-row compression op shuffled:\n$p")
  }

  test("q_domain_filter: blocklist joins broadcast — the corpus side never shuffles") {
    val p = plan(TextQueries.qDomainFilter(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"blocklist join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the blocklist:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("q_profile: one Expand-based multi-distinct agg pass; approx variant has no Expand") {
    val p = plan(ClassifyQueries.qProfile(spark, dir))
    assert(p.contains("Expand"), s"multi-distinct not planned via Expand:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"), p)
    val pa = plan(graft.api.Graft.profileApprox(
      Tables.events(spark, dir), Seq("event_id", "value"), Seq("event_type")))
    assert(!pa.contains("Expand"), s"approx profile should be a single pass:\n$pa")
  }

  test("q_nb_classify scoring is a broadcast kernel: at most the widen exchange, no joins") {
    // the sf0.001 fixture is a single parquet split, so Spread.widen
    // inserts its one repartition; a wide (cluster-scale) input gets none
    val p = plan(ClassifyQueries.qNbClassify(spark, dir))
    assert("Exchange".r.findAllIn(p).size <= 1, s"scoring shuffles beyond the widen:\n$p")
    assert(!p.contains("Join"), s"scoring joins instead of broadcasting the model:\n$p")
  }

  test("q_heavy_hitters: candidate filter is a broadcast join, token stream never sort-merge-shuffles") {
    val p = plan(MiningQueries.qHeavyHitters(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"candidate semi-filter not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled for the candidate join:\n$p")
  }

  test("q_winnow / q_url_normalize / q_readability are shuffle-free per-row plans") {
    for ((name, df) <- Seq(
        "q_winnow" -> MiningQueries.qWinnow(spark, dir),
        "q_url_normalize" -> MiningQueries.qUrlNormalize(spark, dir),
        "q_readability" -> MiningQueries.qReadability(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }

  test("q_decontaminate_embed: broadcast kernel — at most the widen exchange, no join") {
    val p = plan(MiningQueries.qDecontaminateEmbed(spark, dir))
    assert("Exchange".r.findAllIn(p).size <= 1, s"scan shuffles beyond the widen:\n$p")
    assert(!p.contains("Join"), s"benchmark joined instead of broadcast:\n$p")
  }

  test("q_pagerank: no cartesian/nested-loop anywhere in the iteration") {
    val p = plan(MiningQueries.qPagerank(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
  }

  test("q_ccnet_bucket: the per-lang cutpoints broadcast back to the corpus side") {
    val p = plan(MiningQueries.qCcnetBucket(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"cuts not broadcast:\n$p")
  }

  test("q_quality_gate / q_entropy are shuffle-free per-row plans") {
    for ((name, df) <- Seq(
        "q_quality_gate" -> MiningQueries.qQualityGate(spark, dir),
        "q_entropy" -> MiningQueries.qEntropy(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }

  test("q_mix_weights: the corpus is scanned once — totals derive from the cached per-source agg") {
    val p = plan(MiningQueries.qMixWeights(spark, dir))
    // every corpus reference must read the persisted per-source agg;
    // FileScan lines inside InMemoryRelation definitions are prints of
    // the (once-materialized) cache plan, so pair the counts up
    assert("InMemoryTableScan".r.findAllIn(p).size >=
      "FileScan parquet".r.findAllIn(p).size,
      s"a totals branch re-scans the corpus instead of the per-source agg:\n$p")
  }

  test("Spread.widen: narrow inputs spread to defaultParallelism, wide inputs untouched") {
    val dp = spark.sparkContext.defaultParallelism
    val narrow = spark.range(100).toDF("id").coalesce(1)
    assert(Spread.widen(narrow).rdd.getNumPartitions === dp)
    val wide = spark.range(100).toDF("id").repartition(dp)
    assert(Spread.widen(wide) eq wide, "a wide input must pass through un-shuffled")
  }

  test("q_cross_dedup: band equi-join across sides — no cartesian, no nested loop") {
    val p = plan(DedupQueries.qCrossDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
  }

  test("q_domain_cap prunes to top-k per domain BEFORE the exchange (WindowGroupLimit)") {
    val p = plan(CurationQueries.qDomainCap(spark, dir))
    assert(p.contains("WindowGroupLimit"), s"no map-side top-k pruning:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected exactly one hash exchange on the domain key:\n$p")
  }

  test("q_range_join: bucket equi-join despite the interval predicate — the only " +
      "nested loop is the 1-row min-ts broadcast") {
    val p = plan(CurationQueries.qRangeJoin(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, s"nested loop:\n$p")
  }

  test("q_skew_join: salted equi-join only — no cartesian, no nested loop") {
    val p = plan(CurationQueries.qSkewJoin(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
  }

  test("q_semdedup: within-cell pairing is an equi-join on the cell id — " +
      "never an all-pairs nested loop") {
    val p = plan(CurationQueries.qSemDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
  }

  test("q_bm25_search filters the posting list to the query terms before scoring") {
    val p = plan(CurationQueries.qBm25Search(spark, dir))
    assert(p.contains("IN (join,hash,vector)") || p.contains("INSET"),
      s"query-term filter missing from the posting scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("q_pmi: top-k is a TakeOrderedAndProject; unigram joins are equi-joins") {
    val p = plan(MiningQueries.qPmi(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // the only nested loops are the two 1-row totals broadcasts; the
    // unigram-count joins must be hash equi-joins on the token key
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, s"nested loop:\n$p")
    assert("HashJoin".r.findAllIn(p).size >= 2, s"expected equi-joins:\n$p")
  }

  test("q_blocklist: per-row kernel — no shuffle beyond the narrow-input spread") {
    val p = plan(TextQueries.qBlocklist(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
    assert(!p.contains("Join"), s"unexpected join (terms must ride the closure):\n$p")
  }

  test("q_soft_dedup / q_novelty: the df lookup is a hash equi-join on the " +
      "gram hash — no cartesian, tokens split exactly once per branch") {
    for (df <- Seq(CurationQueries.qSoftDedup(spark, dir),
        CurationQueries.qNovelty(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"non-equi join:\n$p")
      // the HOF trap pin: tokens() must be projected to an attribute
      // before the gram lambda references it — a fused form shows the
      // split() call nested inside transform()'s lambda
      assert(!p.matches("(?s).*transform\\([^,]*split\\(.*"),
        s"split re-evaluated inside the gram lambda:\n$p")
      // grams shuffle as xxhash64 longs, never n-word strings
      assert(p.contains("xxhash64"), s"gram hashing missing:\n$p")
    }
  }

  test("q_zipf: top-K vocabulary cut is a TakeOrderedAndProject, never a " +
      "global vocabulary sort; counts aggregate map-side") {
    val p = plan(MiningQueries.qZipf(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k:\n$p")
    assert(p.contains("partial_count"), s"expected map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("q_html_extract is a shuffle-free per-row regex projection") {
    val p = plan(TextQueries.qHtmlExtract(spark, dir))
    assert(!p.contains("Exchange"), s"html extraction must not shuffle:\n$p")
    assert(!p.contains("props"), s"unused columns not pruned:\n$p")
  }

  test("q_oov_rate: the vocabulary cut is a TakeOrderedAndProject and the " +
      "vocab joins back as a broadcast — the term table never re-shuffles on the word") {
    val p = plan(CurationQueries.qOovRate(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k vocab cut:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab lookup must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join:\n$p")
  }

  test("q_knn_classify: scoring inherits knn's broadcast-queries shape; " +
      "vote resolution adds no cartesian") {
    val p = plan(ClassifyQueries.qKnnClassify(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries must broadcast against the unshuffled corpus:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.toLowerCase.contains("floatvecdot"), s"native dot product missing:\n$p")
  }

  test("q_chunk_search: the chunk stream's posting list is filtered to the " +
      "query terms before scoring; no cartesian") {
    val p = plan(CurationQueries.qChunkSearch(spark, dir))
    assert(p.contains("IN (join,hash,vector)") || p.contains("INSET"),
      s"query-term filter missing from the posting scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("q_code_detect is a shuffle-free per-row signal projection") {
    val p = plan(TextQueries.qCodeDetect(spark, dir))
    assert(!p.contains("Exchange"), s"code detection must not shuffle:\n$p")
  }

  test("q_anchor_extract / q_chunk_windows are shuffle-free per-row generators") {
    for (df <- Seq(TextQueries.qAnchorExtract(spark, dir),
        TextQueries.qChunkWindows(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"per-row generator must not shuffle:\n$p")
      assert(p.contains("Generate"), s"expected a generator (explode):\n$p")
    }
    // the HOF/re-evaluation trap: the token split must feed the chunk
    // generator as a projected attribute, not re-split per chunk
    val p = plan(TextQueries.qChunkWindows(spark, dir))
    assert(!p.matches("(?s).*slice\\([^,]*split\\(.*"),
      s"split re-evaluated inside the chunk slice:\n$p")
  }

  test("FloatVecDot is planned natively and supports codegen") {
    val df = SimilarityQueries.qSimilarityKnn(spark, dir)
    val p = plan(df).toLowerCase
    assert(p.contains("floatvecdot"), p)
    // the expression itself must not be a CodegenFallback
    val e = graft.functions.FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(!e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    assert(e.eval(null) === 2.0)
  }

  test("q_revenue_forecast pushes every predicate to the parquet scan") {
    // toString truncates PushedFilters; formatted mode prints them all
    val p = OlapQueries.qRevenueForecast(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters:"), p)
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.02)", "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)"))
      assert(p.contains(f), s"missing pushed filter $f:\n$p")
  }

  test("q_top_orders: broadcast segment semi-join + TakeOrderedAndProject top-10") {
    val p = plan(OlapQueries.qTopOrders(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of partial top-N:\n$p")
    assert(p.contains("LeftSemi"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty, p)
  }

  test("q_dpo_export: sessionize, assembly, rank and pairing all share " +
      "ONE user_id exchange (no second corpus shuffle)") {
    val p = plan(SftQueries.qDpoExport(spark, dir))
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.size === 1, s"expected one exchange, got $exchanges:\n$p")
    assert(exchanges.head.contains("user_id"), s"exchange not on user_id:\n$p")
  }

  test("q_pricing_summary: single shuffle, map-side partial aggregation") {
    val p = plan(OlapQueries.qPricingSummary(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q_gap_fill: the dense grid sides are broadcast, counts agg is partial+final") {
    val p = plan(OlapQueries.qGapFill(spark, dir))
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"grid frames not broadcast:\n$p")
  }

  /** The round-11 weak class, pinned structurally: a WindowExec
    * partitioned ONLY by fixed-cardinality columns (source, lang,
    * event_type, domain — keys whose distinct count does not grow with
    * the data) is a single-task sort per stratum at 100×. Every
    * partitioned window in the gate must therefore be one of:
    *   - keyed by a data-derived column — an id/key/hash whose
    *     cardinality grows with the corpus (user_id, query_id, __s, a
    *     time bucket _wN from date_trunc), or the shard parallelism
    *     parameter of epochShuffle;
    *   - chunk-partitioned — the StratifiedRank/packSequences two-pass
    *     kernels partition by (strata..., __chunk), and their bounded
    *     prefix windows sit above an Aggregate that collapsed the frame
    *     to ≤ strata × chunkCount rows;
    *   - limit-bounded — a rank ≤ k filter Spark rewrites to a
    *     map-side WindowGroupLimit below the window's exchange;
    *   - above an Aggregate — the frame was already collapsed to a
    *     bounded grain (hourly bars, (src, dst) transition pairs).
    * Anything else fails here, which is exactly what the pre-fix
    * q_pref_pairs / q_ntile / q_rank_funcs / q_interleave /
    * q_token_budget_sample plans would do. */
  /** Stratum-window offender scan for one frame — the round-11 rule,
    * with the Aggregate allowance tightened in round 15: an aggregate
    * somewhere below the window no longer suffices (the round-14 KMV
    * plan slipped through exactly that way — its distinct's grain was
    * (event_type, hash), corpus-sized). The allowance now requires an
    * aggregate whose grouping grain is BOUNDED: every grouping key is
    * one of the window's partition keys, a fixed-cardinality stratum
    * (source/lang/event_type/domain and the transition-pair aliases
    * src/dst), the two-pass kernels' `__chunk` ordinal (≤ chunkCount
    * by construction), or a calendar bucket (hour_start/_wN — bounded
    * by the time span, not the corpus; a scalar/global agg is grain
    * zero and trivially bounded). Audited against the gate via
    * WindowAuditDrive: the eight legitimate users (q_autocorr,
    * q_transitions, and the six chunked StratifiedRank windows) all
    * satisfy the bounded-grain form; the round-14 q_distinct_kmv plan
    * does not (see the negative test below). */
  private def stratumWindowOffenders(df: org.apache.spark.sql.DataFrame,
      name: String): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
      case _ => p +: p.children.flatMap(expand)
    }
    // data-derived partition keys: cardinality grows with the corpus.
    // __g (gram hash, r19 softDedup/novelty df-count windows) and
    // w1/w2 (lmScore bigram-count window) are the same class as the
    // long-blessed __s span hash (q_dup_spans): the window count over
    // the hash is the single-pass form of agg + self-join — the hot
    // key's rows concentrate in one task EITHER way (the join shuffles
    // them to one reducer too); the window form just also tokenizes
    // the corpus once instead of twice.
    val dataDerived =
      """(?i).*(id|key)$|^sid$|^__chunk$|^__s$|^__g$|^w[12]$|^shard$|^_w\d+$""".r
    // columns a bounded-grain aggregate may group by (beyond the
    // window's own partition keys): fixed-cardinality strata, the
    // chunk ordinal, calendar buckets
    val boundedName =
      """(?i)^(source|lang|event_type|domain|src|dst|label|__chunk|_w\d+)$|(?i)^(hour|day|week|month)(_start)?$|(?i)_(hour|day|week|month|date)$""".r
    def boundedAggBelow(w: WindowExec): Boolean = {
      val partKeys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      expand(w.child).exists {
        case a: BaseAggregateExec =>
          a.groupingExpressions.forall(_.references.forall(r =>
            partKeys.contains(r.name) || boundedName.matches(r.name)))
        case _ => false
      }
    }
    expand(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }.flatMap { w =>
        val partNames = w.partitionSpec.map(_.sql)
        val safe =
          w.partitionSpec.isEmpty || // global windows: separate rule
          partNames.exists(n => dataDerived.matches(n)) ||
          w.child.toString.contains("WindowGroupLimit") ||
          boundedAggBelow(w)
        if (safe) None else Some(s"$name: Window partitioned by " +
          s"[${partNames.mkString(", ")}] with an unbounded data-sized child")
      }
  }

  test("no gate query carries an unbounded window partitioned by a " +
      "fixed-cardinality stratum (round-11 weak class)") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) => stratumWindowOffenders(fn(spark, dir), name)
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the tightened Aggregate allowance catches the round-14 KMV " +
      "window plan (negative control) and passes the aggregate re-plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
    // the round-14 formulation, verbatim: distinct (event_type, hash)
    // then two unbounded windows partitioned by the stratum alone —
    // its child distinct IS an Aggregate, but at corpus grain, which
    // is exactly the case the old contains("Aggregate") check missed
    val h = pmod(pmod(col("user_id").cast("long"), lit(2147483648L))
      * lit(1103515245L) + lit(12345L), lit(2147483648L))
    val byKey = Window.partitionBy(col("event_type"))
    val old = ev.select(col("event_type"), h.as("__h")).distinct()
      .withColumn("__rn", row_number().over(byKey.orderBy(col("__h").asc)))
      .withColumn("__m", count(lit(1)).over(byKey))
      .filter(col("__rn") <= 64)
      .groupBy(col("event_type"))
      .agg(max(col("__m")).as("m"), max(when(col("__rn") === 64, col("__h"))).as("hk"))
    assert(stratumWindowOffenders(old, "kmv_old").nonEmpty,
      "negative control: the round-14 window plan must be flagged")
    val offenders =
      stratumWindowOffenders(graft.ops.CoreQueries.qDistinctKmv(spark, dir), "q_distinct_kmv")
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  /** The round-12 weak class, pinned structurally: a broadcast
    * nested-loop (or cartesian) join whose BROADCAST side is
    * corpus-derived and unbounded grows BOTH sides with the data —
    * O(n²) compute and a broadcast that outgrows executor memory at
    * 100×. Every non-equi join in the gate must therefore broadcast a
    * side that is bounded by construction:
    *   - an aggregate collapsed to a bounded grain — grouping-free
    *     (1-row scalar frames: tfIdf/bm25 corpus stats) or grouped
    *     only by fixed-cardinality keys (q_ab_test's per-arm moment
    *     rows), detected with the window pin's data-derived-name
    *     regex inverted: row count = #groups, which does not grow
    *     with the corpus;
    *   - a limit — TakeOrderedAndProject / Local/GlobalLimit (top-N
    *     panels, vocab cutoffs);
    *   - a constant-range id panel — a filter comparing an attribute
    *     to literals with `<`/`<=`/`=`, whose row count is fixed by
    *     the literal (vec_id < 64), never by the corpus (a pmod/`%`
    *     stratum filter keeps a constant FRACTION and fails here, the
    *     q_hard_negatives round-12 finding);
    *   - a LocalTableScan / empty relation — literal frames (grids,
    *     parameter tables) or AQE-pruned sides.
    * Anything else fails, which is exactly what the pre-fix
    * q_hard_negatives (5% panel through a BNLJ) would do; its IVF
    * sibling plans a shuffled equi-join on cell and never enters this
    * check. */
  test("no gate query broadcast-nested-loop-joins two corpus-derived " +
      "sides (round-12 weak class)") {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, EqualTo, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.execution.{FilterExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
      case _ => p +: p.children.flatMap(expand)
    }
    def constRange(p: SparkPlan): Boolean = p match {
      case f: FilterExec => f.condition.exists {
        case c: BinaryComparison => (c.isInstanceOf[LessThan] ||
          c.isInstanceOf[LessThanOrEqual] || c.isInstanceOf[EqualTo]) &&
          ((c.left.isInstanceOf[Attribute] && c.right.isInstanceOf[Literal]) ||
           (c.left.isInstanceOf[Literal] && c.right.isInstanceOf[Attribute]))
        case _ => false
      }
      case _ => false
    }
    val dataDerived =
      """(?i).*(id|key)$|^sid$|^__chunk$|^__s$|^shard$|^_w\d+$""".r
    def bounded(p: SparkPlan): Boolean = expand(p).exists {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty ||
        a.groupingExpressions.forall(g => !dataDerived.matches(g.sql))
      case _: TakeOrderedAndProjectExec => true
      case _: LocalTableScanExec => true
      case f if constRange(f) => true
      case o => o.nodeName.contains("Limit")
    }
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        expand(fn(spark, dir).queryExecution.executedPlan).flatMap {
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            if (bounded(build)) None
            else Some(s"$name: BroadcastNestedLoopJoin broadcasts an " +
              s"unbounded corpus-derived side:\n$build")
          case j: CartesianProductExec =>
            if (bounded(j.left) || bounded(j.right)) None
            else Some(s"$name: CartesianProduct over two unbounded sides")
          case _ => None
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("stratified-rank family: every partitioned window is either " +
      "chunk-partitioned or a bounded prefix over the chunk-count aggregate") {
    val family: Seq[(String, DataFrame)] = Seq(
      "q_pref_pairs" -> SftQueries.qPrefPairs(spark, dir),
      "q_pref_pairs_quality" -> SftQueries.qPrefPairsQuality(spark, dir),
      "q_ntile" -> TemporalQueries.qNtile(spark, dir),
      "q_rank_funcs" -> EvalQueries.qRankFuncs(spark, dir),
      "q_interleave" -> TemporalQueries.qInterleave(spark, dir),
      "q_token_budget_sample" -> CoreQueries.qTokenBudgetSample(spark, dir))
    var seen = 0
    family.foreach { case (name, df) =>
      val windows = windowsOf(df)
      assert(windows.nonEmpty, s"$name: expected WindowExec:\n${plan(df)}")
      windows.foreach { w =>
        seen += 1
        val inPart = w.partitionSpec.exists(_.sql.contains("__chunk"))
        val inChild = w.child.toString.contains("__chunk")
        assert(inPart || inChild,
          s"$name: window [${w.partitionSpec.map(_.sql).mkString(",")}] is " +
          s"neither chunk-partitioned nor a chunk-frame prefix:\n${plan(df)}")
      }
    }
    assert(seen >= 12, s"vacuous: only $seen windows across the family")
  }
}
