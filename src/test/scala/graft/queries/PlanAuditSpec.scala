package graft.queries

import graft.SparkSpec

/** Plan-shape regression tests: the properties that make these
  * queries scale are asserted, not just observed once in an explain.
  * If a refactor un-pushes a filter or turns a broadcast into a
  * shuffle join, these fail before the benchmark does.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String = {
    // Other specs cache() query frames they assert on; the CacheManager
    // would then substitute an InMemoryRelation here, whose string
    // carries BOTH the AQE initial and final plans — double-counting
    // Exchange/Join nodes and making the audits order-dependent.
    spark.sharedState.cacheManager.clearCache()
    val df = graft.SparkEntry.queries(name)(spark, sf001)
    df.queryExecution.executedPlan.toString
  }


  /** Pin the BIG-fact plan shape at spec scale: the shuffled-hash
    * fact-join hints are scale-conditional (ScaleHints.shjIfBigFact —
    * sf0.001 sits far below the byte threshold), so these audits
    * force the threshold to 0 while asserting the shape the ×1000
    * corpus gets.
    */
  private def atBigFactScale[A](body: => A): A = {
    spark.conf.set(graft.operators.ScaleHints.ShjFactMinBytesConf, "0")
    try body
    finally spark.conf.unset(graft.operators.ScaleHints.ShjFactMinBytesConf)
  }

  test("q3: filters pushed to parquet scans, joins broadcast, top-k via TakeOrdered") {
    val p = planOf("q3_shipping_priority")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || p.contains("GreaterThan(l_shipdate"), s"lineitem date filter not pushed:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "customer segment filter not pushed")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(p.contains("TakeOrderedAndProject"), "expected top-k operator, not global sort")
  }

  test("q_approx_stats: one fact scan in the final plan (sketch pass collected)") {
    // the sketch aggregate is collected (|returnflag| rows) and
    // re-injected as a local relation, so the final plan carries only
    // the rank-check's lineitem scan — lazily reused, the sketch
    // subtree appeared twice and the plan held THREE 600M-row scans
    // (the r11 ×1000 63 s tail)
    val p = planOf("q_approx_stats")
    val scans = "(FileScan|Scan) parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly one lineitem scan, got $scans:\n$p")
    assert(p.contains("LocalTableScan") || p.contains("LocalRelation"),
      s"expected the collected sketch pass as a local relation:\n$p")
  }

  test("q5: date-range predicate reaches the orders scan") {
    val p = planOf("q5_local_supplier")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") && p.contains("LessThan(o_orderdate"),
      s"orders date range not pushed:\n$p")
  }

  test("q6: all three predicates reach the lineitem scan, four-column read") {
    val p = planOf("q6_forecast_revenue")
    // PushedFilters is elided in toString; the scan's DataFilters line
    // carries the same predicates untruncated
    assert("l_shipdate#\\d+ >= 1997-01-01".r.findFirstIn(p).isDefined
      && "l_shipdate#\\d+ < 1998-01-01".r.findFirstIn(p).isDefined,
      s"shipdate range not pushed:\n$p")
    assert("l_discount#\\d+ >= 0.05".r.findFirstIn(p).isDefined
      && "l_discount#\\d+ <= 0.07".r.findFirstIn(p).isDefined,
      s"discount range not pushed:\n$p")
    assert("l_quantity#\\d+ < 24.0".r.findFirstIn(p).isDefined,
      s"quantity bound not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp"), s"scan should read exactly 4 columns:\n$p")
  }

  test("q4: EXISTS collapses to a max pre-agg; implied shipdate bound reaches the scan") {
    val p = planOf("q4_order_priority")
    // the monotone-EXISTS rewrite: lineitem pre-aggregates to one
    // (orderkey, max shipdate) row, so the fact shuffle carries order
    // count not line count and no semi-join dedup is needed
    assert("max\\(l_shipdate".r.findFirstIn(p).isDefined,
      s"expected the max(l_shipdate) pre-aggregate below the join:\n$p")
    assert(p.contains(s"INTERVAL '${StarSchema.Q4LagDays}' DAY"),
      s"late-shipment condition should live in the join:\n$p")
    // the bound implied by the order-window start plus the lag must
    // reach the parquet scan (row-group pruning at scale); derived
    // from the SAME constants the query uses, so window/lag edits
    // cannot strand this pin
    assert(p.contains(s"GreaterThan(l_shipdate,${StarSchema.Q4DerivedShipBound}"),
      s"derived shipdate bound not pushed to the lineitem scan:\n$p")
    assert("Scan parquet".r.findAllIn(p).size + "FileScan parquet".r.findAllIn(p).size <= 4,
      s"orders and lineitem should each scan once:\n$p")
  }

  test("asofNearest: two RUNNING frames over one exchange, no unbounded-following frame") {
    val p = planOf("q_asof_nearest")
    // the round-9 physical claim: backward and forward picks are BOTH
    // running (unboundedpreceding, currentrow) frames — the forward
    // one over the reversed ordering. A `first over (currentrow,
    // unboundedfollowing)` frame would fuse into one Window but
    // Spark evaluates it O(n²) per partition (re-scan to the end per
    // row) — the planted-hot-key killer round 9 measured at 1939 s.
    assert("Window \\[".r.findAllIn(p).size == 2,
      s"expected two Window operators (asc + desc running frames):\n$p")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"no frame may extend to unboundedfollowing (O(n²) eval):\n$p")
    assert("Exchange hashpartitioning\\(_k".r.findAllIn(p).size == 1,
      s"expected exactly one key exchange for the union-window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nearest must not fall back to a nested loop:\n$p")
  }

  test("attribution: single-pass as-of — one event-row exchange, running frames only") {
    val p = planOf("q_events_attribution")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"no frame may extend to unboundedfollowing (O(n²) eval):\n$p")
    // the pairing must be window-based, never the purchases×touches
    // pair join the round-9 skew probe measured quadratic
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"attribution must not pair via a nested loop:\n$p")
  }

  test("concurrency: only the O(hours) spine window is single-partition") {
    val p = planOf("q_events_concurrency")
    // exactly one SinglePartition exchange (the per-hour carry); the
    // per-instant running sums must stay hash-partitioned by hour
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1,
      s"expected exactly ONE single-partition exchange (the hour spine):\n$p")
    assert("Exchange hashpartitioning\\(hour_us".r.findFirstIn(p).isDefined
      || "hashpartitioning\\(hour_us".r.findFirstIn(p).isDefined,
      s"within-hour running sums should be hash-partitioned by hour:\n$p")
  }

  test("kmv: rank<=k plans the map-side WindowGroupLimit, not a full sort-rank") {
    val p = planOf("q_kmv_distinct")
    assert(p.contains("WindowGroupLimit"),
      s"row_number<=k should push the per-group limit below the exchange:\n$p")
  }

  test("q17: group-average compare is a hash agg + hash join, no full-fact sort") {
    val p = atBigFactScale(planOf("q17_small_qty_revenue"))
    // the window form scans once but WindowExec sorts the ENTIRE
    // fact by partkey — measured 57 s / GC-death risk at the x1000
    // corpus; the agg+hash-join form rescans but never sorts
    assert(p.contains("ShuffledHashJoin"),
      s"per-part average should hash-join back, not sort-merge or window:\n$p")
    assert(!p.contains("Window"), s"no window (full-fact sort) allowed:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact sort allowed:\n$p")
  }

  test("q18: lineitem scans once (qualifying agg reused, no textbook rescan)") {
    val p = planOf("q18_large_volume")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"the HAVING aggregate should be joined, not recomputed from a second scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-100 should be TakeOrderedAndProject")
  }

  test("fact joins feeding tiny aggs hash-build, never sort the fact (r11 tail fixes)") {
    // the x1000 sweep's lesson (BASELINE.md round-11 tail fixes):
    // nothing downstream of these joins reuses a sort order, so an
    // SMJ's O(n log n) fact sort is pure waste — each pins the
    // shuffled-hash build on its filtered/pre-aggregated slim side
    for (q <- Seq("q18_large_volume", "q5_local_supplier",
        "q7_volume_shipping", "q8_market_share", "q_days_to_ship",
        "q4_order_priority", "q21_waiting_supplier")) {
      val p = atBigFactScale(planOf(q))
      assert(p.contains("ShuffledHashJoin"),
        s"$q: expected the hinted shuffled-hash fact join:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: a sort-merge fact join crept back:\n$p")
    }
  }

  test("ngram family: ONE corpus-mass gram join, hash-built, no occurrence-stream sort") {
    // BASELINE.md round-11 LLM-text tail fixes: the per-occurrence
    // bigram/token stream (~1B rows at ×1000) is joined ONCE against
    // a vocab-sized gram table that pre-attaches every per-gram value
    // (cb+cp, or the per-gram fp fixed-point), and that join
    // hash-builds the gram side — an SMJ would sort the stream for a
    // join whose output collapses straight into a per-doc aggregate
    for (q <- Seq("q_llm_bigram_lm", "q_llm_perplexity",
        "q_llm_commonness")) {
      val p = atBigFactScale(planOf(q))
      assert(p.contains("ShuffledHashJoin"),
        s"$q: expected the hinted shuffled-hash gram join:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: a sort-merge join over the occurrence stream crept back:\n$p")
    }
  }

  test("positional index: built in-row, ZERO exchanges") {
    val p = planOf("q_positional_index")
    // (word, doc_id) groups never span document rows, so the index is
    // one scan + generate — any Exchange here moves posting mass that
    // could never merge (BASELINE.md r11: 20.8 s → 2.4 s at ×1000)
    assert(!p.contains("Exchange"), s"positional index must not shuffle:\n$p")
    assert(p.contains("postings("), s"expected the native Postings scan:\n$p")
  }

  test("source drift: corpus collapses to (source, token) counts in ONE pass") {
    val p = planOf("q_llm_source_drift")
    // the raw exploded token stream must never be rescanned: at most
    // one documents scan (zero once the staged (source, w) table
    // shows as ExistingRDD) feeds the aggregation; ct / t_all / t_s
    // are its marginals
    assert("documents\\.parquet".r.findAllIn(p).size <= 1,
      s"token counts / totals must derive from the (source, w) table, not rescans:\n$p")
  }

  test("ann top-k: rank filter becomes WindowGroupLimit (no full sort per query)") {
    val p = planOf("q_ann_topk")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }

  test("scans prune columns: q_top_customers reads only the needed order columns") {
    val p = planOf("q_top_customers")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_totalprice:double>"),
      s"orders scan should read exactly custkey+totalprice:\n$p")
  }

  test("composed training-prep pipeline stays one scan + two shuffles") {
    val p = planOf("q_llm_pipeline")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"pipeline should scan documents exactly once:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 4, // dedup + final agg (+AQE reads)
      s"pipeline grew extra shuffles:\n$p")
    assert(p.contains("WindowGroupLimit"), "dedup row_number should push a group limit")
  }

  test("embed near-dup candidates come from an equi-join, not a nested loop") {
    val p = planOf("q_embed_near_dup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"near-dup pair generation must be the bucket equi-join, not O(n^2):\n$p")
  }

  test("IVF cell assignment is map-only (centroid literals, zero Exchange)") {
    spark.sharedState.cacheManager.clearCache()
    val p = graft.llm.Similarity.ivfAssign(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"ivfAssign should be a map-only pass:\n$p")
    assert(!p.contains("Join"), s"ivfAssign should not join:\n$p")
  }

  test("contamination dedups only post-broadcast-join survivors") {
    val p = planOf("q_llm_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval grams should broadcast:\n$p")
    // The streamed (corpus) side prints between the join node and the
    // build side's BroadcastExchange: it must reach the broadcast
    // filter without a shuffle. Shuffles above the join (countDistinct
    // over survivors) and inside the build subtree (eval-set distinct)
    // both operate on tiny inputs, which is the point.
    val streamed = p.substring(p.indexOf("BroadcastHashJoin"),
      p.indexOf("BroadcastExchange"))
    assert(!streamed.contains("Exchange hashpartitioning"),
      s"corpus gram stream must not shuffle before the broadcast filter:\n$p")
  }

  test("dedup signatures plan is shuffle-free up to the explode") {
    val p = planOf("q_dedup_minhash")
    // per-doc array computation: a single scan, no Exchange before Generate
    assert(!p.contains("Exchange"), s"minhash signatures should be map-only:\n$p")
  }

  test("repetition filter is map-only; vocabulary reads only the text column") {
    val rep = planOf("q_llm_repetition")
    assert(!rep.contains("Exchange"), s"repetition must be a map-only pass:\n$rep")
    val vocab = planOf("q_llm_vocab")
    assert(vocab.contains("ReadSchema: struct<text:string>"),
      s"vocabulary should scan only the text column:\n$vocab")
    assert(vocab.contains("TakeOrderedAndProject"),
      s"vocabulary top-k must not globally sort:\n$vocab")
  }

  test("boilerplate spans: deterministic cut is a top-k, not a global sort") {
    val p = planOf("q_dedup_spans")
    assert(p.contains("TakeOrderedAndProject"),
      s"span cut should be top-k, not a full sort:\n$p")
  }

  test("label centroids: one shuffle, partial aggregation map-side") {
    val p = planOf("q_embed_centroids")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"fixed-point pooling should shuffle exactly once:\n$p")
    assert(!p.contains("rangepartitioning"), s"no global sort expected:\n$p")
  }

  test("epoch shuffle: hash-partitioned windows, never a global sort") {
    val p = planOf("q_llm_shuffle")
    assert(!p.contains("rangepartitioning"),
      s"the addressable shuffle must not globally sort:\n$p")
  }

  test("hybrid retrieval: corpus is staged once, channels reuse it") {
    val p = planOf("q_hybrid_topk")
    assert(p.contains("Scan ExistingRDD"),
      s"hybrid corpus should be staged (Materialize):\n$p")
    assert(!p.contains("Scan parquet"),
      s"post-staging plan must not rescan parquet:\n$p")
  }

  test("token pairs: only the one-row count is nested-loop; pair join is hash-based") {
    val p = planOf("q_llm_token_pairs")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      s"only the n_docs scalar may be a nested-loop broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      s"per-doc pair join must be an equi hash/merge join:\n$p")
  }

  test("ewma: one aggregation exchange, series window partitioned by type") {
    val p = planOf("q_events_ewma")
    assert(p.contains("Window"), s"expected a window operator:\n$p")
    // hourly agg shuffle (+ at most an AQE coalesce read) — the window
    // rides the same hash partitioning on event_type
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"ewma grew extra shuffles:\n$p")
  }

  test("pagerank edge derivation: one user_id exchange feeds the lead window") {
    spark.sharedState.cacheManager.clearCache()
    val df = Graph.clickEdges(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"expected lead() window:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"transition derivation should shuffle once on user_id:\n$p")
  }

  test("q7: nation prune pushed to the dim scans, dims broadcast before the fact shuffle") {
    val p = planOf("q7_volume_shipping")
    assert(p.contains("In(n_name, [NATION_1,NATION_2,NATION_3,NATION_4])"),
      s"nation name filter not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      s"shipdate range not pushed:\n$p")
    // the nation-pruned dims must hash-broadcast into each fact side;
    // the only wide joins are the pruned fact-fact join + final agg
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected both dims broadcast into both fact sides:\n$p")
  }

  test("q9: part-name contains-filter pushed to the part scan") {
    val p = planOf("q9_product_profit")
    assert(p.contains("StringContains(p_name,widget)"),
      s"p_name LIKE filter not pushed:\n$p")
  }

  test("q10: flags pushed, customer-key pre-aggregation, top-k via TakeOrdered") {
    val p = planOf("q10_returned_items")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"orderdate range not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "expected top-k operator")
    // revenue aggregates on o_custkey BEFORE the customer dim join:
    // the partial agg must key on o_custkey, not on customer columns
    assert("partial_sum".r.findFirstIn(p).isDefined
      && "keys=\\[o_custkey#\\d+L?\\]".r.findFirstIn(p).isDefined,
      s"expected pre-aggregation keyed on o_custkey before the dim decorate:\n$p")
  }

  test("q13: zero-order customers via one outer join over a pre-aggregated side") {
    val p = planOf("q13_order_distribution")
    assert(p.contains("LeftOuter"), s"expected a left outer join:\n$p")
    assert(p.contains("Not(EqualTo(o_orderpriority,5-LOW))"),
      s"priority exclusion not pushed:\n$p")
  }

  test("q19: disjunction residuals pushed per side, full OR inside the join") {
    val p = planOf("q19_disjunctive_or")
    // lineitem side keeps the quantity-range union (PushedFilters is
    // truncated in toString; the scan-level Filter carries it in full)
    assert("\\(l_quantity#\\d+ >= 1.0\\) AND \\(l_quantity#\\d+ <= 11.0\\)".r
        .findFirstIn(p).isDefined,
      s"quantity-range disjunction not pushed to the lineitem side:\n$p")
    // part side keeps the brand/size union
    assert("\\(p_brand#\\d+ = Brand#12\\) AND \\(p_size#\\d+ <= 5\\)".r
        .findFirstIn(p).isDefined,
      s"brand/size disjunction not pushed to the part side:\n$p")
    // and the cross-side conjuncts evaluate inside the broadcast join
    assert(p.contains("BroadcastHashJoin"), "expected a broadcast hash join")
  }

  test("q21: the triple-self-join rewrite scans lineitem exactly once, no Expand") {
    val p = planOf("q21_waiting_supplier")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"the aggregate rewrite must scan lineitem once (textbook scans 3x):\n$p")
    assert(p.contains("EqualTo(o_orderstatus,F)"), s"status filter not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "expected top-k operator")
    // the distinct counts are a two-level aggregation, NOT
    // countDistinct: two distinct aggregates would Expand every
    // joined fact row x3 ahead of the shuffle (1.8B rows at x1000)
    assert(!p.contains("Expand"),
      s"countDistinct Expand crept back into the fact aggregation:\n$p")
  }

  test("q22: dormancy is an anti join with the recency filter pushed to orders") {
    val p = planOf("q22_dormant_customers")
    assert(p.contains("LeftAnti"), s"expected a left anti join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,2000-08-01"),
      s"recency filter not pushed to the orders scan:\n$p")
  }

  test("q2: dim prunes pushed, one fact scan, correlated min is a window not a rescan") {
    val p = planOf("q2_min_cost_supplier")
    assert(p.contains("EqualTo(p_size,15)") && p.contains("EqualTo(p_type,STANDARD)"),
      s"part filters not pushed:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"the per-part minimum must come from a window, not a second supply scan:\n$p")
    assert(p.contains("Window"), s"expected the correlated-min window:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-100 should be TakeOrderedAndProject")
  }

  test("q11: per-part aggregate staged once; scalar gate does not rescan the fact") {
    val p = planOf("q11_important_parts")
    assert(p.contains("Scan ExistingRDD"),
      s"the per-part aggregate should be staged (Materialize):\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"the scalar total must come from the staged aggregate, not a fact rescan:\n$p")
  }

  test("q16: exclusion is an anti join below the distinct; part filters pushed") {
    val p = planOf("q16_part_supplier_cnt")
    assert(p.contains("LeftAnti"), s"expected a broadcast anti join:\n$p")
    assert(p.contains("Not(EqualTo(p_brand,Brand#45))"),
      s"brand exclusion not pushed:\n$p")
    // PushedFilters is truncated in toString; the scan-level Filter
    // node carries the IN-list in full
    assert("p_size#\\d+ IN \\(1,9,14,19,23,36,45,49\\)".r.findFirstIn(p).isDefined,
      s"size IN-list not pushed:\n$p")
  }

  test("q20: nested-IN collapses to one conditional-agg scan + semi join") {
    val p = planOf("q20_surging_supplier")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"year slice and total must be two sums over ONE scan (textbook scans twice):\n$p")
    assert(p.contains("LeftSemi"), s"supplier decorate should be a semi join:\n$p")
    assert(p.contains("StringStartsWith(p_name,red)"),
      s"part-name prefix filter not pushed:\n$p")
  }

  test("cms: typed-aggregator sketch plans partial+final; probe set is a top-k") {
    val p = planOf("q_llm_cms_counts")
    // the mergeable grid must cross the shuffle as partial summaries,
    // not as raw tokens
    assert(p.contains("ObjectHashAggregate"),
      s"typed Aggregator should plan ObjectHashAggregate:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 probe words should be a top-k, not a global sort:\n$p")
  }

  test("novelty: df-count and join-back both ride the shingle key, no all-pairs") {
    val p = planOf("q_dedup_novelty")
    assert("Exchange hashpartitioning\\(s#\\d+".r.findFirstIn(p).isDefined,
      s"expected the shingle-key shuffle:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"novelty must stay an equi-join pipeline:\n$p")
  }

  test("span family: the count pass is ONE hash exchange of (h, c) rows") {
    // The load-bearing 100-TB claim (BASELINE.md r13 span-family cut):
    // in-row run-length collapse (LongCounts) makes (h, doc) unique by
    // construction, so the count pass needs exactly one
    // hashpartitioning exchange — 16-byte (h, c) rows, no doc_id, no
    // second distinct-dedup aggregate level. The strip side is
    // map-only off a broadcast of the ≤k winning hashes, so the WHOLE
    // strip query carries that single data exchange (anything beyond
    // a single-partition fold of the ≤k top rows is a regression).
    val strip = planOf("q_dedup_strip_spans")
    val stripHash = "Exchange hashpartitioning".r.findAllIn(strip).size
    assert(stripHash == 1,
      s"strip: expected exactly one hash exchange (the count pass), got $stripHash:\n$strip")
    val stripScans = "(FileScan|Scan) parquet".r.findAllIn(strip).size
    assert(stripScans == 2, s"strip: corpus must scan twice (count, strip), got $stripScans:\n$strip")
    // spans uses topSpans TWICE statically (join left side + the
    // string-recovery broadcast set), so the static plan shows the
    // count exchange duplicated — the scale claim lives in AQE's
    // runtime stage cache, which materializes the canonical-equal
    // shuffle ONCE and rewrites the twin to ReusedExchange. Execute
    // at spec scale and assert that on the FINAL plan: exactly two
    // distinct hash exchanges materialize (count pass + the ≤k-group
    // string-recovery agg), and the duplicate is a ReusedExchange.
    spark.sharedState.cacheManager.clearCache()
    val spansDf = graft.SparkEntry.queries("q_dedup_spans")(spark, sf001)
    spansDf.collect()
    val spans = spansDf.queryExecution.executedPlan.toString
    assert(spans.contains("isFinalPlan=true"), s"expected an executed AQE plan:\n$spans")
    val finalSection = spans.split("== Initial Plan ==")(0)
    val distinctHash = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      .size
    assert(distinctHash == 2,
      s"spans: count pass + bounded string-recovery agg = exactly two materialized hash exchanges, got $distinctHash:\n$finalSection")
    assert(finalSection.contains("ReusedExchange"),
      s"spans: the duplicated count subtree must reuse the materialized stage, not re-shuffle the gram stream:\n$finalSection")
    assert(!spans.contains("count(distinct") && !strip.contains("count(distinct"),
      s"the count pass must not reintroduce a distinct-dedup aggregate level")
  }

  test("suite-wide smell sweep: no nested-loop joins, no cartesian products") {
    // A nested-loop join is scale-hostile when BOTH sides scale with
    // the data. Two queries carry a provably BOUNDED build side and
    // are exempt: q_ann_topk broadcasts the fixed NumQueries query
    // vectors against one corpus scan (the documented exact baseline,
    // O(n * queries)), and q_above_avg_balance broadcasts a single-row
    // global aggregate (O(n * 1)), as do q_llm_tfidf (the broadcast
    // one-row corpus count N), q_llm_commonness (the one-row token
    // total T), and q_llm_curriculum (the one-row quartile-threshold
    // array). Everything else must be free of
    // these operators — a failure means a refactor silently degraded
    // a join into O(n^2).
    val boundedBuildSide =
      Set("q_ann_topk", "q_ann_sq8_topk", "q_above_avg_balance",
        "q_ann_pq_topk", // broadcast NumQueries LUT rows vs corpus codes
        "q_ann_recall", // contains the exact O(n·queries) baseline branch
        "q_llm_tfidf", "q_llm_commonness", "q_llm_curriculum",
        "q_dedup_strip_spans", // one-row flagged-hash array broadcast
        "q_dedup_spans", // same one-row top-k hash-array broadcast
        // (r13 string recovery slices ws at flagged positions)
        "q_llm_token_pairs", // one-row corpus-count broadcast (lift)
        "q_search_bm25", // one-row (N, avgdl) corpus-stats broadcast
        "q_graph_triangles", // three one-row count aggregates crossed
        "q_llm_oov", // one-row top-20 vocabulary array broadcast
        "q_events_gapfill", // generated hour spine × ~5 event types:
        // O(hours × types) by construction, independent of data size
        "q_events_anomaly", // same gap-filled spine as q_events_gapfill
        "q_llm_perplexity", // one-row vocabulary-size broadcast (V)
        "q_llm_source_drift", // one-row corpus-token-total broadcast
        "q22_dormant_customers", // one-row avg-balance scalar broadcast
        "q11_important_parts", // one-row (total, n_parts) scalar broadcast
        "q_llm_heavy_hitters", // one-row corpus-total (n_total) broadcast
        "q_llm_cms_counts", // one-row sketch-grid broadcast
        "q_llm_bpe_merges", // one-row learned-merge broadcast per round
        "q_llm_bpe_segments", // same one-row merge broadcasts
        "q_llm_bpe_encode", // same, under the broadcast vocab join
        "q_llm_temperature_mix", // two one-row scalar broadcasts
        // (weight total, floor-sum) crossed into the O(#sources) frame
        "q_events_interpolate", // same generated spine × types cross
        // as q_events_gapfill: O(hours × types) by construction
        "q_llm_collocations", // one-row (n_tok, n_bi) totals broadcast
        "q_ann_hard_negatives", // broadcast NumQueries anchors vs
        // corpus scan with a label-inequality condition — the
        // q_ann_topk bounded-build-side shape
        "q_ann_mmr_topk", // the same bounded shape for the MMR pool
        // (broadcast NumQueries query vectors vs one corpus scan);
        // present since the query's introduction but previously
        // hidden from this sweep behind the pool's localCheckpoint —
        // the r16 grouped-greedy rewrite removed the checkpoint, so
        // the audited plan now shows the whole tree
        "q_events_rolling_active", // one-row max_day bounds broadcast
        "q_events_forecast_eval") // same generated spine × types
        // cross as q_events_gapfill/q_events_anomaly
    val offenders = (graft.SparkEntry.queries.keySet -- boundedBuildSide)
      .toSeq.sorted.flatMap { name =>
        val p = planOf(name)
        val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(p.contains)
        if (smells.isEmpty) None else Some(s"$name: ${smells.mkString(", ")}")
      }
    assert(offenders.isEmpty, s"scale-hostile operators found:\n${offenders.mkString("\n")}")
  }
}
