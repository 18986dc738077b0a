package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{count, lit}


/** Physical-plan assertions: the plans we designed for are the plans we
  * get (pushdown reaches the scans, dims broadcast, no accidental
  * cartesian products, codegen on the hot aggregates). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString

  /** Post-execution ADAPTIVE plan, final section only — exchange reuse
    * (the thing that makes the star/small bucket branches share one
    * signature computation) only materializes once stages run. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("q3: filters pushed to scans; broadcasts are AQE threshold-driven, not pinned") {
    val df = SparkEntry.queries("q3_top_orders")(spark, TestSpark.Sf)
    // no broadcast hints anywhere: customer and orders are scale-variant,
    // so a pinned broadcast would OOM at 100× (hints bypass AQE's size check)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Hint"),
      "scale-variant sides must not carry join hints:\n" +
        df.queryExecution.optimizedPlan.toString)
    val p = plan("q3_top_orders")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), p)
    assert(!p.contains("CartesianProduct"))
    // at test SF the sides sit under autoBroadcastJoinThreshold, so the
    // AQE-finalized plan still broadcasts — by size, degradable at scale
    assert(finalPlan("q3_top_orders").contains("BroadcastHashJoin"),
      "AQE should choose broadcast at this SF via the size threshold")
  }

  test("q5: only bounded dims hinted; scale-variant sides broadcast via AQE threshold") {
    val df = SparkEntry.queries("q5_region_revenue")(spark, TestSpark.Sf)
    val lp = df.queryExecution.analyzed.toString
    // exactly the two fixed-cardinality dims are hinted (nation, region)
    assert(lp.split("ResolvedHint \\(strategy=broadcast\\)", -1).length - 1 == 2,
      "expected broadcast hints on nation+region only:\n" + lp)
    val p = finalPlan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "at this SF every dim fits the AQE broadcast threshold:\n" + p)
  }

  test("q_order_latency: no pinned broadcast on fact-scale orders; scan pruned to 3 columns") {
    val df = SparkEntry.queries("q_order_latency")(spark, TestSpark.Sf)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Hint"),
      "orders is fact-scale: the join must be AQE-chosen, not hinted:\n" +
        df.queryExecution.optimizedPlan.toString)
    val p = plan("q_order_latency")
    // column pruning reaches the orders scan (3 of 9 columns)
    assert(p.contains("o_orderkey") && p.contains("o_orderpriority"), p)
    assert(!p.contains("o_custkey"), "orders scan must be pruned:\n" + p)
    assert(finalPlan("q_order_latency").contains("BroadcastHashJoin"),
      "AQE should still choose broadcast at this SF via the size threshold")
  }

  test("q1: partial aggregation before the exchange (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"), "map-side combine expected:\n" + p)
    assert(p.indexOf("partial_sum") > p.indexOf("Exchange hashpartitioning"),
      "partial agg must sit below the exchange")
  }

  test("d_token_stats: column pruning reaches the scan") {
    val p = plan("d_token_stats")
    // only the needed columns are read, not source/n_chars
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"), p)
  }

  test("knn brute: broadcast nested loop (by design), not cartesian") {
    val p = plan("e_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("knn pq: codebooks ride broadcasts, no cartesian, no scale-variant shuffle join") {
    val p = plan("e_knn_pq")
    assert(p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("ev_drift_windowed: reference distribution broadcast, window partitioned by window_start") {
    val p = plan("ev_drift_windowed")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "global reference counts must ride a broadcast:\n" +
        p.linesIterator.take(10).mkString("\n"))
    // per-window PSI total must partition by window_start — a global
    // (empty-partition) window would single-reduce the whole table
    val df = SparkEntry.queries("ev_drift_windowed")(spark, TestSpark.Sf)
    val globalWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, "unpartitioned window in drift plan")
  }

  test("d_word_freq: no unpartitioned running window over unbounded input") {
    // The global rank must go through Skew.globalRowNumber (range
    // partition + offset merge) — a bare Window.orderBy would sort the
    // whole distinct-token table in ONE partition at corpus scale.
    val df = SparkEntry.queries("d_word_freq")(spark, TestSpark.Sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found a window with an empty partitionSpec (single-partition sort)")
  }

  test("range band join: broadcast nested loop on the dim side, no cartesian") {
    val p = plan("q_range_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("neardup lsh: signature computed once, bucket-local pairs, no cartesian") {
    val p = finalPlan("e_neardup_lsh")
    assert(!p.contains("CartesianProduct"))
    // star + small-bucket branches must share ONE banded exchange — the
    // hyperplane signatures and the scan behind it execute once
    assert(p.contains("ReusedExchange"), "bucket branches must reuse the banded shuffle:\n" + p)
    assert(p.linesIterator.count(_.contains("FileScan parquet")) <= 3,
      "expected ≤3 scans (bands + two vector re-attach):\n" + p)
  }

  test("prefix-filter jaccard: bucket-generated candidates, no block self-join") {
    val p = finalPlan("dd_jaccard_block_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ReusedExchange"), "bucket branches must reuse the prefix-token shuffle:\n" + p)
    // candidates come from the (block, prefix-token) buckets, so the
    // only joins are the two shingle-set re-attachments
    assert(p.linesIterator.count(_.contains("FileScan parquet")) <= 3, p)
  }

  test("bucketed tables co-locate the join: no shuffle exchange on either side") {
    import spark.implicits._
    // default warehouse dir (spark-warehouse/, gitignored) — the
    // warehouse location is a static conf and can't move per-test
    val orders = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
    val lineitem = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    try {
      // AQE off for the assertion: it rewraps the plan and hides the
      // (absent) exchanges; the point is the static plan needs none.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      val joinSection = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle either side:\n" + p)
      assert(joined.count() ==
        lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderstatus").count().count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("incremental components: label state restricted via broadcasts, never shuffled wide") {
    import spark.implicits._
    // corpus-scale base labels; a tiny batch of new edges
    val base = (1L to 5000L).map(i => (i, i - (i % 5))).toDF("id", "component")
    val newEdges = Seq((3L, 7L), (4001L, 9001L)).toDF("src", "dst")
    val merged = graft.ops.ConnectedComponents.incremental(base, newEdges)
    val p = merged.queryExecution.executedPlan.toString
    // the semi/anti restriction of the label state must ride broadcasts
    // of the batch-proportional affected-components frame — a sort-merge
    // join here would shuffle the whole corpus labelling per increment
    assert(p.contains("BroadcastHashJoin") &&
      (p.contains("LeftAnti") || p.contains("left_anti")),
      "affected-component restriction must be a broadcast anti join:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "label state must never shuffle wide in an increment:\n" + p)
    // and the merge is still exactly right
    val got = merged.as[(Long, Long)].collect().toMap
    assert(got(7L) == 0L && got(3L) == 0L && got(9001L) == 4000L)
    assert(got(4999L) == 4995L) // untouched component label preserved
  }

  test("incremental dedup: corpus restricted by semi-join before the cap, no cartesian") {
    val p = plan("dd_minhash_incremental")
    // The corpus band table must be cut down to batch-touched buckets
    // (LeftSemi) before any window/cap/join work — this is the clause
    // that keeps per-run cost proportional to the batch at 100 TB.
    assert(p.contains("LeftSemi"), "corpus side must be semi-join restricted:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dup spans: single gram exchange (no count-distinct pre-shuffle), no cartesian") {
    val p = plan("dd_dup_spans")
    // minDocs=2 rides min!=max, so no Exchange may partition on
    // (gram, doc) — that pattern is the two-phase distinct the op
    // deliberately avoids.
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(_gh") && l.contains("doc_id")),
      "count-distinct (gram, doc) pre-shuffle crept back in:\n" + p)
    assert(!p.contains("count(distinct"), p)
    assert(!p.contains("CartesianProduct"), p)
    // island merge must stay partitioned per doc, never one global sort
    assert(p.contains("windowspecdefinition(doc_id"), p)
  }

  test("profile columns: ONE scan feeds the multi-distinct (single-pass claim)") {
    val p = plan("d_profile_columns")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      "profiler must read the table exactly once:\n" + p)
    assert(p.contains("Expand"), "multi-distinct should plan via Expand:\n" + p)
  }

  test("quality classifier: pure map stage — only the presentation sort exchanges") {
    val p = plan("d_quality_classifier")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      "feature extraction and the decimal dot product must not shuffle:\n" + p)
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      "all features must come off ONE corpus scan:\n" + p)
  }

  test("dsir: scalar totals broadcast; model join is keyed, no cartesian") {
    val p = plan("d_dsir_weights")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 3-scalar totals row must broadcast:\n" + p)
  }

  test("chunk windows: shuffle-free generate-and-explode (only the final sort exchanges)") {
    val p = plan("d_chunk_windows")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      "no hash exchange may appear before the presentation sort:\n" + p)
  }

  test("length outliers: corpus scan never shuffles; thresholds broadcast") {
    val p = plan("d_length_outliers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "two-row threshold aggregate must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("market basket: brand counts broadcast onto pairs; no cartesian; " +
      "basket frame built once (checkpoint) for the self-join") {
    val p = plan("q_market_basket")
    // the brand-count and n_orders frames are |brands|- and 1-row sized:
    // they must ride broadcasts, never shuffle the 300-row pair frame wide
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "bounded count frames must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the self-join input is the checkpointed basket build — the plan
    // scans the RDD twice, it never recomputes the lineitem⋈part join
    assert(!p.contains("p_partkey"),
      "basket build must be materialized once, not re-derived per side:\n" + p)
  }

  test("shard packing: offsets broadcast, no sort-merge join, no global window") {
    val p = plan("d_shard_packing")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the (partition, key) offset table must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "offset merge must not shuffle the data side:\n" + p)
    // the running-sum window must partition by (_pid, lang) — never a
    // bare per-lang window (the single-reducer shape prefixSumByKey
    // exists to avoid)
    assert(p.contains("windowspecdefinition(_pid"),
      "window must include the partition id in its keys:\n" + p)
  }

  test("minhash pairs: no self-join recompute of signatures") {
    val p = finalPlan("dd_minhash_pairs")
    val sigOccurrences = "graft_minhash_signature".r.findAllIn(p).size
    assert(sigOccurrences <= 1,
      s"signature computed in $sigOccurrences plan branches — self-join recompute?\n$p")
    assert(p.contains("ReusedExchange"),
      "star/small bucket branches must reuse the banded shuffle:\n" + p)
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 0,
      "shingle sets are checkpointed once — the final plan must read " +
        "the materialized blocks, not re-scan parquet:\n" + p)
  }

  test("bm25: ONE explode builds tf; lens/df derive without re-scanning tokens") {
    val p = finalPlan("d_bm25_topk")
    assert(p.linesIterator.count(_.contains("Generate explode")) <= 1,
      "tf is the only token explode — dl and df must derive from it:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "query-term and corpus-stats joins must broadcast:\n" + p)
  }

  test("bm25 indexed: query plan reads only index tables — no corpus scan, no tokenize") {
    val p = plan("d_bm25_indexed")
    assert(!p.contains("documents.parquet"),
      "query-time plan must not rescan the corpus:\n" + p)
    assert(p.linesIterator.count(_.contains("Generate explode")) == 0,
      "no tokenization at query time — the index already holds tf:\n" + p)
  }

  test("bigram lm: one explode for the model table, context counts derived") {
    val p = plan("d_bigram_lm")
    // two explodes total: bigrams (model+scoring share the checkpointed
    // table) and the vocab-count unigram pass — never one per consumer
    assert(p.linesIterator.count(_.contains("Generate explode")) <= 2,
      "bigram table must be built once and reused:\n" + p)
    assert(!p.contains("CartesianProduct"), "V must ride a broadcast:\n" + p)
  }

  test("hash split: split assignment is per-row scalar work, no pre-agg shuffle") {
    val p = plan("d_hash_split")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    // one shuffle for the (lang, split) summary agg + the final sort —
    // assigning splits itself must not shuffle
    assert(exchanges <= 3,
      s"expected only the summary agg + sort exchanges, got $exchanges:\n" + p)
    assert(p.contains("partial"), "summary agg must map-side combine:\n" + p)
  }

  test("cohort retention: first-seen table broadcasts back; offsets never window") {
    val p = finalPlan("ev_cohort_retention")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "cohort sizes (days-scale dim) must ride a broadcast:\n" + p)
    assert(!p.contains("Window"),
      "per-user first-seen is a hash agg, not a global window:\n" + p)
  }

  test("neardup clusters: label-blocked pair join, no cartesian") {
    val p = plan("e_neardup_clusters")
    assert(!p.contains("CartesianProduct"),
      "pair generation must join on the label block key:\n" + p)
  }

  test("graph edge build: LSH-bucketed candidates, no label-quadratic join") {
    // PageRank/triangle checkpoint their edges, which truncates lineage —
    // assert on the shared builder they both call (lshLabelEdges).
    val emb = Tables.load(spark, TestSpark.Sf, "embeddings")
    val df = graft.queries.Similarity.lshLabelEdges(emb, threshold = 0.35)
    val opt = df.queryExecution.optimizedPlan
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val cond = j.condition.map(_.toString).getOrElse("")
      // every join must carry an id equi-key; a condition whose only
      // equality is `label` would be the uncapped block-quadratic
      assert(cond.contains("id_a") || cond.contains("id_b") ||
          cond.contains("vec_id") || cond.contains("_id"),
        s"join must key on ids, label is verify-only:\n$cond")
    }
    // candidates flow through the capped+observed Buckets scaffold
    val s = opt.toString
    assert(s.contains("graft_buckets"),
      "edge candidates must ride Buckets.pairs' observed cap:\n" + s)
    // the un-executed observation is discarded by the registration
    // queue's own bound (Buckets.MaxPendingObservations)
  }

  test("q_bucketed_join: co-located SMJ — no exchange below the join") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, TestSpark.Sf)
    df.collect()
    // AQE wraps finished stages in QueryStageExec nodes whose wrapped
    // plan is NOT a child — flatten through them or collect sees nothing
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case _ => Nil
      }
      p +: (p.children ++ inner).flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val smjs = all.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smjs.size == 1,
      "the bucketed join must plan as one sort-merge join:\n" + all.head)
    // identical 8-bucket layout on the join key on both sides: the join
    // reads buckets zip-wise — an exchange here means the layout was not
    // honored and the per-join shuffle is back. (A partition-LOCAL sort
    // remains: Spark only consumes bucket sortBy order via the legacy
    // outputOrdering flag; sorting an already-sorted bucket is a cheap
    // streaming pass, the shuffle was the scale cost.)
    val below = flatten(smjs.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(below.isEmpty,
      "bucketed SMJ subtree must be exchange-free:\n" + smjs.head)
    assert(all.head.toString.contains("Bucketed: true"),
      "both scans must read the bucketed layout:\n" + all.head)
  }

  test("KS drift: both ECDFs ride one _pid-keyed window, no per-type reducer") {
    val p = plan("ev_ks_drift")
    // the cumulative window must carry the physical partition id —
    // a bare per-event_type windowspec is the single-reducer shape
    // prefixSumsByKey exists to avoid
    assert(p.contains("windowspecdefinition(_pid"),
      "ECDF window must include the partition id in its keys:\n" + p)
    val bare = p.linesIterator.exists(l =>
      l.contains("windowspecdefinition(event_type#") && !l.contains("_pid"))
    assert(!bare, "no bare per-type window allowed:\n" + p)
    // one window computes BOTH running counts — not one pass per ECDF
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      "both cumulative counts must share one Window operator:\n" + p)
  }

  test("scd2 history: ONE custkey exchange feeds both version windows") {
    val p = plan("q_scd2_history")
    val n = p.linesIterator
      .count(_.contains("Exchange hashpartitioning(o_custkey"))
    assert(n == 1,
      s"change-detect and validity windows must share one shuffle, saw $n:\n$p")
  }

  test("nearest as-of: both direction frames share one WindowExec, no join") {
    val p = plan("ev_asof_nearest")
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      "backward and forward candidates must ride one window operator:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the single-pass form must not join event kinds:\n" + p)
  }

  test("pca: one-pass moments + literal-array projection, join-free plans") {
    // pcaBase runs the PcaMoments outer-product aggregator (one scan,
    // dim²-integer partials) and the returned projection is a per-row
    // map against literal mean/component arrays — a regression back to
    // the exploded vec_id self-join would surface as a Join here.
    for (q <- Seq("e_pca_projection", "e_pca_2d")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q projection must be join-free:\n$p")
      assert(!p.contains("Generate"),
        s"$q must not explode the embedding column:\n$p")
    }
  }

  test("SNM pairs: neighbor join is equi on the rank, never quadratic") {
    val p = plan("dd_snm_pairs")
    assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
      "successor pairing must be an equi-join on rn:\n" + p)
    assert(p.contains("windowspecdefinition(_pid"),
      "global rank must be the two-phase _pid-keyed form:\n" + p)
  }

  test("attribution: one sorted window, equi band join, one stack pass") {
    val p = plan("ev_attribution")
    // first-rank, reverse-rank (derived as nr-rf+1) and both counts
    // must ride ONE WindowExec — a second sort order would double the
    // per-purchase sort cost for an identity the algebra supplies
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      "rf/nr/n must share one window operator:\n" + p)
    // touch→purchase banding is an equi-join on user_id with the 7-day
    // band as a post-condition — never a nested-loop over users
    assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
      "lookback join must stay keyed on user_id:\n" + p)
    // the three models unpivot via ONE stack Generate — not a 3-way
    // union that re-executes the join per model
    assert(p.linesIterator.count(_.contains("Generate stack")) == 1,
      "models must fan out through a single stack pass:\n" + p)
    assert(!p.contains("Union"),
      "no union re-scan of the joined touches:\n" + p)
  }

  test("rfm: quintile ranks are two-phase _pid-keyed, never global sorts") {
    val df = SparkEntry.queries("ev_rfm")(spark, TestSpark.Sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "all three metric ranks must ride Skew.globalRowNumber " +
        "(empty partitionSpec = single-reducer sort of the user frame)")
  }

  test("top-k reports: distributed TakeOrderedAndProject, zero unpartitioned windows") {
    // the four former single-reducer global ranks (collocations ranks
    // the corpus-scale bigram table!) must ride orderBy+limit and the
    // bounded collect+sort+posexplode rank, never Window.orderBy
    for (q <- Seq("d_bpe_pair_counts", "d_collocations",
        "d_weighted_sample", "d_token_budget_allocation")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.Sf)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$q ranks through an unpartitioned window (single-reducer sort)")
    }
    assert(plan("d_collocations").contains("TakeOrderedAndProject"),
      "bigram top-k must be per-partition top-k + driver merge")
  }

  test("expectations: key-side dims broadcast, fact FK join keyed, no nested loops") {
    val p = plan("q_expectations")
    // customer/nation key sets broadcast under the dims-are-small rule;
    // the lineitem→orders FK audit must stay a keyed join — a nested
    // loop over either fact table is the shape that dies at 100 TB
    assert(p.contains("BroadcastHashJoin"),
      "dim key sets must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
      "all referential checks must be equi-joins:\n" + p)
  }

  test("entry/exit: one session window then hash aggs — no second window cascade") {
    val p = plan("ev_entry_exit")
    // the lag+running-sum session cut shares one user-keyed sort; the
    // per-session entry/exit must be min_by/max_by aggs, NOT another
    // (user, session)-partitioned window pass
    val exchanges = p.linesIterator
      .count(_.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"session cut must be the only user-keyed shuffle, saw $exchanges:\n$p")
    assert(p.contains("min_by") && p.contains("max_by"),
      "entry/exit must come from the struct-ordered agg:\n" + p)
  }

  test("zorderBy: bit interleave exact, layout rides a range exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // interleave vectors: x=3 (011), y=5 (101) at 3 bits →
    // pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0, pos4=x2=0, pos5=y2=1
    // = 1+2+4+32 = 39; zero stays zero; max 3-bit pair = 63
    val v = Seq((3L, 5L), (0L, 0L), (7L, 7L)).toDF("x", "y")
      .select(graft.ops.Layout.zOrder2($"x", $"y", bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(v == Seq(39L, 0L, 63L), s"interleave vectors: $v")
    // the write-side layout step is a RANGE exchange over the z key —
    // executor-sampled bounds, no driver histogram, no hash collision
    // of the near-unique keys into one partition
    val df = graft.queries.Events.load(spark, TestSpark.Sf)
      .select(($"user_id" % 1024).as("x"),
        expr("(ts div 3600000000000) % 1024").as("y"))
    val z = graft.ops.Layout.zorderBy(df, $"x", $"y", partitions = 8,
      bits = 10)
    val p = z.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning(_graft_zkey"),
      "layout must be a range exchange over the z key:\n" + p)
    // locality the layout buys: within every output partition the
    // z-sorted rows keep BOTH dimensions narrow — check via the
    // bucketed min/max (each 16k-key bucket spans <= 128 in x and y)
    val stats = z.withColumn("bucket", expr("_graft_zkey div 16384"))
      .groupBy($"bucket")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(max($"sx").as("mx"), max($"sy").as("my"))
      .collect()(0)
    assert(stats.getLong(0) <= 127 && stats.getLong(1) <= 127,
      s"z buckets must bound both dims: $stats")
  }

  test("zorder WRITE: per-file spread tight on both dims vs one-column sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // end-to-end: actually write parquet and measure what the file
    // boundaries (= what min/max footer stats describe) look like
    val df = graft.queries.Events.load(spark, TestSpark.Sf)
      .select(($"user_id" % 1024).as("x"),
        expr("(ts div 3600000000000) % 1024").as("y"))
    def spreads(dir: String): Seq[(Long, Long)] = {
      val parts = new java.io.File(dir).listFiles
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
      parts.toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg((max($"x") - min($"x")).as("sx"),
            (max($"y") - min($"y")).as("sy")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
    }
    val zDir = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    graft.ops.Layout.zorderBy(df, $"x", $"y", partitions = 8, bits = 10)
      .drop("_graft_zkey").write.mode("overwrite").parquet(zDir)
    val sDir = java.nio.file.Files
      .createTempDirectory("graft-xsort").toString
    df.repartitionByRange(8, $"x").write.mode("overwrite").parquet(sDir)
    val zs = spreads(zDir)
    val ss = spreads(sDir)
    assert(zs.size >= 4 && ss.size >= 4)
    // a contiguous range of the 2^20 z space 1/8 wide can span at most
    // two 512-aligned curve blocks per dimension
    assert(zs.forall { case (sx, sy) => sx <= 640 && sy <= 640 },
      s"z files must bound BOTH dims: $zs")
    // the x-sorted layout's y stats are useless: files span (nearly)
    // the full y range, so a y predicate prunes nothing
    assert(ss.map(_._2).max >= 700, s"x-sort control lost y: $ss")
    assert(zs.map(s => math.max(s._1, s._2)).max.toDouble <
      ss.map(_._2).max.toDouble,
      "z layout must beat the single-column sort on the worst dimension")
  }
}
