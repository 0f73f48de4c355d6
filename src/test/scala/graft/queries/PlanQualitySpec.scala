package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Executable form of the scale claims: the plans the engine promises are
  * the plans Catalyst actually produces on the driver's tables.
  */
class PlanQualitySpec extends AnyFlatSpec with Matchers with SparkTestBase
  with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  behavior of "physical plans"

  it should "broadcast every dimension join in q5_nation_revenue" in {
    val plan = planOf("q5_nation_revenue").queryExecution.executedPlan
    collect(plan) { case j: BroadcastHashJoinExec => j } should have size 3
  }

  it should "push the shipdate filter into q1's parquet scan" in {
    val scans = planOf("q1_pricing_summary").queryExecution.executedPlan
      .collectLeaves().map(_.toString).filter(_.contains("Scan parquet"))
    scans should not be empty
    all(scans) should include("PushedFilters")
    exactly(1, scans) should include("LessThanOrEqual(l_shipdate")
  }

  it should "prune q1's scan to the referenced columns only" in {
    val scan = planOf("q1_pricing_summary").queryExecution.executedPlan
      .collectLeaves().map(_.toString).find(_.contains("Scan parquet")).get
    // 7 referenced columns, not all 11
    scan should include("l_returnflag")
    (scan should not).include("l_partkey")
    (scan should not).include("l_suppkey")
  }

  it should "partial-aggregate (map-side) before the shuffle in q1" in {
    val plan = planOf("q1_pricing_summary").queryExecution.executedPlan
    val aggs = collect(plan) { case a: HashAggregateExec => a }
    aggs.size should be >= 2 // partial + final
    val exchanges = collect(plan) { case e: ShuffleExchangeLike => e }
    exchanges should not be empty
  }

  it should "plan the as-of join as one shuffle + window, no join node" in {
    val plan = planOf("q_asof_join").queryExecution.executedPlan
    (plan.toString should not).include("Join")
    collect(plan) { case e: ShuffleExchangeLike => e }.size should be <= 3
  }

  it should "plan the range join as an equi-join, never a cross product" in {
    val plan = planOf("q_range_join").queryExecution.executedPlan
    val str = plan.toString
    (str should not).include("CartesianProduct")
    (str should not).include("BroadcastNestedLoopJoin")
    // the band AND the key are both join keys of the single binary join
    val joinLine = str.linesIterator
      .find(l => l.contains("Join") && l.contains("band")).getOrElse("")
    joinLine should include("band")
    joinLine should (include("bu") or include("vu"))
  }

  it should "prune partitions in q_partitioned_scan's read" in {
    // With Pin disabled the gate's read plan stays visible; the lang='de'
    // predicate must be a PARTITION filter on the partitioned copy (one
    // directory listed), not a post-scan row filter over every partition.
    graft.ops.Pin.disabled = true
    try {
      val plan = planOf("q_partitioned_scan").queryExecution.executedPlan
      val scan = collect(plan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      scan.partitionFilters.map(_.toString)
        .exists(_.contains("lang")) shouldBe true
      // the data filters must NOT re-check lang row-by-row
      scan.dataFilters.map(_.toString)
        .exists(_.contains("lang")) shouldBe false
    } finally { graft.ops.Pin.disabled = false }
  }

  it should "keep the tfidf corpus-count join broadcast" in {
    val plan = planOf("q_tfidf_topterms").queryExecution.executedPlan
    collect(plan) {
      case j: BroadcastHashJoinExec => j
      case n: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => n
    } should not be empty
  }

  it should "never plan a cartesian product, and bound every " +
    "nested-loop join's build side, across the join-heavy gate queries" in {
    // The quadratic-self-join tripwire (VERDICT r3: the old
    // q_emb_cosine_neardup gate died at 100x data). Pin.disabled keeps
    // operators' eager localCheckpoints from truncating the plan to an
    // RDD leaf, so the assertions see every join. A
    // BroadcastNestedLoopJoin is acceptable ONLY when its broadcast side
    // is explicitly bounded (a Limit — the md5 audit sample / top-k
    // training sample — or a Filter such as `vec_id < 5` query rows);
    // an unbounded corpus x corpus nested loop fails here.
    val joinHeavy = Seq(
      "q_emb_knn", "q_emb_mmr", "q_emb_cosine_neardup", "q_emb_ivf_ann",
      "q_emb_pq_ann", "q_emb_ivfpq_ann", "q_emb_lsh_ann",
      "q_semantic_dedup",
      "q_ngram_jaccard", "q_minhash_neardup", "q_banded_minhash",
      "q_simhash_buckets", "q_fingerprint", "q_decontaminate",
      "q_image_dedup",
      "q_asof_join", "q_range_join", "q_salted_join", "q_semi_join",
      "q_anti_join", "q_full_outer", "q3_top_orders", "q5_nation_revenue",
      "q_token_pmi", "q_vocab_encode", "q_quality_buckets",
      "q_mixture_temp", "q_dsir_weights", "q_emb_silhouette",
      "q_small_qty_revenue", "q_curation_funnel", "q_mad_outliers",
      "q_event_transitions", "q_retention_cohorts", "q_emb_label_drift",
      "q_gap_fill", "q_rolling_hourly",
      "q_graph_rank", "q_graph_degree", "q_graph_triangles",
      "q_snapshot_diff",
      "q_upsert_merge", "q_recency_score", "q_interval_overlap",
      "q_scd2_history", "q_kcore", "q_bfs_reach", "q_seasonal_anomaly",
      "q_bigram_lm", "q_incr_agg", "q_fk_audit", "q_phrase_search",
      "q_winsorize", "q_skew_report", "q_audience_overlap",
      "q_path_mining", "q_debounce", "q_ngram_novelty", "q_cusum_drift",
      "q_autocorr_24h", "q_join_cardinality", "q_ab_metric",
      "q_chi2_cohort", "q_funnel_integrity",
      "q_attribution", "q_cume_distinct_users", "q_ltv_deciles",
      "q_js_divergence", "q_containment_dedup", "q_time_weighted_avg",
      "q_feature_hashing", "q_target_encoding", "q_graph_components",
      "q_percent_rank", "q_emb_pca_power", "q_emb_pca_project",
      "q_time_travel", "q_vocab_oov")
    graft.ops.Pin.disabled = true
    try {
      joinHeavy.foreach { name =>
        val plan = planOf(name).queryExecution.executedPlan
        withClue(s"$name: ") {
          collect(plan) {
            case c: org.apache.spark.sql.execution.joins
              .CartesianProductExec => c
          } shouldBe empty
          val nlJoins = collect(plan) {
            case j: org.apache.spark.sql.execution.joins
              .BroadcastNestedLoopJoinExec => j
          }
          nlJoins.foreach { j =>
            val build = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
                j.left
              case _ => j.right
            }
            val bounded = build.collect {
              case l: org.apache.spark.sql.execution.GlobalLimitExec => l
              case l: org.apache.spark.sql.execution.LocalLimitExec => l
              case l: org.apache.spark.sql.execution
                .TakeOrderedAndProjectExec => l
              case f: org.apache.spark.sql.execution.FilterExec => f
              // a grouping-free (scalar) aggregate is exactly one row —
              // the n_tok / n_pair / tot_w broadcast totals
              case a: HashAggregateExec if a.groupingExpressions.isEmpty =>
                a
            }
            withClue(s"unbounded nested-loop build side:\n$build\n") {
              bounded should not be empty
            }
          }
          // An unpartitioned WindowExec sorts its whole input on ONE
          // task (VERDICT r6 #1) — acceptable only above an explicit
          // bound (a Limit / TakeOrdered, the q_zipf_fit top-R shape).
          collect(plan) {
            case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          }.foreach { w =>
            val boundedW = w.child.collect {
              case l: org.apache.spark.sql.execution.GlobalLimitExec => l
              case l: org.apache.spark.sql.execution.LocalLimitExec => l
              case l: org.apache.spark.sql.execution
                .TakeOrderedAndProjectExec => l
            }
            withClue(s"unpartitioned window over unbounded input:\n$w\n") {
              boundedW should not be empty
            }
          }
        }
      }
    } finally { graft.ops.Pin.disabled = false }
  }

  it should "never force-broadcast an unbounded-cardinality side " +
    "anywhere in the registry" in {
    // VERDICT r7 #6: q_vocab_encode force-broadcast the full vocabulary —
    // fine at sf0.1, >1 GB at 10^8 tokens. The rule, applied to every
    // registry gate's ANALYZED plan (ResolvedHint survives analysis; the
    // optimizer folds it into the join): a broadcast-hinted subtree must
    // be bounded, meaning one of
    //   - it scans no SCALING base table (region/nation are constant;
    //     customer/supplier/part/orders/lineitem/documents/embeddings/
    //     events grow with SF),
    //   - it contains a Limit, or
    //   - it contains an Aggregate whose grouping keys are NOT
    //     vocabulary-like (tok/term/token/ngram/shingle: the one grouping
    //     family whose cardinality grows with corpus size faster than any
    //     enum-ish dimension).
    // Unhinted joins are AQE's call at runtime and are exempt by design.
    import org.apache.spark.sql.catalyst.plans.logical._
    val scaling = Seq("customer", "supplier", "part", "orders", "lineitem",
      "documents", "embeddings", "events").map(t => s"/$t.parquet")
    val vocabLike = Set("tok", "term", "token", "ngram", "shingle",
      "tok_a", "tok_b", "word")
    val excluded = (n: String) => n.startsWith("q_stream") ||
      Seq("q_jsonl_roundtrip", "q_partitioned_scan", "q_csv_roundtrip",
        "q_zorder_stats", "q_bucketed_join", "q_train_shards").contains(n)
    graft.ops.Pin.disabled = true
    try {
      graft.SparkEntry.queries.keys.filterNot(excluded).toSeq.sorted
        .foreach { name =>
          val analyzed = planOf(name).queryExecution.analyzed
          val hinted = analyzed.collect {
            case h: ResolvedHint if h.hints.strategy.isDefined => h.child
          }
          hinted.foreach { sub =>
            val scansScaling = sub.collectLeaves().exists { leaf =>
              val s = leaf.toString
              scaling.exists(s.contains)
            }
            if (scansScaling) {
              val limited = sub.collectFirst {
                case l: GlobalLimit => l
                case l: LocalLimit => l
              }.isDefined
              val boundedAgg = sub.collectFirst {
                case a: Aggregate if a.groupingExpressions.forall(g =>
                  !g.references.exists(r =>
                    vocabLike.contains(r.name.toLowerCase))) => a
              }.isDefined
              withClue(s"$name: broadcast hint over a scaling-table " +
                s"subtree with no bounding Limit/Aggregate:\n$sub\n") {
                (limited || boundedAgg) shouldBe true
              }
            }
          }
        }
    } finally { graft.ops.Pin.disabled = false }
  }

  it should "rank the vocabulary without any window at all" in {
    // VERDICT r6 #1: q_vocab_encode used to rank the full vocabulary
    // through Window.orderBy with NO partition key — one executor sorts
    // every distinct token (10^7–10^8 on a web corpus). The rank now
    // runs through ops/RowIndex's distributed zipWithIndex, so the plan
    // must contain no WindowExec whatsoever; reintroducing any window
    // (partitioned or not) into this gate trips here.
    val plan = planOf("q_vocab_encode").queryExecution.executedPlan
    collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    } shouldBe empty
  }

  it should "compute Theil-Sen medians without any unpartitioned " +
    "window over the pair multiset" in {
    // VERDICT r9 #2: q_theil_sen used to rank ~3M day-pair slopes
    // through TWO Window.orderBy globals — the biggest single-task sort
    // in the registry (calendar-bounded, but one task). Both medians now
    // run through PrefixSum's two-phase machinery, so the only windows
    // allowed in the gate's plan are PrefixSum's own: the range-bucket
    // pass (partitioned by __pid — each task sorts only its slice) and
    // the ≤P-row offsets pass (unpartitioned but explicitly
    // limit-bounded). Any other window — in particular a global rank
    // over the slope or residual multiset — trips here.
    val plan = planOf("q_theil_sen").queryExecution.executedPlan
    collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val boundedW = w.child.collect {
          case l: org.apache.spark.sql.execution.GlobalLimitExec => l
          case l: org.apache.spark.sql.execution.LocalLimitExec => l
        }
        withClue(s"unpartitioned window over unbounded input:\n$w\n") {
          boundedW should not be empty
        }
      } else {
        withClue(s"partitioned window outside PrefixSum's range-bucket " +
          s"pass:\n$w\n") {
          w.partitionSpec.map(_.toString)
            .exists(_.contains("__pid")) shouldBe true
        }
      }
    }
  }

  it should "feed ANALYZE TABLE statistics into the optimizer's cost " +
    "model" in {
    // The CBO half of the scale story: accurate row counts (not file
    // sizes) drive join reorder and broadcast decisions on a real
    // warehouse. ANALYZE ... FOR ALL COLUMNS must surface as the
    // optimized plan's exact rowCount under CBO.
    val s = spark
    s.conf.set("spark.sql.cbo.enabled", "true")
    try {
      s.read.parquet(s"$dir/customer.parquet").write
        .mode("overwrite").saveAsTable("g_cbo_customer")
      s.sql("ANALYZE TABLE g_cbo_customer COMPUTE STATISTICS " +
        "FOR ALL COLUMNS")
      val expected = s.table("g_cbo_customer").count()
      val stats = s.table("g_cbo_customer")
        .queryExecution.optimizedPlan.stats
      stats.rowCount should not be empty
      stats.rowCount.get.toLong shouldBe expected
    } finally {
      s.sql("DROP TABLE IF EXISTS g_cbo_customer")
      s.conf.unset("spark.sql.cbo.enabled")
    }
  }

  it should "honor explicit join strategy hints on the engine's tables" in {
    // At 100 TB the optimizer's stats-driven choice is sometimes wrong
    // (stale stats, skewed runtime cardinality) — the operator escape
    // hatch is the strategy hint, and it must actually bind: MERGE →
    // SortMergeJoin, SHUFFLE_HASH → ShuffledHashJoin, BROADCAST →
    // BroadcastHashJoin, each on the same orders⋈customer shape.
    val s = spark
    val o = s.read.parquet(s"$dir/orders.parquet")
    val c = s.read.parquet(s"$dir/customer.parquet")
    def joined(h: String) =
      o.join(c.hint(h),
        o("o_custkey") === c("c_custkey")).queryExecution.executedPlan
    collect(joined("merge")) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    } should not be empty
    collect(joined("shuffle_hash")) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    } should not be empty
    collect(joined("broadcast")) {
      case j: BroadcastHashJoinExec => j
    } should not be empty
  }

  it should "split a skewed sort-merge join partition through AQE's " +
    "skew-join handling" in {
    // VERDICT r9 #6: ops/SkewJoin salts MANUALLY (q_salted_join gates
    // it); this proves the engine's join shapes also light up Spark's
    // own OptimizeSkewedJoin when a deployment relies on AQE instead —
    // a deliberately 95%-one-key join must come back with
    // isSkewJoin=true on the final adaptive plan. Thresholds are
    // lowered because local-test shuffle partitions are KB-scale, far
    // below the production 256 MB skew threshold (the same
    // scale-down rationale as the bloom-filter spec below).
    val s = spark
    import org.apache.spark.sql.functions.{col, lit, when}
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // 95% of left rows share key 0; v is hash-mixed so shuffle-block
      // compression can't shrink the skewed partition below threshold
      val left = s.range(0, 150000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 97)
          .as("k"),
        (col("id") * lit(2654435761L)).as("v"))
      val right = s.range(0, 200).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataset's own QueryExecution (count()/write would
      // plan a separate query, leaving joined's adaptive plan unexecuted
      // at its initial, un-reoptimized state)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val skewJoins = collect(finalPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.isSkewJoin => j
      }
      withClue(s"no skew-optimized join in final plan:\n$finalPlan\n") {
        skewJoins should not be empty
      }
    } finally olds.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  it should "inject a runtime bloom filter on the fact side of a " +
    "filtered fact-dim join when enabled" in {
    // Semi-join reduction at 100 TB: when one join side carries a
    // selective filter, Spark 3.3+/4.x can build a bloom filter of its
    // join keys and push it into the OTHER side's scan, cutting shuffled
    // fact rows before the join. Off by default in this session's gates
    // (deterministic plans for the oracle contract), this spec proves
    // the engine's tables + join shapes light it up when a deployment
    // enables it — the application-side size threshold is lowered
    // because the test tables are far below the production 10 GB gate.
    val s = spark
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold" -> "1b",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "100MB",
      // the rule only fires for probable SHUFFLE joins (a broadcast join
      // needs no reduction) — force the shuffle path on the test-scale
      // tables, exactly the shape the big-cluster fact⋈fact join has
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_totalprice") >
          400000.0)
      val l = s.read.parquet(s"$dir/lineitem.parquet")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = j.queryExecution.optimizedPlan.toString
      optimized.toLowerCase should include("bloom")
      j.collect() // and the filtered plan still executes
      ()
    } finally olds.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  it should "run lang-ID and fingerprint as native expressions, not " +
    "ScalaUDFs" in {
    // VERDICT r4 #7: the per-row ScalaUDF converter/closure tax on the
    // document hot path. graftfns.LangId / Fingerprint are codegen'd
    // expressions; if someone reverts to udf(...) this trips.
    graft.ops.Pin.disabled = true
    try {
      Seq("q_lang_id", "q_fingerprint").foreach { name =>
        withClue(s"$name: ") {
          val plan = planOf(name).queryExecution.executedPlan.toString
          (plan should not).include("ScalaUDF")
        }
      }
    } finally { graft.ops.Pin.disabled = false }
  }

  it should "plan the substr-dedup pass with no joins beyond the bounded " +
    "survivor joins and no cartesian product" in {
    val plan = planOf("q_substr_dedup").queryExecution.executedPlan
    val str = plan.toString
    (str should not).include("CartesianProduct")
    (str should not).include("BroadcastNestedLoopJoin")
  }

  it should "plan the scan-shaped corpus filters join-free and UDF-free" in {
    // q_gopher_rules / q_bpe_merge / q_dedup_keep are single-pass shapes:
    // predicates and pair expansion as codegen'd expressions over one
    // scan (+ one hash window for the survivor pick) — a join or a
    // ScalaUDF appearing here means the 100 TB single-pass claim broke.
    Seq("q_gopher_rules", "q_bpe_merge", "q_dedup_keep").foreach { name =>
      withClue(s"$name: ") {
        val str = planOf(name).queryExecution.executedPlan.toString
        (str should not).include("Join")
        (str should not).include("ScalaUDF")
        (str should not).include("CartesianProduct")
      }
    }
  }

  it should "prune partitions on a hive-layout write (no data read " +
    "outside the filtered partition)" in {
    // The 100 TB layout lever the other specs don't cover: a filter on
    // the partition column must become a PartitionFilter (directory
    // pruning at planning), not a PushedFilter (row-group skipping at
    // read). Written to a temp dir from the same fixture tables.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_part_prune").toString
    try {
      graft.queries.Q.events(spark, dir)
        .write.partitionBy("event_type").mode("overwrite").parquet(tmp)
      val scan = spark.read.parquet(tmp)
        .filter(org.apache.spark.sql.functions.col("event_type") === "view")
        .queryExecution.executedPlan
        .collectLeaves().map(_.toString).find(_.contains("Scan parquet")).get
      scan should include("PartitionFilters")
      scan should include regex "PartitionFilters: \\[[^\\]]*event_type"
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  it should "bound q_graph_jaccard's wedge-apex fan-out at JaccardHubCap" in {
    // r12 verdict #2: exact co-neighbor counting is Σ deg(w)² — one
    // power-law hub at 100x data makes a single wedge key quadratic. The
    // gate caps each apex's adjacency before wedge generation; this
    // asserts the bound on the GATE'S OWN capped frame (max rows per
    // apex ≤ cap ⇒ no wedge key above cap²) and that the capped frame is
    // a subset of the full adjacency it estimates.
    import org.apache.spark.sql.functions.{count => cnt, lit, max => mx}
    val (und, _, capped) = GraphQueries.jaccardAdjacency(spark, dir)
    val maxFan = capped.groupBy("u").agg(cnt(lit(1)).as("n"))
      .agg(mx("n")).head().getLong(0)
    maxFan should be <= GraphQueries.JaccardHubCap.toLong
    capped.count() should be <= und.count()
    capped.exceptAll(und).count() shouldBe 0L
    // Plan-level: the capping window (row_number partitioned by the apex)
    // is actually in the gate's plan, not just in the helper.
    graft.ops.Pin.disabled = true
    try {
      val plan = planOf("q_graph_jaccard")
        .queryExecution.executedPlan.toString
      plan should include("row_number")
    } finally { graft.ops.Pin.disabled = false }
  }
}
