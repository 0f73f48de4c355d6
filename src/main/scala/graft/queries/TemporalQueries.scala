package graft.queries

import graft.queries.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temporal table maintenance and time-weighted analytics over `events`:
  * SCD2 history construction, latest-wins upsert merge, recency-weighted
  * scoring, and session-vs-busy-hour interval overlap.
  *
  * These are the maintenance loops a 100 TB event store actually runs —
  * build a slowly-changing history once, merge daily deltas into it,
  * score entities by recency — and every one of them is a single shuffle
  * keyed on the entity id (user) plus windows PARTITIONED by that id, so
  * no task ever sorts more than one user's history. All durations and
  * weights are exact integers (epoch micros, powers of two); value sums
  * go through decimal per the Q contract, so results hash-match the
  * DuckDB oracle bit-for-bit.
  */
object TemporalQueries {

  private val HourUs: Long = 3600L * 1000000L

  /** q_ewma_burst's exact λ=0.9 weights: 9^(k−1)·10^(8−k) for trailing
    * lag k = 1..8, scale 10^7 — one integer literal list shared by both
    * spellings (pow() doubles differ by ULPs across libms; these never
    * can).
    */
  private val EwmaW: Seq[BigInt] =
    (1 to 8).map(k => BigInt(9).pow(k - 1) * BigInt(10).pow(8 - k))
  private val GapUs: Long = 1800L * 1000000L // 30 min session gap
  private val RecencyDepth = 20              // events per user in the score
  private val TopN = 20

  /** events projected to exact integer time. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), col("value"),
      unix_micros(col("ts")).as("us"))

  private val evSql =
    """ev AS (
      |  SELECT user_id, event_id, event_type, value,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD2 history build: collapse each user's event stream into
    // change-point versions (state = event_type), each valid from its
    // first occurrence until the next state change; the last version per
    // user stays open (valid_to NULL). Two windows, both partitioned by
    // user_id — no task ever holds more than one user's timeline, so the
    // build is one shuffle at any corpus size. Durations are exact
    // integer micros.
    "q_scd2_history" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val versions = ev(s, dir)
        .withColumn("prev_state", lag("event_type", 1).over(w))
        .filter(col("prev_state").isNull ||
          col("prev_state") =!= col("event_type"))
        .withColumn("valid_to_us", lead("us", 1).over(w))
      versions.groupBy("event_type")
        .agg(count(lit(1)).as("n_versions"),
          count(col("valid_to_us")).as("n_closed"),
          sum(col("valid_to_us") - col("us")).cast("long").as("sum_dur_us"),
          max(col("valid_to_us") - col("us")).as("max_dur_us"))
        .orderBy("event_type")
    },

    // Latest-wins upsert merge: the event log splits at a data-derived
    // cutoff (70% through the observed time span, exact integer
    // arithmetic) into a base snapshot and a delta batch; per key
    // (user_id, event_type) the merged winner is the latest row by
    // (us, event_id), delta beating base. Emits the merge audit a real
    // MERGE INTO job logs: per event_type and outcome class
    // (insert/update/carry), key counts and an exact-decimal sum of the
    // winning values. One row_number window keyed on (key, side) + one
    // groupBy — two shuffles total, both on the merge key.
    "q_upsert_merge" -> { (s, dir) =>
      val e = ev(s, dir)
      // Integer floor division (`div`), mirroring the oracle's `// 10`:
      // Column `/` is DOUBLE division and at epoch-micro magnitudes its
      // rounding can shift the cutoff by 1 us, misclassifying boundary
      // events between base/upd on regenerated testdata.
      val cut = e.agg(min(col("us")).as("mn_us"), max(col("us")).as("mx_us"))
        .select(expr("mn_us + ((mx_us - mn_us) * 7) div 10").as("cutoff_us"))
      val w = Window.partitionBy("user_id", "event_type", "side")
        .orderBy(desc("us"), desc("event_id"))
      val winners = e.crossJoin(broadcast(cut))
        .withColumn("side",
          when(col("us") < col("cutoff_us"), "base").otherwise("upd"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("val_dec", col("value").cast("decimal(18,4)"))
      winners.groupBy("user_id", "event_type")
        .agg(
          max(when(col("side") === "base", col("us"))).as("base_us"),
          max(when(col("side") === "base", col("val_dec"))).as("base_val"),
          max(when(col("side") === "upd", col("us"))).as("upd_us"),
          max(when(col("side") === "upd", col("val_dec"))).as("upd_val"))
        .withColumn("outcome",
          when(col("base_us").isNull, "insert")
            .when(col("upd_us").isNull, "carry")
            .otherwise("update"))
        .withColumn("win_val", coalesce(col("upd_val"), col("base_val")))
        .groupBy("event_type", "outcome")
        .agg(count(lit(1)).as("n_keys"),
          sum(col("win_val")).cast("double").as("sum_win_value"))
        .orderBy("event_type", "outcome")
    },

    // Recency-weighted user score: each user's last `RecencyDepth` events
    // (by event time, newest first), weighted by exact powers of two —
    // weight 2^(RecencyDepth-rn), so the newest event counts 2^19 and the
    // 20th counts 1. Numerator is an exact decimal sum of value×weight
    // (associative → partition-order independent); the reported score
    // divides once at the end and rounds to 6 decimals. The standard
    // "activity score" of a feature store, computed in one user-keyed
    // window + one groupBy.
    "q_recency_score" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(desc("us"), desc("event_id"))
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= RecencyDepth)
        .withColumn("wt",
          pow(lit(2.0), lit(RecencyDepth) - col("rn")).cast("long"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_recent"),
          sum(col("wt")).as("den"),
          sum(col("value").cast("decimal(18,4)") * col("wt")).as("num"))
        .select(col("user_id"), col("n_recent"),
          round(col("num").cast("double") / col("den"), 6).as("recency_score"))
        .orderBy(desc("recency_score"), col("user_id"))
        .limit(TopN)
    },

    // Interval-overlap join: per-user session intervals (30-min lag-gap
    // sessionization) intersected with globally "busy" hours (hourly
    // event count at or above the mean, decided by exact integer
    // cross-multiplication — no division). Sessions explode only into
    // the hour buckets they actually span (`sequence` on the hour
    // index), then equi-join on the bucket — the bucketed-range-join
    // plan, never an unbounded interval × interval comparison; the busy
    // set is calendar-bounded and broadcast. Emits the top users by
    // exact overlap micros.
    "q_interval_overlap" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val run = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sessions = ev(s, dir)
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("brk", when(col("prev_us").isNull ||
          col("us") - col("prev_us") > GapUs, 1).otherwise(0))
        .withColumn("sid", sum(col("brk")).over(run))
        .groupBy("user_id", "sid")
        .agg(min(col("us")).as("s"), max(col("us")).as("e"))
      val hourly = ev(s, dir)
        .groupBy(expr(s"us div ${HourUs}L").as("hb"))
        .agg(count(lit(1)).as("n"))
      val tot = hourly.agg(sum(col("n")).as("tot"),
        count(lit(1)).as("nh"))
      val busy = hourly.crossJoin(broadcast(tot))
        .filter(col("n") * col("nh") >= col("tot"))
        .select("hb")
      sessions
        .withColumn("hb", explode(sequence(
          expr(s"s div ${HourUs}L"), expr(s"e div ${HourUs}L"))))
        .join(broadcast(busy), "hb")
        .withColumn("ov", greatest(lit(0L),
          least(col("e"), (col("hb") + 1) * HourUs) -
            greatest(col("s"), col("hb") * HourUs)))
        .groupBy("user_id")
        .agg(count_distinct(col("sid")).as("n_busy_sessions"),
          sum(col("ov")).cast("long").as("busy_overlap_us"))
        .orderBy(desc("busy_overlap_us"), col("user_id"))
        .limit(TopN)
    },

    // Exact winsorization: per-type p05/p95 bounds by NEAREST-RANK
    // (integer rank arithmetic on a totally-ordered sort — never
    // interpolated, so the bound is an actual data value both engines
    // pick identically), then values clamped and re-summed in exact
    // decimal. The robust-scaling pass run before feeding any metric to
    // a model. One type-partitioned window + a broadcast bounds join.
    "q_winsorize" -> { (s, dir) =>
      val e = ev(s, dir)
      val w = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      val ranked = e.withColumn("rn", row_number().over(w))
      val n = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      val bounds = ranked.join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(5 * (n - 1)) div 100 + 1") ||
          col("rn") === expr("(95 * (n - 1)) div 100 + 1"))
        .groupBy("event_type")
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      e.join(broadcast(bounds), "event_type")
        .withColumn("clipped",
          least(greatest(col("value"), col("lo")), col("hi")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(min(col("lo")), 6).as("p05"),
          round(max(col("hi")), 6).as("p95"),
          sum(when(col("value") < col("lo"), 1).otherwise(0)).cast("long")
            .as("n_clipped_low"),
          sum(when(col("value") > col("hi"), 1).otherwise(0)).cast("long")
            .as("n_clipped_high"),
          dsum(col("clipped")).as("sum_winsorized"))
        .orderBy("event_type")
    },

    // Incremental view maintenance: the hourly rollup is computed as
    // base partial (events before the 70% cutoff) MERGED with a delta
    // partial (events after) — the update path of a materialized
    // aggregate: never re-scan the base, just merge partial states.
    // Merge-equals-recompute holds EXACTLY because counts and decimal
    // sums are associative; the oracle IS the full recompute, so the
    // gate proves the incremental path bit-identical to the batch path.
    "q_incr_agg" -> { (s, dir) =>
      val e = ev(s, dir)
      // Same integer `div` cutoff as q_upsert_merge: this gate's oracle is
      // cutoff-independent, but the engine's base/delta split should still
      // sit on the exact integer boundary the scaladoc claims.
      val cut = e.agg(min(col("us")).as("mn_us"), max(col("us")).as("mx_us"))
        .select(expr("mn_us + ((mx_us - mn_us) * 7) div 10").as("cutoff_us"))
      val tagged = e.crossJoin(broadcast(cut))
      def partial(df: DataFrame): DataFrame =
        df.groupBy(expr(s"us div ${HourUs}L").as("hb"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,4)")).as("sv"))
      val base = partial(tagged.filter(col("us") < col("cutoff_us")))
      val delta = partial(tagged.filter(col("us") >= col("cutoff_us")))
      base.unionByName(delta)
        .groupBy("hb", "event_type")
        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).cast("long").as("n_events"),
          sum(col("sv")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // EWMA burst detection in EXACT integer arithmetic — the classic
    // smoother without the classic cross-engine trap: λ^k via pow()
    // differs by ULPs between libms, so the weights are the scaled
    // integers 9^(k−1)·10^(8−k) (λ=0.9 over an 8-hour trailing window,
    // current hour excluded), precomputed once and injected as the SAME
    // literals into both spellings. Each hour's count contributes to
    // its next 8 hours through an explode (an equi-keyed aggregate —
    // no range join, no window over an unbounded frame); a burst is
    // x·den > 2·num, compared in integers, so the verdict can never
    // flip on an FP boundary. Per type: observed hours, burst count,
    // first burst hour — the alerting summary of a 100 TB event feed.
    "q_ewma_burst" -> { (s, dir) =>
      val wArr = EwmaW.mkString("array(", "L, ", "L)")
      val hourly = ev(s, dir)
        .groupBy(col("event_type"), expr(s"us div ${HourUs}L").as("hb"))
        .agg(count(lit(1)).as("x"))
      val contrib = hourly
        .select(col("event_type"), col("hb"), col("x"),
          explode(expr("sequence(1, 8)")).as("k"))
        .select(col("event_type"), (col("hb") + col("k")).as("thb"),
          (col("x") * expr(s"element_at($wArr, cast(k AS INT))"))
            .as("xw"),
          expr(s"element_at($wArr, cast(k AS INT))").as("w"))
        .groupBy(col("event_type").as("cet"), col("thb"))
        .agg(sum(col("xw")).as("num"), sum(col("w")).as("den"))
      hourly.join(contrib,
          col("event_type") === col("cet") && col("hb") === col("thb"))
        .select(col("event_type"), col("hb"), col("x"), col("num"),
          col("den"),
          (col("x") * col("den") > col("num") * 2).as("burst"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("burst"), 1).otherwise(0)).cast("long")
            .as("n_bursts"),
          min(when(col("burst"), col("hb"))).as("first_burst_hb"))
        .orderBy("event_type")
    },

    // Incremental JOIN-view maintenance — the delta decomposition an
    // hourly refresh job runs instead of recomputing a 100 TB join:
    // with both sides split into base + delta (late-arriving customers
    // c_custkey%10=0, new orders o_orderkey%7=0), the maintained view is
    // O_b⋈C_b ∪ ΔO⋈C_b ∪ O_b⋈ΔC ∪ ΔO⋈ΔC — all four terms equi-keyed
    // on the same join key (in production the three Δ-terms are tiny
    // and AQE broadcasts them; only the first exists from the previous
    // refresh). The oracle computes the full join in one shot, so a
    // pass proves the decomposition exhaustive AND disjoint — the
    // correctness property incremental maintenance lives or dies by.
    "q_incr_join_view" -> { (s, dir) =>
      val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cb = c.filter(col("c_custkey") % 10 =!= 0)
      val cd = c.filter(col("c_custkey") % 10 === 0)
      val ob = o.filter(col("o_orderkey") % 7 =!= 0)
      val od = o.filter(col("o_orderkey") % 7 === 0)
      def term(os: DataFrame, cs: DataFrame): DataFrame =
        os.join(cs, col("o_custkey") === col("c_custkey"))
          .select("c_mktsegment", "c_custkey", "o_totalprice")
      term(ob, cb).unionByName(term(od, cb))
        .unionByName(term(ob, cd)).unionByName(term(od, cd))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("revenue"),
          count_distinct(col("c_custkey")).as("n_custs"))
        .orderBy("c_mktsegment")
    },

    // Per-type activity trend: OLS slope of daily event counts over the
    // day index. Every moment (Sx, Sy, Sxy, Sxx) is an exact BIGINT sum
    // of integers — associative, so partitioning cannot perturb it — and
    // the one floating division happens once per group on identical
    // integer operands in both engines. Two shuffles, both keyed and
    // group-bounded; this is how "is this source drying up?" is asked of
    // a 100 TB event store.
    "q_trend_fit" -> { (s, dir) =>
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("us div 86400000000").as("d"))
        .agg(count(lit(1)).as("n"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("d")).as("sx"), sum(col("n")).as("sy"),
          sum(col("d") * col("n")).as("sxy"),
          sum(col("d") * col("d")).as("sxx"))
        .select(col("event_type"), col("n_days"),
          col("sy").cast("long").as("n_events"),
          // moments widened to decimal(38,0) before the cross products —
          // n_days·Sxy overflows a long once daily counts reach ~1e9.
          // A single-day group has zero x-variance: slope is NULL by the
          // same explicit rule in both engines (double /0 is engine-
          // dependent — Infinity vs error — so never reach it).
          when(col("n_days") > 1,
            round((col("n_days") * col("sxy").cast("decimal(38,0)") -
              col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
              (col("n_days") * col("sxx").cast("decimal(38,0)") -
                col("sx").cast("decimal(38,0)") * col("sx"))
                .cast("double"), 6)).as("slope_per_day"))
        .orderBy("event_type")
    },

    // CUSUM drift detection over the daily series (Page 1954): the
    // change-point statistic s_i = max(0, s_{i-1} + dev_i) computed
    // WITHOUT its sequential recurrence — s_i ≡ p_i − min_{j≤i} p_j for
    // the prefix sums p, so two frames of one type-keyed window replace
    // the loop. Deviations are cross-multiplied integers
    // (n·n_days − total, mean never divided), the alarm rule
    // (2·cusum > total·n_days... spelled 2·cusum > total) is an integer
    // compare, and the whole gate is exact at any scale.
    "q_cusum_drift" -> { (s, dir) =>
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("us div 86400000000").as("d"))
        .agg(count(lit(1)).as("n"))
      val typ = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("n")).cast("long").as("tot"))
      val w = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(typ), "event_type")
        .withColumn("p", sum(col("n") * col("nd") - col("tot")).over(w))
        .withColumn("cusum", col("p") - min(col("p")).over(w))
        .groupBy("event_type")
        .agg(max(col("nd")).as("n_days"),
          max(col("cusum")).cast("long").as("max_cusum_scaled"),
          sum(when(col("cusum") * 2 > col("tot"), 1).otherwise(0))
            .cast("long").as("n_alarm_days"))
        .orderBy("event_type")
    },

    // Lag-24h autocorrelation — seasonality STRENGTH, complementing
    // q_seasonal_anomaly's hot-spot view: Pearson r between each hour's
    // count and the count exactly 24 h earlier. The lag is an equi-join
    // on (type, hb = hb+24) — never a window over gap-ridden rows, so
    // missing hours pair correctly. Moments are exact integers widened
    // to decimal(38,0) (the q_trend_fit discipline); the one double
    // formula has a fixed association mirrored in the oracle.
    "q_autocorr_24h" -> { (s, dir) =>
      val hourly = ev(s, dir)
        .groupBy(col("event_type"), expr(s"us div ${HourUs}L").as("hb"))
        .agg(count(lit(1)).as("n"))
      val pairs = hourly.as("a")
        .join(hourly.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.hb") === col("b.hb") + 24)
        .select(col("a.event_type").as("event_type"),
          col("a.n").as("x"), col("b.n").as("y"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      pairs.groupBy("event_type")
        .agg(count(lit(1)).as("m"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("m").as("n_pairs"),
          when((col("m") * d(col("sxx")) - d(col("sx")) * col("sx"))
            .cast("double") > 0.0 &&
            (col("m") * d(col("syy")) - d(col("sy")) * col("sy"))
              .cast("double") > 0.0,
            round((col("m") * d(col("sxy")) - d(col("sx")) * col("sy"))
              .cast("double") /
              sqrt((col("m") * d(col("sxx")) - d(col("sx")) * col("sx"))
                .cast("double")) /
              sqrt((col("m") * d(col("syy")) - d(col("sy")) * col("sy"))
                .cast("double")), 6)).as("r_lag24"))
        .orderBy("event_type")
    },

    // Seasonal (hour-of-day) anomaly profile: hours running at ≥1.5× the
    // type's mean hourly load, decided by integer cross-multiplication
    // (2·n·nh ≥ 3·tot) so the boundary can never flip between engines.
    // The peak ratio divides once per group. |event_types|×24 groups —
    // constant-size aggregate state at any corpus size.
    "q_seasonal_anomaly" -> { (s, dir) =>
      val hod = events(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"))
      val typ = hod.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("tot"))
      hod.join(broadcast(typ), "event_type")
        .groupBy("event_type")
        .agg(max(col("n_hours")).as("n_hours"),
          sum(when(col("n") * col("n_hours") * 2 >= col("tot") * 3, 1)
            .otherwise(0)).cast("long").as("n_hot_hours"),
          round(max(col("n") * col("n_hours")).cast("double") /
            max(col("tot")), 6).as("peak_ratio"))
        .orderBy("event_type")
    },

    // Time-travel snapshot read: each user's STATE (last event type) as
    // of the 70% integer cutoff — "what did the table look like at T",
    // the reproducible-read primitive under every backfill audit. One
    // filter + one user-keyed max_by; emits the state census at T.
    // At 100 TB the filter prunes to partitions ≤ T before any shuffle.
    "q_time_travel" -> { (s, dir) =>
      val e = ev(s, dir)
      val cut = e.agg(min(col("us")).as("mn_us"), max(col("us")).as("mx_us"))
        .select(expr("mn_us + ((mx_us - mn_us) * 7) div 10").as("cutoff_us"))
      e.crossJoin(broadcast(cut))
        .filter(col("us") <= col("cutoff_us"))
        .groupBy("user_id")
        .agg(max(struct(col("us"), col("event_id"), col("event_type")))
          .as("last"))
        .select(col("user_id"), col("last.event_type").as("state"))
        .groupBy("state")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("state")
    },

    // Time-weighted average value per event type: each event's value
    // holds until the user's NEXT event (step-function semantics — the
    // correct mean for sensor/metric streams where sampling is uneven;
    // the arithmetic mean over-weights chatty periods). One
    // user-partitioned lead window + one groupBy; the numerator is an
    // exact decimal Σ value·duration (associative), the single division
    // happens once per group and is rounded to 6.
    "q_time_weighted_avg" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      ev(s, dir)
        .withColumn("next_us", lead("us", 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dur", col("next_us") - col("us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dur")).cast("long").as("sum_dur_us"),
          sum(col("value").cast("decimal(18,4)") * col("dur")).as("num"))
        .select(col("event_type"), col("n_intervals"), col("sum_dur_us"),
          round(col("num").cast("double") / col("sum_dur_us"), 6)
            .as("tw_avg"))
        .orderBy("event_type")
    },

    // Week-over-week revenue growth — the trend report every revenue
    // dashboard opens with: orders rolled up to ISO weeks
    // (date_trunc('week') = Monday in BOTH engines), exact-decimal
    // weekly totals, then the growth ratio against the previous week
    // within the same calendar year. The lag window is PARTITIONED by
    // the week-start's year (groups stay calendar-bounded — the
    // unpartitioned-window shape the plan sweep rejects never appears);
    // each year's first week has no predecessor and drops on both
    // engines alike. The ratio divides two exact decimals as doubles
    // once per week row, rounded to 6.
    "q_wow_growth" -> { (s, dir) =>
      val weekly = t(s, dir, "orders")
        .groupBy(date_trunc("week", col("o_orderdate")).as("wk"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
        .withColumn("yr", year(col("wk")))
      val w = Window.partitionBy("yr").orderBy("wk")
      weekly
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .filter(col("prev_rev").isNotNull)
        .select(col("yr").cast("long").as("yr"),
          unix_micros(col("wk")).as("week_us"),
          col("n_orders"),
          col("rev").cast("double").as("revenue"),
          round((col("rev").cast("double") -
            col("prev_rev").cast("double")) /
            col("prev_rev").cast("double"), 6).as("wow_growth"))
        .orderBy("week_us")
    },

    // Customer value-band migration — the churn/upsell transition
    // matrix: each customer's total spend in the first and second half
    // of the order history, banded by FIXED integer-cent cuts (none /
    // low ≤ $900k / mid ≤ $1.5M / high), cross-tabulated. ONE
    // conditional-sum pass computes both periods (never two scans);
    // spend is summed in integer cents (round(x·100, 0) per order — an
    // exactly-integral double before the long cast, see q_abc_parts),
    // so the band boundaries are exact at any scale. ≤ 16-row result.
    "q_band_migration" -> { (s, dir) =>
      val split = to_timestamp(lit("1998-06-01"))
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      def band(c: org.apache.spark.sql.Column) =
        when(c === 0, "0_none")
          .when(c <= 90000000L, "1_low")
          .when(c <= 150000000L, "2_mid")
          .otherwise("3_high")
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(when(col("o_orderdate") < split, cents).otherwise(0L))
          .as("s1"),
          sum(when(col("o_orderdate") >= split, cents).otherwise(0L))
            .as("s2"))
        .groupBy(band(col("s1")).as("band_p1"),
          band(col("s2")).as("band_p2"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("band_p1", "band_p2")
    },

    // Maximum drawdown of the daily revenue series — the running-peak
    // metric every finance/SLO dashboard computes: the largest drop of
    // a day's revenue below the best day seen so far. The running peak
    // is [[graft.ops.PrefixScan]]'s two-phase distributed prefix-max
    // over the date-ordered daily frame (never a global-sort window);
    // revenue is integer cents (the q_abc_parts spelling), so peak,
    // drawdown and the argmax day are exact; ties resolve to the
    // earliest day by a min over the scalar-broadcast maximum.
    "q_drawdown" -> { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .as("rev_cents"))
      val scanned = graft.ops.PrefixScan
        .withExclusivePrefixMax(daily, Seq("day_us"), "rev_cents")
        .select(col("day_us"), col("rev_cents"),
          greatest(col("prefix_max"), col("rev_cents")).as("peak"))
        .withColumn("dd", col("peak") - col("rev_cents"))
      val mx = scanned.agg(max(col("dd")).as("max_dd"),
        count(lit(1)).as("n_days"))
      scanned.crossJoin(broadcast(mx)) // scalar — sanctioned
        .filter(col("dd") === col("max_dd"))
        .agg(min(col("day_us")).as("dd_day_us"))
        .crossJoin(broadcast(mx))
        .select(col("n_days"),
          (col("max_dd").cast("double") / 100).as("max_drawdown"),
          col("dd_day_us"))
    },

    // Day-of-week seasonality profile — the weekly-rhythm companion to
    // q_autocorr_24h's daily rhythm. The weekday index is PURE INTEGER
    // arithmetic ((epoch_days + 3) % 7, 0 = Monday: day 0 = 1970-01-01
    // was a Thursday = 3), so both engines derive it from the same
    // microsecond integers with zero calendar-function parity risk.
    // One partial-aggregated pass; 7 × |event types| rows.
    "q_dow_profile" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("dow", (expr("us div 86400000000") + 3) % 7)
        .groupBy("dow", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("dow", "event_type")
    })

  val oracles: Map[String, String] = Map(
    "q_scd2_history" ->
      s"""WITH $evSql,
         |m AS (
         |  SELECT user_id, event_id, event_type, us,
         |    lag(event_type) OVER (PARTITION BY user_id
         |                          ORDER BY us, event_id) AS prev_state
         |  FROM ev),
         |v AS (
         |  SELECT user_id, event_id, event_type, us FROM m
         |  WHERE prev_state IS NULL OR prev_state <> event_type),
         |h AS (
         |  SELECT event_type, us,
         |    lead(us) OVER (PARTITION BY user_id
         |                   ORDER BY us, event_id) AS valid_to_us
         |  FROM v)
         |SELECT event_type, count(*) AS n_versions,
         |  count(valid_to_us) AS n_closed,
         |  CAST(sum(valid_to_us - us) AS BIGINT) AS sum_dur_us,
         |  max(valid_to_us - us) AS max_dur_us
         |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_upsert_merge" ->
      s"""WITH $evSql,
         |cut AS (
         |  SELECT CAST(min(us) + ((max(us) - min(us)) * 7) // 10 AS BIGINT)
         |    AS cutoff_us FROM ev),
         |tagged AS (
         |  SELECT ev.*, CASE WHEN us < (SELECT cutoff_us FROM cut)
         |    THEN 'base' ELSE 'upd' END AS side FROM ev),
         |winners AS (
         |  SELECT user_id, event_type, side, us,
         |    CAST(value AS DECIMAL(18,4)) AS val_dec,
         |    row_number() OVER (PARTITION BY user_id, event_type, side
         |                       ORDER BY us DESC, event_id DESC) AS rn
         |  FROM tagged QUALIFY rn = 1),
         |merged AS (
         |  SELECT user_id, event_type,
         |    max(CASE WHEN side = 'base' THEN us END) AS base_us,
         |    max(CASE WHEN side = 'base' THEN val_dec END) AS base_val,
         |    max(CASE WHEN side = 'upd' THEN us END) AS upd_us,
         |    max(CASE WHEN side = 'upd' THEN val_dec END) AS upd_val
         |  FROM winners GROUP BY user_id, event_type)
         |SELECT event_type,
         |  CASE WHEN base_us IS NULL THEN 'insert'
         |       WHEN upd_us IS NULL THEN 'carry'
         |       ELSE 'update' END AS outcome,
         |  count(*) AS n_keys,
         |  CAST(sum(COALESCE(upd_val, base_val)) AS DOUBLE) AS sum_win_value
         |FROM merged GROUP BY event_type, outcome
         |ORDER BY event_type, outcome""".stripMargin,

    "q_recency_score" ->
      s"""WITH $evSql,
         |r AS (
         |  SELECT user_id, value,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY us DESC, event_id DESC) AS rn
         |  FROM ev QUALIFY rn <= $RecencyDepth),
         |w AS (
         |  SELECT user_id, value,
         |    CAST(power(2, $RecencyDepth - rn) AS BIGINT) AS wt FROM r)
         |SELECT user_id, count(*) AS n_recent,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4)) * wt) AS DOUBLE)
         |        / sum(wt), 6) AS recency_score
         |FROM w GROUP BY user_id
         |ORDER BY recency_score DESC, user_id LIMIT $TopN""".stripMargin,

    "q_interval_overlap" ->
      s"""WITH $evSql,
         |b AS (
         |  SELECT user_id, event_id, us,
         |    CASE WHEN lag(us) OVER (PARTITION BY user_id
         |                            ORDER BY us, event_id) IS NULL
         |      OR us - lag(us) OVER (PARTITION BY user_id
         |                            ORDER BY us, event_id) > $GapUs
         |      THEN 1 ELSE 0 END AS brk
         |  FROM ev),
         |sb AS (
         |  SELECT user_id, us,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM b),
         |sessions AS (
         |  SELECT user_id, sid, min(us) AS s, max(us) AS e
         |  FROM sb GROUP BY user_id, sid),
         |hourly AS (
         |  SELECT us // $HourUs AS hb, count(*) AS n FROM ev GROUP BY 1),
         |tot AS (SELECT sum(n) AS tot, count(*) AS nh FROM hourly),
         |busy AS (
         |  SELECT hb FROM hourly
         |  WHERE n * (SELECT nh FROM tot) >= (SELECT tot FROM tot)),
         |ex AS (
         |  SELECT user_id, sid, s, e,
         |    unnest(generate_series(s // $HourUs, e // $HourUs)) AS hb
         |  FROM sessions),
         |ov AS (
         |  SELECT user_id, sid,
         |    greatest(0, least(e, (ex.hb + 1) * $HourUs)
         |                - greatest(s, ex.hb * $HourUs)) AS ov
         |  FROM ex JOIN busy ON ex.hb = busy.hb)
         |SELECT user_id, count(DISTINCT sid) AS n_busy_sessions,
         |  CAST(sum(ov) AS BIGINT) AS busy_overlap_us
         |FROM ov GROUP BY user_id
         |ORDER BY busy_overlap_us DESC, user_id LIMIT $TopN""".stripMargin,

    "q_winsorize" ->
      s"""WITH $evSql,
         |ranked AS (
         |  SELECT event_type, event_id, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM ev),
         |bounds AS (
         |  SELECT event_type, min(value) AS lo, max(value) AS hi
         |  FROM ranked
         |  WHERE rn = (5 * (n - 1)) // 100 + 1
         |     OR rn = (95 * (n - 1)) // 100 + 1
         |  GROUP BY event_type)
         |SELECT ev.event_type, count(*) AS n,
         |  round(min(lo), 6) AS p05, round(max(hi), 6) AS p95,
         |  CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clipped_low,
         |  CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clipped_high,
         |  ${dsumSql("least(greatest(value, lo), hi)")} AS sum_winsorized
         |FROM ev JOIN bounds ON ev.event_type = bounds.event_type
         |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin,

    "q_incr_agg" ->
      s"""WITH $evSql
         |SELECT event_type,
         |  count(DISTINCT us // $HourUs) AS n_hours,
         |  count(*) AS n_events,
         |  ${dsumSql("value")} AS sum_value
         |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Identical integer weights; bursts decided by the same integer
    // cross-multiplication.
    "q_ewma_burst" ->
      s"""WITH $evSql,
         |hourly AS (
         |  SELECT event_type, us // ${HourUs} AS hb, count(*) AS x
         |  FROM ev GROUP BY 1, 2),
         |contrib AS (
         |  SELECT event_type, hb + r.k AS thb,
         |    sum(x * ([${EwmaW.mkString(", ")}][r.k])) AS num,
         |    sum([${EwmaW.mkString(", ")}][r.k]) AS den
         |  FROM hourly, range(1, 9) r(k)
         |  GROUP BY event_type, hb + r.k)
         |SELECT h.event_type, count(*) AS n_hours,
         |  CAST(sum(CASE WHEN h.x * c.den > 2 * c.num THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_bursts,
         |  min(CASE WHEN h.x * c.den > 2 * c.num THEN h.hb END)
         |    AS first_burst_hb
         |FROM hourly h
         |JOIN contrib c ON h.event_type = c.event_type AND h.hb = c.thb
         |GROUP BY h.event_type
         |ORDER BY h.event_type""".stripMargin,

    // Full one-shot recompute of the join view the engine maintains as
    // a four-term base/delta decomposition.
    "q_incr_join_view" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${dsumSql("o_totalprice", 2)} AS revenue,
         |  count(DISTINCT c_custkey) AS n_custs
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "q_trend_fit" ->
      s"""WITH $evSql,
         |daily AS (
         |  SELECT event_type, us // 86400000000 AS d, count(*) AS n
         |  FROM ev GROUP BY 1, 2)
         |SELECT event_type, count(*) AS n_days,
         |  CAST(sum(n) AS BIGINT) AS n_events,
         |  CASE WHEN count(*) > 1 THEN
         |    round(CAST(count(*) * sum(d * n) - sum(d) * sum(n) AS DOUBLE)
         |        / CAST(count(*) * sum(d * d) - sum(d) * sum(d) AS DOUBLE),
         |        6) END AS slope_per_day
         |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_cusum_drift" ->
      s"""WITH $evSql,
         |daily AS (
         |  SELECT event_type, us // 86400000000 AS d, count(*) AS n
         |  FROM ev GROUP BY 1, 2),
         |typ AS (
         |  SELECT event_type, count(*) AS nd,
         |    CAST(sum(n) AS BIGINT) AS tot
         |  FROM daily GROUP BY event_type),
         |pf AS (
         |  SELECT daily.event_type, d, nd, tot,
         |    sum(n * nd - tot) OVER (PARTITION BY daily.event_type
         |      ORDER BY d ROWS UNBOUNDED PRECEDING) AS p
         |  FROM daily JOIN typ ON daily.event_type = typ.event_type),
         |c AS (
         |  SELECT event_type, nd, tot,
         |    p - min(p) OVER (PARTITION BY event_type ORDER BY d
         |                     ROWS UNBOUNDED PRECEDING) AS cusum
         |  FROM pf)
         |SELECT event_type, max(nd) AS n_days,
         |  CAST(max(cusum) AS BIGINT) AS max_cusum_scaled,
         |  CAST(sum(CASE WHEN cusum * 2 > tot THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_alarm_days
         |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_autocorr_24h" ->
      s"""WITH $evSql,
         |hourly AS (
         |  SELECT event_type, us // $HourUs AS hb, count(*) AS n
         |  FROM ev GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a.event_type, a.n AS x, b.n AS y
         |  FROM hourly a JOIN hourly b
         |    ON a.event_type = b.event_type AND a.hb = b.hb + 24),
         |mom AS (
         |  SELECT event_type, count(*) AS m,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(x * y) AS HUGEINT) AS sxy,
         |    CAST(sum(x * x) AS HUGEINT) AS sxx,
         |    CAST(sum(y * y) AS HUGEINT) AS syy
         |  FROM pairs GROUP BY event_type)
         |SELECT event_type, m AS n_pairs,
         |  CASE WHEN CAST(m * sxx - sx * sx AS DOUBLE) > 0.0
         |        AND CAST(m * syy - sy * sy AS DOUBLE) > 0.0 THEN
         |    round(CAST(m * sxy - sx * sy AS DOUBLE)
         |      / sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
         |      / sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 6)
         |  END AS r_lag24
         |FROM mom ORDER BY event_type""".stripMargin,

    "q_seasonal_anomaly" ->
      """WITH hod AS (
        |  SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hod,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |typ AS (
        |  SELECT event_type, count(*) AS n_hours, sum(n) AS tot
        |  FROM hod GROUP BY event_type)
        |SELECT hod.event_type, max(n_hours) AS n_hours,
        |  CAST(sum(CASE WHEN n * n_hours * 2 >= tot * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hot_hours,
        |  round(CAST(max(n * n_hours) AS DOUBLE) / max(tot), 6)
        |    AS peak_ratio
        |FROM hod JOIN typ ON hod.event_type = typ.event_type
        |GROUP BY hod.event_type ORDER BY hod.event_type""".stripMargin,

    // Same integer cutoff as q_upsert_merge; the per-user latest row via
    // a rank window (the oracle's single-node spelling of the engine's
    // struct-max aggregate).
    "q_time_travel" ->
      s"""WITH $evSql,
         |c AS (
         |  SELECT CAST(min(us) + ((max(us) - min(us)) * 7) // 10 AS BIGINT)
         |    AS cutoff FROM ev),
         |f AS (SELECT ev.* FROM ev, c WHERE us <= cutoff),
         |r AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY us DESC, event_id DESC) AS rn
         |  FROM f)
         |SELECT event_type AS state, count(*) AS n_users
         |FROM r WHERE rn = 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same lead-window durations; SUM(BIGINT) cast back to BIGINT (the
    // DuckDB HUGEINT rule), decimal numerator, one rounded division.
    "q_time_weighted_avg" ->
      s"""WITH $evSql,
         |iv AS (
         |  SELECT event_type, value,
         |    lead(us) OVER (PARTITION BY user_id
         |                   ORDER BY us, event_id) - us AS dur
         |  FROM ev),
         |g AS (
         |  SELECT event_type, count(*) AS n_intervals,
         |    CAST(sum(dur) AS BIGINT) AS sum_dur_us,
         |    sum(CAST(value AS DECIMAL(18,4)) * dur) AS num
         |  FROM iv WHERE dur IS NOT NULL GROUP BY event_type)
         |SELECT event_type, n_intervals, sum_dur_us,
         |  round(CAST(num AS DOUBLE) / sum_dur_us, 6) AS tw_avg
         |FROM g ORDER BY event_type""".stripMargin,

    "q_wow_growth" ->
      """WITH weekly AS (
        |  SELECT CAST(date_trunc('week', CAST(o_orderdate AS TIMESTAMP))
        |           AS TIMESTAMP) AS wk,
        |    count(*) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM orders GROUP BY 1),
        |lg AS (
        |  SELECT CAST(EXTRACT(year FROM wk) AS BIGINT) AS yr,
        |    epoch_us(wk) AS week_us, n_orders, rev,
        |    lag(rev) OVER (PARTITION BY EXTRACT(year FROM wk)
        |                   ORDER BY wk) AS prev_rev
        |  FROM weekly)
        |SELECT yr, week_us, n_orders,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  round((CAST(rev AS DOUBLE) - CAST(prev_rev AS DOUBLE))
        |    / CAST(prev_rev AS DOUBLE), 6) AS wow_growth
        |FROM lg WHERE prev_rev IS NOT NULL
        |ORDER BY week_us""".stripMargin,

    "q_band_migration" ->
      """WITH p AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-06-01'
        |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-06-01'
        |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS s2
        |  FROM orders GROUP BY o_custkey),
        |b AS (
        |  SELECT
        |    CASE WHEN s1 = 0 THEN '0_none'
        |         WHEN s1 <= 90000000 THEN '1_low'
        |         WHEN s1 <= 150000000 THEN '2_mid'
        |         ELSE '3_high' END AS band_p1,
        |    CASE WHEN s2 = 0 THEN '0_none'
        |         WHEN s2 <= 90000000 THEN '1_low'
        |         WHEN s2 <= 150000000 THEN '2_mid'
        |         ELSE '3_high' END AS band_p2
        |  FROM p)
        |SELECT band_p1, band_p2, count(*) AS n_customers
        |FROM b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT epoch_us(date_trunc('day', CAST(o_orderdate
        |      AS TIMESTAMP))) AS day_us,
        |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1),
        |sc AS (
        |  SELECT day_us, rev_cents,
        |    CAST(max(rev_cents) OVER (ORDER BY day_us
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
        |  FROM daily),
        |d AS (
        |  SELECT day_us, peak - rev_cents AS dd FROM sc),
        |m AS (
        |  SELECT CAST(max(dd) AS BIGINT) AS max_dd,
        |    count(*) AS n_days FROM d)
        |SELECT m.n_days,
        |  CAST(m.max_dd AS DOUBLE) / 100 AS max_drawdown,
        |  (SELECT min(day_us) FROM d, m WHERE d.dd = m.max_dd)
        |    AS dd_day_us
        |FROM m""".stripMargin,

    "q_dow_profile" ->
      s"""WITH $evSql
         |SELECT (us // 86400000000 + 3) % 7 AS dow, event_type,
         |  count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM ev
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin)
}
