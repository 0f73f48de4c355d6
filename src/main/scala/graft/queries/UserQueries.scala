package graft.queries

import graft.queries.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** User/growth analytics over `events`: marketing attribution, audience
  * accumulation, and lifetime-value stratification — the reporting loops
  * a product analytics stack runs daily over the event firehose.
  *
  * Scale shapes: attribution is one user-partitioned window (no task
  * holds more than one user's timeline); cumulative distinct users is
  * groupBy(user) → groupBy(day) → distributed prefix sum
  * ([[graft.ops.PrefixSum]] — never an unpartitioned running-total
  * window); LTV deciles rank through [[graft.ops.RowIndex]]'s
  * zipWithIndex (range-repartitioned, full parallelism at any user
  * count — the q_vocab_encode lesson applied to user ranking). Money
  * sums ride the Q decimal contract.
  */
object UserQueries {

  private val DayUs: Long = 86400L * 1000000L

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
    // Last-touch attribution: each purchase is credited to the user's
    // most recent PRECEDING non-purchase event type (the touchpoint);
    // purchases with no prior touch fall in 'none'. One window
    // partitioned by user — the attribution pass is a single shuffle on
    // user_id at any scale — then a per-touchpoint rollup of purchase
    // counts and exact-decimal revenue.
    "q_attribution" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(s, dir)
        .withColumn("attr",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("attr"), lit("none")).as("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("sum_value"))
        .orderBy("attributed")
    },

    // Cumulative distinct users by day — the audience growth curve. The
    // scalable spelling: min-day per user (ONE groupBy — distinctness is
    // resolved at the user grain, never recounted per day), new-user
    // counts per day, then ops/PrefixSum's two-phase distributed running
    // total over the calendar — the `SUM() OVER (ORDER BY day)` that
    // would otherwise single-partition-sort. Integer-exact throughout.
    "q_cume_distinct_users" -> { (s, dir) =>
      val firstDay = ev(s, dir)
        .groupBy("user_id")
        .agg(min(expr(s"us div ${DayUs}L")).as("day"))
      val perDay = firstDay.groupBy("day").agg(count(lit(1)).as("n_new"))
      // per-DAY rows: bounded by the calendar (q_theil_sen's argument),
      // not by event volume — the bounded prefix path applies
      graft.ops.PrefixSum
        .withExclusivePrefixBounded(perDay, Seq("day"), "n_new")
        .select(col("day"), col("n_new"),
          (col("prefix") + col("n_new")).cast("long").as("cume_users"))
        .orderBy("day")
    },

    // Right-to-erasure cascade audit: given a deletion cohort (the
    // deterministic user_id % 97 == 0 stand-in for a GDPR request
    // batch), report per table how many rows the cascade removes and
    // how many survive — the compliance evidence a deletion job must
    // emit. Each table is ONE anti-join-shaped aggregate (a conditional
    // sum on the key predicate — no join needed when membership is
    // computable from the key itself; with an arbitrary request table
    // these become broadcast anti-joins). Customer keys join events'
    // user ids, so the same cohort cascades across both.
    "q_delete_propagation" -> { (s, dir) =>
      def audit(df: DataFrame, table: String, key: Column): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            sum(when(key % 97 === 0, 1).otherwise(0)).cast("long")
              .as("n_deleted"))
          .select(lit(table).as("table_name"), col("n_rows"),
            col("n_deleted"),
            (col("n_rows") - col("n_deleted")).as("n_surviving"))
      audit(ev(s, dir), "events", col("user_id"))
        .unionByName(audit(t(s, dir, "customer"), "customer",
          col("c_custkey")))
        .unionByName(audit(t(s, dir, "orders"), "orders",
          col("o_custkey")))
        .orderBy("table_name")
    },

    // Smoothed target encoding over the (event_type, hour-of-day) grid —
    // the leakage-prone categorical featurizer done the safe way:
    // enc = (Σvalue + m·prior) / (n + m) with m = 100 and prior = the
    // global mean, so rare cells shrink toward the prior instead of
    // memorizing noise. 120 cells at any corpus size; sums are exact
    // decimals and the two divisions run once per cell in one mirrored
    // association, rounded to 6.
    "q_target_encoding" -> { (s, dir) =>
      val e = ev(s, dir)
      val cat = e.groupBy(col("event_type"),
          expr("(us div 3600000000) % 24").as("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).as("sv"))
      val g = e.agg(count(lit(1)).as("gn"),
        sum(col("value").cast("decimal(18,4)")).as("gs"))
      cat.crossJoin(broadcast(g))
        .select(col("event_type"), col("hod"), col("n"),
          round((col("sv").cast("double") +
            lit(100.0) * (col("gs").cast("double") / col("gn"))) /
            (col("n") + lit(100.0)), 6).as("enc"))
        .orderBy("event_type", "hod")
    },

    // Lifetime-value deciles: per-user purchase totals (exact decimal),
    // users ranked by (ltv DESC, user_id) through RowIndex's distributed
    // zipWithIndex (the negated sort key rides along because the range
    // partitioner orders ascending), decile = rank*10 div n — integer-
    // exact boundaries, no percentile approximation. Emits the standard
    // LTV concentration table (decile → users, revenue share input).
    "q_ltv_deciles" -> { (s, dir) =>
      val ltv = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,4)")).as("ltv"))
        .withColumn("neg_ltv", -col("ltv"))
      val nTot = ltv.agg(count(lit(1)).as("nu"))
      graft.ops.RowIndex // single consumer: skip the output pin
        .withContiguousIndex(ltv, Seq("neg_ltv", "user_id"), pin = false)
        .crossJoin(broadcast(nTot))
        .withColumn("decile", expr("(row_idx * 10) div nu"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"),
          sum(col("ltv")).cast("double").as("sum_ltv"))
        .orderBy("decile")
    },

    // RFM segmentation — the classic marketing stratification: per
    // purchasing user, Recency (last purchase time), Frequency
    // (purchase count) and Monetary (exact-decimal revenue), each
    // tercile-coded by exact integer rank (rank*3 div n — the
    // q_ltv_deciles boundary arithmetic), then the 27-cell segment
    // grid. Ranking is THREE passes of RowIndex's distributed
    // zipWithIndex over the per-user frame (range-partitioned, full
    // parallelism at any user count — never an unpartitioned ntile
    // window); the per-user frame is derived once. Ties break on
    // user_id everywhere, so the terciles are deterministic.
    "q_rfm_segments" -> { (s, dir) =>
      val per = graft.ops.Pin.pin(ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(max(col("us")).as("last_us"),
          count(lit(1)).as("freq"),
          sum(col("value").cast("decimal(18,4)")).as("monetary"))
        .withColumn("neg_last", -col("last_us"))
        .withColumn("neg_freq", -col("freq"))
        .withColumn("neg_mon", -col("monetary")))
      val nTot = per.agg(count(lit(1)).as("nu"))
      def tercile(df: DataFrame, sortCol: String, out: String): DataFrame =
        graft.ops.RowIndex
          .withContiguousIndex(df.select(col("user_id"), col(sortCol)),
            Seq(sortCol, "user_id"), pin = false) // single consumer
          .crossJoin(broadcast(nTot))
          .select(col("user_id"),
            expr("(row_idx * 3) div nu").as(out))
      val r = tercile(per, "neg_last", "r_code")
      val f = tercile(per, "neg_freq", "f_code")
      val m = tercile(per, "neg_mon", "m_code")
      per.join(r, "user_id").join(f, "user_id").join(m, "user_id")
        .groupBy("r_code", "f_code", "m_code")
        .agg(count(lit(1)).as("n_users"),
          sum(col("monetary")).cast("double").as("sum_monetary"))
        .orderBy("r_code", "f_code", "m_code")
    },

    // Gini coefficient of per-user purchase revenue — the inequality
    // summary behind every "top X% of users drive Y% of revenue" claim
    // (the scalar twin of q_ltv_deciles' concentration table). Users
    // rank ascending by (ltv, user_id) through RowIndex's distributed
    // zipWithIndex; Gini = (2·Σ rank·ltv − (n+1)·Σ ltv) / (n·Σ ltv)
    // with Σ rank·ltv an exact decimal×integer sum — both numerator
    // terms are exact, so the one double division at the end is
    // bit-identical in both engines at any user count.
    "q_gini_ltv" -> { (s, dir) =>
      val ltv = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,4)")).as("ltv"))
      graft.ops.RowIndex // single consumer: skip the output pin
        .withContiguousIndex(ltv, Seq("ltv", "user_id"), pin = false)
        .agg(count(lit(1)).as("n_users"),
          sum(col("ltv")).as("tot_dec"),
          sum(col("ltv") * (col("row_idx") + 1)).as("wsum_dec"))
        .select(col("n_users"),
          col("tot_dec").cast("double").as("total_ltv"),
          round((lit(2) * col("wsum_dec").cast("double") -
            (col("n_users") + 1) * col("tot_dec").cast("double")) /
            (col("n_users") * col("tot_dec").cast("double")), 6)
            .as("gini"))
    },

    // Engagement day-bitmaps — the bitset encoding of "which days was
    // each user active" that engagement warehouses keep instead of raw
    // event rows: one BIGINT per user per 64-day epoch page (epoch day
    // d sets bit d mod 64 of page d div 64 — calendar-free, so data
    // spanning any month/year boundary never aliases), built by a
    // `bit_or` aggregate (associative, partial-aggregated map-side —
    // per-user-page state is ONE long at any event volume), then the
    // activity histogram via summed `bit_count`. The same masks support
    // streak/overlap queries as pure integer ops. Identical spelling in
    // both engines; all integers.
    "q_engagement_bitmap" -> { (s, dir) =>
      ev(s, dir)
        .select(col("user_id"), expr("us div 86400000000").as("d"))
        .select(col("user_id"), expr("d div 64").as("page"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(d % 64 AS INT))")
            .as("daybit"))
        .groupBy("user_id", "page")
        .agg(expr("bit_or(daybit)").as("mask"))
        .groupBy("user_id")
        .agg(expr("CAST(sum(bit_count(mask)) AS BIGINT)")
          .as("active_days"))
        .groupBy("active_days")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("active_days")
    },

    // Longest activity streak per user — the gaps-and-islands pattern:
    // distinct active days per user, then `day − row_number` is
    // constant exactly within a consecutive run, so one user-partitioned
    // window + one (user, island) count finds every streak without
    // self-joins. Emits the longest-streak histogram. Every window is
    // user-partitioned (no task holds more than one user's days ≤ 31
    // rows here, ≤ span-days in general).
    "q_activity_streaks" -> { (s, dir) =>
      val days = ev(s, dir)
        .select(col("user_id"), expr("us div 86400000000").as("d"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val streaks = days
        .withColumn("grp", col("d") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).as("longest_streak"))
      streaks.groupBy("longest_streak")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("longest_streak")
    },

    // Growth accounting — the DAU decomposition every growth team
    // reports: per day, active users split into NEW (first-ever day),
    // RETAINED (also active yesterday) and RESURRECTED (active before,
    // but not yesterday), plus CHURNED (active yesterday, gone today) =
    // yesterday's actives − today's retained. Everything is distinct
    // (user, day) rows + equi-joins — the yesterday test is a self-join
    // on (user, day−1), churn closes via a day-frame self-join on
    // (day−1): NO windows, no driver state, shuffles keyed on user/day
    // only. The identity active = new + retained + resurrected holds
    // exactly by construction.
    "q_growth_accounting" -> { (s, dir) =>
      val ud = graft.ops.Pin.pin(ev(s, dir)
        .select(col("user_id"), expr("us div 86400000000").as("d"))
        .distinct())
      val firstD = ud.groupBy("user_id").agg(min(col("d")).as("fd"))
      val yd = ud.select(col("user_id").as("yu"), (col("d") + 1).as("yd"))
      val flags = ud
        .join(firstD, "user_id")
        .join(yd, col("user_id") === col("yu") && col("d") === col("yd"),
          "left")
        .select(col("d"),
          when(col("fd") === col("d"), 1).otherwise(0).as("is_new"),
          when(col("yu").isNotNull, 1).otherwise(0).as("is_ret"))
      val daily = flags.groupBy("d")
        .agg(count(lit(1)).as("active"),
          sum(col("is_new")).cast("long").as("new_users"),
          sum(col("is_ret")).cast("long").as("retained"))
        .withColumn("resurrected",
          col("active") - col("new_users") - col("retained"))
      val prev = daily.select((col("d") + 1).as("pd"),
        col("active").as("prev_active"))
      daily.join(prev, col("d") === col("pd"), "left")
        .select(col("d").as("epoch_day"), col("active"),
          col("new_users"), col("retained"), col("resurrected"),
          coalesce(col("prev_active") - col("retained"), lit(0L))
            .cast("long").as("churned"))
        .orderBy("epoch_day")
    },

    // User-activity power law — q_zipf_fit's machinery pointed at the
    // user dimension: is activity heavy-tailed, and how steep? Top-100
    // users by event count (TakeOrdered BEFORE the rank window — the
    // sanctioned bounded-window shape), log-log least squares. The
    // slope is the whale-concentration summary capacity planning and
    // abuse detection both read.
    "q_user_power_law" -> { (s, dir) =>
      val R = 100
      val cnt = ev(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val ranked = cnt
        .orderBy(col("cnt").desc, col("user_id")).limit(R)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("user_id"))))
        .select(log(col("rank").cast("double")).as("x"),
          log(col("cnt").cast("double")).as("y"))
      val tots = cnt.agg(count(lit(1)).as("n_users"),
        sum(col("cnt")).cast("long").as("n_events"))
      val m = ranked.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      tots.crossJoin(broadcast( // scalar aggregates — sanctioned
        m.select(round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6)
          .as("power_slope"))))
    },

    // Stickiness (DAU/MAU) — the engagement-intensity scalar: average
    // daily actives over the span divided by span-wide distinct
    // actives. Both terms reduce to integers (Σ per-day actives, one
    // distinct count); the single division happens once at the end.
    "q_stickiness" -> { (s, dir) =>
      val ud = graft.ops.Pin.pin(ev(s, dir)
        .select(col("user_id"), expr("us div 86400000000").as("d"))
        .distinct())
      val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("dau")).cast("long").as("sum_dau"))
      val mau = ud.select("user_id").distinct()
        .agg(count(lit(1)).as("mau"))
      dau.crossJoin(broadcast(mau)) // scalar aggregates — sanctioned
        .select(col("n_days"), col("sum_dau"), col("mau"),
          round(col("sum_dau").cast("double") /
            (col("n_days") * col("mau")).cast("double"), 6)
            .as("stickiness"))
    },

    // First-touch entry-point distribution — which door do users come
    // in through? Each user's FIRST event (argmin by (time, event_id)
    // as ONE struct-min aggregate — no window, no self-join, partial-
    // aggregated map-side) rolled up by type, with the cold-start share
    // (users whose very first event is already a purchase — the
    // attribution blind spot every funnel report footnotes). One
    // shuffle on the user key; |event types| rows.
    "q_entry_points" -> { (s, dir) =>
      val first = ev(s, dir)
        .groupBy("user_id")
        .agg(min(struct(col("us"), col("event_id"), col("event_type")))
          .as("f"))
        .select(col("f.event_type").as("first_type"))
      val tot = first.agg(count(lit(1)).as("n_users_total"))
      first.groupBy("first_type")
        .agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(tot)) // scalar aggregate — sanctioned
        .select(col("first_type"), col("n_users"),
          round(col("n_users").cast("double") /
            col("n_users_total").cast("double"), 6).as("share"))
        .orderBy("first_type")
    },

    // Linear multi-touch attribution — the equal-credit counterpart of
    // q_attribution's last-touch: every touchpoint in the hour BEFORE a
    // purchase shares the purchase value equally. The (purchase, touch)
    // pairs come from [[graft.ops.RangeJoin]]'s banded plan (equi-join
    // on (user, time-band); pair volume bounded by per-user temporal
    // locality, never per-user row products); the per-purchase touch
    // count is a window PARTITIONED BY the purchase id (each partition
    // = one purchase's touches). Credits divide once per pair as
    // doubles (identical in both engines), round to 6, and decimal-sum
    // per channel. Purchases with no preceding touch drop on both
    // engines alike (q_attribution's 'none' bucket covers them).
    "q_linear_attribution" -> { (s, dir) =>
      val e = ev(s, dir)
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("bid"), col("user_id").as("bu"),
          col("us").as("t_buy"), col("value"))
      val touches = e.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("tu"), col("us").as("t_touch"),
          col("event_type").as("touch_type"))
      val pairs = graft.ops.RangeJoin.banded(buys, touches,
        "bu", "tu", "t_buy", "t_touch", -3600L * 1000000L, -1L)
      val wB = Window.partitionBy("bid")
      pairs
        .withColumn("n_touches", count(lit(1)).over(wB))
        .withColumn("credit",
          round(col("value") / col("n_touches"), 6))
        .groupBy("touch_type")
        .agg(count(lit(1)).as("n_credits"),
          dsumPre(col("credit"), 6).as("credited_value"))
        .orderBy("touch_type")
    })

  val oracles: Map[String, String] = Map(
    "q_attribution" ->
      s"""WITH $evSql,
         |a AS (
         |  SELECT event_type, value,
         |    last_value(CASE WHEN event_type <> 'purchase'
         |                    THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY us, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS attr
         |  FROM ev)
         |SELECT COALESCE(attr, 'none') AS attributed,
         |  count(*) AS n_purchases,
         |  ${dsumSql("value")} AS sum_value
         |FROM a WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cume_distinct_users" ->
      s"""WITH $evSql,
         |f AS (SELECT user_id, min(us // $DayUs) AS day
         |      FROM ev GROUP BY 1),
         |d AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1)
         |SELECT day, n_new,
         |  CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cume_users
         |FROM d ORDER BY day""".stripMargin,

    "q_delete_propagation" ->
      s"""WITH $evSql,
         |a AS (
         |  SELECT 'events' AS table_name, count(*) AS n_rows,
         |    CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_deleted
         |  FROM ev
         |  UNION ALL
         |  SELECT 'customer', count(*),
         |    CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT)
         |  FROM customer
         |  UNION ALL
         |  SELECT 'orders', count(*),
         |    CAST(sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT)
         |  FROM orders)
         |SELECT table_name, n_rows, n_deleted,
         |  n_rows - n_deleted AS n_surviving
         |FROM a ORDER BY table_name""".stripMargin,

    "q_target_encoding" ->
      s"""WITH $evSql,
         |cat AS (
         |  SELECT event_type, (us // 3600000000) % 24 AS hod,
         |    count(*) AS n,
         |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
         |  FROM ev GROUP BY 1, 2),
         |g AS (
         |  SELECT count(*) AS gn,
         |    SUM(CAST(value AS DECIMAL(18,4))) AS gs
         |  FROM ev)
         |SELECT event_type, hod, n,
         |  round((CAST(sv AS DOUBLE) +
         |    100.0 * (CAST(gs AS DOUBLE) / gn)) / (n + 100.0), 6) AS enc
         |FROM cat, g
         |ORDER BY event_type, hod""".stripMargin,

    "q_ltv_deciles" ->
      s"""WITH $evSql,
         |l AS (
         |  SELECT user_id, SUM(CAST(value AS DECIMAL(18,4))) AS ltv
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
         |n AS (SELECT count(*) AS nu FROM l),
         |r AS (
         |  SELECT user_id, ltv,
         |    row_number() OVER (ORDER BY ltv DESC, user_id) - 1 AS idx
         |  FROM l)
         |SELECT CAST((idx * 10) // nu AS BIGINT) AS decile,
         |  count(*) AS n_users,
         |  CAST(SUM(ltv) AS DOUBLE) AS sum_ltv
         |FROM r, n
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rfm_segments" ->
      s"""WITH $evSql,
         |p AS (
         |  SELECT user_id, max(us) AS last_us, count(*) AS freq,
         |    SUM(CAST(value AS DECIMAL(18,4))) AS monetary
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
         |n AS (SELECT count(*) AS nu FROM p),
         |r AS (
         |  SELECT user_id, monetary,
         |    row_number() OVER (ORDER BY last_us DESC, user_id) - 1
         |      AS r_idx,
         |    row_number() OVER (ORDER BY freq DESC, user_id) - 1 AS f_idx,
         |    row_number() OVER (ORDER BY monetary DESC, user_id) - 1
         |      AS m_idx
         |  FROM p)
         |SELECT CAST((r_idx * 3) // nu AS BIGINT) AS r_code,
         |  CAST((f_idx * 3) // nu AS BIGINT) AS f_code,
         |  CAST((m_idx * 3) // nu AS BIGINT) AS m_code,
         |  count(*) AS n_users,
         |  CAST(SUM(monetary) AS DOUBLE) AS sum_monetary
         |FROM r, n
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_gini_ltv" ->
      s"""WITH $evSql,
         |l AS (
         |  SELECT user_id, SUM(CAST(value AS DECIMAL(18,4))) AS ltv
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
         |r AS (
         |  SELECT ltv,
         |    row_number() OVER (ORDER BY ltv, user_id) AS rn
         |  FROM l)
         |SELECT count(*) AS n_users,
         |  CAST(SUM(ltv) AS DOUBLE) AS total_ltv,
         |  round((2 * CAST(SUM(ltv * rn) AS DOUBLE) -
         |    (count(*) + 1) * CAST(SUM(ltv) AS DOUBLE)) /
         |    (count(*) * CAST(SUM(ltv) AS DOUBLE)), 6) AS gini
         |FROM r""".stripMargin,

    "q_engagement_bitmap" ->
      s"""WITH $evSql,
         |dd AS (SELECT user_id, us // 86400000000 AS d FROM ev),
         |m AS (
         |  SELECT user_id,
         |    bit_or(CAST(1 AS BIGINT) << CAST(d % 64 AS INT)) AS mask
         |  FROM dd GROUP BY user_id, d // 64),
         |a AS (
         |  SELECT user_id,
         |    CAST(sum(bit_count(mask)) AS BIGINT) AS active_days
         |  FROM m GROUP BY user_id)
         |SELECT active_days, count(*) AS n_users
         |FROM a
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_activity_streaks" ->
      s"""WITH $evSql,
         |d AS (
         |  SELECT DISTINCT user_id, us // 86400000000 AS d FROM ev),
        |i AS (
        |  SELECT user_id, d,
        |    d - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS grp
        |  FROM d),
        |st AS (
        |  SELECT user_id, count(*) AS len
        |  FROM i GROUP BY user_id, grp),
        |lg AS (
        |  SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
        |  FROM st GROUP BY user_id)
        |SELECT longest_streak, count(*) AS n_users
        |FROM lg
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_growth_accounting" ->
      s"""WITH $evSql,
         |ud AS (
         |  SELECT DISTINCT user_id, us // 86400000000 AS d FROM ev),
         |fd AS (SELECT user_id, min(d) AS fd FROM ud GROUP BY 1),
         |fl AS (
         |  SELECT ud.d,
         |    CASE WHEN fd.fd = ud.d THEN 1 ELSE 0 END AS is_new,
         |    CASE WHEN y.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_ret
         |  FROM ud
         |  JOIN fd ON ud.user_id = fd.user_id
         |  LEFT JOIN ud y ON ud.user_id = y.user_id
         |    AND y.d = ud.d - 1),
         |daily AS (
         |  SELECT d, count(*) AS active,
         |    CAST(SUM(is_new) AS BIGINT) AS new_users,
         |    CAST(SUM(is_ret) AS BIGINT) AS retained
         |  FROM fl GROUP BY d)
         |SELECT a.d AS epoch_day, a.active, a.new_users, a.retained,
         |  a.active - a.new_users - a.retained AS resurrected,
         |  CAST(COALESCE(p.active - a.retained, 0) AS BIGINT) AS churned
         |FROM daily a
         |LEFT JOIN daily p ON a.d = p.d + 1
         |ORDER BY epoch_day""".stripMargin,

    "q_user_power_law" ->
      s"""WITH $evSql,
         |cnt AS (
         |  SELECT user_id, count(*) AS cnt FROM ev GROUP BY user_id),
         |tots AS (
         |  SELECT count(*) AS n_users,
         |    CAST(sum(cnt) AS BIGINT) AS n_events FROM cnt),
         |rk AS (
         |  SELECT ln(CAST(row_number() OVER
         |      (ORDER BY cnt DESC, user_id) AS DOUBLE)) AS x,
         |    ln(CAST(cnt AS DOUBLE)) AS y
         |  FROM cnt ORDER BY cnt DESC, user_id LIMIT 100),
         |m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
         |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
         |  FROM rk)
         |SELECT tots.n_users, tots.n_events,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         |    AS power_slope
         |FROM tots, m""".stripMargin,

    "q_stickiness" ->
      s"""WITH $evSql,
         |ud AS (
         |  SELECT DISTINCT user_id, us // 86400000000 AS d FROM ev),
         |dau AS (
         |  SELECT count(*) AS n_days,
         |    CAST(SUM(dau) AS BIGINT) AS sum_dau FROM (
         |    SELECT d, count(*) AS dau FROM ud GROUP BY d)),
         |mau AS (
         |  SELECT count(*) AS mau FROM (
         |    SELECT DISTINCT user_id FROM ud))
         |SELECT n_days, sum_dau, mau,
         |  round(CAST(sum_dau AS DOUBLE) /
         |    CAST(n_days * mau AS DOUBLE), 6) AS stickiness
         |FROM dau, mau""".stripMargin,

    "q_entry_points" ->
      s"""WITH $evSql,
         |f AS (
         |  SELECT user_id,
         |    (min({'us': us, 'eid': event_id, 'et': event_type})).et
         |      AS first_type
         |  FROM ev GROUP BY user_id),
         |t AS (SELECT count(*) AS n_users_total FROM f)
         |SELECT first_type, count(*) AS n_users,
         |  round(CAST(count(*) AS DOUBLE) /
         |    (SELECT n_users_total FROM t), 6) AS share
         |FROM f
         |GROUP BY first_type
         |ORDER BY first_type""".stripMargin,

    "q_linear_attribution" ->
      s"""WITH $evSql,
         |b AS (
         |  SELECT event_id AS bid, user_id, us AS t_buy, value
         |  FROM ev WHERE event_type = 'purchase'),
         |t AS (
         |  SELECT user_id, us AS t_touch, event_type AS touch_type
         |  FROM ev WHERE event_type <> 'purchase'),
         |p AS (
         |  SELECT b.bid, b.value, t.touch_type
         |  FROM b JOIN t ON b.user_id = t.user_id
         |    AND t.t_touch >= b.t_buy - 3600000000
         |    AND t.t_touch <= b.t_buy - 1),
         |c AS (
         |  SELECT touch_type, value,
         |    count(*) OVER (PARTITION BY bid) AS n_touches
         |  FROM p)
         |SELECT touch_type, count(*) AS n_credits,
         |  CAST(SUM(CAST(round(value / n_touches, 6) AS DECIMAL(18,6)))
         |    AS DOUBLE) AS credited_value
         |FROM c
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
