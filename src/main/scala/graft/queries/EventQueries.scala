package graft.queries

import graft.operators.ChangeDetection
import graft.streaming.Windows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 S2 / §2.3 C1–C7 (change detection, watermark scans, dedup,
  * CDC latest-state) and the §7.2 windowed retail KPIs, as oracle-checked
  * batch queries over `events`. The streaming twins of these exact
  * aggregations run in `graft.streaming` (same builder functions) — batch
  * oracle parity here validates the shared logic.
  *
  * All timestamps are compared at second precision and bucketed at ≥30 min
  * granularity; the events table's sub-microsecond digits (see
  * `queries.table`) cannot affect any compared value.
  */
object EventQueries extends QueryPack {

  private val wmDefault = "2024-01-20 00:00:00"
  private val wmClick = "2024-01-25 00:00:00"
  private val wmView = "2024-01-28 00:00:00"

  /** S2 watermark probe: COUNT(*) + MAX(ts) newer than the watermark —
    * the exact change-detection SQL the reference generates per table
    * (`data_sources.py:138-142`). Predicate pushed in the raw-long
    * domain (see [[eventsAfter]]) so parquet row groups prune. */
  def s2WatermarkScan(s: SparkSession, dir: String): DataFrame =
    eventsAfter(s, dir, wmDefault)
      .agg(count(lit(1)).as("change_count"), fmtTs(max(col("ts"))).as("max_ts"))

  /** S2 incremental extraction: full rows newer than the watermark
    * (`data_sources.py:224-231` — `SELECT * WHERE ts > :last ORDER BY ts`).
    * The predicate reaches the parquet scan as a pushed filter. */
  def s2IncrementalExtract(s: SparkSession, dir: String): DataFrame =
    eventsAfter(s, dir, "2024-01-28 00:00:00")
      .withColumn("ts", fmtTs(col("ts")))
      .orderBy(col("event_id"))

  /** C3 multi-key change detection through the engine's
    * [[ChangeDetection.detectChanges]]: per-event-type watermarks (two
    * explicit, rest defaulted), one fused pass. */
  def c3DetectChanges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wm = Seq(("click", java.sql.Timestamp.valueOf(wmClick)),
      ("view", java.sql.Timestamp.valueOf(wmView)))
      .toDF("key", "last_ts")
    ChangeDetection.detectChanges(table(s, dir, "events"), "event_type", "ts",
        wm, ts(wmDefault))
      .withColumn("new_watermark", fmtTs(col("new_watermark")))
      .orderBy(col("event_type"))
  }

  /** C2 dedup of exact re-deliveries on the reference's composite key
    * (source:table:type:timestamp ≈ user:type:ts here) — result is the
    * surviving-row count vs total (`change_detection.py:93-134`). */
  def c2DedupEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    // project the dedup key BEFORE the operator: the distinct shuffle then
    // carries 3 columns, not whole rows (the count is key-only anyway)
    val kept = ChangeDetection.dedupExactRedeliveries(
      ev.select(col("user_id"), col("event_type"), col("ts")),
      Seq("user_id", "event_type"), "ts")
    kept.agg(count(lit(1)).as("unique_events"))
      .crossJoin(ev.agg(count(lit(1)).as("total_events")))
  }

  /** S3/C4 CDC latest-state: collapse the event log to the newest row per
    * user — the read-side MERGE of a changelog
    * (`data_sources.py:166-209`). */
  def cdcLatestState(s: SparkSession, dir: String): DataFrame =
    ChangeDetection.latestState(table(s, dir, "events"),
        Seq("user_id"), "ts", "event_id")
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("value").as("last_value"), fmtTs(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))

  /** Tumbling 1h revenue KPI (purchases only) — the streaming mart's
    * windowed aggregation, batch mode. */
  def wTumblingRevenue(s: SparkSession, dir: String): DataFrame =
    Windows.tumbling(
        table(s, dir, "events").filter(col("event_type") === "purchase"),
        "ts", "1 hour", Seq.empty,
        Seq(count(lit(1)).as("n_purchases"), decSum(col("value")).as("revenue")))
      .select(fmtTs(col("window_start")).as("window_start"),
        col("n_purchases"), col("revenue"))
      .orderBy(col("window_start"))

  /** Sliding 1h/30min activity KPI per event type. */
  def wSlidingActivity(s: SparkSession, dir: String): DataFrame =
    Windows.sliding(table(s, dir, "events"), "ts", "1 hour", "30 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value")))
      .select(fmtTs(col("window_start")).as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Batch twin of [[graft.streaming.Streams.trendingTopKSink]]:
    * tumbling 1-hour counts per user, top-5 per window ranked by
    * (count desc, user asc) through the SAME bounded-heap operator and
    * the same sort spec the sink uses per micro-batch — so the sink's
    * ranking semantics are hash-pinned by the DuckDB oracle, not just
    * spot-checked by the streaming test. One shuffle (the windowed
    * count); the heap ranks each window's items in a single pass with
    * O(k) state, never a per-window sort. */
  def wTrendingTopk(s: SparkSession, dir: String): DataFrame = {
    val counts = Windows.tumbling(table(s, dir, "events"), "ts", "1 hour",
      Seq(col("user_id")), Seq(count(lit(1)).as("n_events")))
    graft.plans.TopK.perKey(
        counts.select(col("window_start"), col("user_id"), col("n_events")),
        Seq("window_start"),
        Seq(graft.plans.TopK.desc("n_events"),
          graft.plans.TopK.asc("user_id")), 5)
      .select(fmtTs(col("window_start")).as("window_start"),
        col("user_id"), col("n_events"), col("rank"))
      .orderBy(col("window_start"), col("rank"))
  }

  /** Per-user session windows (30 min inactivity gap) — native
    * `session_window`, stateful in streaming mode. */
  def wSessionUser(s: SparkSession, dir: String): DataFrame =
    Windows.session(table(s, dir, "events"), "ts", "30 minutes",
        Seq(col("user_id")),
        Seq(count(lit(1)).as("n_events"), decSum(col("value")).as("session_value")))
      .select(col("user_id"), fmtTs(col("session_start")).as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** As-of join ([[graft.operators.AsOfJoin]]): each event annotated
    * with the user's latest order at or before the event time. Orders
    * are pre-collapsed to one row per (customer, date) so the as-of
    * match is deterministic; DuckDB's native ASOF LEFT JOIN is the
    * oracle. */
  def asofLastOrder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ords = ChangeDetection.latestState(
        table(s, dir, "orders"), Seq("o_custkey", "o_orderdate"),
        "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    AsOfJoin.asOf(ev, ords, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts"),
        col("o_orderkey").as("last_order_key"),
        col("o_totalprice").as("last_order_total"))
      .orderBy(col("event_id"))
  }

  /** Tolerance as-of join ([[graft.operators.AsOfJoin.asOfWithin]]):
    * each event carries the user's most recent purchase VALUE — but only
    * if that purchase happened within the last hour (stale matches null
    * out). Same one-shuffle carry-forward plan as the plain as-of; the
    * oracle is DuckDB's native ASOF LEFT JOIN plus the tolerance CASE. */
  def asofRecentPurchase(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purch = ChangeDetection.latestState(
        table(s, dir, "events").filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), "ts", "event_id")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    AsOfJoin.asOfWithin(ev, purch, "user_id", "ts", "p_ts",
        Seq("value"), toleranceSeconds = 3600L)
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts"),
        col("value").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Range join ([[graft.operators.RangeJoin]]): event values matched to
    * overlapping value bands via the bin equi-join (no nested-loop).
    * Result: per band, how many events and their value sum. */
  def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeJoin
    import s.implicits._
    val bands = (0 until 12).map(i => (i.toLong, i * 10.0, i * 10.0 + 25.0))
      .toDF("band_id", "lo", "hi")
    val ev = table(s, dir, "events")
      .select(col("event_id"), col("value"))
      .filter(col("value").isNotNull)
    RangeJoin.pointInInterval(ev, bands, "value", "lo", "hi", binWidth = 10.0)
      .groupBy(col("band_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("value_sum"))
      .orderBy(col("band_id"))
  }

  /** Skew-salted join ([[graft.operators.Skew.saltedJoin]]): events ⋈
    * customer salted 8 ways, then per-segment counts and value sums.
    * The oracle is the PLAIN join — salting must be invisible in the
    * result (the operator's exactness contract), pinned here at the
    * driver's hash-compare level, not just in a unit test. */
  def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Skew
    val ev = table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("value").isNotNull)
    val cust = table(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedJoin(ev, cust, "user_id", "event_id", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("value_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** Ordered funnel (view → click → purchase): each user's first view,
    * first click AFTER that view, first purchase AFTER that click, and
    * the funnel stage reached. Three whole-partition conditional MINs
    * over ONE user_id shuffle — the sequential dependency (each step's
    * predicate uses the previous step's timestamp) chains window
    * operators on the same partitioning, so no joins and no re-shuffle.
    * Strict `>` comparisons stay in the microsecond domain on both
    * engines (the oracle casts the raw nanosecond timestamps down). */
  def wFunnelSteps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("tv"), max(col("t2")).as("tc"),
        max(col("t3")).as("tp"))
      .select(col("user_id"),
        when(col("tp").isNotNull, lit(3))
          .when(col("tc").isNotNull, lit(2))
          .when(col("tv").isNotNull, lit(1))
          .otherwise(lit(0)).as("stage"),
        fmtTs(col("tv")).as("t_view"), fmtTs(col("tc")).as("t_click"),
        fmtTs(col("tp")).as("t_purchase"))
      .orderBy(col("user_id"))
  }

  /** JSON path extraction at scan time: pull `$.k` out of the props
    * JSON column and aggregate on it — `get_json_object` is codegen'd,
    * so the parse rides the scan (no UDF boundary, no second pass). */
  def jPropsExtract(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("value_sum"))
      .orderBy(col("k"))

  /** Retention cohorts: users grouped by first-seen week, counted in
    * each week they were active. Distinct (user, week) pairs are
    * built by aggregation (never `countDistinct`'s Expand rewrite —
    * after the pre-distinct, each pair is one row, so a plain count IS
    * the distinct-user count), and the cohort join carries only
    * (user → cohort). */
  def wRetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
      .select(col("user_id"), date_trunc("WEEK", col("ts")).as("week"))
    val active = ev.distinct()
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), col("week"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        date_format(col("week"), "yyyy-MM-dd").as("week"), col("n_users"))
      .orderBy(col("cohort_week"), col("week"))
  }

  /** Sequence-pattern matching over per-user event histories — the
    * MATCH_RECOGNIZE-lite / CEP primitive: each user's chronological
    * event types collapse to a letter string (one aggregate on the
    * user shuffle; order pinned by (ts, event_id) so both engines
    * build the identical string), then patterns are regex counts over
    * that string. Patterns here are chosen DETERMINISTIC across regex
    * engines (literal adjacency `vcp`, and `v[^p]*p` whose greedy run
    * cannot cross a `p` — leftmost-greedy Java and leftmost-longest
    * RE2 agree); alternation-ambiguous patterns would not port. Per
    * user the string is session-history-sized — at 100 TB you bound
    * it by windowing the input first (the w_session_user machinery);
    * the regex pass itself is map-side on one row per user. */
  def wPatternMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val letter = when($"event_type" === "view", "v")
      .when($"event_type" === "click", "c")
      .when($"event_type" === "purchase", "p")
      .when($"event_type" === "signup", "s")
      .otherwise("e")
    // re-pack compiled (round 15): the interpreted
    // sort_array + transform spelling ran two lambdas per EVENT of the
    // corpus post-shuffle; sort_array(asc) and array_sort differ only
    // in null-ELEMENT placement, which concat skips either way — the
    // native expression is the pinned twin of both spellings
    val seqs = table(s, dir, "events")
      .select($"user_id", struct($"ts", $"event_id", letter.as("l")).as("e"))
      .groupBy($"user_id")
      .agg(graft.functions.NativeText.sortedStructConcat(
        collect_list($"e"), "").as("seq"))
    seqs.select($"user_id",
        length($"seq").as("n_events"),
        expr("regexp_count(seq, 'vcp')").as("n_vcp_adjacent"),
        expr("regexp_count(seq, 'v[^p]*p')").as("n_view_to_purchase"))
      .withColumn("converted", $"n_view_to_purchase" > 0)
      .orderBy($"user_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "w_pattern_match" -> (wPatternMatch _),
    "w_retention_cohorts" -> (wRetentionCohorts _),
    "w_funnel_steps" -> (wFunnelSteps _),
    "j_props_extract" -> (jPropsExtract _),
    "skew_salted_join" -> (skewSaltedJoin _),
    "range_join_bands" -> (rangeJoinBands _),
    "asof_last_order" -> (asofLastOrder _),
    "asof_recent_purchase" -> (asofRecentPurchase _),
    "s2_watermark_scan" -> (s2WatermarkScan _),
    "s2_incremental_extract" -> (s2IncrementalExtract _),
    "c3_detect_changes" -> (c3DetectChanges _),
    "c2_dedup_events" -> (c2DedupEvents _),
    "cdc_latest_state" -> (cdcLatestState _),
    "w_tumbling_revenue" -> (wTumblingRevenue _),
    "w_sliding_activity" -> (wSlidingActivity _),
    "w_trending_topk" -> (wTrendingTopk _),
    "w_session_user" -> (wSessionUser _))

  val oracles: Map[String, String] = Map(
    // wPatternMatch twin: string_agg with the same (ts, event_id)
    // order; len(regexp_extract_all) is DuckDB's regexp_count
    "w_pattern_match" -> """
      WITH l AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END AS letter
        FROM events),
      s AS (
        SELECT user_id,
               string_agg(letter, '' ORDER BY ts, event_id) AS seq
        FROM l GROUP BY user_id)
      SELECT user_id,
             CAST(length(seq) AS INT) AS n_events,
             CAST(len(regexp_extract_all(seq, 'vcp')) AS INT)
               AS n_vcp_adjacent,
             CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INT)
               AS n_view_to_purchase,
             len(regexp_extract_all(seq, 'v[^p]*p')) > 0 AS converted
      FROM s ORDER BY user_id""",
    "w_retention_cohorts" -> """
      WITH e AS (
        SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
        FROM events),
      active AS (SELECT DISTINCT user_id, week FROM e),
      cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1)
      SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
             strftime(a.week, '%Y-%m-%d') AS week,
             COUNT(*) AS n_users
      FROM active a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY c.cohort_week, a.week
      ORDER BY cohort_week, week""",
    "w_funnel_steps" -> s"""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      w1 AS (
        SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM e GROUP BY user_id),
      w2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM e JOIN w1 ON e.user_id = w1.user_id
        WHERE e.event_type = 'click' AND e.ts > w1.t1
        GROUP BY e.user_id),
      w3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM e JOIN w2 ON e.user_id = w2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > w2.t2
        GROUP BY e.user_id)
      SELECT u.user_id,
             CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1
                  ELSE 0 END AS stage,
             ${fmtTsSql("t1")} AS t_view,
             ${fmtTsSql("t2")} AS t_click,
             ${fmtTsSql("t3")} AS t_purchase
      FROM (SELECT DISTINCT user_id FROM e) u
      LEFT JOIN w1 ON u.user_id = w1.user_id
      LEFT JOIN w2 ON u.user_id = w2.user_id
      LEFT JOIN w3 ON u.user_id = w3.user_id
      ORDER BY u.user_id""",
    "j_props_extract" -> s"""
      SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
             COUNT(*) AS n_events,
             ${decSumSql("value")} AS value_sum
      FROM events
      GROUP BY 1
      ORDER BY k""",
    "skew_salted_join" -> s"""
      SELECT c.c_mktsegment, COUNT(*) AS n_events,
             ${decSumSql("e.value")} AS value_sum
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.value IS NOT NULL
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment""",
    "range_join_bands" -> s"""
      WITH bands AS (
        SELECT i AS band_id, i * 10.0 AS lo, i * 10.0 + 25.0 AS hi
        FROM (SELECT UNNEST(range(0, 12)) AS i))
      SELECT b.band_id, b.lo, b.hi, COUNT(*) AS n_events,
             ${decSumSql("e.value")} AS value_sum
      FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
      WHERE e.value IS NOT NULL
      GROUP BY b.band_id, b.lo, b.hi
      ORDER BY b.band_id""",
    "asof_last_order" -> """
      WITH ords AS (
        SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
          SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1)
      SELECT e.event_id, e.user_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             o.o_orderkey AS last_order_key,
             o.o_totalprice AS last_order_total
      FROM events e ASOF LEFT JOIN ords o
        ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
      ORDER BY e.event_id""",
    "asof_recent_purchase" -> """
      WITH purch AS (
        SELECT user_id, ts AS p_ts, value FROM (
          SELECT user_id, ts, value,
                 row_number() OVER (PARTITION BY user_id, ts
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE event_type = 'purchase') WHERE rn = 1)
      SELECT e.event_id, e.user_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             CASE WHEN p.p_ts IS NOT NULL
                   AND date_diff('second', p.p_ts, e.ts) <= 3600
                  THEN p.value ELSE NULL END AS last_purchase_value
      FROM events e ASOF LEFT JOIN purch p
        ON e.user_id = p.user_id AND e.ts >= p.p_ts
      ORDER BY e.event_id""",
    "s2_watermark_scan" -> s"""
      SELECT COUNT(*) AS change_count,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
      FROM events WHERE ts > TIMESTAMP '$wmDefault'""",
    "s2_incremental_extract" -> """
      SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id,
             event_type, value, props
      FROM events WHERE ts > TIMESTAMP '2024-01-28 00:00:00'
      ORDER BY event_id""",
    "c3_detect_changes" -> s"""
      WITH wm AS (
        SELECT event_type,
          CASE event_type
            WHEN 'click' THEN TIMESTAMP '$wmClick'
            WHEN 'view' THEN TIMESTAMP '$wmView'
            ELSE TIMESTAMP '$wmDefault' END AS last_ts
        FROM (SELECT DISTINCT event_type FROM events))
      SELECT e.event_type, COUNT(*) AS change_count,
             strftime(MAX(e.ts), '%Y-%m-%d %H:%M:%S') AS new_watermark
      FROM events e JOIN wm ON e.event_type = wm.event_type
      WHERE e.ts > wm.last_ts
      GROUP BY e.event_type ORDER BY e.event_type""",
    "c2_dedup_events" -> """
      SELECT (SELECT COUNT(*) FROM (
                SELECT DISTINCT user_id, event_type, date_trunc('millisecond', ts)
                FROM events)) AS unique_events,
             (SELECT COUNT(*) FROM events) AS total_events""",
    "cdc_latest_state" -> """
      SELECT user_id, event_type AS last_event_type, value AS last_value,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
      FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id
              ORDER BY date_trunc('millisecond', ts) DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id""",
    "w_tumbling_revenue" -> s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             COUNT(*) AS n_purchases,
             ${decSumSql("value")} AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY date_trunc('hour', ts)
      ORDER BY window_start""",
    "w_sliding_activity" -> s"""
      SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - k.off, '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events,
             ${decSumSql("value")} AS total_value
      FROM events
      CROSS JOIN (SELECT INTERVAL '0 minutes' AS off
                  UNION ALL SELECT INTERVAL '30 minutes') k
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "w_trending_topk" -> """
      SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
             user_id, n_events, CAST(rnk AS INT) AS rank
      FROM (
        SELECT ws, user_id, n_events,
               row_number() OVER (PARTITION BY ws
                 ORDER BY n_events DESC, user_id) AS rnk
        FROM (SELECT date_trunc('hour', ts) AS ws, user_id,
                     COUNT(*) AS n_events
              FROM events GROUP BY 1, 2))
      WHERE rnk <= 5
      ORDER BY window_start, rank""",
    "w_session_user" -> s"""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts, value,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT user_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events,
             ${decSumSql("value")} AS session_value
      FROM sessions GROUP BY user_id, session_id
      ORDER BY user_id, session_start""")
}
