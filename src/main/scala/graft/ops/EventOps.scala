package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Event-sequence operators over the `events` table: sessionization,
  * as-of join, latest-record-per-key. These are the batch duals of the
  * reference's streaming windowing (SparkApplication.scala:88) and the
  * operators a log/telemetry pipeline needs at scale.
  */
object EventOps {

  /** As-of join, composed from built-ins (no O(n·m) range join):
    * for each left ("probe") row, attach the most recent strictly-earlier
    * right ("quote") row sharing the key.
    *
    * Implementation: tag both sides, UNION ALL, one shuffle+sort per key on
    * (ts, side), then `last(value, ignoreNulls)` over the preceding-rows
    * frame carries the latest right value forward. Probe rows sort before
    * quote rows at equal timestamps, so the match is strictly `right.ts <
    * left.ts`. Cost: ONE shuffle of |L|+|R| rows — versus the
    * broadcast-nested-loop a naive `l.ts > r.ts` join would plan. This is
    * the standard scalable formulation; skewed keys can be salted upstream.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           carry: String, leftCols: Seq[String]): DataFrame = {
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"), lit(0).as("_side"),
      lit(null).cast(right.schema(carry).dataType).as("_carry"),
      struct(leftCols.map(col): _*).as("_row"))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"), lit(1).as("_side"),
      col(carry).as("_carry"), lit(null).cast(l.schema("_row").dataType).as("_row"))
    // _carry as the final sort key: ties of (key, ts) among right rows
    // would otherwise resolve by partition order (nondeterministic).
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").asc, col("_carry").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    l.union(r)
      .withColumn("_asof", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select((leftCols.map(c => col(s"_row.$c").as(c)) :+ col("_asof")): _*)
  }

  /** Each purchase event joined to the user's most recent prior signup. */
  def q46AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    asOf(purchases, signups, "user_id", "ts", "ts",
      Seq("event_id", "user_id", "ts"))
      .withColumnRenamed("_asof", "last_signup_ts")
      .orderBy(col("event_id"))
  }

  val q46Sql: String =
    """SELECT p.event_id, p.user_id, p.ts, s.ts AS last_signup_ts
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
         ON p.user_id = s.user_id AND p.ts > s.ts
       ORDER BY p.event_id"""

  /** Batch sessionization: a >30-minute gap starts a new session; emit one
    * row per session. lag → boundary flag → running sum = session id, then
    * reaggregate. Two window passes + one aggregate, all on the same
    * user_id partitioning (Spark reuses the exchange).
    */
  def q47Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        // Exact microsecond gap on both engines (CAST ts AS LONG truncates
        // subseconds in Spark while DuckDB epoch() is fractional — a
        // boundary-straddling gap would split differently).
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_seq", sum(col("new_sess")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"),
        expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("sess_value"))
      .orderBy(col("user_id"), col("sess_seq"))
  }

  val q47Sql: String =
    """WITH flagged AS (
         SELECT user_id, event_id, ts, value,
                CASE WHEN LAG(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       ), numbered AS (
         SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
         FROM flagged)
       SELECT user_id, sess_seq, COUNT(*) AS n_events,
              MIN(ts) AS sess_start, MAX(ts) AS sess_end,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sess_value
       FROM numbered GROUP BY user_id, sess_seq
       ORDER BY user_id, sess_seq"""

  /** Latest record per key (the dedup-to-current-state operator every CDC /
    * log pipeline needs): row_number desc = 1. Spark plans the filter as a
    * WindowGroupLimit, so each partition keeps a 1-row heap instead of
    * fully sorting.
    */
  def q48LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("user_id"))
  }

  val q48Sql: String =
    """SELECT user_id, event_id, ts, event_type FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM events) WHERE rn = 1
       ORDER BY user_id"""

  /** Tumbling-window batch aggregate over event time — the batch dual of
    * the streaming `window()` aggregation (15-min windows like the
    * reference's, on the events table).
    */
  def q49TumblingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))
      .orderBy(col("w_start"), col("event_type"))

  val q49Sql: String =
    """SELECT time_bucket(INTERVAL 15 MINUTES, ts) AS w_start, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""

  /** Native session windows (30-min gap) in batch — the same operator the
    * streaming side uses with a watermark. Spark merges events whose gaps
    * are < the timeout; window.end = last event + gap. The oracle
    * reproduces that with the lag/cumsum formulation (q47's), proving the
    * two sessionization paths agree.
    */
  def q38SessionWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))

  val q38Sql: String =
    """WITH flagged AS (
         SELECT user_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
       ), numbered AS (
         SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq
         FROM flagged)
       SELECT user_id, MIN(ts) AS sess_start,
              MAX(ts) + INTERVAL 30 MINUTES AS sess_end, COUNT(*) AS n_events
       FROM numbered GROUP BY user_id, sess_seq
       ORDER BY user_id, sess_start"""

  /** CDC-style snapshot diff: per-user latest state (q48's deterministic
    * latest-per-key) as of T1 vs as of T2, full-outer joined on the key
    * and classified `added` / `changed` / `unchanged` (`removed` is
    * impossible in an append-only log but falls out of the same
    * expression). This is the nightly "what moved since the last
    * snapshot" report. Scale shape: one window shuffle per snapshot on
    * user_id, then the full-outer join reuses that same partitioning —
    * the diff costs no extra exchange over computing the two snapshots.
    */
  def q97SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val t1 = "2024-01-15 00:00:00"
    def snap(asOf: String) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .filter(col("ts") <= lit(asOf).cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"))
    }
    val oldS = snap(t1).select(col("user_id"), col("event_id").as("old_event_id"))
    val newS = snap("2024-12-31 00:00:00")
      .select(col("user_id"), col("event_id").as("new_event_id"))
    oldS.join(newS, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("old_event_id").isNull, "added")
          .when(col("new_event_id").isNull, "removed")
          .when(col("old_event_id") =!= col("new_event_id"), "changed")
          .otherwise("unchanged").as("change"),
        coalesce(col("old_event_id"), lit(-1L)).as("old_event_id"),
        coalesce(col("new_event_id"), lit(-1L)).as("new_event_id"))
      .orderBy(col("user_id"))
  }

  val q97Sql: String =
    """WITH old_s AS (
         SELECT user_id, event_id AS old_event_id FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
       new_s AS (
         SELECT user_id, event_id AS new_event_id FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts <= TIMESTAMP '2024-12-31 00:00:00') WHERE rn = 1)
       SELECT COALESCE(o.user_id, n.user_id) AS user_id,
              CASE WHEN o.user_id IS NULL THEN 'added'
                   WHEN n.user_id IS NULL THEN 'removed'
                   WHEN o.old_event_id <> n.new_event_id THEN 'changed'
                   ELSE 'unchanged' END AS change,
              COALESCE(o.old_event_id, -1) AS old_event_id,
              COALESCE(n.new_event_id, -1) AS new_event_id
       FROM old_s o FULL JOIN new_s n ON o.user_id = n.user_id
       ORDER BY user_id"""

  /** Ordered funnel conversion (view → click → purchase): per user, each
    * stage's timestamp is the MIN event time STRICTLY AFTER the previous
    * stage was reached — the standard product-analytics funnel where
    * out-of-order events don't count. Output is the three-row funnel
    * report: users reaching each stage and conversion vs stage 1.
    *
    * Scale shape: three filtered partial-aggregated groupBys on user_id,
    * chained by per-user hash joins (the user dimension is tiny relative
    * to the event log — at 100 TB of events the joins stay key joins on
    * the aggregated frames, never on raw events). Counts are exact; the
    * single division per row rounds once.
    */
  def q112EventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit(1L))
      .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("stage", lit(2L)))
      .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("stage", lit(3L)))
    val base = s1.agg(count(lit(1)).as("n1"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("n").as("n_users"),
        round(col("n").cast("double") / col("n1"), 6).as("conv_r"))
      .orderBy(col("stage"))
  }

  val q112Sql: String =
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN s1 USING (user_id)
              WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
       s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN s2 USING (user_id)
              WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id),
       counts AS (SELECT CAST(1 AS BIGINT) AS stage, COUNT(*) AS n FROM s1
                  UNION ALL SELECT 2, COUNT(*) FROM s2
                  UNION ALL SELECT 3, COUNT(*) FROM s3)
       SELECT stage, n AS n_users,
              ROUND(CAST(n AS DOUBLE) / (SELECT COUNT(*) FROM s1), 6) AS conv_r
       FROM counts ORDER BY stage"""

  /** Weekly retention cohorts: users grouped by first-seen week, the
    * classic (cohort × week-offset) retention triangle with per-cell
    * distinct-user counts and the rate against cohort size. Weeks are
    * Monday-truncated in both engines; the offset is exact integer day
    * arithmetic (never timestamp subtraction).
    *
    * Scale shape: first-seen is one partial-aggregated min per user;
    * (user, week) activity is a distinct over a projected pair; the
    * cohort join keys on user_id; the final cell aggregation is
    * partial-aggregated on (cohort_week, week_offset). Nothing touches
    * raw-event granularity after the first two aggregations.
    */
  def q113RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val first = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val sizes = first.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    val active = ev.select(col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("activity_week")).distinct()
    active.join(first, "user_id")
      .withColumn("week_offset",
        (datediff(col("activity_week"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention_r"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q113Sql: String =
    """WITH first AS (SELECT user_id,
                    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
             FROM events GROUP BY user_id),
       sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM first GROUP BY 1),
       active AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('week', ts) AS DATE) AS activity_week
                  FROM events)
       SELECT f.cohort_week AS cohort_week,
              CAST(date_diff('day', f.cohort_week, a.activity_week) // 7 AS BIGINT) AS week_offset,
              COUNT(*) AS n_active,
              ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(s.cohort_size), 6) AS retention_r
       FROM active a JOIN first f USING (user_id)
            JOIN sizes s ON f.cohort_week = s.cohort_week
       GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""

  /** Time-series subsequence pattern scan — distributed profile-style
    * matching (the streaming-similarity-search family, e.g. Time Series
    * Similarity Search for Streaming Data in Distributed Systems,
    * EDBT'19): find the k windows of the per-user `value` series closest
    * to a fixed query pattern of length m, under mean-centered Euclidean
    * distance computed in EXACT integer arithmetic so both engines rank
    * identically:
    *
    *   dist = Σ_i ((m·x_i − Sx) − (m·q_i − Sq))²   over cents (value·100),
    *
    * which is m² times the distance between the mean-centered series —
    * rank-equivalent to mean-centered Euclidean with no division and no
    * sqrt (the two float ops whose libm rounding could diverge; full
    * z-normalization would need a sqrt of the window variance, so the
    * amplitude-invariant variant is deliberately out of the oracle-exact
    * surface).
    *
    * Scale: one shuffle partitions by user_id; the sliding window carries
    * an m-bounded frame (collect_list over ROWS BETWEEN CURRENT AND m-1
    * FOLLOWING — never a series-sized array); the distance is per-row
    * arithmetic on the m-array; the global top-k is
    * TakeOrderedAndProject. Overflow headroom: |m·x| ≤ 8·~50k cents ≈
    * 4e5, squared 1.6e11, times m = 1.3e12 — far inside BIGINT.
    */
  def patternScan(events: DataFrame, pattern: Seq[Long], k: Int = 10): DataFrame = {
    val m = pattern.length
    val sq = pattern.sum
    val qlit = pattern.mkString("array(", "L, ", "L)")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, m - 1)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .withColumn("arr", collect_list(col("cents")).over(w))
      .filter(size(col("arr")) === m)
      .withColumn("sx", expr("aggregate(arr, 0L, (a, v) -> a + v)"))
      .withColumn("dist", expr(
        s"""aggregate(zip_with(arr, $qlit,
                               (x, q) -> ($m * x - sx - ($m * q - ${sq}L))
                                         * ($m * x - sx - ($m * q - ${sq}L))),
                      0L, (a, v) -> a + v)"""))
      .orderBy(col("dist"), col("user_id"), col("event_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("dist"), col("user_id"), col("event_id"))).cast("long"))
      .select(col("rank"), col("user_id"), col("event_id").as("start_id"), col("dist"))
      .orderBy(col("rank"))
  }

  /** A spike-shaped demo pattern in cents (rise to 200, fall back). */
  private val spikePattern: Seq[Long] =
    Seq(10000L, 12000L, 15000L, 20000L, 15000L, 12000L, 10000L, 9000L)

  def q126PatternScan(s: SparkSession, dir: String): DataFrame =
    patternScan(t(s, dir, "events"), spikePattern)

  val q126Sql: String =
    """WITH e AS (SELECT user_id, event_id, ts,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
       w AS (SELECT user_id, event_id,
                    list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS arr
             FROM e),
       f AS (SELECT user_id, event_id, arr,
                    list_reduce(arr, (a, v) -> a + v) AS sx
             FROM w WHERE len(arr) = 8),
       q AS (SELECT [10000, 12000, 15000, 20000, 15000, 12000, 10000, 9000]::BIGINT[] AS ql,
                    103000::BIGINT AS sq),
       d AS (SELECT user_id, event_id AS start_id,
                    list_reduce([(8 * arr[i] - sx - (8 * ql[i] - sq))
                                 * (8 * arr[i] - sx - (8 * ql[i] - sq))
                                 FOR i IN generate_series(1, 8)],
                                (a, v) -> a + v) AS dist
             FROM f, q)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist, user_id, start_id) AS BIGINT) AS rank,
              user_id, start_id, dist
       FROM d ORDER BY dist, user_id, start_id LIMIT 10"""

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral fingerprint product analytics derives next to funnels
    * ([[q112EventFunnel]]): for each (from, to) event-type pair, the
    * transition count and its probability among all transitions leaving
    * `from`.
    *
    * Scale shape: ONE shuffle partitions events by user_id for the lead()
    * pass; the per-pair aggregation is partial-aggregated on a key space
    * of |types|² (25 here) — the row-share window at the end runs on that
    * tiny aggregated frame, never on raw events. The probability divides
    * once and rounds once.
    */
  def q132TransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = t(s, dir, "events")
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p_r", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q132Sql: String =
    """WITH seq AS (SELECT event_type AS from_type,
                         LEAD(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts ASC, event_id ASC) AS to_type
                  FROM events),
       c AS (SELECT from_type, to_type, COUNT(*) AS n FROM seq
             WHERE to_type IS NOT NULL GROUP BY 1, 2)
       SELECT from_type, to_type, n,
              ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p_r
       FROM c ORDER BY from_type, to_type"""

  /** Slowly-changing-dimension (type 2) history build from the raw event
    * log — the CDC operator that turns an append-only stream into a
    * versioned dimension: collapse each user's consecutive runs of equal
    * state (event_type here), emit one row per run with
    * [valid_from, valid_to) validity, a per-user version number, and an
    * is_current flag on the open row. The dual of [[q48LatestPerKey]]
    * (which keeps ONLY the current row).
    *
    * Scale shape: everything runs on ONE user_id partitioning — the lag
    * (change detection), the lead (interval close), and the row_number
    * (versioning) reuse the same exchange+sort, and Spark plans exactly
    * one shuffle. No self-join against the history table, which is the
    * naive SCD2 build that re-reads the dimension per batch.
    */
  def q133Scd2History(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val byUserChanges = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("prev_state", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("event_id"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byUserChanges))
      .withColumn("version", row_number().over(byUserChanges).cast("long"))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q133Sql: String =
    """WITH flagged AS (
         SELECT user_id, event_id, ts, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS prev_state
         FROM events),
       runs AS (SELECT user_id, event_type AS state, ts AS valid_from, event_id
                FROM flagged
                WHERE prev_state IS NULL OR prev_state <> event_type)
       SELECT user_id,
              CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
              state, valid_from,
              LEAD(valid_from) OVER w AS valid_to,
              LEAD(valid_from) OVER w IS NULL AS is_current
       FROM runs
       WINDOW w AS (PARTITION BY user_id ORDER BY valid_from ASC, event_id ASC)
       ORDER BY user_id, version"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_transition_matrix" -> (q132TransitionMatrix _),
    "q133_scd2_history" -> (q133Scd2History _),
    "q126_pattern_scan" -> (q126PatternScan _),
    "q112_event_funnel" -> (q112EventFunnel _),
    "q113_retention_cohorts" -> (q113RetentionCohorts _),
    "q38_session_window" -> (q38SessionWindow _),
    "q46_asof_join" -> (q46AsofJoin _),
    "q47_sessionize" -> (q47Sessionize _),
    "q48_latest_per_key" -> (q48LatestPerKey _),
    "q49_tumbling_window" -> (q49TumblingWindow _),
    "q97_snapshot_diff" -> (q97SnapshotDiff _))

  val oracle: Map[String, String] = Map(
    "q132_transition_matrix" -> q132Sql,
    "q133_scd2_history" -> q133Sql,
    "q126_pattern_scan" -> q126Sql,
    "q112_event_funnel" -> q112Sql,
    "q113_retention_cohorts" -> q113Sql,
    "q38_session_window" -> q38Sql,
    "q46_asof_join" -> q46Sql,
    "q47_sessionize" -> q47Sql,
    "q48_latest_per_key" -> q48Sql,
    "q49_tumbling_window" -> q49Sql,
    "q97_snapshot_diff" -> q97Sql)
}
