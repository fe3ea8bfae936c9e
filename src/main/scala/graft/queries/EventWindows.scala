package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Exact._
import graft.Tables

/** Event-time windowing over the `events` table, in BATCH mode.
  *
  * The reference is strictly batch (job runs to DONE and exits,
  * coordinator.go:136-140), so these run as batch `window()` /
  * `session_window()` aggregations (SURVEY.md §1.3). The same
  * transformations run unchanged under `readStream` — see
  * `graft.streaming` for the watermarked streaming variants.
  *
  * Scale: window() compiles to an ordinary hash aggregation keyed on
  * (window, ...) — partial+final, no global sort; session_window uses
  * the sort-based session merge within user_id partitions, which
  * scales as long as a single user's events fit a partition (true for
  * any sane user cardinality; salting by day would be the escape
  * hatch).
  */
object EventWindows {

  /** Tumbling 1-hour windows per event_type. */
  def hourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"), col("n_users"))

  /** Sliding windows: 1-hour length, 30-minute slide (each event lands
    * in exactly two windows).
    */
  def sliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Session windows per user: 30-minute inactivity gap. A new event
    * at t extends the session to t+gap; the next event merges iff it
    * arrives strictly before that end.
    */
  def sessions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"),
        max(col("ts")).as("last_ts"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("session_value"), col("last_ts"))

  /** Session entry/exit transition matrix — the product-analytics
    * counterpart of [[sessions]], built on GAP-BASED sessionization
    * (lag + running sum of session-break flags — the classic
    * two-window construction, vs [[sessions]]' `session_window`):
    * events more than 30 minutes apart start a new session; each
    * session reports its first and last page (`props.$k`), and the
    * output aggregates sessions per (entry_page, exit_page) with the
    * bounce count (single-event sessions; entry = exit by
    * construction). Timestamps compare as exact epoch MICROSECONDS
    * (`unix_micros` / DuckDB `epoch_us`) — second-truncation would
    * misclassify sub-second gaps differently per engine.
    *
    * Scale: both windows and the per-session aggregation ride ONE
    * hash partitioning on user_id (the session key); the final
    * (entry, exit) matrix is page² rows — tiny.
    */
  def entryExit(spark: SparkSession, sfDir: String): DataFrame =
    entryExitOf(Tables.events(spark, sfDir))

  /** Core over any (user_id, ts, event_id, props) frame. */
  def entryExitOf(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val asc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts"), col("event_id"))
    val desc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("page"))
      .withColumn("gap_us",
        Tables.epochMicros(col("ts"))
          - lag(Tables.epochMicros(col("ts")), 1).over(byUser))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id",
        sum(col("brk")).over(byUser.rowsBetween(Long.MinValue, 0)))
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(max(when(col("rn_a") === 1, col("page"))).as("entry_page"),
        max(when(col("rn_d") === 1, col("page"))).as("exit_page"),
        count(lit(1)).as("n_events"))
      .groupBy(col("entry_page"), col("exit_page"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
  }

  /** Hour-of-day profile — scalar time extraction + agg. */
  def hourOfDay(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(hour(col("ts")).as("hod"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  /** Semi-structured access: extract `$.k` from the JSON props column.
    * At scale this stays in codegen (`get_json_object` is a native
    * expression) — no UDF.
    */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Three-step conversion funnel (view → click → purchase, strictly
    * time-ordered per user): stage timestamps are unordered-frame
    * window minima chained per user — all three share one hash
    * partitioning on user_id, so the whole funnel costs a single
    * exchange plus one final global aggregate. No per-user UDF, no
    * event-sequence collect.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .withColumn("v", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts") > col("v"), col("ts"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts") > col("c"), col("ts"))).over(w))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("v").isNotNull, col("user_id"))).as("n_view"),
        countDistinct(when(col("c").isNotNull, col("user_id"))).as("n_view_click"),
        countDistinct(when(col("p").isNotNull, col("user_id"))).as("n_full_funnel"))
  }

  /** Daily retention cohorts: users grouped by first-active day, with
    * day-1 and day-7 return counts. One distinct (user, day) pass,
    * one window for the cohort day, one aggregate — no self-join of
    * the activity table.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("day") === date_add(col("cohort_day"), 1),
          col("user_id"))).as("n_d1"),
        countDistinct(when(col("day") === date_add(col("cohort_day"), 7),
          col("user_id"))).as("n_d7"))
      // emit the day as midnight-UTC timestamp: every other date in
      // the suite flows as timestamp[us], and a date32 column hits
      // engine-dependent pandas representations in the compare
      .select(col("cohort_day").cast("timestamp").as("cohort_day"),
        col("n_users"), col("n_d1"), col("n_d7"))
  }

  /** Exponentially weighted moving average of the hourly event count
    * per event_type, over a trailing 8-observation window with DYADIC
    * weights 2^(7-j) (newest = 128 … oldest = 1). Powers of two keep
    * the weighted numerator an exact BIGINT — `Σ lag_j · 2^(7-j)` —
    * so the EWMA is one terminal division of exact integers instead
    * of a float recurrence (which is partition-order-dependent and
    * not expressible as a frame anyway). The denominator counts only
    * the weights of PRESENT lags, so the head of each series is a
    * proper partial average, not damped toward zero.
    *
    * Scale: one hash aggregation to hourly counts, then a per-type
    * window sort — series length is hours, not events, so the sorted
    * partitions are tiny no matter the corpus size.
    */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
    val terms = (0 to 7).map { j =>
      val l = if (j == 0) col("cnt") else lag(col("cnt"), j).over(byType)
      (coalesce(l, lit(0L)) * lit(1L << (7 - j)),
        when(l.isNotNull, lit(1L << (7 - j))).otherwise(lit(0L)))
    }
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("hour"), col("event_type"), col("cnt"),
        terms.map(_._1).reduce(_ + _).as("wsum"),
        terms.map(_._2).reduce(_ + _).as("wtot"))
      .select(col("hour"), col("event_type"), col("cnt"), col("wsum"), col("wtot"),
        (col("wsum").cast("double") / col("wtot")).as("ewma"))
  }

  /** Trailing-window z-score anomaly detection over the GAP-FILLED
    * hourly series: each (event_type, hour) bucket is compared to its
    * previous 24 buckets. The series is densified on the corpus's
    * hour spine first (cnt = 0 where nothing happened) — a ROWS frame
    * over the sparse series would silently span gaps, and a traffic
    * drop to ZERO (the classic incident signal) could never be
    * flagged because the missing bucket never entered the series.
    * All moments are exact BIGINT sums over the frame (counts are
    * integers), so mean/variance reduce to a fixed sequence of IEEE
    * divisions — deterministic cross-engine, the same discipline as
    * [[ewma]]'s dyadic integer weights. Rows need ≥ 12 trailing
    * buckets (half a day of history) and non-degenerate variance;
    * |z| ≥ 3 flags the bucket.
    *
    * Scale: the spine is generated from a one-row bounds aggregate
    * (O(hours × types) rows, never O(events)); the window then rides
    * a single event_type-keyed exchange and each frame is ≤ 24 rows
    * of integer pairs.
    */
  def anomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val variance = ((col("s2").cast("double")
      - col("s1").cast("double") * col("s1").cast("double") / nd)
      / (nd - lit(1.0)))
    val ev = Tables.events(spark, sfDir)
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds.select(explode(
      sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    spine.crossJoin(types)
      .join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .select(col("hour"), col("event_type"), col("cnt"),
        count(col("cnt")).over(w).as("n"),
        sum(col("cnt")).over(w).as("s1"),
        sum(col("cnt") * col("cnt")).over(w).as("s2"))
      .filter(col("n") >= 12)
      .select(col("hour"), col("event_type"), col("cnt"),
        mean.as("mean"), variance.as("variance"))
      .filter(col("variance") > 0)
      .withColumn("z",
        (col("cnt").cast("double") - col("mean")) / sqrt(col("variance")))
      .withColumn("is_anomaly", abs(col("z")) >= 3.0)
  }

  /** Max / end-of-hour CONCURRENT sessions per hour — the sweep-line
    * interval aggregation (how many user sessions are open at once):
    * each gap-sessionized session [first, last event] becomes a +1
    * delta at its start and a −1 just after its end (closed
    * interval), and concurrency at t is the running sum of deltas
    * ≤ t. Naively that running sum is ONE global sort — a scale
    * killer — so it is decomposed into the two-level prefix sum (the
    * [[graft.llm.Pack]] discipline): deltas pre-aggregate per exact
    * instant, running sums run WITHIN each hour bucket (hash-
    * partitioned by hour), and only the per-hour delta totals — one
    * row per hour, O(time-range), never O(events) — cross the final
    * single-partition carry window. Max concurrency in an hour =
    * carry-in + max(0, max within-hour running sum) because the hour
    * starts at carry-in and concurrency only changes at boundaries.
    * The hour is the bucket dial: a corpus with billions of
    * boundaries per hour shrinks it to minutes, growing the spine
    * window linearly while shrinking the partitions.
    *
    * All-integer arithmetic end to end (micros, counts) — exact
    * cross-engine.
    */
  def concurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byUser = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val hourUs = 3600000000L
    val sess = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        Tables.epochMicros(col("ts"))
          - lag(Tables.epochMicros(col("ts")), 1).over(byUser))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id",
        sum(col("brk")).over(byUser.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(Tables.epochMicros(col("ts"))).as("s_us"),
        (max(Tables.epochMicros(col("ts"))) + lit(1L)).as("e_us"))
    val deltas = sess.select(col("s_us").as("us"), lit(1L).as("d"))
      .unionAll(sess.select(col("e_us").as("us"), lit(-1L).as("d")))
      .groupBy(col("us")).agg(sum(col("d")).as("d"))
      .withColumn("hour_us", col("us") - col("us") % lit(hourUs))
    val inHour = W.partitionBy(col("hour_us")).orderBy(col("us"))
      .rowsBetween(Long.MinValue, 0)
    val perHour = deltas
      .withColumn("run", sum(col("d")).over(inHour))
      .groupBy(col("hour_us"))
      .agg(sum(col("d")).as("hour_delta"), max(col("run")).as("max_run"))
    // the only single-partition window: O(hours) rows of two longs
    val spine = W.orderBy(col("hour_us")).rowsBetween(Long.MinValue, -1)
    perHour
      .withColumn("carry_in",
        coalesce(sum(col("hour_delta")).over(spine), lit(0L)))
      .select(timestamp_micros(col("hour_us")).as("hour_start"),
        (col("carry_in") + greatest(col("max_run"), lit(0L)))
          .as("max_concurrency"),
        (col("carry_in") + col("hour_delta")).as("end_concurrency"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_hourly" -> hourly _,
    "q_events_concurrency" -> concurrency _,
    "q_events_ewma" -> ewma _,
    "q_events_anomaly" -> anomalies _,
    "q_events_entry_exit" -> entryExit _,
    "q_events_sliding" -> sliding _,
    "q_events_sessions" -> sessions _,
    "q_events_hour_of_day" -> hourOfDay _,
    "q_events_json" -> jsonProps _,
    "q_events_funnel" -> funnel _,
    "q_events_retention" -> retention _,
  )

  /** SQL mirror of [[ewma]]'s dyadic lag terms (j = 0 is the current
    * row — `lag(cnt, 0)` is avoided for portability).
    */
  private val sqlEwmaWsum: String = (0 to 7).map { j =>
    val l = if (j == 0) "cnt" else s"lag(cnt, $j) OVER w"
    s"COALESCE($l, 0) * ${1L << (7 - j)}"
  }.mkString(" + ")

  private val sqlEwmaWtot: String = (0 to 7).map { j =>
    val l = if (j == 0) "cnt" else s"lag(cnt, $j) OVER w"
    s"CASE WHEN $l IS NULL THEN 0 ELSE ${1L << (7 - j)} END"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    // sweep-line concurrency: same gap sessionization as entry_exit,
    // then +1/-1 deltas, per-instant pre-agg, within-hour running
    // sums, and the cross-hour carry — all integer micros
    "q_events_concurrency" ->
      """WITH gapped AS (
        |  SELECT user_id, ts, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |sess AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM gapped),
        |iv AS (
        |  SELECT min(us) AS s_us, max(us) + 1 AS e_us
        |  FROM sess GROUP BY user_id, sess_id),
        |deltas AS (
        |  SELECT us, CAST(sum(d) AS BIGINT) AS d FROM (
        |    SELECT s_us AS us, 1 AS d FROM iv
        |    UNION ALL SELECT e_us AS us, -1 AS d FROM iv)
        |  GROUP BY us),
        |hourly AS (
        |  SELECT us - us % 3600000000 AS hour_us, us, d,
        |    CAST(sum(d) OVER (PARTITION BY us - us % 3600000000
        |      ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM deltas),
        |per_hour AS (
        |  SELECT hour_us, CAST(sum(d) AS BIGINT) AS hour_delta,
        |         max(run) AS max_run
        |  FROM hourly GROUP BY hour_us)
        |SELECT make_timestamp(hour_us) AS hour_start,
        |  CAST(COALESCE(CAST(sum(hour_delta) OVER c AS BIGINT), 0)
        |    + greatest(max_run, 0) AS BIGINT) AS max_concurrency,
        |  CAST(COALESCE(CAST(sum(hour_delta) OVER c AS BIGINT), 0)
        |    + hour_delta AS BIGINT) AS end_concurrency
        |FROM per_hour
        |WINDOW c AS (ORDER BY hour_us
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin,
    "q_events_entry_exit" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |         CAST(json_extract_string(props, '$$.k') AS INT) AS page
         |  FROM events),
         |gapped AS (
         |  SELECT *, epoch_us(ts)
         |      - lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS gap_us
         |  FROM ev),
         |flagged AS (
         |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
         |                 THEN 1 ELSE 0 END AS brk
         |  FROM gapped),
         |sess AS (
         |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
         |  FROM flagged),
         |ranked AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY user_id, sess_id
         |      ORDER BY ts, event_id) AS rn_a,
         |    row_number() OVER (PARTITION BY user_id, sess_id
         |      ORDER BY ts DESC, event_id DESC) AS rn_d
         |  FROM sess),
         |per_session AS (
         |  SELECT user_id, sess_id,
         |    max(CASE WHEN rn_a = 1 THEN page END) AS entry_page,
         |    max(CASE WHEN rn_d = 1 THEN page END) AS exit_page,
         |    count(*) AS n_events
         |  FROM ranked GROUP BY user_id, sess_id)
         |SELECT entry_page, exit_page,
         |  CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bounces
         |FROM per_session GROUP BY entry_page, exit_page""".stripMargin,
    "q_events_anomaly" ->
      s"""WITH bounds AS (
         |  SELECT date_trunc('hour', min(ts)) AS lo,
         |         date_trunc('hour', max(ts)) AS hi FROM events),
         |hours AS (
         |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
         |  FROM bounds),
         |types AS (SELECT DISTINCT event_type FROM events),
         |counts AS (
         |  SELECT date_trunc('hour', ts) AS hour, event_type,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2),
         |filled AS (
         |  SELECT h.hour, t.event_type, coalesce(c.cnt, 0) AS cnt
         |  FROM hours h CROSS JOIN types t
         |  LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type)
         |SELECT hour, event_type, cnt, mean, variance,
         |  (CAST(cnt AS DOUBLE) - mean) / sqrt(variance) AS z,
         |  abs((CAST(cnt AS DOUBLE) - mean) / sqrt(variance)) >= 3.0 AS is_anomaly
         |FROM (
         |  SELECT hour, event_type, cnt,
         |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    (CAST(s2 AS DOUBLE)
         |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n AS DOUBLE) - 1.0) AS variance
         |  FROM (
         |    SELECT hour, event_type, cnt,
         |      CAST(count(cnt) OVER w AS BIGINT) AS n,
         |      CAST(sum(cnt) OVER w AS BIGINT) AS s1,
         |      CAST(sum(cnt * cnt) OVER w AS BIGINT) AS s2
         |    FROM filled
         |    WINDOW w AS (PARTITION BY event_type ORDER BY hour
         |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |  WHERE n >= 12)
         |WHERE variance > 0""".stripMargin,
    "q_events_ewma" ->
      s"""SELECT hour, event_type, cnt, wsum, wtot,
         |  CAST(wsum AS DOUBLE) / wtot AS ewma
         |FROM (
         |  SELECT hour, event_type, cnt,
         |    CAST($sqlEwmaWsum AS BIGINT) AS wsum,
         |    CAST($sqlEwmaWtot AS BIGINT) AS wtot
         |  FROM (
         |    SELECT date_trunc('hour', ts) AS hour, event_type,
         |           CAST(count(*) AS BIGINT) AS cnt
         |    FROM events GROUP BY 1, 2)
         |  WINDOW w AS (PARTITION BY event_type ORDER BY hour))""".stripMargin,
    "q_events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n, ${sqlDsum("value")} AS total_value,
         |  count(DISTINCT user_id) AS n_users
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_sliding" ->
      s"""WITH b AS (
         |  SELECT event_type, value,
         |    date_trunc('hour', ts)
         |      + CASE WHEN date_part('minute', ts) >= 30
         |             THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS b30
         |  FROM events)
         |SELECT ws AS window_start, event_type,
         |  count(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM (SELECT event_type, value,
         |        unnest([b30, b30 - INTERVAL 30 MINUTE]) AS ws FROM b)
         |GROUP BY ws, event_type""".stripMargin,
    "q_events_sessions" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (
         |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT min(ts) AS session_start, user_id,
         |  count(*) AS n_events, ${sqlDsum("value")} AS session_value,
         |  max(ts) AS last_ts
         |FROM sess GROUP BY user_id, sid""".stripMargin,
    "q_events_hour_of_day" ->
      s"""SELECT CAST(date_part('hour', ts) AS INT) AS hod, event_type,
         |  count(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id)
        |SELECT
        |  (SELECT count(DISTINCT user_id) FROM events) AS n_users,
        |  (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_view_click,
        |  (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin,
    "q_events_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |d AS (
        |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM days)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT CASE WHEN day = cohort_day + 1 THEN user_id END) AS n_d1,
        |  count(DISTINCT CASE WHEN day = cohort_day + 7 THEN user_id END) AS n_d7
        |FROM d GROUP BY cohort_day""".stripMargin,
  )
}
