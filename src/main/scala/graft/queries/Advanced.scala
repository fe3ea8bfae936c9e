package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, Bucketed, RangeJoin, Skew}

/** Advanced composed operators as oracle-checked queries: as-of join
  * and skew-salted aggregation.
  */
object Advanced {

  /** For every purchase event, the latest error event of the same
    * user at-or-before it (point-in-time join; DuckDB ASOF LEFT JOIN
    * is the oracle).
    */
  def asofPurchaseError(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    // dedupe the reference side per (key, time): both engines pick an
    // arbitrary row when right-side timestamps tie, so make the tie
    // impossible deterministically (max value per instant)
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts").as("err_ts"))
      .agg(max(col("value")).as("err_value"))
      .select(col("user_id"), col("err_ts"), col("err_value"))
    AsOfJoin.asof(purchases, errors, "user_id", "ts", "err_ts")
  }

  /** For every error event, the NEXT purchase of the same user
    * at-or-after it, but only within 1 hour — the forward as-of with
    * tolerance ([[AsOfJoin.asofForward]]; pandas `merge_asof`
    * direction='forward' semantics). Purchases pre-aggregated to one
    * row per (user, instant) so right-side ties are impossible (same
    * discipline as [[asofPurchaseError]]).
    */
  def asofNextPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_id"))
    AsOfJoin.asofForward(errors, purchases, "user_id", "ts", "p_ts",
      prefix = "next_", toleranceMicros = 3600000000L)
  }

  /** For every click event, the NEAREST error of the same user in
    * EITHER direction, within 30 minutes — [[AsOfJoin.asofNearest]]
    * (pandas `merge_asof` direction='nearest'; backward wins ties).
    * Errors pre-aggregated per (user, instant) as in the other as-of
    * queries. The oracle composes DuckDB's backward (`>=`) and
    * strictly-forward (`<`) ASOF joins and picks the closer match —
    * the same tie/inclusivity contract the operator documents.
    */
  def asofNearestError(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts").as("err_ts"))
      .agg(max(col("value")).as("err_value"))
      .select(col("user_id"), col("err_ts"), col("err_value"))
    AsOfJoin.asofNearest(clicks, errors, "user_id", "ts", "err_ts",
      prefix = "near_", toleranceMicros = 1800000000L)
  }

  /** The same point-in-time join through [[AsOfJoin.asofSalted]] —
    * result identical to [[asofPurchaseError]] (and checked against
    * the SAME DuckDB ASOF oracle); the point is the skew-safe
    * physical shape: the left side fans over 8 deterministic salts,
    * the right side replicates per salt, so a hot user's events
    * spread over 8 window partitions instead of one straggler task.
    */
  def asofPurchaseErrorSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts").as("err_ts"))
      .agg(max(col("value")).as("err_value"))
      .select(col("user_id"), col("err_ts"), col("err_value"))
    AsOfJoin.asofSalted(purchases, errors, "user_id", "ts", "err_ts",
      nSalts = 8)
  }

  /** Every purchase inside the 5-minute window after an error of the
    * same user — a point-in-interval range join, bin-bucketed so the
    * physical plan is a SortMergeJoin on (user_id, time-bin) instead
    * of the nested loop the raw inequality predicate would force
    * (oracle: the plain DuckDB inequality join).
    */
  def rangeJoinErrorWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val win = 300000000L // 5 min in micros = interval length = bin width
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        Tables.epochMicros(col("ts")).as("p_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"),
        Tables.epochMicros(col("ts")).as("lo_us"),
        (Tables.epochMicros(col("ts")) + win).as("hi_us"))
    RangeJoin.pointInInterval(purchases, errors, "user_id",
        "p_us", "lo_us", "hi_us", win)
      .select(col("user_id"), col("event_id"), col("ts"), col("err_ts"))
  }

  /** Every (error, purchase) pair of the same user whose derived
    * activity windows overlap — error outage window [ts, ts+10 min]
    * vs purchase activity window [ts, ts+5 min] — via the bin-bucketed
    * interval-overlap join ([[RangeJoin.intervalOverlap]]; oracle is
    * the plain DuckDB inequality join). Bin width = the larger
    * interval, so each side replicates into ≤ 2 bins.
    */
  def intervalOverlapWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val errWin = 600000000L  // 10 min in micros
    val purWin = 300000000L  // 5 min
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"),
        Tables.epochMicros(col("ts")).as("e_lo"),
        (Tables.epochMicros(col("ts")) + errWin).as("e_hi"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        Tables.epochMicros(col("ts")).as("p_lo"),
        (Tables.epochMicros(col("ts")) + purWin).as("p_hi"))
    RangeJoin.intervalOverlap(errors, purchases, "user_id",
        "e_lo", "e_hi", "p_lo", "p_hi", errWin)
      .select(col("user_id"), col("err_ts"), col("p_ts"))
  }

  /** Event counts via the two-stage salted aggregation — result
    * identical to a plain groupBy count (which IS the oracle); the
    * point is the skew-safe physical shape.
    */
  def saltedTypeCount(spark: SparkSession, sfDir: String): DataFrame =
    Skew.saltedCount(Tables.events(spark, sfDir), "event_type")

  /** Full analytic-window breadth: lead/lag/ntile/percent_rank/
    * first_value over a totally-ordered frame.
    */
  def windowAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_key"), col("quartile"), col("first_key"))
  }

  /** Edit distance between consecutive docs' text heads — Levenshtein
    * is definition-identical across engines (integer DP).
    */
  def editDistanceAdjacent(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 80).as("head"))
    val a = d.select(col("doc_id").as("doc_a"), col("head").as("head_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("head").as("head_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("head_a"), col("head_b")).as("edit_dist"))
  }

  /** Datetime arithmetic: average days from order to each line's ship
    * date, per priority (datediff is an exact integer).
    *
    * Two physical choices, both measured at the ×1000 corpus: the
    * orders side is hash-built (`shuffle_hash`), not sort-merged —
    * the final aggregate has 5 groups, so the join's only job is
    * lookup and sorting 600M fact rows for an SMJ is pure waste. An
    * eager per-order pre-aggregation of lineitem (the q4 move) was
    * measured and REJECTED here: it replaced the trivially cheap
    * 5-group aggregate with a 150M-key hash aggregate and ran 2.5×
    * SLOWER (200 s vs 80 s) — aggregate pushdown only pays when it
    * shrinks the dominant shuffle, not when the post-join aggregate
    * is already near-free.
    */
  def daysToShip(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", o),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        (sum(datediff(col("l_shipdate"), col("o_orderdate"))).cast("double")
          / count(lit(1))).as("avg_days_to_ship"),
        max(datediff(col("l_shipdate"), col("o_orderdate"))).as("max_days"),
        count(lit(1)).as("n"))
  }

  /** Scalar-subquery pattern: customers above the global average
    * balance (the average is an exact decimal-sum division, so the
    * threshold is bitwise-identical cross-engine).
    */
  def aboveAvgBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val avgBal = c.agg(graft.Exact.davg(col("c_acctbal")).as("avg_bal"))
    c.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** Lineitem–orders revenue per priority over storage-bucketed
    * copies of both tables: the join reads matching buckets directly
    * and plans with NO Exchange before the aggregation (the oracle is
    * the same join on the raw parquet — bucketing must not change a
    * single value, only the physical plan).
    */
  /** The one-time bucket render [[bucketedJoinRevenue]] rides on —
    * fingerprint-cached (across JVMs via the on-disk marker), so
    * repeated calls are a metadata check. Exposed separately so
    * Bench can pay it in its setup pass and time the query's
    * steady-state Exchange-free join from the first rep.
    */
  def bucketedSetup(spark: SparkSession, sfDir: String): Unit = {
    // one data-sized count for BOTH sides (co-location needs equal
    // bucket counts), derived from the larger (lineitem) side
    val nBuckets = Bucketed.bucketCountFor(Tables.lineitem(spark, sfDir))
    Bucketed.write(spark, Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "graft_orders_bkt", "o_orderkey", nBuckets,
      Bucketed.srcFingerprint(spark, s"$sfDir/orders.parquet"))
    Bucketed.write(spark, Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount")),
      "graft_lineitem_bkt", "l_orderkey", nBuckets,
      Bucketed.srcFingerprint(spark, s"$sfDir/lineitem.parquet"))
  }

  def bucketedJoinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    bucketedSetup(spark, sfDir)
    Bucketed.colocatedJoin(spark, "graft_lineitem_bkt", "graft_orders_bkt",
        "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(
        graft.Exact.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        graft.Exact.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
  }

  /** Blocked fuzzy (record-linkage) join over part names: distinct
    * name signatures first, then a first-token blocking equi-join,
    * then Levenshtein ≤ 4 scoring inside each block. The
    * distinct-first step is the scale lever — edit distance runs on
    * name SIGNATURES (vocabulary-sized), never on the row set, and
    * the blocking key turns the quadratic candidate space into
    * Σ block² — the standard blocking-key shape of entity
    * resolution at corpus scale. Per-name part counts ride along so
    * the output still prices each match's row-level impact.
    */
  def fuzzyNameJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = Tables.part(spark, sfDir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", substring_index(col("p_name"), " ", 1))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .where(col("dist").between(1, 4))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        col("dist"),
        col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> asofPurchaseError _,
    "q_asof_salted" -> asofPurchaseErrorSalted _,
    "q_asof_forward" -> asofNextPurchase _,
    "q_asof_nearest" -> asofNearestError _,
    "q_fuzzy_join" -> fuzzyNameJoin _,
    "q_range_join" -> rangeJoinErrorWindow _,
    "q_interval_overlap" -> intervalOverlapWindows _,
    "q_bucketed_join" -> bucketedJoinRevenue _,
    "q_salted_count" -> saltedTypeCount _,
    "q_window_analytics" -> windowAnalytics _,
    "q_edit_distance" -> editDistanceAdjacent _,
    "q_days_to_ship" -> daysToShip _,
    "q_above_avg_balance" -> aboveAvgBalance _,
  )

  val oracles: Map[String, String] = Map(
    "q_fuzzy_join" ->
      """WITH sigs AS (
        |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
        |         split_part(p_name, ' ', 1) AS blk
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  levenshtein(a.p_name, b.p_name) AS dist,
        |  a.n_parts AS n_a, b.n_parts AS n_b
        |FROM sigs a JOIN sigs b
        |  ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 4""".stripMargin,
    "q_asof_join" ->
      """SELECT p.user_id, p.event_id, p.ts, p.value,
        |  e.err_ts AS asof_err_ts, e.err_value AS asof_err_value
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |                FROM events WHERE event_type = 'error'
        |                GROUP BY user_id, ts) e
        |  ON p.user_id = e.user_id AND p.ts >= e.err_ts""".stripMargin,
    // the salted variant must land on the IDENTICAL oracle result —
    // salting is a physical rewrite, not a semantic one
    "q_asof_salted" ->
      """SELECT p.user_id, p.event_id, p.ts, p.value,
        |  e.err_ts AS asof_err_ts, e.err_value AS asof_err_value
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |                FROM events WHERE event_type = 'error'
        |                GROUP BY user_id, ts) e
        |  ON p.user_id = e.user_id AND p.ts >= e.err_ts""".stripMargin,
    // forward ASOF (e.ts <= p.p_ts picks the EARLIEST purchase at-or-
    // after); the 1-hour tolerance is the same epoch_us compare the
    // Spark side nulls out on (NULL p_ts falls through the CASE)
    "q_asof_forward" ->
      """WITH p AS (SELECT user_id, ts AS p_ts, max(event_id) AS p_id
        |           FROM events WHERE event_type = 'purchase'
        |           GROUP BY user_id, ts)
        |SELECT e.user_id, e.event_id, e.ts, e.value,
        |  CASE WHEN epoch_us(p.p_ts) - epoch_us(e.ts) <= 3600000000
        |       THEN p.p_ts END AS next_p_ts,
        |  CASE WHEN epoch_us(p.p_ts) - epoch_us(e.ts) <= 3600000000
        |       THEN p.p_id END AS next_p_id
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'error') e
        |ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts <= p.p_ts""".stripMargin,
    // nearest = pick the closer of the backward (inclusive >=) and
    // strictly-forward (<) ASOF legs; backward wins gap ties; 30-min
    // tolerance nulls the chosen match (tolerance-after-choice ==
    // tolerance-per-leg because the nearer leg is chosen first)
    "q_asof_nearest" ->
      """WITH err AS (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |             FROM events WHERE event_type = 'error'
        |             GROUP BY user_id, ts),
        |c AS (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click'),
        |b AS (SELECT c.user_id, c.event_id, c.ts,
        |             e.err_ts AS b_ts, e.err_value AS b_val
        |      FROM c ASOF LEFT JOIN err e
        |        ON c.user_id = e.user_id AND c.ts >= e.err_ts),
        |f AS (SELECT c.user_id, c.event_id,
        |             e.err_ts AS f_ts, e.err_value AS f_val
        |      FROM c ASOF LEFT JOIN err e
        |        ON c.user_id = e.user_id AND c.ts < e.err_ts),
        |n AS (SELECT b.user_id, b.event_id, b.ts,
        |             CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
        |                    epoch_us(b.ts) - epoch_us(b.b_ts)
        |                      <= epoch_us(f.f_ts) - epoch_us(b.ts))
        |                  THEN b.b_ts ELSE f.f_ts END AS near_ts,
        |             CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
        |                    epoch_us(b.ts) - epoch_us(b.b_ts)
        |                      <= epoch_us(f.f_ts) - epoch_us(b.ts))
        |                  THEN b.b_val ELSE f.f_val END AS near_val
        |      FROM b JOIN f USING (user_id, event_id))
        |SELECT user_id, event_id, ts,
        |  CASE WHEN abs(epoch_us(near_ts) - epoch_us(ts)) <= 1800000000
        |       THEN near_ts END AS near_err_ts,
        |  CASE WHEN abs(epoch_us(near_ts) - epoch_us(ts)) <= 1800000000
        |       THEN near_val END AS near_err_value
        |FROM n""".stripMargin,
    "q_range_join" ->
      """SELECT p.user_id, p.event_id, p.ts, e.err_ts
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts AS err_ts FROM events
        |      WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND p.ts >= e.err_ts
        | AND p.ts <= e.err_ts + INTERVAL 5 MINUTE""".stripMargin,
    // closed-interval overlap: [E, E+600s] ∩ [P, P+300s] ≠ ∅ ⇔
    // E <= P+300s && P <= E+600s (same epoch_us micros both engines)
    "q_interval_overlap" ->
      """SELECT e.user_id, e.err_ts, p.p_ts
        |FROM (SELECT user_id, ts AS err_ts FROM events
        |      WHERE event_type = 'error') e
        |JOIN (SELECT user_id, ts AS p_ts FROM events
        |      WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id
        | AND epoch_us(e.err_ts) <= epoch_us(p.p_ts) + 300000000
        | AND epoch_us(p.p_ts) <= epoch_us(e.err_ts) + 600000000""".stripMargin,
    "q_bucketed_join" ->
      s"""SELECT o_orderpriority,
         |  ${graft.Exact.sqlRevenue("l_extendedprice", "l_discount")} AS revenue,
         |  ${graft.Exact.sqlDsum("l_quantity")} AS sum_qty,
         |  count(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    "q_salted_count" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  ntile(4) OVER w AS quartile,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "q_edit_distance" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_days_to_ship" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / count(*) AS avg_days_to_ship,
        |  MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_days,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q_above_avg_balance" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
        |  FROM customer)""".stripMargin,
  )
}
