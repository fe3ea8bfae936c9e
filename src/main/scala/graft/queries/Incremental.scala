package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{BloomJoin, Compaction}
import graft.sources.Formats

/** Incremental-pipeline and scan-efficiency operators as
  * oracle-checked queries: bloom semi-join pruning, CDC log
  * compaction and upsert merge, non-parquet format roundtrips, and
  * z-order layout statistics.
  */
object Incremental {

  /** Order revenue for one customer segment, with the fact side
    * bloom-pruned on `o_custkey` BEFORE the exact semi join — the
    * runtime-filter shape, explicit. The oracle is the plain
    * `IN (SELECT ...)` semi join: the bloom pass must not change one
    * value (no false negatives; false positives die in the join).
    */
  def bloomSemiRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val dimKeys = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val pruned = BloomJoin.bloomPrune(
      Tables.orders(spark, sfDir), "o_custkey", dimKeys, estItems = 100000L)
    pruned.join(dimKeys, col("o_custkey") === col("c_custkey"), "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(graft.Exact.dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
  }

  /** Latest event per user — change-log compaction over the event
    * stream, total-ordered by (ts, event_id) so ties are impossible.
    */
  def latestEventPerUser(spark: SparkSession, sfDir: String): DataFrame =
    Compaction.latestPerKey(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")),
      Seq("user_id"), Seq(col("ts"), col("event_id")))

  /** Upsert-merge equivalence: compact the history before a cutoff
    * into a base snapshot, replay everything after the cutoff as an
    * update batch, merge — the result must equal compacting the whole
    * log in one pass (which is the oracle). This is the daily
    * incremental-snapshot pattern: the base is O(keys), only the new
    * day shuffles at full width.
    */
  def upsertMergedState(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cut = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val ordering = Seq(col("ts"), col("event_id"))
    val base = Compaction.latestPerKey(ev.filter(col("ts") < cut),
      Seq("user_id"), ordering)
    Compaction.upsertMerge(base, ev.filter(col("ts") >= cut),
      Seq("user_id"), ordering)
  }

  /** Incremental aggregate maintenance: a "materialized" partial
    * state (per-day decimal sums + counts over the history before a
    * cutoff) merged with the fresh tail's partials must equal the
    * full recompute — because the partials are the SAME mergeable
    * state Spark's own partial+final HashAggregate ships between map
    * and reduce, lifted to the snapshot level. At 100 TB this is the
    * difference between re-scanning all history daily and scanning
    * one day: the state is O(groups), only the tail scans at full
    * width. Decimal partials keep the merge exact (double partials
    * would re-order float addition and drift from the oracle).
    */
  def incrementalDailyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderdate"), col("o_totalprice"))
    val cut = lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderdate"))
        .agg(sum(graft.Exact.dec2(col("o_totalprice"))).as("psum"),
          count(lit(1)).as("pn"))
    partials(o.filter(col("o_orderdate") < cut))
      .unionByName(partials(o.filter(col("o_orderdate") >= cut)))
      .groupBy(col("o_orderdate"))
      .agg(sum(col("psum")).cast("double").as("revenue"),
        sum(col("pn")).as("n"))
  }

  /** Snapshot diff: classify every key of the compacted state as
    * added / changed / unchanged between a historical cutoff and now
    * — the audit complement of [[upsertMergedState]]. One full-outer
    * join of two O(keys) compacted sides; the raw log never joins.
    */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"))
    val cut = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val ordering = Seq(col("ts"), col("event_id"))
    val old = Compaction.latestPerKey(ev.filter(col("ts") < cut),
        Seq("user_id"), ordering)
      .select(col("user_id"), col("event_id").as("old_event_id"))
    val neu = Compaction.latestPerKey(ev, Seq("user_id"), ordering)
      .select(col("user_id"), col("event_id").as("new_event_id"))
    old.join(neu, Seq("user_id"), "full_outer")
      .select(col("user_id"), col("old_event_id"), col("new_event_id"),
        when(col("old_event_id").isNull, "added")
          .when(col("new_event_id").isNull, "removed")
          .when(col("old_event_id") === col("new_event_id"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** ORC write→read→aggregate roundtrip (see [[Formats]]). */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    Formats.orcRoundtripAgg(spark, sfDir)

  /** CSV write→read→aggregate roundtrip (see [[Formats]]). */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    Formats.csvRoundtripAgg(spark, sfDir)

  /** Calendar-spine densification (gap filling): one row per
    * (hour, event_type) across the corpus's full hour range, zeros
    * where nothing happened — time-series consumers (dashboards,
    * anomaly baselines, join spines) need the absent hours to EXIST.
    * The spine is generated, not scanned: `sequence()` over the
    * global min/max hour (a one-row aggregate) exploded to ~hours
    * rows, cross-joined with the handful of event types — both sides
    * bounded, so the nested-loop join is O(hours × types), never
    * O(data). The real data contributes only the hourly aggregate.
    */
  def gapFilledHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds.select(explode(
      sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum(col("value")).as("total_value"))
    spine.crossJoin(types)
      .join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  /** Hive-partitioned sink + pruned read: write events partitioned by
    * `event_type`, then read back ONE partition. The filter must
    * become a PartitionFilter (directory pruning — only the purchase
    * directory is listed/read, asserted in IncrementalSpec), which at
    * 100 TB is the difference between scanning one event type and
    * scanning all of them.
    */
  def partitionedSinkRead(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_part_$fp"
    val staged = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    staged.write.mode("overwrite").partitionBy("event_type").parquet(path)
    // explicit schema: a zero-row corpus writes no data files, and
    // schema inference over an empty partitioned dir fails
    spark.read.schema(staged.schema).parquet(path)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum(col("value")).as("total_value"))
  }

  /** Z-order (Morton) layout statistics: interleave the low 16 bits
    * of `l_partkey`/`l_suppkey`, bucket rows by the top 8 z-bits, and
    * report per-bucket extents of BOTH dimensions. The point of the
    * curve is that each bucket is a small axis-aligned box, so
    * min/max file statistics prune scans filtered on EITHER column —
    * sorting by one column only buys pruning on that column. The
    * extents (and the bit arithmetic) are engine-neutral integers,
    * so the whole layout decision is oracle-checkable.
    */
  def zorderLayoutStats(spark: SparkSession, sfDir: String): DataFrame = {
    // mod-256 densifies both dimensions so the interleave exercises
    // all 16 z-bits at every scale factor (raw l_suppkey is ~2 decimal
    // digits at small SF — its high bits would pin every row into one
    // bucket)
    val x = col("l_partkey") % 256
    val y = col("l_suppkey") % 256
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
    Tables.lineitem(spark, sfDir)
      .select(x.as("zx"), y.as("zy"), z.as("zval"))
      .groupBy(shiftright(col("zval"), 8).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zx")).as("min_part"), max(col("zx")).as("max_part"),
        min(col("zy")).as("min_supp"), max(col("zy")).as("max_supp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_join" -> bloomSemiRevenue _,
    "q_cdc_latest" -> latestEventPerUser _,
    "q_cdc_upsert" -> upsertMergedState _,
    "q_incr_agg" -> incrementalDailyRevenue _,
    "q_cdc_diff" -> snapshotDiff _,
    "q_events_gapfill" -> gapFilledHourly _,
    "q_partitioned_sink" -> partitionedSinkRead _,
    "q_orc_roundtrip" -> orcRoundtrip _,
    "q_csv_roundtrip" -> csvRoundtrip _,
    "q_zorder_stats" -> zorderLayoutStats _,
  )

  /** DuckDB mirror of the Spark-side Morton interleave. */
  private def sqlZ: String =
    (0 until 8).map { i =>
      s"((((l_partkey % 256) >> $i) & 1) << ${2 * i}) | " +
        s"((((l_suppkey % 256) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  val oracles: Map[String, String] = Map(
    "q_bloom_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority""".stripMargin,
    "q_cdc_latest" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_cdc_upsert" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_events_gapfill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo,
        |         date_trunc('hour', max(ts)) AS hi FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |counts AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY 1, 2)
        |SELECT h.hour, t.event_type,
        |  coalesce(c.n, 0) AS n,
        |  coalesce(c.total_value, 0.0) AS total_value
        |FROM hours h CROSS JOIN types t
        |LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type""".stripMargin,
    "q_partitioned_sink" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id""".stripMargin,
    "q_incr_agg" ->
      """SELECT o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderdate""".stripMargin,
    "q_cdc_diff" ->
      """WITH old AS (
        |  SELECT user_id, event_id AS old_event_id FROM (
        |    SELECT user_id, event_id,
        |      row_number() OVER (PARTITION BY user_id
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rn = 1),
        |neu AS (
        |  SELECT user_id, event_id AS new_event_id FROM (
        |    SELECT user_id, event_id,
        |      row_number() OVER (PARTITION BY user_id
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  o.old_event_id, n.new_event_id,
        |  CASE WHEN o.old_event_id IS NULL THEN 'added'
        |       WHEN n.new_event_id IS NULL THEN 'removed'
        |       WHEN o.old_event_id = n.new_event_id THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old o FULL OUTER JOIN neu n ON o.user_id = n.user_id""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  max(l_partkey) AS max_part, count(*) AS n
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT lang, count(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  max(lang || ',"' || source || '"') AS max_tricky,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang""".stripMargin,
    "q_zorder_stats" ->
      s"""SELECT (zval >> 8) AS zbucket, count(*) AS n,
         |  min(zx) AS min_part, max(zx) AS max_part,
         |  min(zy) AS min_supp, max(zy) AS max_supp
         |FROM (SELECT (l_partkey % 256) AS zx, (l_suppkey % 256) AS zy,
         |        ($sqlZ) AS zval
         |      FROM lineitem)
         |GROUP BY 1""".stripMargin
  )
}
