package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Exact._
import graft.Tables

/** Analytics surface over the driver's TPC-H-ish star schema.
  *
  * The reference's paradigm (map → shuffle → group → reduce,
  * SURVEY.md §0) admits joins/aggregates as user programs (the classic
  * reduce-side-join idiom, SURVEY.md §2.3); here they are declarative
  * DataFrames so Catalyst supplies pushdown, pruning, join selection
  * and partial aggregation.
  *
  * Scale design (for the 100 TB target):
  *   - dimension tables (region 5, nation 25, supplier, part, even
  *     customer at most SFs) are `broadcast()` — fact-table joins
  *     never shuffle the big side on a dim key;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key once
  *     and reuse that partitioning for the downstream groupBy where
  *     keys align;
  *   - every aggregate is partial+final hash agg (map-side combine);
  *   - filters sit directly on the scan so parquet gets
  *     PushedFilters + ReadSchema pruning;
  *   - top-k is `orderBy().limit(k)` → Spark's TakeOrderedAndProject:
  *     per-partition heaps, no global sort materialization.
  */
object StarSchema {

  /** TPC-H Q1-shaped pricing summary: single scan of lineitem,
    * partial+final hash agg, no join. The reference would run this as
    * one MR job with a holistic reduce; partial agg shrinks the
    * shuffle to |flag×status| rows per partition.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped shipping priority: broadcast the filtered
    * customer dim into orders, shuffle-join lineitem on orderkey,
    * aggregate, TakeOrderedAndProject top-10 (total order:
    * revenue desc then orderkey — ties can't flake the oracle).
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(broadcast(cust.join(ord, cust("c_custkey") === ord("o_custkey"))),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped local supplier volume: the full six-table join.
    * All dims broadcast; the only shuffles are orders⋈lineitem on
    * orderkey and the final n_name agg.
    */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    // range predicate, not year(): function-wrapped columns can't reach
    // parquet PushedFilters; the range form skips row groups at scale
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
    // hash-build the year-sliced orders: the agg has |nation| groups,
    // so sorting the full fact for an SMJ buys nothing
    l.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", o), l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s),
        l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  /** TPC-H Q6-shaped forecast revenue: the pure-pushdown query — no
    * join, no groupBy key, three scan-level predicates. At 100 TB this
    * plan is ONLY a parquet scan with PushedFilters skipping row
    * groups plus a partial+final agg of one row per partition; any
    * plan that reads more than (shipdate, discount, quantity,
    * extendedprice) or evaluates the filter above the scan is wrong.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4-shaped late-shipment count (adapted: the synthetic
    * lineitem has no commit/receipt dates, so "late" is shipped more
    * than 60 days after the order date). The EXISTS over a correlated
    * monotone predicate collapses to a max: ∃ line with
    * `l_shipdate > o_orderdate + 60d` ⟺
    * `max(l_shipdate) > o_orderdate + 60d`, so lineitem is
    * pre-aggregated to one (orderkey, max_ship) row — the map-side
    * partial combine shrinks the fact shuffle from line count to
    * order count (4× at TPC-H fan-out) and the join emits each order
    * at most once with no semi-join dedup. The scan also carries the
    * IMPLIED bound `l_shipdate > min(o_orderdate) + 60d` (orderdate ≥
    * 1997-01-01 forces any witness past 1997-03-02) — a derived
    * filter parquet min/max pruning can use, the textbook
    * magic-sets/predicate-derivation move. Oracle SQL stays the
    * textbook EXISTS form, so the hash match proves the rewrite.
    */
  /** Q4's order window + lateness lag, and the scan bound they IMPLY
    * (`min(o_orderdate) + lag`): one source for the filter, the join
    * interval, the derived pushdown literal, and the oracle SQL, so
    * changing the window or the lag cannot silently strand the
    * derived bound and drop witnesses (PlanAuditSpec derives its pin
    * from these same constants).
    */
  private[graft] val Q4WindowStart = java.time.LocalDate.parse("1997-01-01")
  private[graft] val Q4WindowEnd = Q4WindowStart.plusMonths(6)
  private[graft] val Q4LagDays = 60L
  private[graft] val Q4DerivedShipBound = Q4WindowStart.plusDays(Q4LagDays)

  def orderPriorityChecking(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(Q4WindowStart.toString).cast("timestamp")
        && col("o_orderdate") < lit(Q4WindowEnd.toString).cast("timestamp"))
    val lastShip = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate")
      .filter(col("l_shipdate") > lit(Q4DerivedShipBound.toString).cast("timestamp"))
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("max_ship"))
    // shuffled-hash: hashing the 6-month orders slice skips the
    // O(n log n) sort of the order-count aggregate stream
    graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", ord)
      .join(lastShip, ord("o_orderkey") === col("l_orderkey")
        && col("max_ship") > ord("o_orderdate") + expr(s"INTERVAL $Q4LagDays DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q12-shaped priority line counts (adapted: grouped by
    * l_returnflag since the synthetic schema has no shipmode).
    * Conditional aggregation — the CASE collapses inside the partial
    * agg, so the shuffle carries |returnflag| rows per partition, not
    * the joined fact rows.
    */
  def priorityLineCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
  }

  /** TPC-H Q14-shaped promo effect: percentage-of-total conditional
    * aggregate over a broadcast dim join. Both sums are exact decimal
    * (order-independent); the final ratio is one double division, with
    * identical association on the oracle side so the bits match.
    */
  def promoEffect(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg((lit(100.0)
          * sum(when(col("p_type") === "PROMO",
              discPrice(col("l_extendedprice"), col("l_discount")))).cast("double")
          / sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double"))
        .as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18-shaped large-volume customers. Unlike textbook Q18
    * (which rescans lineitem after the HAVING subquery), the
    * qualifying aggregate already carries sum_qty, so we join it
    * straight to orders — ONE lineitem scan instead of two. The
    * qualifying set is O(orders) so it shuffle-joins on orderkey (not
    * broadcast — at 100 TB it does not fit); customer broadcasts.
    */
  def largeVolumeCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    // hash-build the filtered qualifying set; the result feeds a
    // top-k (TakeOrdered), so neither SMJ sort would be reused
    Tables.orders(spark, sfDir)
      .join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", big),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q15-shaped top supplier: aggregate once, then keep the
    * row(s) equal to the global max via a one-row broadcast scalar —
    * the rev frame is staged so the max does not recompute it. The
    * max compare is safe cross-engine because total_rev is an exact
    * decimal sum (order-independent) cast to double.
    */
  def topSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = graft.Materialize.stage(
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("total_rev")),
      eager = false)
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: "compare each row to its
    * group's aggregate". Two physical shapes, both measured at the
    * ×1000 corpus (600M lines): an unordered window over l_partkey
    * scans the fact ONCE but WindowExec must SORT the full fact by
    * partkey — 57 s and the sweep's only GC-death risk at a 48 g
    * heap. Here the per-part average is a hash aggregate (map-side
    * combine to ~one row per part) hash-joined back to the fact —
    * two fact scans and shuffles, but NO 600M-row sort and bounded
    * build memory. Values are identical either way (same exact
    * decimal sum / count, then double math written the same on both
    * sides); the oracle SQL is the textbook self-join form.
    */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val perPart = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(dec2(col("l_quantity"))).cast("double")
          / count(col("l_quantity"))).as("avg_qty"))
    li.join(graft.operators.ScaleHints.shjIfBigFact(spark,
          s"$sfDir/lineitem.parquet", perPart),
        col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** Top customers by lifetime order value — broadcast-joined dim,
    * top-k via TakeOrderedAndProject.
    */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** Window functions: per-customer top-3 orders with row_number +
    * rank + running sum. Ordering key (totalprice desc, orderkey) is
    * total, so frames are deterministic.
    */
  def windowTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("running_spent",
        sum(dec2(col("o_totalprice"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .filter(col("rn") <= 3)
  }

  /** Set operations: nation keys with customers vs with suppliers. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nationkey")).distinct()
    cn.except(sn).withColumn("op", lit("cust_only"))
      .unionAll(cn.intersect(sn).withColumn("op", lit("both")))
      .unionAll(sn.except(cn).withColumn("op", lit("supp_only")))
      .select("op", "nationkey")
  }

  /** Semi/anti joins: customers with vs without orders (EXISTS /
    * NOT EXISTS). left_semi/left_anti never widen rows — at scale the
    * probe side streams against the orderkey hash table.
    */
  def semiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"))
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
    val noOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
    withOrders.agg(count(lit(1)).as("n")).withColumn("op", lit("with_orders"))
      .unionAll(noOrders.agg(count(lit(1)).as("n")).withColumn("op", lit("no_orders")))
      .select("op", "n")
  }

  /** ROLLUP grouping sets over returnflag × linestatus. */
  def rollupSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** CUBE grouping sets (all 4 combinations). */
  def cubeSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  /** Outer joins: nations with customer and supplier counts — full
    * outer over two pre-aggregated sides, nulls preserved.
    */
  def outerJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(spark, sfDir)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** Pivot: order counts by priority, one column per status value
    * (explicit value list ⇒ stable schema; oracle is conditional
    * aggregation).
    */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** Explicit GROUPING SETS (beyond rollup/cube): status totals,
    * priority totals, and grand total in one pass, with grouping_id
    * distinguishing the sets. Pure DataFrame API — no temp-view
    * session state.
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"),
        grouping_id().as("gid"))

  /** Bag-semantics set ops: UNION ALL / EXCEPT ALL keep duplicates. */
  def setOpsAll(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nationkey"))
    cn.exceptAll(sn).withColumn("op", lit("cust_except_all"))
      .unionAll(cn.intersectAll(sn).withColumn("op", lit("intersect_all")))
      .groupBy(col("op"), col("nationkey"))
      .agg(count(lit(1)).as("n"))
  }

  /** Approximate sketches over lineitem, hard-verified by BOUND
    * CHECKS rather than by value: HLL and approx-percentile sketch
    * bytes differ across engines, so instead of emitting the raw
    * estimates we emit the exact statistics (oracle-comparable) plus
    * booleans asserting each estimate landed within its published
    * error bound — `hll_ok` iff |HLL − exact| ≤ 3·rsd·exact (rsd
    * 0.05), `median_ok` iff the approx median's rank is within the
    * guaranteed 1/accuracy rank error of p·n (checked via a second
    * pass counting rows ≤/< the estimate). The DuckDB oracle computes
    * the exact stats and asserts TRUE for both flags, so a sketch
    * drifting out of bound flips a flag and fails the hash match —
    * a hard correctness signal without portable sketch SQL.
    *
    * Scale: exactly TWO scans of lineitem, and NEITHER builds a
    * sketch buffer per partkey group:
    *
    *  1. the sketch pass — HLL + approx-percentile + count grouped by
    *     return flag only (no distinct aggregate in sight, so Spark
    *     plans a single-level partial+final hash agg with one sketch
    *     buffer per flag per task). Its |returnflag| ≈ 3 rows are
    *     COLLECTED and re-injected as a local relation.
    *  2. the exact pass — countDistinct AND the median rank check in
    *     one TWO-LEVEL aggregate (the q21 move): level 1 groups by
    *     (flag, partkey) with long partial rank-sums (map-side
    *     combine collapses the fact to part-count rows), level 2
    *     re-aggregates by flag, where count(*) IS the exact distinct
    *     part count and the rank sums just add up.
    *
    * Two shapes this explicitly rejects, both measured at ×100
    * (BASELINE.md round-12): the r11 original (three pruned fact
    * scans — the 63 s ×1000 tail this rewrite targets), and the naive
    * "one multi-aggregate pass": mixing exact countDistinct with the
    * sketches makes Catalyst plan an Expand whose FIRST-level
    * aggregate is keyed by (flag, partkey), i.e. an approx_percentile
    * buffer per PART — 24 s where the sum of the separate passes is
    * 7.6 s at ×100, and 235 s (3.7× WORSE than the original) at
    * ×1000. PlanAuditSpec pins the final plan to ONE fact scan plus
    * the local relation.
    */
  def approxStats(spark: SparkSession, sfDir: String): DataFrame = {
    val rsd = 0.05           // HLL target relative standard deviation
    val acc = 10000L         // approx_percentile accuracy (rank err ≤ n/acc)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
    val sketch = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), rsd).as("_hll"),
      expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("_amed"),
      count(lit(1)).as("n"))
    // scan 1 happens HERE; bounded by the group count (≈3 rows)
    val sketchLocal = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(sketch.collect(): _*)),
      sketch.schema)
      .select(col("l_returnflag").as("_rf"), col("_hll"), col("_amed"), col("n"))
    val exact = li
      .join(broadcast(sketchLocal.select(col("_rf"), col("_amed"))),
        col("l_returnflag") === col("_rf"))
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(
        sum(when(col("l_extendedprice") <= col("_amed"), 1L).otherwise(0L)).as("le1"),
        sum(when(col("l_extendedprice") < col("_amed"), 1L).otherwise(0L)).as("lt1"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("le1")).as("_le"), sum(col("lt1")).as("_lt"))
    exact.join(broadcast(sketchLocal), col("l_returnflag") === col("_rf"))
      .select(col("l_returnflag"), col("n_parts"), col("n"),
        (abs(col("_hll") - col("n_parts")).cast("double")
          <= col("n_parts").cast("double") * (3.0 * rsd)).as("hll_ok"),
        (col("_le").cast("double") >= (lit(0.5) - lit(2.0) / acc) * col("n")
          && col("_lt").cast("double") <= (lit(0.5) + lit(2.0) / acc) * col("n"))
          .as("median_ok"))
  }

  /** Per-group exact stats: count-distinct, min/max (all exact —
    * no float-order dependence).
    */
  def aggStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("n"))

  /** Brand volume top-10: broadcast part dim into lineitem. */
  def partBrandVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
    Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
      .orderBy(col("total_qty").desc, col("p_brand").asc)
      .limit(10)
  }

  /** Histogram: orders per priority × status with exact avg price. */
  def priorityHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), davg(col("o_totalprice")).as("avg_price"))

  /** Exact interpolated quantiles per order status (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, same linear-interpolation
    * definition).
    */
  def priceQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        count(lit(1)).as("n"))

  /** Scalar-function projection (the engine-level functions the
    * reference keeps inside user plugins — SURVEY.md §2.3).
    */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      upper(col("lang")).as("lang_u"),
      length(col("text")).as("text_len"),
      substring(col("text"), 1, 20).as("prefix"),
      regexp_extract(col("text"), "[a-z]+", 0).as("first_word"),
      concat_ws("-", col("lang"), col("source")).as("tag"),
      abs(col("n_chars") - 100).as("absdiff"),
      (col("n_chars") % 7).as("mod7"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> pricingSummary _,
    "q3_shipping_priority" -> shippingPriority _,
    "q4_order_priority" -> orderPriorityChecking _,
    "q5_local_supplier" -> localSupplierVolume _,
    "q6_forecast_revenue" -> forecastRevenue _,
    "q12_priority_lines" -> priorityLineCounts _,
    "q14_promo_effect" -> promoEffect _,
    "q15_top_supplier" -> topSupplier _,
    "q17_small_qty_revenue" -> smallQtyRevenue _,
    "q18_large_volume" -> largeVolumeCustomers _,
    "q_top_customers" -> topCustomers _,
    "q_window_top_orders" -> windowTopOrders _,
    "q_set_ops" -> setOps _,
    "q_semi_anti" -> semiAnti _,
    "q_rollup" -> rollupSummary _,
    "q_agg_stats" -> aggStats _,
    "q_part_brand_volume" -> partBrandVolume _,
    "q_priority_histogram" -> priorityHistogram _,
    "q_price_quantiles" -> priceQuantiles _,
    "q_scalar_funcs" -> scalarFuncs _,
    "q_cube" -> cubeSummary _,
    "q_grouping_sets" -> groupingSets _,
    "q_set_ops_all" -> setOpsAll _,
    "q_outer_join" -> outerJoin _,
    "q_pivot" -> pivotStatus _,
    "q_approx_stats" -> approxStats _,
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '$Q4WindowStart 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '$Q4WindowEnd 00:00:00'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey
         |                AND l_shipdate > o_orderdate + INTERVAL $Q4LagDays DAY)
         |GROUP BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM region, nation, supplier, customer, orders, lineitem
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin,
    "q14_promo_effect" ->
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS promo_revenue_pct,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${sqlRevenue("l_extendedprice", "l_discount")} AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_rev
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    "q17_small_qty_revenue" ->
      s"""SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN (SELECT l_partkey, ${sqlDavg("l_quantity")} AS avg_qty
         |      FROM lineitem GROUP BY l_partkey) a USING (l_partkey)
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q18_large_volume" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM orders
         |JOIN (SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING sum_qty > 150) big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "q_top_customers" ->
      s"""SELECT c_custkey, c_name,
         |  ${sqlDsum("o_totalprice")} AS total_spent, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_name
         |ORDER BY total_spent DESC, c_custkey ASC
         |LIMIT 10""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, running_spent
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn,
        |    rank() OVER w AS rk,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |) WHERE rn <= 3""".stripMargin,
    "q_set_ops" ->
      """SELECT 'cust_only' AS op, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'both' AS op, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'supp_only' AS op, nationkey FROM (
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        |  EXCEPT SELECT DISTINCT c_nationkey FROM customer)""".stripMargin,
    "q_semi_anti" ->
      """SELECT 'with_orders' AS op, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS op, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // Exact stats are oracle-computed; the bound flags MUST be true
    // (the Spark side computes them from the live sketches, so a
    // sketch drifting outside its published bound fails the hash).
    "q_approx_stats" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n,
        |  TRUE AS hll_ok,
        |  TRUE AS median_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_part_brand_volume" ->
      s"""SELECT p_brand, ${sqlDsum("l_quantity")} AS total_qty, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand
         |ORDER BY total_qty DESC, p_brand ASC
         |LIMIT 10""".stripMargin,
    "q_priority_histogram" ->
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         |  ${sqlDavg("o_totalprice")} AS avg_price
         |FROM orders GROUP BY o_orderpriority, o_orderstatus""".stripMargin,
    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n, ${sqlDsum("o_totalprice")} AS total,
         |  grouping_id(o_orderstatus, o_orderpriority) AS gid
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_set_ops_all" ->
      """SELECT op, nationkey, count(*) AS n FROM (
        |  SELECT 'cust_except_all' AS op, nationkey FROM (
        |    SELECT c_nationkey AS nationkey FROM customer
        |    EXCEPT ALL SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'intersect_all' AS op, nationkey FROM (
        |    SELECT c_nationkey AS nationkey FROM customer
        |    INTERSECT ALL SELECT s_nationkey FROM supplier))
        |GROUP BY op, nationkey""".stripMargin,
    "q_outer_join" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |                 FROM supplier GROUP BY 1) s
        |USING (nationkey)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_price_quantiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5)  AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT doc_id,
        |  upper(lang) AS lang_u,
        |  length(text) AS text_len,
        |  substring(text, 1, 20) AS prefix,
        |  regexp_extract(text, '[a-z]+') AS first_word,
        |  concat_ws('-', lang, source) AS tag,
        |  abs(n_chars - 100) AS absdiff,
        |  n_chars % 7 AS mod7
        |FROM documents""".stripMargin,
  )
}
