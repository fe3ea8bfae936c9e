package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Exact._
import graft.Tables

/** The second half of the TPC-H plan-shape family (Q7–Q22). The
  * synthetic schema has no partsupp, so Q9 substitutes
  * `p_retailprice` for `ps_supplycost`, and the four partsupp-only
  * queries (Q2/Q11/Q16/Q20) treat the OBSERVED supply relation —
  * lineitem aggregated per (part, supplier) — as partsupp: supply
  * cost is the minimum observed unit price, supply value the shipped
  * revenue, availability the shipped quantity. Every defining plan
  * shape survives the substitution.
  *
  * Like [[StarSchema]], each query is chosen for a DISTINCT
  * load-bearing plan feature the engine must get right at 100 TB:
  * broadcast-prune before the fact-fact shuffle (Q7/Q8), pre-aggregate
  * before the dim decorate (Q10, Q13), a join predicate that is a
  * disjunction of conjunctions spanning both sides (Q19), a
  * triple-self-join rewritten as ONE scan + one aggregate (Q21), and
  * an anti join gated by a broadcast scalar (Q22).
  */
object TpchMore {

  /** TPC-H Q7-shaped volume shipping between nations (widened from
    * the textbook's 2-nation pair to a 4-nation set so the result is
    * non-degenerate at every test SF; the plan is identical). The
    * defining scale move: both broadcast dims PRUNE (4 of 25 nations
    * survive) and the prune happens map-side BEFORE the
    * orders⋈lineitem shuffle, so the only wide exchange carries a
    * fraction of the fact rows. Joining the dims after the fact-fact
    * join would shuffle everything.
    */
  def volumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
      .select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
    // hash-build the nation-pruned orders side: the agg groups by
    // (nation, nation, year), so the SMJ sorts would be pure waste
    li.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", ord),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  /** TPC-H Q8-shaped market share: NATION_3's share of PROMO-part
    * revenue sold into EUROPE, per year. Same broadcast-prune-first
    * shape as Q7; the share is a conditional / unconditional exact
    * decimal sum pair divided once as doubles (the Q14 discipline).
    */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")
    val natEu = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("eu_nationkey"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(natEu), col("c_nationkey") === col("eu_nationkey"))
      .select("c_custkey")
    val sNat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_natkey"), col("n_name").as("supp_nation"))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(sNat), col("s_nationkey") === col("s_natkey"))
      .select("s_suppkey", "supp_nation")
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
    // hash-build the 3-year EUROPE-customer orders slice: the final
    // agg is per-year, so neither side's SMJ sort would be reused
    li.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", ord),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3",
            discPrice(col("l_extendedprice"), col("l_discount")))).cast("double")
          / sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double"))
          .as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q9-shaped product-type profit (adapted: no partsupp, so
    * cost is `p_retailprice × quantity`). Exact decimal arithmetic end
    * to end — profit is a DIFFERENCE, where float rounding would be
    * order-visible — summed per (nation, year).
    */
  def productProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val sNat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_natkey"), col("n_name"))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(sNat), col("s_nationkey") === col("s_natkey"))
      .select("s_suppkey", "n_name")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
    // fact⋈orders is the suite's heaviest SMJ at ×1000 (both sides
    // big, nothing downstream reuses the sort): the scale-conditional
    // SHJ hint on the orders build side skips sorting 600M widget
    // lines + 150M orders. Same-day isolated ×1000 A/B (r14,
    // min-of-3, healthy controls): 59.6 → 26.7 s; sf0.1 keeps SMJ
    // (below the byte gate, where SMJ's constants win).
    val ord = graft.operators.ScaleHints.shjIfBigFact(spark,
      s"$sfDir/lineitem.parquet",
      Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))
          - dec2(col("p_retailprice")) * dec2(col("l_quantity")))
        .cast("double").as("profit"))
  }

  /** TPC-H Q10-shaped returned-item losers, top 20. Scale move:
    * aggregate to O(customers) on `o_custkey` FIRST, then decorate
    * with the customer/nation dims and TakeOrderedAndProject — the
    * textbook plan groups by five customer attributes, dragging wide
    * dim columns through the big shuffle for no reason.
    */
  def returnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    perCust
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q13-shaped customer order-count distribution (adapted: the
    * comment NOT-LIKE filter becomes a priority exclusion). Orders
    * pre-aggregate to one row per customer BEFORE the outer join, so
    * the join is O(customers)⋈O(customers) and the zero-order
    * customers surface via the left join's nulls.
    */
  def orderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c_count"))
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q19-shaped disjunctive join: the predicate is an OR of
    * conjunctions each spanning BOTH join sides, so it cannot be fully
    * pushed to either scan — the plan feature to verify is that
    * Catalyst still pushes the per-side residuals (brand ∈ {…} to the
    * part scan, the quantity-range UNION to the lineitem scan) while
    * the cross-side conjuncts evaluate inside the broadcast hash join.
    */
  def disjunctiveOr(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey")
      && ((col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#24" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30))))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21-shaped waiting suppliers (adapted: "late" is shipped
    * more than 60 days after the order date). The textbook plan scans
    * lineitem THREE times (l1 + EXISTS l2 + NOT-EXISTS l3); here one
    * scan computes per order the distinct-supplier count, the
    * distinct-LATE-supplier count, and the late line count, and the
    * predicate `n_supp ≥ 2 ∧ n_late_supp = 1` is exactly the
    * exists/not-exists pair — the oracle SQL is the textbook
    * triple-scan form, so the hash match PROVES the rewrite. One
    * shuffle instead of three joins on a 100 TB fact.
    *
    * The distinct counts are a TWO-LEVEL aggregation, not
    * `countDistinct`: two distinct aggregates make Catalyst Expand
    * every joined fact row ×3 ahead of the shuffle (1.8B rows at the
    * ×1000 corpus). Grouping by (orderkey, suppkey) first and
    * re-aggregating by orderkey computes the same four values — and
    * since the fact join already hash-partitions on orderkey, BOTH
    * aggregate levels are shuffle-free at scale (clustering on a
    * superset of the partitioning keys): the Expand and its exchange
    * vanish from the plan.
    */
  def waitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    // shuffled-hash, not sort-merge: hashing the (filtered, slim)
    // orders side skips the O(n log n) sort of the 600M-row fact —
    // the same trade the containment rescore measured; build side is
    // orders/32 partitions, well inside executor memory
    val perSupp = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/lineitem.parquet", ord),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(late, 1L).otherwise(0L)).as("supp_late_lines"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("supp_late_lines") > 0L, 1L).otherwise(0L)).as("n_late_supp"),
        min(when(col("supp_late_lines") > 0L, col("l_suppkey"))).as("late_supp"),
        sum(col("supp_late_lines")).as("n_late_lines"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
    perOrder.join(broadcast(s), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }

  /** TPC-H Q22-shaped dormant rich customers (adapted: grouped by
    * nation instead of phone prefix, and "dormant" means no orders in
    * the data's final year — every synthetic customer has SOME order,
    * so the textbook's no-orders-ever test is vacuous here):
    * above-positive-average balance, no recent orders. The average is
    * ONE broadcast scalar (exact decimal sum / count, double-divided
    * identically in the oracle); the dormancy test is a left-anti
    * join that streams customers against the recent-orders key table,
    * with the date filter pushed to the orders scan.
    */
  def dormantCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
      .select("o_custkey")
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
  }

  /** TPC-H Q2-shaped minimum-cost supplier (adapted: supply cost is
    * the minimum unit price a supplier has ever shipped the part at,
    * `min(l_extendedprice / l_quantity)` — the observed analog of
    * `ps_supplycost`). The defining feature is the correlated
    * minimum: only (part, supplier) rows achieving the per-part
    * regional minimum survive.
    *
    * Scale shape: BOTH broadcast dims prune BEFORE the fact shuffle
    * (p_size/p_type cut part ~300×, the region cut suppliers 5×), so
    * the groupBy aggregates only surviving fact rows; the correlated
    * min is a window over the O(parts × regional suppliers) aggregate
    * — no second scan, no self-join — and the result caps through
    * TakeOrderedAndProject. Cross-engine exactness: the unit price is
    * ONE IEEE division of the same two parquet doubles, and min() of
    * identical doubles is bit-identical in any order.
    */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")
    val eu = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(eu), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val p = Tables.part(spark, sfDir)
      .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_brand")
    val supply = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_brand"),
        col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supplycost"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    supply
      .withColumn("min_cost", min(col("supplycost")).over(w))
      .filter(col("supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("supplycost"))
      .orderBy(col("s_acctbal").desc, col("s_name").asc, col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q11-shaped important-parts-by-value (adapted: supply value
    * is shipped revenue `sum(l_extendedprice)` from EUROPE suppliers;
    * the textbook's fixed fraction becomes 1.25× the average per-part
    * value so the predicate is scale-invariant — a constant fraction
    * of TOTAL degenerates as the part count grows).
    *
    * The defining feature is the scalar-subquery gate: the total and
    * part count are ONE broadcast row crossed against the per-part
    * aggregate. Both sides compute the threshold compare in the same
    * order on exact decimal sums cast to double once (`4·value·n >
    * 5·total`), so the boundary is bit-identical cross-engine.
    */
  def importantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")
    val eu = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(eu), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    // Staged once (Materialize): the per-part aggregate feeds BOTH the
    // output rows and the scalar total — without staging, the scalar
    // subtree would rescan the 100 TB fact for an O(parts) frame.
    val perPart = graft.Materialize.stage(
      Tables.lineitem(spark, sfDir)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(dec2(col("l_extendedprice"))).as("value_dec")))
    val totals = perPart.agg(
      sum(col("value_dec")).as("total_dec"), count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(totals))
      .filter(col("value_dec").cast("double") * col("n_parts") * lit(4.0)
        > col("total_dec").cast("double") * lit(5.0))
      .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
  }

  /** TPC-H Q16-shaped supplier count per part attribute (adapted:
    * the supply relation is observed shipments, and the excluded
    * "complaint" suppliers are the distressed ones, s_acctbal < 0 —
    * the schema has no s_comment). Defining shape: dedup to DISTINCT
    * (brand, type, size, supplier) BEFORE the count so multiple
    * shipments don't inflate it, with the exclusion as a broadcast
    * left-anti join pushed below the distinct — at 100 TB the
    * distinct shuffles O(relationships), not O(lineitem).
    */
  def partSupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val excluded = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO"
        && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct()
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("supplier_cnt"))
  }

  /** TPC-H Q20-shaped surging suppliers (adapted: with shipments as
    * the supply relation, the availability-vs-half-year-demand test
    * becomes "shipped more of the red parts in 1997 than an average
    * year": `7 · qty_1997 > qty_total` over the 7-year corpus).
    *
    * Defining shape: the textbook's nested IN subqueries collapse to
    * ONE conditional-aggregate scan per supplier — the year slice and
    * the all-time total are two sums over the same rows — and the
    * supplier decorate is a semi join against the qualifying keys.
    * The compare is integer cents (`sum` of `quantity·100` as BIGINT):
    * exact, order-free, and overflow-safe past 10¹⁶ rows.
    */
  def surgingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val red = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith("red")).select("p_partkey")
    val in97 = col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    val qtyCents = (dec2(col("l_quantity")) * lit(100)).cast("long")
    val qualifying = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(when(in97, qtyCents).otherwise(0L)).as("q97"),
        sum(qtyCents).as("qtot"))
      .filter(col("q97") * lit(7L) > col("qtot"))
      .select("l_suppkey")
    Tables.supplier(spark, sfDir)
      .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> minCostSupplier _,
    "q11_important_parts" -> importantParts _,
    "q16_part_supplier_cnt" -> partSupplierCount _,
    "q20_surging_supplier" -> surgingSuppliers _,
    "q7_volume_shipping" -> volumeShipping _,
    "q8_market_share" -> marketShare _,
    "q9_product_profit" -> productProfit _,
    "q10_returned_items" -> returnedItems _,
    "q13_order_distribution" -> orderDistribution _,
    "q19_disjunctive_or" -> disjunctiveOr _,
    "q21_waiting_supplier" -> waitingSupplier _,
    "q22_dormant_customers" -> dormantCustomers _,
  )

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH supply AS (
        |  SELECT p_partkey, p_brand, s_name, s_acctbal, n_name,
        |    min(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
        |      AS supplycost
        |  FROM lineitem, part, supplier, nation, region
        |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
        |FROM supply
        |WHERE supplycost = (SELECT min(s2.supplycost) FROM supply s2
        |                    WHERE s2.p_partkey = supply.p_partkey)
        |ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem, supplier, nation, region
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM v
        |WHERE CAST(value_dec AS DOUBLE) * (SELECT count(*) FROM v) * 4.0
        |    > CAST((SELECT sum(value_dec) FROM v) AS DOUBLE) * 5.0""".stripMargin,
    "q16_part_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    // Textbook nested-IN form on purpose: the hash match proves the
    // one-scan conditional-aggregate rewrite is equivalent.
    "q20_surging_supplier" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY l_suppkey
        |  HAVING 7 * SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |                 THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                 ELSE 0 END)
        |       > SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)))""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(vol) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |    CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
         |  FROM supplier, lineitem, orders, customer,
         |       nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey
         |    AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
         |    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
         |    AND n1.n_name <> n2.n_name
         |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS mkt_share,
        |  count(*) AS n_items
        |FROM part, supplier, lineitem, orders, customer,
        |     nation n1, nation n2, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      - CAST(p_retailprice AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM part, supplier, lineitem, orders, nation
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%widget%'
        |GROUP BY n_name, o_year""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND c_nationkey = n_nationkey
         |  AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q19_disjunctive_or" ->
      s"""SELECT ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // Textbook triple-scan EXISTS/NOT-EXISTS form on purpose: the hash
    // match proves the one-scan aggregate rewrite is equivalent.
    "q21_waiting_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 10""".stripMargin,
    "q22_dormant_customers" ->
      s"""SELECT c_nationkey, count(*) AS numcust,
         |  ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${sqlDsum("c_acctbal")} / COUNT(c_acctbal)
         |                   FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
         |GROUP BY c_nationkey""".stripMargin,
  )
}
