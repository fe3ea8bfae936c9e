package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.operators.{BloomJoin, Compaction}

class IncrementalSpec extends SparkSpec {

  test("bloom prune keeps every true match and the composed join " +
      "equals the plain semi join") {
    val dimKeys = Tables.customer(spark, sf001)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val orders = Tables.orders(spark, sf001)
    val pruned = BloomJoin.bloomPrune(orders, "o_custkey", dimKeys, 100000L)
    val exact = orders.join(dimKeys,
      col("o_custkey") === col("c_custkey"), "leftsemi")
    // no false negatives: every exact-match row survives the prune
    assert(exact.join(pruned.select(col("o_orderkey")), Seq("o_orderkey"),
      "leftanti").count() === 0)
    // composed prune→join is value-identical to the plain semi join
    val composed = pruned.join(dimKeys,
      col("o_custkey") === col("c_custkey"), "leftsemi")
    assert(composed.count() === exact.count())
    assert(composed.join(exact, Seq("o_orderkey"), "leftanti").count() === 0)
  }

  test("bloom prune actually prunes non-matching fact rows") {
    val dimKeys = Tables.customer(spark, sf001)
      .filter(col("c_custkey") <= 5).select(col("c_custkey"))
    val orders = Tables.orders(spark, sf001)
    val kept = BloomJoin.bloomPrune(orders, "o_custkey", dimKeys, 100L).count()
    // 3% nominal fpp: the prune must remove the overwhelming majority
    assert(kept < orders.count() / 4, s"bloom kept $kept rows")
  }

  test("latestPerKey returns exactly one row per key, the max ordering") {
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val latest = Compaction.latestPerKey(ev, Seq("user_id"),
      Seq(col("ts"), col("event_id")))
    val nKeys = ev.select(col("user_id")).distinct().count()
    assert(latest.count() === nKeys)
    // each kept row carries its user's max ts
    val maxTs = ev.groupBy(col("user_id")).agg(max(col("ts")).as("mts"))
    assert(latest.join(maxTs, Seq("user_id"))
      .filter(col("ts") =!= col("mts")).count() === 0)
  }

  test("upsertMerge(base-snapshot, tail) == compact(full log)") {
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val cut = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val ordering = Seq(col("ts"), col("event_id"))
    val base = Compaction.latestPerKey(ev.filter(col("ts") < cut),
      Seq("user_id"), ordering)
    val merged = Compaction.upsertMerge(base, ev.filter(col("ts") >= cut),
      Seq("user_id"), ordering)
    val full = Compaction.latestPerKey(ev, Seq("user_id"), ordering)
    assert(merged.count() === full.count())
    assert(merged.join(full, Seq("user_id", "event_id"), "leftanti")
      .count() === 0)
  }

  test("upsertMerge prefers the update row on an exact ordering tie") {
    import spark.implicits._
    val base = Seq((1L, 10L, "old")).toDF("k", "ts", "v")
    val upd = Seq((1L, 10L, "new")).toDF("k", "ts", "v")
    val out = Compaction.upsertMerge(base, upd, Seq("k"), Seq(col("ts")))
      .collect()
    assert(out.length === 1 && out(0).getString(2) === "new")
  }

  test("format roundtrips lose nothing (ORC + CSV vs direct parquet)") {
    val orc = Incremental.orcRoundtrip(spark, sf001)
    val direct = Tables.lineitem(spark, sf001)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(graft.Exact.dsum(col("l_quantity")).as("sum_qty"),
        graft.Exact.dsum(col("l_extendedprice")).as("sum_price"),
        max(col("l_partkey")).as("max_part"), count(lit(1)).as("n"))
    assert(orc.exceptAll(direct).count() === 0 &&
      direct.exceptAll(orc).count() === 0)

    val csv = Incremental.csvRoundtrip(spark, sf001)
    val directCsv = Tables.documents(spark, sf001)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        max(concat(col("lang"), lit(",\""), col("source"), lit("\"")))
          .as("max_tricky"),
        countDistinct(col("source")).as("n_sources"))
    assert(csv.exceptAll(directCsv).count() === 0 &&
      directCsv.exceptAll(csv).count() === 0)
  }

  test("bloom prefilter sits in the plan as a might_contain predicate") {
    val p = graft.SparkEntry.queries("q_bloom_join")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom predicate missing:\n$p")
  }

  test("partitioned-sink read prunes to the one matching partition") {
    val df = Incremental.partitionedSinkRead(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_type#\\d+ = purchase".r
      .findFirstIn(p).isDefined,
      s"partition filter not applied at the scan:\n$p")
    val direct = graft.Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(df.count() === direct.count())
  }

  test("gap-filled hourly covers every (hour, type) cell with zeros") {
    val out = Incremental.gapFilledHourly(spark, sf001)
    val nHours = out.select(col("hour")).distinct().count()
    val nTypes = out.select(col("event_type")).distinct().count()
    assert(out.count() === nHours * nTypes, "grid is not dense")
    // zeros exist (sf0.001's sparse stream cannot fill every cell)
    assert(out.filter(col("n") === 0).count() > 0)
    // filled cells match the plain hourly aggregate
    val direct = graft.Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type")).agg(count(lit(1)).as("n"))
    assert(out.filter(col("n") > 0).select(col("hour"), col("event_type"),
      col("n")).exceptAll(direct).count() === 0)
  }

  test("z-order buckets are axis-aligned boxes on both dimensions") {
    val stats = Incremental.zorderLayoutStats(spark, sf001).collect()
    // densified 8-bit dims, bucket = top 8 z-bits => many buckets, and
    // each bucket is a 16x16 box (8 unfixed low z-bits = 4 per dim)
    assert(stats.length > 8, s"only ${stats.length} z buckets")
    stats.foreach { r =>
      val (minP, maxP) = (r.getAs[Long]("min_part"), r.getAs[Long]("max_part"))
      val (minS, maxS) = (r.getAs[Long]("min_supp"), r.getAs[Long]("max_supp"))
      assert(maxP - minP < 16, s"part extent ${maxP - minP}")
      assert(maxS - minS < 16, s"supp extent ${maxS - minS}")
    }
  }
}
