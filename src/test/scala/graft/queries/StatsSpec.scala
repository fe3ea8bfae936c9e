package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("correlation matches a driver-side exact computation") {
    val dir = "/root/testdata/sf0.001"
    val rows = Stats.corrQtyPrice(spark, dir).collect()
    assert(rows.length == 3) // returnflags A, N, R
    val data = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { r =>
      val (flag, corr) = (r.getString(0), r.getDouble(4))
      assert(corr >= -1.0 && corr <= 1.0, s"$flag corr $corr out of range")
      val xs = data.filter(_._1 == flag)
      // exact moments via BigDecimal, then the same double formula
      val n = xs.length.toDouble
      def bd(v: Double) = BigDecimal(v).setScale(2)
      val sx = xs.map(v => bd(v._2)).sum.toDouble
      val sy = xs.map(v => bd(v._3)).sum.toDouble
      val sxx = xs.map(v => bd(v._2) * bd(v._2)).sum.toDouble
      val syy = xs.map(v => bd(v._3) * bd(v._3)).sum.toDouble
      val sxy = xs.map(v => bd(v._2) * bd(v._3)).sum.toDouble
      val expect = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(corr - expect) < 1e-12,
        s"$flag: engine $corr vs driver $expect")
    }
  }

  test("kmv sketch: kth hash, exact count and estimate match a driver-side bottom-k") {
    val dir = "/root/testdata/sf0.001"
    val rows = Stats.kmvDistinct(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val byLang = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(w => (r.getString(0), h60(w))))
      .distinct.groupBy(_._1).map { case (l, ws) =>
        (l, ws.map(_._2).distinct.sorted) }
    assert(rows.keySet == byLang.keySet)
    byLang.foreach { case (lang, hashes) =>
      val (nExact, nSketch, kth, est) = rows(lang)
      assert(nExact == hashes.length)
      assert(nSketch == math.min(64, hashes.length))
      assert(kth == hashes(math.min(64, hashes.length) - 1))
      if (hashes.length < 64) assert(est == nExact.toDouble)
      else {
        val expect = 63.0 * 1152921504606846976.0 / kth
        assert(est == expect, s"$lang: $est vs $expect")
        // k=64 => relative stderr ~ 1/sqrt(62) ≈ 12.7%; 4σ bound
        assert(math.abs(est - nExact) / nExact < 0.51,
          s"$lang: estimate $est vs exact $nExact off by >4 sigma")
      }
    }
  }

  test("token outliers: every reported z is extreme, recomputed from raw counts") {
    val dir = "/root/testdata/sf0.001"
    val rows = Stats.tokenOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "sf0.001 corpus is known to contain an outlier")
    val bySource = graft.Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.llm.TextAnalysis.tokensCol).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, vs) => (s, vs.map(_._2.toDouble)) }
    rows.foreach { case (_, source, nt, z) =>
      assert(math.abs(z) >= 2.0)
      val vs = bySource(source)
      val mean = vs.sum / vs.length
      val variance = vs.map(v => v * v).sum / vs.length - mean * mean
      val expect = (nt - mean) / math.sqrt(variance)
      assert(math.abs(z - expect) < 1e-9, s"doc in $source: $z vs $expect")
    }
  }
}
