package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force checks of the round-8 event-analytics
  * additions: first/last-touch attribution, step-hold TWAP (whose
  * two-level lead decomposition must equal the naive global-order
  * construction), and linear gap interpolation.
  */
class EventAnalyticsSpec extends SparkSpec {

  private def cents(v: Double): java.math.BigDecimal =
    new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP)

  private lazy val events = graft.Tables.events(spark, sf001)
    .select(col("user_id"), graft.Tables.epochMicros(col("ts")).as("us"),
      col("event_id"), col("event_type"), col("value"),
      get_json_object(col("props"), "$.k").cast("int").as("page"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getInt(5))))

  test("attribution: first/last-touch credits match a brute-force pairing") {
    val lookbackUs = 7L * 24 * 3600000000L
    val first = scala.collection.mutable.Map[Option[Int], (Long, java.math.BigDecimal)]()
    val last = scala.collection.mutable.Map[Option[Int], (Long, java.math.BigDecimal)]()
    events.groupBy(_._1).values.foreach { rows =>
      val touches = rows.filter(r => r._4 == "view" || r._4 == "click")
        .sortBy(r => (r._2, r._3))
      rows.filter(_._4 == "purchase").foreach { p =>
        val in = touches.filter(t => t._2 <= p._2 && t._2 > p._2 - lookbackUs)
        if (in.nonEmpty) {
          // only pages that OPENED or CLOSED a purchase appear (the
          // round-9 as-of rewrite dropped mid-window zero-credit rows)
          for ((m, t) <- Seq((first, in.head), (last, in.last))) {
            val (n, v) = m.getOrElse(t._6, (0L, java.math.BigDecimal.ZERO))
            m(t._6) = (n + 1, v.add(cents(p._5)))
          }
        }
      }
    }
    val got = EventWindows.attribution(spark, sf001).collect().map { r =>
      val page = if (r.isNullAt(0)) None else Some(r.getInt(0))
      // a page credited on only one of the two models carries a NULL
      // sum on the other (SQL SUM over zero rows) — the brute force's 0
      def d(i: Int) = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
      page -> ((r.getLong(1), d(2), r.getLong(3), d(4)))
    }.toMap
    val expect = (first.keySet ++ last.keySet).map { page =>
      val (nf, vf) = first.getOrElse(page, (0L, java.math.BigDecimal.ZERO))
      val (nl, vl) = last.getOrElse(page, (0L, java.math.BigDecimal.ZERO))
      page -> ((nf, vf.doubleValue, nl, vl.doubleValue))
    }.toMap
    assert(got.nonEmpty)
    assert(got == expect,
      s"sample: ${(got.toSet -- expect.toSet).take(3)} vs ${(expect.toSet -- got.toSet).take(3)}")
  }

  test("twap: two-level decomposition equals the naive global step construction") {
    val hourUs = 3600000000L
    val num = scala.collection.mutable.Map[(Long, String), java.math.BigDecimal]()
    val held = scala.collection.mutable.Map[(Long, String), Long]().withDefaultValue(0L)
    events.groupBy(_._4).foreach { case (tpe, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.zip(ordered.tail).foreach { case (cur, next) =>
        val (s, e) = (cur._2, next._2)
        var b = s - s % hourUs
        while (b < e) {
          val ov = math.min(e, b + hourUs) - math.max(s, b)
          if (ov > 0) {
            val k = (b, tpe)
            num(k) = num.getOrElse(k, java.math.BigDecimal.ZERO)
              .add(cents(cur._5).multiply(java.math.BigDecimal.valueOf(ov)))
            held(k) += ov
          }
          b += hourUs
        }
      }
    }
    val got = EventWindows.twap(spark, sf001).collect().map { r =>
      val i = r.getTimestamp(0).toInstant
      ((i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getString(1)),
        (r.getDouble(2), r.getLong(3)))
    }.toMap
    val expect = num.keys.map { k =>
      k -> ((num(k).doubleValue / held(k).toDouble, held(k)))
    }.toMap
    assert(got.nonEmpty)
    // a type's holds within one hour never overlap: held ≤ hour
    got.values.foreach { case (_, h) => assert(h > 0 && h <= hourUs) }
    assert(got == expect,
      s"sample: ${(got.toSet -- expect.toSet).take(3)} vs ${(expect.toSet -- got.toSet).take(3)}")
  }

  test("interpolate: gaps are the straight line between observed hours; edges clamp") {
    val hourUs = 3600000000L
    val obs = scala.collection.mutable.Map[(Long, String), java.math.BigDecimal]()
    events.foreach { r =>
      val k = (r._2 - r._2 % hourUs, r._4)
      obs(k) = obs.getOrElse(k, java.math.BigDecimal.ZERO).add(cents(r._5))
    }
    val lo = events.map(_._2).min / hourUs * hourUs
    val hi = events.map(_._2).max / hourUs * hourUs
    val types = events.map(_._4).distinct
    val expect = types.flatMap { tpe =>
      val series = (lo to hi by hourUs).map(h => (h, obs.get((h, tpe)).map(_.doubleValue)))
      series.indices.map { i =>
        val (h, v) = series(i)
        val value = v.getOrElse {
          val prev = series.take(i).reverse.find(_._2.isDefined)
          val next = series.drop(i + 1).find(_._2.isDefined)
          (prev, next) match {
            case (None, Some((_, Some(nv)))) => nv
            case (Some((_, Some(pv))), None) => pv
            case (Some((ph, Some(pv))), Some((nh, Some(nv)))) =>
              pv + (nv - pv) * ((h - ph).toDouble / (nh - ph).toDouble)
            case _ => fail(s"type $tpe has no observations at all")
          }
        }
        (h, tpe) -> ((value, v.isEmpty))
      }
    }.toMap
    val got = EventWindows.interpolate(spark, sf001).collect().map { r =>
      val i = r.getTimestamp(0).toInstant
      ((i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getString(1)),
        (r.getDouble(2), r.getBoolean(3)))
    }.toMap
    assert(got.nonEmpty && got.values.exists(_._2),
      "fixture has no empty hours — interpolation untested")
    assert(got == expect,
      s"sample: ${(got.toSet -- expect.toSet).take(3)} vs ${(expect.toSet -- got.toSet).take(3)}")
  }

  test("ohlc: open/close are the tie-broken first/last values; high/low exact") {
    val hourUs = 3600000000L
    val expect = events.groupBy(r => (r._2 - r._2 % hourUs, r._4)).map {
      case (k, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3)).map(_._5)
        k -> ((ordered.head, ordered.max, ordered.min, ordered.last,
          ordered.length.toLong))
    }
    val got = EventWindows.ohlc(spark, sf001).collect().map { r =>
      val i = r.getTimestamp(0).toInstant
      ((i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))
    }.toMap
    assert(got.nonEmpty)
    assert(got == expect,
      s"sample: ${(got.toSet -- expect.toSet).take(3)} vs ${(expect.toSet -- got.toSet).take(3)}")
  }

  test("cohort ltv: cumulative revenue by cohort age matches brute force; curve monotone") {
    val dayUs = 86400000000L
    val byUser = events.groupBy(_._1)
    val cohortOf = byUser.map { case (u, rs) => u -> rs.map(_._2 / dayUs).min }
    val sizes = cohortOf.groupBy(_._2).map { case (c, us) => c -> us.size.toLong }
    val rev = scala.collection.mutable.Map[(Long, Int), (java.math.BigDecimal, Long)]()
    events.filter(_._4 == "purchase").foreach { r =>
      val c = cohortOf(r._1)
      val age = (r._2 / dayUs - c).toInt
      val (v, n) = rev.getOrElse((c, age), (java.math.BigDecimal.ZERO, 0L))
      rev((c, age)) = (v.add(cents(r._5)), n + 1)
    }
    val expect = rev.keys.groupBy(_._1).flatMap { case (c, ks) =>
      var cum = java.math.BigDecimal.ZERO
      ks.toSeq.sorted.map { case (_, age) =>
        val (v, n) = rev((c, age))
        cum = cum.add(v)
        (c, age) -> ((n, v.doubleValue, cum.doubleValue,
          cum.doubleValue / sizes(c).toDouble))
      }
    }
    val got = EventWindows.cohortLtv(spark, sf001).collect().map { r =>
      val i = r.getTimestamp(0).toInstant
      (i.getEpochSecond * 1000000L / dayUs, r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    }.toMap
    assert(got.nonEmpty)
    assert(got == expect,
      s"sample: ${(got.toSet -- expect.toSet).take(3)} vs ${(expect.toSet -- got.toSet).take(3)}")
    // within a cohort, cumulative revenue never decreases with age
    got.toSeq.groupBy(_._1._1).foreach { case (_, rows) =>
      val curve = rows.sortBy(_._1._2).map(_._2._3)
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a })
    }
  }

  test("forecast eval: seasonal-naive MAE/bias match a brute-force lag-24 scan") {
    val hourUs = 3600000000L
    val lo = events.map(_._2).min / hourUs
    val hi = events.map(_._2).max / hourUs
    val counts = events.groupBy(r => (r._2 / hourUs, r._4))
      .map { case (k, rs) => k -> rs.length.toLong }
    val expect = events.map(_._4).distinct.map { tpe =>
      val series = (lo to hi).map(h => counts.getOrElse((h, tpe), 0L))
      val pairs = series.drop(24).zip(series.dropRight(24))
      val n = pairs.length.toLong
      tpe -> ((n,
        pairs.map { case (a, p) => math.abs(a - p) }.sum.toDouble / n.toDouble,
        pairs.map { case (a, p) => a - p }.sum.toDouble / n.toDouble))
    }.toMap
    val got = EventWindows.forecastEval(spark, sf001).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))
    }.toMap
    assert(got.nonEmpty)
    assert(got == expect, s"got $got vs $expect")
  }

  test("rolling active: 7-day WAU and same-day DAU match a brute-force window scan") {
    val dayUs = 86400000000L
    val pairs = events.map(r => (r._1, r._2 / dayUs)).distinct
    val maxDay = pairs.map(_._2).max
    val minDay = pairs.map(_._2).min
    val expect = (minDay to maxDay + 0).flatMap { d =>
      // report days start at the first activity day and end at the last
      val wau = pairs.collect { case (u, day) if day <= d && day >= d - 6 => u }.distinct.size.toLong
      val dau = pairs.collect { case (u, day) if day == d => u }.distinct.size.toLong
      if (wau == 0) None else Some(d -> ((wau, dau)))
    }.toMap
    val got = EventWindows.rollingActive(spark, sf001).collect().map { r =>
      val i = r.getTimestamp(0).toInstant
      (i.getEpochSecond * 1000000L / dayUs) -> ((r.getLong(1), r.getLong(2)))
    }.toMap
    assert(got.nonEmpty)
    // WAU must dominate DAU everywhere, and exceed it somewhere
    got.values.foreach { case (w, d) => assert(w >= d) }
    assert(got.values.exists { case (w, d) => w > d })
    assert(got == expect,
      s"sample: ${(got.toSet -- expect.toSet).take(3)} vs ${(expect.toSet -- got.toSet).take(3)}")
  }

  test("transitions: Markov matrix rows sum to 1 and match brute-force counts") {
    val pairs = events.groupBy(_._1).values.flatMap { rows =>
      val o = rows.sortBy(r => (r._2, r._3)).map(_._4)
      o.zip(o.drop(1))
    }.toSeq
    val expect = pairs.groupBy(identity).map { case ((a, b), xs) =>
      (a, b) -> xs.length.toLong }
    val fromTotals = expect.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val got = EventWindows.transitions(spark, sf001).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))
    }.toMap
    assert(got.nonEmpty)
    assert(got.map { case (k, v) => k -> v._1 } == expect)
    got.foreach { case ((a, _), (n, tot, p)) =>
      assert(tot == fromTotals(a))
      assert(p == n.toDouble / tot.toDouble)
    }
    // each from-row's probabilities sum to ~1 (exact rationals n/tot)
    got.groupBy(_._1._1).foreach { case (a, m) =>
      val s = m.values.map(_._3).sum
      assert(math.abs(s - 1.0) < 1e-9, s"from=$a probabilities sum to $s")
    }
  }
}
