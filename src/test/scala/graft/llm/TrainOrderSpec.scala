package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TrainOrderSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf001).select(col("doc_id"))

  test("same seed replays the identical order; a new seed re-deals") {
    val a = TrainOrder.shuffled(docs, "doc_id", "s1", 4)
      .as[(Long, Long, Long)].collect().toSet
    val b = TrainOrder.shuffled(docs, "doc_id", "s1", 4)
      .as[(Long, Long, Long)].collect().toSet
    val c = TrainOrder.shuffled(docs, "doc_id", "s2", 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a != c)
  }

  test("(shard, pos) is a bijection onto the corpus") {
    val rows = TrainOrder.shuffled(docs, "doc_id", "s1", 4)
      .as[(Long, Long, Long)].collect()
    assert(rows.map(r => (r._2, r._3)).distinct.length == rows.length)
    assert(rows.map(_._1).toSet == docs.as[Long].collect().toSet)
    // positions within each shard are 1..shardSize with no gaps
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("shards are load-balanced within 3x of each other") {
    val sizes = TrainOrder.shuffled(docs, "doc_id", "s1", 4)
      .groupBy("shard").count().as[(Long, Long)].collect().map(_._2)
    assert(sizes.length == 4)
    assert(sizes.max <= 3 * sizes.min)
  }

  test("the order is not the identity (it actually shuffles)") {
    val inOrder = TrainOrder.shuffled(docs, "doc_id", "s1", 1)
      .orderBy("pos").as[(Long, Long, Long)].collect().map(_._1)
    assert(inOrder.toSeq != inOrder.sorted.toSeq)
  }

  test("bijection and shard range hold for any shard count") {
    for (n <- Seq(1, 2, 5, 13, 32)) {
      val rows = TrainOrder.shuffled(docs, "doc_id", "sX", n)
        .as[(Long, Long, Long)].collect()
      assert(rows.map(_._1).toSet == docs.as[Long].collect().toSet, s"n=$n")
      assert(rows.forall(r => r._2 >= 0 && r._2 < n), s"n=$n shard range")
      rows.groupBy(_._2).values.foreach { b =>
        assert(b.map(_._3).sorted.toSeq == (1L to b.length).toSeq, s"n=$n pos")
      }
    }
  }

  test("curriculum buckets are quality-monotone quartiles") {
    val rows = TrainOrder.curriculum(spark, sf001)
      .as[(Long, Double, Long, Long)].collect()
    val n = docs.count()
    assert(rows.length == n)
    val byBucket = rows.groupBy(_._3)
    assert(byBucket.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
    // histogram-equalized: every bucket within 2x of n/4 (ties at a
    // threshold can shift mass down a bucket)
    byBucket.values.foreach(b =>
      assert(b.length <= n / 2 && b.length >= n / 8, s"bucket ${b.length}"))
    // monotone: max quality of bucket i <= min quality of bucket i+1
    val sortedBuckets = byBucket.toSeq.sortBy(_._1)
    sortedBuckets.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) =>
        assert(lo.map(_._2).max <= hi.map(_._2).min)
      case _ =>
    }
    // (bucket, pos) is a bijection: 1..size within each bucket
    byBucket.values.foreach { b =>
      assert(b.map(_._4).sorted.toSeq == (1L to b.length).toSeq)
    }
  }
}
