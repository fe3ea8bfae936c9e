package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over the click-transition graph. */
class GraphSpec extends SparkSpec {

  test("ranks are positive, node-complete, and conserve bounded mass") {
    val edges = Graph.clickEdges(spark, sf001)
    val nNodes = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().count()
    val pr = Graph.pageRank(spark, sf001).cache()
    assert(pr.count() == nNodes, "one rank row per node")
    assert(pr.where(col("pr") <= 0).count() == 0, "every rank positive")
    // total mass: ≤ 2^30 (floor losses + dropped dangling mass only
    // shrink it), and ≥ the pure-teleport floor N·tele
    val total = pr.agg(sum(col("pr"))).head().getLong(0)
    assert(total <= Graph.Scale)
    assert(total >= nNodes * (3L * Graph.Scale / (20L * nNodes)))
  }

  test("a sink-free uniform cycle is a fixed point of the iteration") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 0, equal weights: uniform ranks must stay uniform
    val edges = Seq((0, 1, 5L), (1, 2, 5L), (2, 0, 5L))
      .toDF("src", "dst", "w")
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    val e = edges.join(outw, "src")
    val init = Graph.Scale / 3
    val tele = 3L * Graph.Scale / (20L * 3)
    var ranks = Seq(0, 1, 2).toDF("id").select(col("id"), lit(init).as("r"))
    for (_ <- 1 to 3) {
      val inflow = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("(r * w) div tw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = inflow.select(col("dst").as("id"),
        (lit(tele) + expr("(17 * s) div 20")).as("r"))
    }
    val rs = ranks.select(col("r")).as[Long].collect().toSet
    assert(rs.size == 1, s"cycle ranks must stay uniform, got $rs")
    // fixed point of r = tele + floor(17 r / 20): r* ≈ 20/3·tele
    val r = rs.head
    assert(r == tele + 17L * r / 20L, "uniform rank is the iteration's fixed point")
  }

  test("a page with only outbound transitions keeps exactly the teleport rank") {
    // build from real data: find a src-only node if one exists;
    // otherwise assert the floor analytically on the full output
    val pr = Graph.pageRank(spark, sf001)
    val edges = Graph.clickEdges(spark, sf001)
    val n = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().count()
    val tele = 3L * Graph.Scale / (20L * n)
    assert(pr.where(col("pr") < tele).count() == 0,
      "teleport term is a hard floor for every node")
  }

  test("triangles: planted K4 + pendant path counts exactly 4; orientation-proof") {
    import spark.implicits._
    // K4 on {1,2,3,4} = 4 triangles; path 4-5-6 adds edges but no
    // triangle; a self-loop and duplicate/reversed edges must all be
    // normalized away by the undirected-distinct step.
    val edges = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // K4
      (2, 1), (4, 3),                                 // reversed dups
      (5, 4), (5, 6),                                 // pendant path
      (6, 6)                                          // self-loop
    ).toDF("src", "dst")
    val r = Graph.triangleCountOf(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 8L, 4L)),
      s"expected (6 nodes, 8 edges, 4 triangles), got $r")
  }

  test("triangles: random graphs match the reference enumeration (fixed seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 5
      val edges = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).toSet
      val expected = (for {
        (a, b) <- und; c <- (b + 1) until n
        if und.contains((a, c)) && und.contains((b, c))
      } yield (a, b, c)).size
      val got = Graph.triangleCountOf(edges.toDF("src", "dst"))
        .collect().head.getLong(2)
      assert(got == expected.toLong, s"trial $trial (n=$n): $got vs $expected")
    }
  }

  test("components over the corpus: labels match a driver BFS reference") {
    val rows = Graph.connectedComponents(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // independent reference: BFS over the same undirected edge set
    val edges = Graph.clickEdges(spark, sf001)
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.filter { case (a, b) => a != b }.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val allNodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val label = scala.collection.mutable.Map.empty[Long, Long]
    allNodes.sorted.foreach { start =>
      if (!label.contains(start)) {
        var frontier = List(start); val seen = scala.collection.mutable.Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj).filterNot(seen)
          frontier.foreach(seen.add)
        }
        seen.foreach(n => label(n) = seen.min)
      }
    }
    assert(rows.map(r => r._1 -> r._2).toMap == label.toMap)
    // sizes are consistent with the labels
    val sizes = label.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (_, comp, sz) => assert(sizes(comp) == sz) }
  }

  test("BFS hops: planted graph — shortest paths win, the hop cap truncates, unreachable stays NULL") {
    import spark.implicits._
    // 1→2→3→4→5 chain, a 1→3 shortcut, and 6→1 (unreachable FROM 1:
    // BFS follows direction). Source is min(id) = 1.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (6L, 1L))
      .toDF("src", "dst")
    def hops(maxHops: Int): Map[Long, Option[Int]] =
      Graph.bfsHopsOf(e, maxHops).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
        .toMap
    assert(hops(4) == Map(
      1L -> Some(0), 2L -> Some(1), 3L -> Some(1), // shortcut beats 2-hop path
      4L -> Some(2), 5L -> Some(3), 6L -> None))
    // cap at 2: node 5 (dist 3) must be unreached, nothing else changes
    assert(hops(2) == Map(
      1L -> Some(0), 2L -> Some(1), 3L -> Some(1),
      4L -> Some(2), 5L -> None, 6L -> None))
  }

  test("label prop: planted two-clique bridge graph resolves to two communities") {
    import spark.implicits._
    // two K4s joined by one weak bridge (4-5, weight 1 vs 10 inside);
    // a self-loop-only node 9 must stay a singleton. CC would merge
    // the cliques into one 8-node component — label prop must NOT.
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = k4a.map { case (a, b) => (a + 4L, b + 4L) }
    val edges = ((k4a ++ k4b).map { case (a, b) => (a, b, 10L) }
      ++ Seq((4L, 5L, 1L), (9L, 9L, 3L)))
      .toDF("src", "dst", "w")
    val r = Graph.labelPropagationOf(edges, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val expected = (1L to 4L).map(n => (n, 1L, 4L)).toSet ++
      (5L to 8L).map(n => (n, 5L, 4L)).toSet + ((9L, 9L, 1L))
    assert(r == expected, s"got $r")
  }

  test("label prop: equal-weight triangle converges to the min label") {
    import spark.implicits._
    // synchronous rounds with (max weight, min label) tiebreak: round
    // 1 gives 1->2, 2->1, 3->1; round 2 resolves every tie to 1
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 2L))
      .toDF("src", "dst", "w")
    val r = Graph.labelPropagationOf(edges, 3)
      .select(col("community")).distinct()
      .as[Long].collect().toSet
    assert(r == Set(1L), s"deterministic tiebreak must land on min id, got $r")
  }

  test("triangles over the corpus: count matches the unoriented enumeration") {
    val und = Graph.clickEdges(spark, sf001)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val expected = (for {
      (a, b) <- und; (a2, c) <- und
      if a2 == a && c > b && und.contains((b, c))
    } yield (a, b, c)).size
    val got = Graph.triangleCount(spark, sf001).collect().head.getLong(2)
    assert(got == expected.toLong, s"engine $got vs reference $expected")
  }
}
