package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Materialize, Tables}

/** Graph analytics over the click-transition graph derived from
  * `events`: consecutive events of one user (ordered by `ts`, ties by
  * `event_id`) form a directed edge between their `props.k` page ids,
  * weighted by transition count.
  *
  * PageRank here is FIXED-POINT integer arithmetic throughout
  * (ranks are BIGINTs scaled by 2^30; damping 17/20; every division
  * is an integer `div`), for the same reason the embedding centroids
  * are ([[graft.llm.Similarity]]): float summation order varies with
  * partitioning, so a double-typed rank would not be
  * oracle-comparable — and on a real cluster would not even be
  * reproducible run-to-run. With integers, Spark and DuckDB agree
  * bit-for-bit after any number of iterations.
  *
  * Scale shape: edges/outweights are staged once and reused by every
  * iteration; each iteration is one equi-join (ranks ⋈ edges on src,
  * a hash shuffle on the edge key) plus one aggregation on dst —
  * the textbook distributed PageRank step. Ranks never leave the
  * cluster; the only driver value is the node count (one scalar),
  * which sizes the teleport constant. Dangling mass (nodes with no
  * out-edges) is dropped, not redistributed — the deterministic
  * variant; documented, and mirrored exactly by the oracle.
  */
object Graph {
  /** 2^30 — the fixed-point scale for rank values. */
  val Scale: Long = 1L << 30

  /** Directed weighted click-transition edges (src, dst, w). */
  def clickEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("nk", lead(col("k"), 1).over(byUser))
      .where(col("nk").isNotNull)
      .groupBy(col("k").as("src"), col("nk").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** `iters` rounds of damped PageRank; returns (page, pr, pr_frac).
    * `pr` is the scaled BIGINT rank (exact); `pr_frac` is the single
    * terminal IEEE division pr/2^30 (identical cross-engine because
    * both operands are exact).
    */
  def pageRank(spark: SparkSession, sfDir: String, iters: Int = 3): DataFrame = {
    val edges = Materialize.stage(clickEdges(spark, sfDir))
    val nodes = Materialize.stage(
      edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct())
    // node count is the one driver-side scalar: it sizes the teleport
    // and init constants (dimension-cardinality sized, like the
    // k-means centroid collect)
    // max(…, 1): a zero-row corpus has no nodes, and every downstream
    // plan is empty anyway — the constants just need to be defined
    val n = math.max(nodes.count(), 1L)
    val init = Scale / n
    val tele = 3L * Scale / (20L * n)
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    val contribEdges = Materialize.stage(edges.join(outw, "src"))

    var ranks = nodes.select(col("id"), lit(init).as("r"))
    for (_ <- 1 to iters) {
      val inflow = contribEdges
        .join(ranks, contribEdges("src") === ranks("id"))
        .select(col("dst"), expr("(r * w) div tw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = Materialize.stage(
        nodes.join(inflow, nodes("id") === inflow("dst"), "left")
          .select(nodes("id"),
            (lit(tele) + coalesce(expr("(17 * s) div 20"), lit(0L))).as("r")))
    }
    ranks.select(col("id").as("page"), col("r").as("pr"),
      (col("r").cast("double") / Scale).as("pr_frac"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> ((s: SparkSession, d: String) => pageRank(s, d)),
  )

  /** Oracle: the same three iterations unrolled as CTEs; `//` is
    * DuckDB's integer floor-division (all quantities positive, so it
    * matches Spark's truncating `div`).
    */
  private def iterSql(prev: String, out: String): String =
    s"""$out AS (
       |  SELECT n.id, c.tele + COALESCE((17 * f.s) // 20, 0) AS r
       |  FROM nodes n CROSS JOIN consts c
       |  LEFT JOIN (
       |    SELECT e.dst AS id, sum((r.r * e.w) // o.tw) AS s
       |    FROM edges e JOIN $prev r ON r.id = e.src
       |    JOIN outw o ON o.src = e.src
       |    GROUP BY e.dst) f ON f.id = n.id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_graph_pagerank" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |         CAST(json_extract_string(props, '$$.k') AS INT) AS k
         |  FROM events),
         |nxt AS (
         |  SELECT k AS src,
         |         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM ev),
         |edges AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
         |  FROM nxt WHERE dst IS NOT NULL GROUP BY src, dst),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |consts AS (
         |  SELECT CAST(${Scale} AS BIGINT) // n AS init,
         |         CAST(${3L * Scale} AS BIGINT) // (20 * n) AS tele
         |  FROM nn),
         |outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
         |r0 AS (SELECT id, init AS r FROM nodes CROSS JOIN consts),
         |${iterSql("r0", "i1")},
         |${iterSql("i1", "i2")},
         |${iterSql("i2", "i3")}
         |SELECT id AS page, CAST(r AS BIGINT) AS pr,
         |       CAST(r AS DOUBLE) / ${Scale} AS pr_frac
         |FROM i3""".stripMargin,
  )
}
