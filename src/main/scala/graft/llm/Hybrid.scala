package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CosineSim.cosine_sim

/** Hybrid retrieval: dense (embedding) + sparse (keyword) search
  * fused into one ranked result — the RAG-stack staple the reference
  * paradigm expresses as two map→shuffle→reduce passes over the same
  * corpus (`worker.go:104-110`'s fan-out twice, once per channel).
  *
  * Candidates are the UNION of two channels, each blind to the other:
  *   - dense: same hyperplane-LSH bucket as the query
  *     ([[Similarity.signatureCol]] — data-oblivious, catches
  *     semantic neighbors with disjoint vocabulary);
  *   - sparse: shares a RARE term with the query (document frequency
  *     ≤ [[MaxDf]] — the IDF-channel skeleton: common terms generate
  *     candidates quadratically and rank information poorly, so only
  *     the rare tail joins).
  * Final score re-ranks the pooled candidates:
  * `0.7·cosine + 0.3·token-Jaccard`, both exact cross-engine (the
  * ordered-reduce cosine of [[graft.functions.CosineSim]]; Jaccard is
  * int/int division).
  *
  * Scale: the corpus-side term explode is the wordcount shuffle; the
  * rare-term df filter caps each posting list at [[MaxDf]], so sparse
  * candidates are Σ df² ≤ MaxDf·|rare terms| — never quadratic in the
  * corpus. The dense channel is the same bucket equi-join as
  * [[Similarity.lshTopK]]. Queries broadcast; the corpus never
  * self-joins outside bucket/term buckets.
  */
object Hybrid {

  val MaxDf = 5
  val WCos = 0.7
  val WJac = 0.3

  private def jaccard(a: Column, b: Column): Column = {
    val nInter = size(array_intersect(a, b))
    val nUnion = size(a) + size(b) - nInter
    when(nUnion > 0, nInter.cast("double") / nUnion.cast("double"))
  }

  def hybridTopK(spark: SparkSession, sfDir: String): DataFrame =
    hybridTopKOf(Tables.embeddings(spark, sfDir),
      Tables.documents(spark, sfDir))

  /** The bucketed+tokenized corpus, staged once for all consumers. */
  private def stagedCorpus(emb: DataFrame, docs: DataFrame): DataFrame =
    graft.Materialize.stage(emb
      .withColumn("bucket", Similarity.signatureCol(col("embedding")))
      .join(docs
          .select(col("doc_id"), array_distinct(TextAnalysis.tokensCol).as("toks")),
        col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("embedding"), col("bucket"), col("toks")))

  /** The broadcastable query frame over the staged corpus. */
  private def queryFrame(corpus: DataFrame): DataFrame =
    corpus.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"), col("toks").as("q_toks"))

  /** Rare-term postings (document frequency ≤ [[MaxDf]]) — the
    * sparse channel's candidate source, shared by both hybrid
    * queries so the df policy cannot desynchronize them.
    */
  private def rareTermPostings(corpus: DataFrame): DataFrame = {
    val terms = corpus.select(col("vec_id"), explode(col("toks")).as("t"))
    val rare = terms.groupBy(col("t"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= MaxDf)
      .select(col("t"))
    terms.join(rare, Seq("t"), "left_semi")
  }

  /** Query-side slice of [[rareTermPostings]]. */
  private def queryTerms(rareTerms: DataFrame): DataFrame =
    rareTerms.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("t").as("q_t"))

  /** Core over explicit (vec_id, embedding) + (doc_id, text) inputs.
    *
    * The bucketed+tokenized corpus is STAGED ([[graft.Materialize]]):
    * it feeds four consumers (query set, dense join, term explode,
    * final score joins), and without staging each one would rescan
    * the parquet and recompute the 4×64-dim hyperplane signature —
    * 16 scans at plan level. Staged, the corpus is computed once.
    */
  def hybridTopKOf(emb: DataFrame, docs: DataFrame): DataFrame = {
    val corpus = stagedCorpus(emb, docs)
    val q = queryFrame(corpus)

    val dense = corpus.select(col("vec_id"), col("bucket"))
      .join(broadcast(q.select(col("query_id"), col("q_bucket"))),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))

    val rareTerms = rareTermPostings(corpus)
    val sparse = rareTerms
      .join(broadcast(queryTerms(rareTerms)),
        col("t") === col("q_t") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))

    val cand = dense.union(sparse).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand
      .join(broadcast(q), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("toks")), Seq("neighbor_id"))
      .withColumn("cos", cosine_sim(col("q_emb"), col("embedding")))
      .withColumn("jac", jaccard(col("q_toks"), col("toks")))
      .withColumn("score",
        coalesce(col("cos"), lit(0.0)) * WCos
          + coalesce(col("jac"), lit(0.0)) * WJac)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Similarity.K)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("score"), col("cos"), col("jac"))
  }

  val RrfC = 60

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * over the same two candidate channels as [[hybridTopKOf]]: each
    * channel ranks its OWN candidates by its own signal (dense:
    * cosine; sparse: token Jaccard), and a candidate's fused score is
    * Σ_channels 1/([[RrfC]] + rank), an absent channel contributing
    * 0. Rank-based fusion needs no cross-channel score calibration —
    * why it is the default fusion in production hybrid search — and
    * is exactly reproducible cross-engine: ranks are integers and the
    * fused score a sum of two exact IEEE divisions.
    *
    * Scale: identical joins to [[hybridTopKOf]] (bucket equi-join +
    * df-capped rare-term join); the additions are two per-query
    * window ranks over candidate sets those joins already bound.
    * Channel ranks are emitted 0-coalesced (0 = "not a candidate in
    * this channel") so the output stays integer-typed.
    */
  def rrfTopK(spark: SparkSession, sfDir: String): DataFrame =
    rrfTopKOf(Tables.embeddings(spark, sfDir), Tables.documents(spark, sfDir))

  def rrfTopKOf(emb: DataFrame, docs: DataFrame): DataFrame = {
    val corpus = stagedCorpus(emb, docs)
    val q = queryFrame(corpus)

    val wD = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val dense = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("bucket"))
      .join(broadcast(q.select(col("query_id"), col("q_emb"), col("q_bucket"))),
        col("bucket") === col("q_bucket") && col("neighbor_id") =!= col("query_id"))
      // 0-coalesced like the sparse channel's jac: a NULL cosine
      // (zero-norm embedding) must rank below every valid score by
      // CONSTRUCTION, not by engine-default null ordering (Spark's
      // DESC NULLS LAST vs DuckDB's default merely happen to agree)
      .withColumn("cos",
        coalesce(cosine_sim(col("q_emb"), col("embedding")), lit(0.0)))
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(wD).as("r_dense"))

    val rareTerms = rareTermPostings(corpus)
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("jac").desc, col("neighbor_id").asc)
    val sparse = rareTerms
      .join(broadcast(queryTerms(rareTerms)),
        col("t") === col("q_t") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id")).distinct()
      .join(broadcast(q.select(col("query_id"), col("q_toks"))), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("toks")),
        Seq("neighbor_id"))
      .withColumn("jac", coalesce(jaccard(col("q_toks"), col("toks")), lit(0.0)))
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(wS).as("r_sparse"))

    val wF = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    dense.join(sparse, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfC) + col("r_dense")), lit(0.0))
          + coalesce(lit(1.0) / (lit(RrfC) + col("r_sparse")), lit(0.0)))
      .withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= Similarity.K)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("rrf"),
        coalesce(col("r_dense"), lit(0)).cast("long").as("r_dense"),
        coalesce(col("r_sparse"), lit(0)).cast("long").as("r_sparse"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_topk" -> hybridTopK _,
    "q_hybrid_rrf" -> rrfTopK _,
  )

  private def sqlJac(a: String, b: String): String =
    s"""(CASE WHEN len($a) + len($b) - len(list_intersect($a, $b)) > 0
       |  THEN CAST(len(list_intersect($a, $b)) AS DOUBLE)
       |       / CAST(len($a) + len($b) - len(list_intersect($a, $b)) AS DOUBLE)
       |  END)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_hybrid_topk" ->
      s"""WITH ${Similarity.sqlBuckets},
         |dtoks AS (
         |  SELECT doc_id, list_distinct(${TextAnalysis.sqlTokens}) AS toks
         |  FROM documents),
         |corpus AS (
         |  SELECT b.vec_id, b.embedding, b.bucket, t.toks
         |  FROM buckets b JOIN dtoks t ON b.vec_id = t.doc_id),
         |qs AS (
         |  SELECT * FROM corpus WHERE vec_id < ${Similarity.NumQueries}),
         |terms AS (
         |  SELECT vec_id, unnest(toks) AS t FROM corpus),
         |rare AS (
         |  SELECT t FROM terms GROUP BY t HAVING count(*) <= $MaxDf),
         |rt AS (
         |  SELECT vec_id, terms.t FROM terms JOIN rare ON terms.t = rare.t),
         |cand AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM qs q JOIN corpus c
         |    ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
         |  UNION
         |  SELECT qt.vec_id AS query_id, ct.vec_id AS neighbor_id
         |  FROM rt qt JOIN rt ct
         |    ON ct.t = qt.t AND ct.vec_id <> qt.vec_id
         |  WHERE qt.vec_id < ${Similarity.NumQueries}),
         |scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${Similarity.sqlCos("q.embedding", "c.embedding")} AS cos,
         |    ${sqlJac("q.toks", "c.toks")} AS jac
         |  FROM cand
         |  JOIN corpus q ON q.vec_id = cand.query_id
         |  JOIN corpus c ON c.vec_id = cand.neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, jac,
         |    COALESCE(cos, 0.0) * $WCos + COALESCE(jac, 0.0) * $WJac AS score
         |  FROM scored)
         |SELECT query_id, neighbor_id, rank, score, cos, jac FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, neighbor_id ASC) AS rank
         |  FROM ranked)
         |WHERE rank <= ${Similarity.K}""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH ${Similarity.sqlBuckets},
         |dtoks AS (
         |  SELECT doc_id, list_distinct(${TextAnalysis.sqlTokens}) AS toks
         |  FROM documents),
         |corpus AS (
         |  SELECT b.vec_id, b.embedding, b.bucket, t.toks
         |  FROM buckets b JOIN dtoks t ON b.vec_id = t.doc_id),
         |qs AS (
         |  SELECT * FROM corpus WHERE vec_id < ${Similarity.NumQueries}),
         |terms AS (
         |  SELECT vec_id, unnest(toks) AS t FROM corpus),
         |rare AS (
         |  SELECT t FROM terms GROUP BY t HAVING count(*) <= $MaxDf),
         |rt AS (
         |  SELECT vec_id, terms.t FROM terms JOIN rare ON terms.t = rare.t),
         |dense AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS r_dense
         |  FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      COALESCE(${Similarity.sqlCos("q.embedding", "c.embedding")}, 0.0) AS cos
         |    FROM qs q JOIN corpus c
         |      ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)),
         |scand AS (
         |  SELECT DISTINCT qt.vec_id AS query_id, ct.vec_id AS neighbor_id
         |  FROM rt qt JOIN rt ct
         |    ON ct.t = qt.t AND ct.vec_id <> qt.vec_id
         |  WHERE qt.vec_id < ${Similarity.NumQueries}),
         |sparse AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY jac DESC, neighbor_id ASC) AS r_sparse
         |  FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |      COALESCE(${sqlJac("q.toks", "c.toks")}, 0.0) AS jac
         |    FROM scand s
         |    JOIN corpus q ON q.vec_id = s.query_id
         |    JOIN corpus c ON c.vec_id = s.neighbor_id)),
         |fused AS (
         |  SELECT COALESCE(d.query_id, s.query_id) AS query_id,
         |    COALESCE(d.neighbor_id, s.neighbor_id) AS neighbor_id,
         |    COALESCE(CAST(1 AS DOUBLE) / ($RrfC + d.r_dense), 0.0)
         |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfC + s.r_sparse), 0.0) AS rrf,
         |    CAST(COALESCE(d.r_dense, 0) AS BIGINT) AS r_dense,
         |    CAST(COALESCE(s.r_sparse, 0) AS BIGINT) AS r_sparse
         |  FROM dense d FULL OUTER JOIN sparse s
         |    ON s.query_id = d.query_id AND s.neighbor_id = d.neighbor_id)
         |SELECT query_id, neighbor_id, rank, rrf, r_dense, r_sparse FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, neighbor_id ASC) AS rank
         |  FROM fused)
         |WHERE rank <= ${Similarity.K}""".stripMargin,
  )
}
