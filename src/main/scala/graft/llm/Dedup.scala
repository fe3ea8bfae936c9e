package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.PortableHash._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash signatures + LSH band candidate pairs,
  * SimHash, and exact n-gram Jaccard. All pure DataFrame ops over
  * codegen'd/native expressions; every hash is the portable
  * md5-derived [[PortableHash.h60]] so the DuckDB oracle reproduces
  * results bit-for-bit.
  *
  * Scale design — everything per-document is computed over shingle
  * ARRAYS inside the row (map-only, zero shuffle): signatures,
  * simhash, per-doc shingle sets. The only shuffles in the whole
  * module are (a) the LSH band bucket self-join for candidate pairs —
  * cost sum(bucket²), never the n² all-pairs — and (b) the final tiny
  * aggregations. Two performance rules learned the hard way at sf0.1
  * (70 s → ~1 s class hotspots):
  *   - never reference a computed array twice inside a projection or
  *     HOF lambda without [[PortableHash.bind]] — argument trees
  *     re-evaluate per element access;
  *   - one md5 per shingle, then cheap affine integer mixes for the
  *     16-way family ([[PortableHash.minhashMix]]) — not 16 md5s.
  */
object Dedup {

  /** Distinct 3-word shingles of a document as an array column
    * (whole text as one shingle for docs under 3 tokens). The token
    * array is bound once; shingle assembly is O(tokens).
    */
  private def shingleArr: Column =
    bind(TextAnalysis.tokensCol) { ws =>
      array_distinct(
        when(size(ws) >= 3, graft.functions.Ngrams.ngrams(ws, 3))
          .otherwise(array(concat_ws(" ", ws))))
    }

  /** Shared tokenizer SQL — one source of truth with TextAnalysis. */
  private val sqlWs = TextAnalysis.sqlTokens

  /** CTE producing (doc_id, sh) with sh = distinct shingle list —
    * mirrors [[shingleArr]].
    */
  private val sqlShArr =
    s"""WITH toks AS (
       |  SELECT doc_id, $sqlWs AS ws FROM documents),
       |sharr AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(ws) >= 3
       |         THEN list_transform(range(1, len(ws) - 1),
       |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
       |         ELSE [array_to_string(ws, ' ')] END) AS sh
       |  FROM toks)""".stripMargin

  /** (doc_id, sh: array<string>) — one row per document. */
  private def shArrTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), shingleArr.as("sh"))

  /** 16 MinHash values as an array column: the native codegen'd
    * [[graft.functions.MinhashSigs]] expression — one fused
    * hash+16-minima loop per document (the earlier nested-HOF
    * formulation dispatched interpreted lambdas O(16·shingles) times
    * per row; MinhashSigsSpec asserts bit-exact equivalence).
    */
  private def mhsOf(sh: Column): Column =
    graft.functions.MinhashSigs.minhash_sigs(sh)

  private val sqlMhs =
    s"""list_transform(range(0, 16),
       |  i -> list_min(list_transform(hv, h -> ${sqlMinhashMix("h", "i")})))""".stripMargin

  private val sqlSigs =
    s"""hvt AS (
       |  SELECT doc_id,
       |    list_transform(sh, s -> ${sqlH60("s")} & 2147483647) AS hv
       |  FROM sharr),
       |sigs AS (SELECT doc_id, $sqlMhs AS mhs FROM hvt)""".stripMargin

  /** Shared CTE chain ending in `comp(doc, cluster)` — the connected-
    * components result reused by the clusters and near-keep oracles.
    */
  private lazy val sqlCompChain =
    s"""$sqlShArr,
       |$sqlSigs,
       |$sqlBandsCand,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |      len(list_filter(list_zip(sa.mhs, sb.mhs), p -> p[1] = p[2])) / 16.0 AS est
       |    FROM cand
       |    JOIN sigs sa ON sa.doc_id = doc_a
       |    JOIN sigs sb ON sb.doc_id = doc_b)
       |  WHERE est >= 0.5),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc FROM edges),
       |reach(doc, r) AS (
       |  SELECT doc, doc FROM nodes
       |  UNION
       |  SELECT reach.doc, e.dst FROM reach JOIN edges e ON reach.r = e.src),
       |comp AS (SELECT doc, min(r) AS cluster FROM reach GROUP BY doc)""".stripMargin

  /** Shared band + candidate-pair CTEs (used by the pairs and the
    * clusters oracles — keep them textually identical).
    */
  private val sqlBandsCand =
    """bands AS (
      |  SELECT doc_id, CAST(b AS INT) AS band,
      |    (b*2) || ':' || mhs[b*2 + 1] || ',' || (b*2+1) || ':' || mhs[b*2 + 2] AS sig
      |  FROM sigs CROSS JOIN range(0, 8) t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  /** Exact dedup: md5 over whitespace-normalized lowercased text;
    * representative = min doc_id per group.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_dups"))

  /** MinHash signatures, exploded flat as (doc_id, i, mh) for the
    * oracle compare.
    */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    shArrTable(spark, sfDir)
      .select(col("doc_id"), posexplode(mhsOf(col("sh"))))
      .select(col("doc_id"), col("pos").as("i"), col("col").as("mh"))

  /** MinHash-LSH candidate pairs: 8 bands × 2 rows. Band signatures
    * are strings "2b:mh[2b],2b+1:mh[2b+1]" computed per-row from the
    * bound signature array; docs collide when one band matches
    * exactly. est_jaccard = match fraction across all 16 from a zip
    * of the two signature arrays.
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // Materialize signatures once: the plan references `sigs` three
    // times (band explode + two candidate-attach joins), and without a
    // checkpoint each reference re-runs the md5+affine-mix pipeline
    // over every shingle. Signatures are ~16 longs per document —
    // orders of magnitude smaller than the text they summarize — so
    // persisting them is the right trade at any corpus size. LAZY
    // (eager=false): materialization happens at first action, so
    // merely constructing the query (plan audits, explain dumps)
    // stays free.
    val sigs = shArrTable(spark, sfDir)
      .select(col("doc_id"), mhsOf(col("sh")).as("mhs"))
      .localCheckpoint(false)
    val bands = sigs.select(col("doc_id"),
      posexplode(bind(col("mhs")) { mhs =>
        transform(sequence(lit(0), lit(7)), b => concat(
          (b * 2).cast("string"), lit(":"),
          element_at(mhs, b * 2 + 1).cast("string"), lit(","),
          (b * 2 + 1).cast("string"), lit(":"),
          element_at(mhs, b * 2 + 2).cast("string")))
      }))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("sig"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("mhs").as("mhs_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("mhs").as("mhs_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("mhs_a"), col("mhs_b"), (x, y) => x === y),
          b => b)) / 16.0).as("est_jaccard"))
  }

  /** SimHash (32-bit): per-bit ±1 votes from token hashes with token
    * multiplicity, via the native codegen'd [[graft.functions.Simhash]]
    * expression — one fused hash+vote+fold loop per document. (The
    * earlier higher-order-function formulation computed the same value
    * through O(32·tokens) interpreted lambda dispatches per row.)
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.Simhash.simhash(TextAnalysis.tokensCol).as("simhash"))

  /** End-to-end near-dup clustering: LSH candidate pairs with
    * est_jaccard >= 0.5 form an undirected graph; connected components
    * are computed by distributed min-label propagation to fixpoint
    * (each round: every node takes the min cluster id among itself and
    * its neighbors). Every document gets a cluster id (= min doc_id of
    * its component; singletons cluster with themselves) and an is_dup
    * flag. The DuckDB oracle computes the same components with a
    * recursive CTE.
    *
    * Scale: the loop is O(component diameter) joins over the EDGE set
    * (tiny after LSH banding), never over the corpus; localCheckpoint
    * truncates lineage so plans don't grow per iteration. This is the
    * standard large-graph CC shape (label propagation); the corpus
    * table is touched exactly once at the end.
    */
  /** Edge sets at most this size are solved with driver-side
    * union-find (one job, microseconds of CPU); larger graphs fall
    * back to the distributed label-propagation loop. LSH banding keeps
    * real near-dup graphs far below this even at corpus scale — the
    * pair count is O(actual duplicates), not O(corpus).
    */
  private val DriverCCMaxEdges = 1000000L

  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    // checkpoint pairs first: the LSH pipeline above it is the
    // expensive part — compute it once
    val pairs = minhashLshPairs(spark, sfDir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val nEdges = pairs.count()
    // broadcast the label table ONLY on the small-graph path — the
    // distributed path exists precisely because labels may not fit
    // the driver, so it must shuffle-join
    val labels =
      if (nEdges <= DriverCCMaxEdges) broadcast(driverUnionFind(spark, pairs))
      else distributedLabelProp(pairs)
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "ldoc"),
        col("doc_id") === col("ldoc"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .withColumn("is_dup", col("cluster") =!= col("doc_id"))
  }

  /** Union-find over a collected edge list — exact min-label
    * components in one pass, for graphs that fit the driver.
    */
  private def driverUnionFind(spark: SparkSession,
      pairs: DataFrame): DataFrame = {
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    // iterative find with path compression (no stack risk on chains)
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x
      while (cur != root) { val next = parent(cur); parent(cur) = root; cur = next }
      root
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-label wins
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    import spark.implicits._
    nodes.map(n => (n, find(n))).toSeq.toDF("doc_id", "cluster")
  }

  /** Distributed min-label propagation to fixpoint — the path for
    * graphs too large to collect. O(diameter) rounds of small joins;
    * localCheckpoint truncates lineage per round.
    */
  private def distributedLabelProp(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint(true)
    val maxIters = 50
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val prop = labels.join(edges, labels("doc_id") === edges("src"))
        .select(edges("dst").as("doc_id"), col("cluster"))
      val next = labels.unionAll(prop)
        .groupBy("doc_id").agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      changed = next.except(labels).count()
      labels = next
      iter += 1
    }
    // fail loudly rather than return a silently-split clustering: a
    // component with diameter > maxIters hasn't converged (would need
    // the large-star/small-star doubling variant, which converges in
    // O(log diameter) rounds)
    require(changed == 0,
      s"connected components did not converge after $maxIters rounds")
    labels
  }

  /** The deduplicated corpus itself — the rows a pipeline ships:
    * keep the min-doc_id representative of each exact-dup group.
    */
  def keepRepresentatives(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val keep = exact(spark, sfDir).select(col("keep_doc"))
    docs.join(keep, docs("doc_id") === keep("keep_doc"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** NEAR-dup deduplicated corpus: keep the min-doc_id representative
    * of every connected near-dup cluster (singletons represent
    * themselves) — the [[keepRepresentatives]] counterpart at
    * est_jaccard ≥ 0.5 instead of exact equality. Shaped as an
    * ANTI-join against the is_dup set: that side is O(actual
    * duplicates) — genuinely tiny and broadcastable — where the
    * keep-side is approximately the whole corpus.
    */
  def keepNearDupRepresentatives(spark: SparkSession, sfDir: String): DataFrame = {
    val dups = dedupClusters(spark, sfDir)
      .filter(col("is_dup"))
      .select(col("doc_id"))
    Tables.documents(spark, sfDir)
      .join(broadcast(dups), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Exact n-gram Jaccard between consecutive doc ids: a doc-level
    * self-join (n rows, broadcastable) with per-row array
    * intersection — no shingle-level shuffle.
    */
  def jaccardAdjacent(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shArrTable(spark, sfDir)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_inter"),
        size(col("sh_a")).cast("long").as("n_a"),
        size(col("sh_b")).cast("long").as("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> exact _,
    "q_dedup_minhash" -> minhashSignatures _,
    "q_dedup_minhash_pairs" -> minhashLshPairs _,
    "q_dedup_simhash" -> simhash _,
    "q_dedup_clusters" -> dedupClusters _,
    "q_dedup_keep" -> keepRepresentatives _,
    "q_dedup_near_keep" -> keepNearDupRepresentatives _,
    "q_jaccard_adjacent" -> jaccardAdjacent _,
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
        |  min(doc_id) AS keep_doc, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_minhash" ->
      s"""$sqlShArr,
         |$sqlSigs
         |SELECT doc_id, CAST(i AS INT) AS i, mhs[i + 1] AS mh
         |FROM sigs CROSS JOIN range(0, 16) t(i)""".stripMargin,
    "q_dedup_minhash_pairs" ->
      s"""$sqlShArr,
         |$sqlSigs,
         |$sqlBandsCand
         |SELECT doc_a, doc_b,
         |  len(list_filter(list_zip(sa.mhs, sb.mhs), p -> p[1] = p[2])) / 16.0 AS est_jaccard
         |FROM cand
         |JOIN sigs sa ON sa.doc_id = doc_a
         |JOIN sigs sb ON sb.doc_id = doc_b""".stripMargin,
    "q_dedup_clusters" ->
      // the recursive member (reach) requires the RECURSIVE keyword on
      // the single WITH that opens the chained CTE list
      s"""$sqlCompChain
         |SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
         |  COALESCE(c.cluster, d.doc_id) <> d.doc_id AS is_dup
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc""".stripMargin
        .replaceFirst("WITH ", "WITH RECURSIVE "),
    "q_dedup_near_keep" ->
      s"""$sqlCompChain
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc
         |WHERE COALESCE(c.cluster, d.doc_id) = d.doc_id""".stripMargin
        .replaceFirst("WITH ", "WITH RECURSIVE "),
    "q_dedup_simhash" ->
      s"""WITH hs AS (
         |  SELECT doc_id,
         |    list_transform($sqlWs,
         |      w -> CAST('0x' || substr(md5(w || '#sim'), 1, 15) AS BIGINT)) AS hs
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(range(0, 32), b ->
         |    CASE WHEN list_sum(list_transform(hs,
         |           h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM hs""".stripMargin,
    "q_dedup_keep" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents
        |  GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))""".stripMargin,
    "q_jaccard_adjacent" ->
      s"""$sqlShArr
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
         |  CAST(len(a.sh) AS BIGINT) AS n_a,
         |  CAST(len(b.sh) AS BIGINT) AS n_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
         |FROM sharr a JOIN sharr b ON b.doc_id = a.doc_id + 1""".stripMargin,
  )
}
