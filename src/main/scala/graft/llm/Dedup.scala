package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.PortableHash._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash signatures + LSH band candidate pairs,
  * SimHash, and exact n-gram Jaccard. All pure DataFrame ops over
  * codegen'd expressions; every hash is the portable md5-derived
  * [[PortableHash.h60]] so the DuckDB oracle reproduces results
  * bit-for-bit.
  *
  * Scale design: exact dedup and the signature computations are one
  * scan + one groupBy each. Candidate generation NEVER does the n²
  * all-pairs join — pairs come from the LSH band self-join, whose
  * cost is sum(bucket²) over band buckets (tiny when signatures are
  * selective). That's the property that survives 100 TB; brute-force
  * pair scans do not.
  */
object Dedup {

  /** 3-word shingles of a document (whole text as one shingle for
    * docs under 3 tokens), deduplicated after explode.
    */
  private def shinglesCol: Column = {
    val ws = TextAnalysis.tokensCol
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ",
          element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  private val sqlShingles =
    """CASE WHEN len(ws) >= 3
      |     THEN list_transform(range(1, len(ws) - 1),
      |            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |     ELSE [array_to_string(ws, ' ')] END""".stripMargin

  private val sqlShingleTable =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), w -> length(w) > 0) AS ws
       |  FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest($sqlShingles) AS shingle FROM toks)""".stripMargin

  /** Distinct (doc_id, shingle) pairs. */
  private def shingleTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shinglesCol).as("shingle"))
      .distinct()

  /** Exact dedup: md5 over whitespace-normalized lowercased text;
    * representative = min doc_id per group.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_dups"))

  /** MinHash signatures: 16 hash functions as salted h60 over the
    * shingle set — `mh_i(d) = min over shingles s of h60(s # i)`.
    * Salting gives independent families with no (a*h+b) mod-p overflow
    * portability hazards. Output exploded flat as (doc_id, i, mh).
    */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    shingleTable(spark, sfDir)
      .select(col("doc_id"), col("shingle"),
        explode(sequence(lit(0), lit(15))).as("i"))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(h60(col("shingle"), col("i").cast("string"))).as("mh"))

  private val sqlMinhash =
    s"""mh AS (
       |  SELECT doc_id, i, min(${sqlH60("shingle || '#' || i")}) AS mh
       |  FROM sh CROSS JOIN range(16) t(i)
       |  GROUP BY doc_id, i)""".stripMargin

  /** MinHash-LSH candidate pairs: 8 bands × 2 rows. Docs collide when
    * one band's 2 minhashes match exactly; est_jaccard is the match
    * fraction across all 16. The self-join is on (band, sig) buckets —
    * never all-pairs.
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val mh = minhashSignatures(spark, sfDir)
    val bands = mh.withColumn("band", expr("i div 2"))
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          s => concat(s("i").cast("string"), lit(":"), s("mh").cast("string"))))
        .as("sig"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand.join(mh.as("ma"), col("doc_a") === col("ma.doc_id"))
      .join(mh.as("mb"),
        col("doc_b") === col("mb.doc_id") && col("ma.i") === col("mb.i"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("ma.mh") === col("mb.mh"), 1).otherwise(0)) / 16.0)
        .as("est_jaccard"))
  }

  /** SimHash (32-bit): per-bit ±1 votes from token hashes, with token
    * multiplicity as the weight (a token appearing twice votes twice).
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextAnalysis.tokensCol).as("w"))
      .withColumn("h", h60(col("w"), lit("sim")))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(expr("shiftright(h, b) & 1") === 1, 1).otherwise(-1)).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
        .as("simhash"))

  /** Exact n-gram Jaccard between consecutive doc ids — the oracle
    * for MinHash estimates and a direct near-dup measure on a known
    * linear pair set (adjacent ids ⇒ O(n) pairs, deterministic).
    */
  def jaccardAdjacent(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingleTable(spark, sfDir)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1
          && col("b.shingle") === col("a.shingle"))
      .groupBy(col("a.doc_id").as("doc_a"))
      .agg(count(lit(1)).as("ni"))
    cnt.as("ca")
      .join(cnt.as("cb"), col("cb.doc_id") === col("ca.doc_id") + 1)
      .join(inter, col("doc_a") === col("ca.doc_id"), "left")
      .select(
        col("ca.doc_id").as("doc_a"), col("cb.doc_id").as("doc_b"),
        coalesce(col("ni"), lit(0L)).as("n_inter"),
        col("ca.n").as("n_a"), col("cb.n").as("n_b"),
        (coalesce(col("ni"), lit(0L)).cast("double")
          / (col("ca.n") + col("cb.n") - coalesce(col("ni"), lit(0L))))
          .as("jaccard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> exact _,
    "q_dedup_minhash" -> minhashSignatures _,
    "q_dedup_minhash_pairs" -> minhashLshPairs _,
    "q_dedup_simhash" -> simhash _,
    "q_jaccard_adjacent" -> jaccardAdjacent _,
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
        |  min(doc_id) AS keep_doc, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_minhash" ->
      s"""$sqlShingleTable,
         |$sqlMinhash
         |SELECT doc_id, CAST(i AS INT) AS i, mh FROM mh""".stripMargin,
    "q_dedup_minhash_pairs" ->
      s"""$sqlShingleTable,
         |$sqlMinhash,
         |bands AS (
         |  SELECT doc_id, i // 2 AS band,
         |    string_agg(i || ':' || mh, ',' ORDER BY i) AS sig
         |  FROM mh GROUP BY doc_id, i // 2),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
         |FROM cand
         |JOIN mh ma ON ma.doc_id = doc_a
         |JOIN mh mb ON mb.doc_id = doc_b AND mb.i = ma.i
         |GROUP BY doc_a, doc_b""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '\\s+'), w -> length(w) > 0)) AS w
         |  FROM documents),
         |th AS (SELECT doc_id, ${sqlH60("w || '#sim'")} AS h FROM toks),
         |bits AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM th CROSS JOIN range(32) t(b)
         |  GROUP BY doc_id, b)
         |SELECT doc_id,
         |  SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
         |FROM bits GROUP BY doc_id""".stripMargin,
    "q_jaccard_adjacent" ->
      s"""$sqlShingleTable,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, count(*) AS ni
         |  FROM sh a JOIN sh b
         |    ON b.doc_id = a.doc_id + 1 AND b.shingle = a.shingle
         |  GROUP BY a.doc_id)
         |SELECT ca.doc_id AS doc_a, cb.doc_id AS doc_b,
         |  COALESCE(ni, 0) AS n_inter, ca.n AS n_a, cb.n AS n_b,
         |  CAST(COALESCE(ni, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(ni, 0)) AS jaccard
         |FROM cnt ca
         |JOIN cnt cb ON cb.doc_id = ca.doc_id + 1
         |LEFT JOIN inter ON doc_a = ca.doc_id""".stripMargin,
  )
}
