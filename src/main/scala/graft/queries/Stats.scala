package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical aggregates with ORDER-INDEPENDENT cross-engine
  * determinism: Pearson correlation and z-score outlier detection.
  *
  * Neither uses the engines' built-in `corr`/`stddev` — those stream
  * doubles through Welford-style updates whose result depends on
  * partition order, so Spark and DuckDB disagree in the last ulps.
  * Instead both queries aggregate EXACT raw moments (decimal for
  * money-like doubles, BIGINT for integer token counts — both
  * associative, both order-free) and derive the statistic with one
  * fixed double formula evaluated identically by both engines: IEEE
  * +,*,/,sqrt are correctly rounded, so identical operand trees give
  * identical bits. Same trick as [[graft.Exact]], extended to second
  * moments.
  */
object Stats {

  private def d2(c: Column): Column = graft.Exact.dec2(c)

  /** Exact-split decimal→double for NON-NEGATIVE decimal sums.
    *
    * A direct `CAST(decimal AS DOUBLE)` is not deterministic across
    * engines: DuckDB converts the scaled int128 to double and then
    * divides by 10^scale — TWO roundings — while Spark/Java round the
    * decimal once, correctly; on values like 7096786968835.8685 they
    * differ by an ulp and a downstream correlation hash-mismatches.
    * Splitting into `floor` (an exactly-representable integer ≤ 2^53
    * at every gate SF) plus the scale-digit fractional numerator
    * (< 10^scale, also exact) leaves both engines evaluating the SAME
    * IEEE `hi + lo/10^scale` expression — identical bits. Mirror:
    * [[sqlDbl]].
    */
  private def dbl(c: Column, scale: Int): Column = {
    val pow = math.pow(10, scale)
    floor(c).cast("long").cast("double") +
      ((c - floor(c)) * lit(pow.toLong)).cast("long").cast("double") / lit(pow)
  }

  /** SQL fragment mirroring [[dbl]] for the DuckDB oracle. */
  private def sqlDbl(s: String, scale: Int): String = {
    val pow = math.pow(10, scale).toLong
    s"(CAST(CAST(floor($s) AS BIGINT) AS DOUBLE)" +
      s" + CAST(CAST(($s - floor($s)) * $pow AS BIGINT) AS DOUBLE) / $pow.0)"
  }

  /** Per-returnflag Pearson correlation (and means) of quantity vs
    * extended price over lineitem. Exact decimal first/second moments
    * — one map-side-combinable aggregation, no second pass — then the
    * raw-moment formula in doubles, with every moment entering double
    * land through the exact-split [[dbl]] conversion.
    */
  def corrQtyPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val q = col("l_quantity")
    val p = col("l_extendedprice")
    val m = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(d2(q)).as("sx_d"), sum(d2(p)).as("sy_d"),
        sum(d2(q) * d2(q)).as("sxx_d"), sum(d2(p) * d2(p)).as("syy_d"),
        sum(d2(q) * d2(p)).as("sxy_d"))
    val nd = col("n").cast("double")
    val sx = dbl(col("sx_d"), 2)
    val sy = dbl(col("sy_d"), 2)
    val sxx = dbl(col("sxx_d"), 4)
    val syy = dbl(col("syy_d"), 4)
    val sxy = dbl(col("sxy_d"), 4)
    m.select(col("l_returnflag"), col("n"),
      (sx / nd).as("avg_qty"),
      (sy / nd).as("avg_price"),
      ((nd * sxy - sx * sy)
        / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)))
        .as("corr_qty_price"))
  }

  /** Per-source token-count z-score outliers over documents — the
    * data-curation signal for aberrantly short/long members of a
    * source. Moments are exact BIGINT sums; the per-source stats table
    * is tiny (one row per source) and broadcast back, so the corpus is
    * scanned twice but never shuffled on a wide key.
    */
  def tokenOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(graft.llm.TextAnalysis.tokensCol).cast("long").as("nt"))
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val stats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("nt")).as("s1"),
        sum(col("nt") * col("nt")).as("s2"))
      .select(col("source"), mean.as("mean"),
        (col("s2").cast("double") / nd - mean * mean).as("var"))
    docs.join(broadcast(stats), Seq("source"))
      .filter(col("var") > 0)
      .select(col("doc_id"), col("source"), col("nt").as("n_tokens"),
        ((col("nt").cast("double") - col("mean")) / sqrt(col("var"))).as("z"))
      .filter(abs(col("z")) >= 2.0)
  }

  /** Skyline (Pareto frontier) of documents over (quality, length):
    * a doc is on the frontier iff no other doc strictly beats it on
    * BOTH axes. Computed rank-wise, not pairwise: per distinct
    * quality score take the max length, run a strict prefix-max over
    * scores descending, and a doc survives iff its length ≥ the max
    * length of any strictly-higher-quality doc. The only ordered
    * window runs on the DISTINCT-SCORE table — cardinality is the
    * quality formula's granularity, not the corpus — so the corpus
    * itself never sorts globally; it's one groupBy plus one equi-join
    * against the tiny per-score table. (The O(n²) NOT-EXISTS form is
    * the oracle's job, not the engine's.)
    */
  def skylineDocs(spark: SparkSession, sfDir: String): DataFrame = {
    // staged: the scored frame feeds both the per-score max and the
    // final join, and the quality expression is the regex-heavy part
    // of the whole query — unstaged, it evaluates twice per document
    val d = graft.Materialize.stage(Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.llm.TextAnalysis.qualityCol.as("q"),
        col("n_chars"))
      .where(col("q").isNotNull))
    val perq = d.groupBy(col("q")).agg(max(col("n_chars")).as("mx"))
    val strictPrefix = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val pm = perq.select(col("q"),
      max(col("mx")).over(strictPrefix).as("m_strict"))
    d.join(broadcast(pm), Seq("q"))
      .where(col("m_strict").isNull || col("n_chars") >= col("m_strict"))
      .select(col("doc_id"), col("q").as("quality"), col("n_chars"))
  }

  /** Bottom-k (KMV) distinct-count sketch of the token vocabulary per
    * language, checked against the exact distinct count it estimates.
    * The sketch is the k SMALLEST [[graft.llm.PortableHash.h60]]
    * values per group — a MERGEABLE summary (bottom-k of a union is
    * the bottom-k of the per-partition bottom-ks), which is what makes
    * it the 100-TB shape: only ≤ k longs per group ever cross the
    * final shuffle, and the classic estimator n̂ = (k−1)·2⁶⁰ / h₍ₖ₎
    * reads one number off the full sketch. A group that never fills
    * its sketch (< k distinct hashes) reports its exact count, per
    * the standard KMV definition.
    *
    * Physically the rank-≤-k is a `row_number ≤ k` window, which
    * Catalyst rewrites to WindowGroupLimit — each map task forwards
    * at most k rows per group BEFORE the exchange (plan-audited in
    * PLANS.md). The estimate is deterministic cross-engine: 63·2⁶⁰ is
    * exactly representable in a double and the single IEEE division
    * is correctly rounded, so both engines produce identical bits.
    * "Exact" is defined as distinct HASHES — md5-collision semantics
    * agree by construction instead of by luck.
    */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 64
    val two60 = 1152921504606846976L // h60's range: [0, 2^60)
    val hashed = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(graft.llm.TextAnalysis.tokensCol).as("word"))
      .select(col("lang"), graft.llm.PortableHash.h60(col("word")).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"))
    val sketch = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
    val exact = hashed.groupBy(col("lang")).agg(count(lit(1)).as("n_exact"))
    sketch.join(exact, Seq("lang"))
      .select(col("lang"), col("n_exact"), col("n_sketch"), col("kth_hash"),
        when(col("n_sketch") < k, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(two60).cast("double")
            / col("kth_hash").cast("double"))
          .as("est_distinct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_corr" -> corrQtyPrice _,
    "q_stats_outliers" -> tokenOutliers _,
    "q_skyline" -> skylineDocs _,
    "q_kmv_distinct" -> kmvDistinct _,
  )

  val oracles: Map[String, String] = Map(
    // same portable md5-prefix hash, same rank-<=-k sketch, same
    // exactly-representable 63*2^60 constant — identical double bits
    "q_kmv_distinct" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT lang, ${graft.llm.PortableHash.sqlH60("word")} AS h
         |  FROM (SELECT lang, unnest(${graft.llm.TextAnalysis.sqlTokens}) AS word
         |        FROM documents)),
         |ranked AS (
         |  SELECT lang, h,
         |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
         |  FROM toks),
         |sk AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_sketch,
         |         max(h) AS kth_hash
         |  FROM ranked WHERE rn <= 64 GROUP BY lang),
         |ex AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM toks GROUP BY lang)
         |SELECT lang, n_exact, n_sketch, kth_hash,
         |  CASE WHEN n_sketch < 64 THEN CAST(n_exact AS DOUBLE)
         |       ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
         |            / CAST(kth_hash AS DOUBLE) END AS est_distinct
         |FROM sk JOIN ex USING (lang)""".stripMargin,
    // rank-wise mirror of skylineDocs, NOT a NOT-EXISTS pairwise scan
    // — same strict-prefix-max construction so tie semantics (equal
    // quality never dominates) agree by shape, not by accident
    "q_skyline" ->
      s"""WITH d AS (
         |  SELECT doc_id, ${graft.llm.TextAnalysis.sqlQualityCol} AS q, n_chars
         |  FROM documents),
         |dd AS (SELECT * FROM d WHERE q IS NOT NULL),
         |perq AS (SELECT q, max(n_chars) AS mx FROM dd GROUP BY q),
         |pm AS (
         |  SELECT q, max(mx) OVER (ORDER BY q DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_strict
         |  FROM perq)
         |SELECT doc_id, dd.q AS quality, n_chars
         |FROM dd JOIN pm USING (q)
         |WHERE m_strict IS NULL OR n_chars >= m_strict""".stripMargin,
    // Decimal moments enter double land via the exact-split sqlDbl
    // form, NOT a direct CAST — DuckDB's native decimal→double cast
    // double-rounds (int128→double, then /10^scale) and can land an
    // ulp off Spark's correctly-rounded conversion.
    "q_stats_corr" ->
      s"""SELECT l_returnflag, n,
         |  sx / nd AS avg_qty,
         |  sy / nd AS avg_price,
         |  (nd * sxy - sx * sy)
         |    / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
         |    AS corr_qty_price
         |FROM (SELECT l_returnflag,
         |        CAST(count(*) AS BIGINT) AS n,
         |        CAST(count(*) AS DOUBLE) AS nd,
         |        ${sqlDbl("sum(CAST(l_quantity AS DECIMAL(18,2)))", 2)} AS sx,
         |        ${sqlDbl("sum(CAST(l_extendedprice AS DECIMAL(18,2)))", 2)} AS sy,
         |        ${sqlDbl("sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))", 4)} AS sxx,
         |        ${sqlDbl("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))", 4)} AS syy,
         |        ${sqlDbl("sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))", 4)} AS sxy
         |      FROM lineitem GROUP BY l_returnflag)""".stripMargin,
    "q_stats_outliers" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(${graft.llm.TextAnalysis.sqlTokens}) AS BIGINT) AS nt
         |  FROM documents),
         |st AS (
         |  SELECT source,
         |    CAST(s1 AS DOUBLE) / nd AS mean,
         |    CAST(s2 AS DOUBLE) / nd
         |      - CAST(s1 AS DOUBLE) / nd * (CAST(s1 AS DOUBLE) / nd) AS var
         |  FROM (SELECT source, CAST(count(*) AS DOUBLE) AS nd,
         |          CAST(sum(nt) AS BIGINT) AS s1,
         |          CAST(sum(nt * nt) AS BIGINT) AS s2
         |        FROM d GROUP BY source))
         |SELECT doc_id, source, nt AS n_tokens,
         |  (CAST(nt AS DOUBLE) - mean) / sqrt(var) AS z
         |FROM d JOIN st USING (source)
         |WHERE var > 0 AND abs((CAST(nt AS DOUBLE) - mean) / sqrt(var)) >= 2.0""".stripMargin,
  )
}
