package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.PortableHash.{h60, sqlH60}

/** Repeated-span (boilerplate) detection — the exact-substring dedup
  * signal of Lee et al.'s "Deduplicating Training Data Makes Language
  * Models Better": a fixed-length token window that recurs across
  * documents is boilerplate (headers, footers, license blurbs,
  * navigation chrome) that set-level MinHash can't see because it
  * judges whole documents, not spans.
  *
  * The reference's wordcount shape (`worker.go:104-110` map → hash
  * shuffle → `worker.go:155-169` grouped reduce) generalized to
  * 8-token windows, with one scale-critical twist: the count shuffle
  * is keyed on the 60-bit hash of the span, NOT the span string. An
  * 8-token span averages ~50 bytes and there are ~|tokens| of them,
  * so shuffling strings moves the whole corpus ~7×; shuffling
  * (hash, doc_id) moves 16 bytes a span. The winning spans' strings
  * are recovered afterwards by a second map-only pass filtered with a
  * broadcast IN-list of the k winning hashes — at 100 TB that's a
  * full rescan, but a cheap one (no shuffle, pushdown-friendly), and
  * it touches k=50 groups instead of re-shuffling a corpus of text.
  */
object Boilerplate {

  /** The per-doc span relation every pass here reads: doc_id, the
    * token array `ws`, and the POSITIONAL 8-gram hash array `gh`
    * (gh[i] covers tokens i..i+n-1, 1-based through element_at).
    * Deliberately NOT staged: the ×1000 profile (BASELINE.md r13)
    * put tokenize+ngrams+h60 at ~11 s a pass against a ~50 s count
    * shuffle, and a localCheckpoint of ws+gh (~2 GB of row blocks)
    * cost more in write+read+GC than the recompute — measured as a
    * net LOSS (spans 82 → 90 s) plus a transient same-JVM OOM when
    * two staged queries ran back to back. Each pass recomputes the
    * map work inline off the columnar parquet scan instead.
    */
  private def gramRelation(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokensCol.as("ws"))
      .withColumn("gh",
        transform(graft.functions.Ngrams.ngrams(col("ws"), n), g => h60(g)))

  /** The count shuffle — ONE exchange, 16 bytes a span-group ((h, c),
    * never the string and never doc_id): in-doc duplicate spans
    * collapse IN-ROW first ([[graft.functions.LongCounts]] — sorted
    * run-length (h, c) pairs per doc), which makes (h, doc) unique by
    * construction, so `n_docs = count(1)` and `n_occ = sum(c)` need
    * no distinct-dedup aggregate level at all. The previous
    * `count_distinct(doc_id) + count(1)` formulation planned TWO
    * aggregate levels and shuffled all 235.7M ×1000 occurrences
    * twice — profiled at ~48 s of the 72 s count pass this shape
    * deletes (BASELINE.md r13).
    */
  private def topSpans(g: DataFrame, k: Int, minDocs: Int): DataFrame =
    g.select(explode(graft.functions.LongCounts.long_counts(col("gh")))
        .as("hc"))
      .select(col("hc.v").as("h"), col("hc.c").as("c"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("h").asc)
      .limit(k)

  /** Flagged-position array per doc: indices i (1-based) where gh[i]
    * is in the broadcast flagged-hash set. The size guard matters:
    * Spark `sequence(1, 0)` DESCENDS instead of yielding empty, and
    * `element_at(gh, 0)` is an ANSI error.
    */
  private def flaggedPositions(gh: Column, bh: Column): Column =
    when(size(gh) > 0,
      filter(sequence(lit(1), size(gh)), i => array_contains(bh, element_at(gh, i))))
      .otherwise(array().cast("array<int>"))

  /** Winning spans' strings, recovered from the STAGED relation: per
    * doc, slice `ws` at each flagged position (the gram string is the
    * space-join of its n tokens — [[graft.functions.Ngrams]]
    * semantics) — a membership test over ≤ k broadcast hashes per
    * gram instead of re-tokenizing and re-hashing the corpus.
    */
  private def recoverStrings(g: DataFrame, top: DataFrame, n: Int): DataFrame = {
    val bSet = top.agg(collect_set(col("h")).as("bh"))
    g.crossJoin(broadcast(bSet))
      .select(col("ws"), col("gh"),
        explode(flaggedPositions(col("gh"), col("bh"))).as("p"))
      .select(element_at(col("gh"), col("p")).as("h"),
        array_join(slice(col("ws"), col("p"), lit(n)), " ").as("span"))
      .groupBy(col("h")).agg(min(col("span")).as("span"))
  }

  /** Spans seen in ≥ `minDocs` distinct documents, top `k` by
    * (document frequency, occurrence count), ties broken on the span
    * hash for a deterministic cut. Documents shorter than `n` tokens
    * contribute nothing. One tokenize+hash scan (staged), two cheap
    * array re-reads.
    */
  def repeatedSpans(docs: DataFrame, n: Int = 8, k: Int = 50,
      minDocs: Int = 2): DataFrame = {
    val g = gramRelation(docs, n)
    val top = topSpans(g, k, minDocs)
    top.join(recoverStrings(g, top, n), Seq("h"))
      .select(col("span"), col("n_docs"), col("n_occ"))
  }

  def spansQuery(spark: SparkSession, sfDir: String): DataFrame =
    repeatedSpans(Tables.documents(spark, sfDir))

  /** Boilerplate REMOVAL — the strip pass the detector feeds: every
    * token covered by an occurrence of a flagged span (any 8-token
    * window whose hash is in the flagged set) is dropped, and the
    * survivors rejoin with single spaces. Positions are 1-based: gram
    * i covers tokens i..i+7, so token j is removed iff some flagged
    * gram position p satisfies j-7 ≤ p ≤ j.
    *
    * The flagged set rides in as a one-row broadcast array (≤ k
    * hashes — a bounded build side, like the TF-IDF corpus count),
    * so the strip itself is a map-only second pass over the corpus:
    * detect pays the count shuffle once, strip shuffles nothing.
    */
  /** Strip core over a (staged or inline) gram relation, flagged
    * hashes already extracted as a one-row broadcast array.
    */
  private def stripCore(g: DataFrame, bSet: DataFrame, n: Int): DataFrame =
    g.crossJoin(broadcast(bSet))
      .select(col("doc_id"), col("ws"),
        flaggedPositions(col("gh"), col("bh")).as("fp"))
      .select(col("doc_id"),
        array_join(
          when(size(col("ws")) > 0,
            transform(
              filter(sequence(lit(1), size(col("ws"))),
                j => !exists(col("fp"), p => p >= j - (n - 1) && p <= j)),
              j => element_at(col("ws"), j)))
            .otherwise(array().cast("array<string>")), " ").as("clean_text"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(col("fp")).cast("long").as("n_flagged_spans"))
      .withColumn("n_kept",
        when(length(col("clean_text")) === 0, 0L)
          .otherwise(size(split(col("clean_text"), " ")).cast("long")))

  /** Composable strip against an external flagged-span table (span
    * strings): one corpus scan, no staging (nothing is read twice).
    */
  def stripSpans(docs: DataFrame, flagged: DataFrame, n: Int = 8): DataFrame =
    stripCore(gramRelation(docs, n),
      flagged.agg(collect_set(h60(col("span"))).as("bh")), n)

  /** The registered detect-then-strip composition. Fused (r13): the
    * detector's top-k HASHES feed the strip directly — the string-
    * recovery pass exists only for human-readable output and the
    * strip never needed it — so the corpus is scanned twice (count,
    * strip), down from three times, and the count pass itself is the
    * one-shuffle [[topSpans]] shape. ×1000 isolated same-day A/B:
    * 91.6 → 57.7 s min-of-2 (BASELINE.md span-family section).
    */
  def stripQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val g = gramRelation(Tables.documents(spark, sfDir), 8)
    stripCore(g, topSpans(g, 50, 2).agg(collect_set(col("h")).as("bh")), 8)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_spans" -> spansQuery _,
    "q_dedup_strip_spans" -> stripQuery _,
  )

  /** Mirror: DuckDB slices `ws[i : i + 7]` (inclusive) over
    * `range(1, len - 6)` = the same 8-token windows as
    * [[graft.functions.Ngrams]]; the hash-group / string-recovery
    * split is mirrored exactly so the deterministic top-k cut agrees.
    */
  /** Shared CTE chain: tokens → exploded spans+hashes → top-k. */
  private val sqlTopCtes =
    s"""toks AS (
       |  SELECT doc_id, ${TextAnalysis.sqlTokens} AS ws FROM documents),
       |spans AS (
       |  SELECT doc_id, span, ${sqlH60("span")} AS h FROM (
       |    SELECT doc_id,
       |      unnest(CASE WHEN len(ws) >= 8
       |        THEN list_transform(range(1, len(ws) - 6),
       |               i -> array_to_string(ws[i : i + 7], ' '))
       |        ELSE [] END) AS span
       |    FROM toks)),
       |top AS (
       |  SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |    CAST(count(*) AS BIGINT) AS n_occ
       |  FROM spans GROUP BY h
       |  HAVING count(DISTINCT doc_id) >= 2
       |  ORDER BY n_docs DESC, n_occ DESC, h ASC LIMIT 50)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_spans" ->
      s"""WITH $sqlTopCtes
         |SELECT s.span, t.n_docs, t.n_occ
         |FROM top t JOIN (SELECT h, min(span) AS span FROM spans
         |                 GROUP BY h) s USING (h)""".stripMargin,
    "q_dedup_strip_spans" ->
      s"""WITH $sqlTopCtes,
         |bset AS (SELECT list(h) AS bh FROM top),
         |marked AS (
         |  SELECT doc_id, ws,
         |    CASE WHEN len(ws) >= 8
         |      THEN list_filter(range(1, len(ws) - 6),
         |             i -> list_contains(bh,
         |                    ${sqlH60("array_to_string(ws[i : i + 7], ' ')")}))
         |      ELSE [] END AS fp
         |  FROM toks CROSS JOIN bset),
         |kept AS (
         |  SELECT doc_id, ws, fp,
         |    list_transform(
         |      list_filter(range(1, len(ws) + 1),
         |        j -> len(list_filter(fp, p -> p >= j - 7 AND p <= j)) = 0),
         |      j -> ws[j]) AS kw
         |  FROM marked)
         |SELECT doc_id,
         |  -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
         |  COALESCE(array_to_string(kw, ' '), '') AS clean_text,
         |  CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CAST(len(fp) AS BIGINT) AS n_flagged_spans,
         |  CAST(CASE WHEN length(COALESCE(array_to_string(kw, ' '), '')) = 0
         |       THEN 0 ELSE len(kw) END AS BIGINT) AS n_kept
         |FROM kept""".stripMargin,
  )
}
