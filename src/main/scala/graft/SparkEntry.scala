package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.jobs.CanonicalJobs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a `queries` entry (Spark) and,
  * where ANSI-SQL-expressible, a matching `oracleSql` entry (DuckDB).
  * Column names are aliased identically on both sides — the driver's
  * compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CanonicalJobs.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    "mr_wordcount" -> (CanonicalJobs.wordcount _),
    "mr_inverted_index" -> (CanonicalJobs.invertedIndex _),
    "mr_grep" -> ((s: SparkSession, d: String) => CanonicalJobs.grep(s, d)),
    "mr_sort" -> (CanonicalJobs.sortDocs _),
    "mr_sql_mapf" -> (CanonicalJobs.sqlWordcount _),
    // the reference's plugin flow: a Java jar compiled + loaded at
    // run time (JobLoader), reproducing the wordcount oracle
    "mr_plugin_wordcount" -> (graft.jobs.PluginDemo.pluginWordcount _),
  ) ++ graft.queries.StarSchema.queries ++ graft.queries.TpchMore.queries ++
    graft.queries.EventWindows.queries ++
    graft.queries.Advanced.queries ++ graft.queries.Graph.queries ++
    graft.llm.TextAnalysis.queries ++ graft.llm.Dedup.queries ++
    graft.llm.NgramLM.queries ++ graft.llm.Bpe.queries ++
    graft.llm.Similarity.queries ++ graft.llm.Multimodal.queries ++
    graft.llm.Pipeline.queries ++ graft.llm.Pack.queries ++
    graft.llm.TrainOrder.queries ++ graft.llm.Boilerplate.queries ++
    graft.llm.Hybrid.queries ++
    graft.queries.Search.queries ++ graft.queries.Stats.queries ++
    graft.queries.Incremental.queries ++ graft.queries.Reshape.queries ++
    graft.queries.Features.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "mr_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word""".stripMargin,
    "mr_inverted_index" ->
      """SELECT word,
        |       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word""".stripMargin,
    "mr_grep" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE regexp_matches(text, 'hash join')""".stripMargin,
    "mr_sort" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |ORDER BY lang ASC, n_chars DESC, doc_id ASC""".stripMargin,
    "mr_sql_mapf" ->
      """SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY doc_id, word""".stripMargin,
    // identical semantics to mr_wordcount — the point: the runtime-
    // loaded jar must land on the same counts as the native query
    "mr_plugin_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word""".stripMargin,
  ) ++ graft.queries.StarSchema.oracles ++ graft.queries.TpchMore.oracles ++
    graft.queries.EventWindows.oracles ++
    graft.queries.Advanced.oracles ++ graft.queries.Graph.oracles ++
    graft.llm.TextAnalysis.oracles ++ graft.llm.Dedup.oracles ++
    graft.llm.NgramLM.oracles ++ graft.llm.Bpe.oracles ++
    graft.llm.Similarity.oracles ++ graft.llm.Multimodal.oracles ++
    graft.llm.Pipeline.oracles ++ graft.llm.Pack.oracles ++
    graft.llm.TrainOrder.oracles ++ graft.llm.Boilerplate.oracles ++
    graft.llm.Hybrid.oracles ++
    graft.queries.Search.oracles ++ graft.queries.Stats.oracles ++
    graft.queries.Incremental.oracles ++ graft.queries.Reshape.oracles ++
    graft.queries.Features.oracles

  /** One-time renders some queries ride on (the plugin corpus text
    * files + user jar; the bucketed join's table layout) — idempotent
    * and fingerprint-cached on disk, so re-invoking them against an
    * unchanged corpus is a metadata check, across JVM runs too. Bench
    * pays these in a separate timed setup pass (its `setup` JSON
    * field), so the registered queries measure steady state from
    * rep 1; each query still invokes its own setup internally, so
    * correctness never depends on Bench having run.
    */
  def setups: Map[String, (SparkSession, String) => Unit] = Map(
    "mr_plugin_wordcount" -> ((s: SparkSession, d: String) => {
      val _ = graft.jobs.PluginDemo.jarPath
      val _ = graft.jobs.PluginDemo.corpusGlob(s, d)
    }),
    "q_bucketed_join" ->
      ((s: SparkSession, d: String) => graft.queries.Advanced.bucketedSetup(s, d)),
  )

  /** Non-registry extras: results whose values no SQL engine can
    * recompute (today: the raw DEFLATE byte counts). Verify dumps
    * them under the SIBLING directory `<outDir>-extras/<name>` —
    * outside the driver's scan — and tools/check.py exact-compares
    * each against an independent Python recompute (recorded in
    * CHECKS.md). The driver-gated invariants of the same computation
    * live in the regular registry (`q_llm_compression`).
    */
  def extras: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_compression_ratio" -> (graft.llm.TextAnalysis.compressionRatio _),
  )
}
