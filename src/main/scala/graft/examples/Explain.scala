package graft.examples
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registered query (arg 1),
  * or regenerate `PLANS.md` for the headline queries when invoked
  * with `--all <outFile>`.
  */
object Explain {
  private val Headline = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_top_customers", "q_dedup_minhash", "q_dedup_minhash_pairs",
    "q_dedup_cluster_stats", "q_llm_contamination", "q_ann_ivf_topk",
    "q_ann_ivf_index_probe", "q_embed_near_dup", "q_llm_full_pipeline",
    "q_dedup_cross", "q_llm_tfidf", "q_ann_sq8_topk", "q_llm_quota_sample",
    "q_hybrid_topk", "q_ann_filtered_topk", "q_dedup_spans",
    "q_llm_curriculum", "q_llm_shuffle", "q_embed_centroids",
    "q_bucketed_join", "q_phrase_search", "q_stats_corr",
    "q_llm_data_card", "q_embed_semantic_dedup", "q_hybrid_rrf",
    "q_search_bm25", "q_llm_grouped_split", "q_embed_diverse_sample",
    "q_llm_quality_calibrated", "q_skyline", "q_graph_triangles",
    "q_events_anomaly", "q_events_entry_exit", "q_range_join", "q_asof_join",
    "q_asof_forward", "q_interval_overlap", "q_asof_salted", "q_asof_nearest",
    "q_events_concurrency", "q_kmv_distinct", "q_events_attribution",
    "q_events_twap", "q_events_interpolate", "q_llm_collocations",
    "q_events_ohlc", "q_events_transitions", "q_ann_mmr_topk",
    "q_dedup_takedown", "q_ann_hard_negatives", "q_events_rolling_active",
    "q_events_cohort_ltv", "q_events_forecast_eval", "q_dedup_novelty",
    "q4_order_priority", "q6_forecast_revenue", "q17_small_qty_revenue",
    "q18_large_volume", "q7_volume_shipping", "q10_returned_items",
    "q19_disjunctive_or", "q21_waiting_supplier", "q_llm_bpe_merges",
    "q_llm_heavy_hitters", "q2_min_cost_supplier", "q11_important_parts",
    "q16_part_supplier_cnt", "q20_surging_supplier", "q_ann_recall")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def planOf(name: String, dir: String = "/root/testdata/sf0.001"): String = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }
    args.toSeq match {
      case Seq("--all", out) =>
        val md = new StringBuilder(
          "# Physical plans (generated — `sbt \"runMain graft.examples.Explain --all PLANS.md\"`)\n\n" +
          "Formatted plans of the headline queries at sf0.001, as evidence for\n" +
          "the plan-shape claims in README/BASELINE: pushed filters, pruned\n" +
          "scans, broadcast dims, map-only per-doc work, no scale-hostile\n" +
          "joins. PlanAuditSpec asserts the load-bearing properties; this file\n" +
          "is for human review. `Scan ExistingRDD` nodes are staged\n" +
          "intermediates (graft.Materialize; e.g. the collapse+signature\n" +
          "table computed once and re-read by bands, est-joins, and the\n" +
          "doc-to-representative expansion — see Dedup.sigTable).\n")
        Headline.foreach { q =>
          // cap pathological dumps (the K-step MMR plan formats to
          // ~28k lines): the operator tree at the top carries the
          // shape evidence; the per-node detail tail is truncated
          val full = planOf(q).trim
          val lines = full.linesIterator.toSeq
          val plan = if (lines.length <= 400) full
            else (lines.take(400) :+
              s"... [truncated: ${lines.length - 400} more detail lines]")
              .mkString("\n")
          md.append(s"\n## $q\n\n```\n$plan\n```\n")
        }
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          md.toString.getBytes("UTF-8"))
        println(s"wrote $out")
      case Seq(name) => println(planOf(name))
      case Seq(name, dir) => println(planOf(name, dir))
      case _ => System.err.println("usage: Explain <query> [sfDir] | --all <outFile>")
    }
    spark.stop()
  }
}
