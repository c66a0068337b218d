package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: dump the formatted physical plans of the headline
  * workloads to PLANS.md (the plan-audit artifact; re-run after changing
  * operator implementations).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val sections = Seq(
      "q_bin4d — 4-D histogram (scan→project→partial agg→exchange→final)" -> "q_bin4d",
      "q_bin4d_huge — 4-D histogram at 1e8 cells (primitive two-phase count kernel: local combine → one exchange of pre-combined rows → merge; no HashAggregate)" -> "q_bin4d_huge",
      "q_bin_per_part_huge — per-part cube with integral part ids folded into the flat kernel key (bounds filter → CountByKey; part decoded + cast back after the agg)" -> "q_bin_per_part_huge",
      "q_filter_range — predicate + projection pushdown into the scan" -> "q_filter_range",
      "q_cosine_topk — brute-force ANN (TakeOrderedAndProject, no global sort)" -> "q_cosine_topk",
      "q_minhash_pairs — LSH banding (bounded bucket-key shuffle join)" -> "q_minhash_pairs",
      "q_minhash_inline — clique-robust LSH (sigs ride the band exchange, FirstMatchingBand dedup, no distinct/pair exchange)" -> "q_minhash_inline",
      "q_calib_roundtrip — config-reloaded calibration (pure fused projection)" -> "q_calib_roundtrip",
      "q_zipf — vocab rank via range-repartition + zipWithIndex (no keyless window)" -> "q_zipf",
      "q_ngram_jaccard — blocked pair join (native sorted-merge intersect kernel)" -> "q_ngram_jaccard",
      "q_ffill — two-phase global fill (parallel range-partition fill + tiny carry prefix-scan + broadcast patch; no single-task window)" -> "q_ffill",
      "q_dfield — native codegen bilinear grid lookup (no UDF)" -> "q_dfield",
      "q_asof — as-of join as union + running window (no nested-loop join)" -> "q_asof",
      "q_tfidf — chained aggregations, document frequency from per-doc counts" -> "q_tfidf",
      "q_sample — deterministic hash sample as a pure pushdown-friendly filter" -> "q_sample",
      "q_chunks — context-window chunking (map-only explode, no shuffle)" -> "q_chunks",
      "q_pack — sequence packing (one keyed window shuffle on pack_group)" -> "q_pack",
      "q_mixture — mixture report (one corpus agg + keyless window total)" -> "q_mixture",
      "q_bigram_ppl — bigram LM score (bigram-count join + vocab join + broadcast V)" -> "q_bigram_ppl",
      "q_quality_score — hashed-linear classifier score (map-only, weight table as one literal)" -> "q_quality_score",
      "q_kmeans_step — Lloyd update (broadcast assignment + single k-buffer exchange)" -> "q_kmeans_step",
      "q_heavy_hitters — two-pass sketch re-count (candidate In filter pushed to the scan)" -> "q_heavy_hitters",
      "q_mad_outliers — median/MAD scoring (two percentile windows, one exchange)" -> "q_mad_outliers",
      "q_rollup — hierarchical census (map-side Expand, one exchange)" -> "q_rollup",
      "q_resample — mixture resampling (broadcast rate table, corpus filtered map-side)" -> "q_resample",
      "q_dup_passages — cross-doc passage census (one fp-keyed exchange, no join)" -> "q_dup_passages",
      "q_split — split assignment (pure codegen'd projection, no shuffle)" -> "q_split",
      "q_dsir — DSIR weight scoring (map-only; λ table rides as one literal)" -> "q_dsir",
      "q_epochs — epoch upsampling (map-side generator, no shuffle)" -> "q_epochs",
      "q_corpus_diff — snapshot diff (digests shuffle, not bodies)" -> "q_corpus_diff",
      "q_domain_kl — per-domain KL (one corpus shuffle into (group, bucket) space)" -> "q_domain_kl",
      "q_gumbel — weighted resample (TakeOrderedAndProject, no global sort)" -> "q_gumbel",
      "q_top_percent — per-group percentile cut (one keyed window exchange)" -> "q_top_percent",
      "q_hashed_embed — text→embedding bridge (map-only native kernel + explode)" -> "q_hashed_embed",
      "q_zorder — Z-order lake-layout key (pure bit-op projection)" -> "q_zorder",
      "q_cross_dedup — incremental near-dup probe (band equi-joins only)" -> "q_cross_dedup",
      "q_json_extract — typed JSON field extraction (codegen projection, no UDF)" -> "q_json_extract",
      "q_url_parse — URL parse family (regex/split projections inline in the scan)" -> "q_url_parse",
      "q_degrees — graph degree profile (one agg per direction + full-outer merge)" -> "q_degrees",
      "q_scd2 — SCD2 history (both windows + filter on ONE key exchange)" -> "q_scd2",
      "q_fuzzy_pairs — edit-distance linkage (banded block join + thresholded levenshtein)" -> "q_fuzzy_pairs",
      "q_resample_grid — fixed-grid LOCF resample (bounds agg → sequence explode → asof window)" -> "q_resample_grid",
      "q_brute_batch — exact batch ANN baseline (broadcast nested-loop scan, mergeable TopKAgg heap rank)" -> "q_brute_batch",
      "q_ivf_batch — batch IVF ANN (map-side probe routing, broadcast query join, mergeable TopKAgg heap rank)" -> "q_ivf_batch",
      "q_ivf_pq_batch — batch IVF-PQ (codes-only corpus exchange, codegen ADC distance)" -> "q_ivf_pq_batch",
      "q_text_batch — batch BM25 (broadcast query-term join, one score-sum exchange, mergeable TopKAgg heap rank)" -> "q_text_batch",
      "q_text_batch_auto — batch BM25 at default settings (auto df-prune folds into the broadcast query-term side; candidate exchange bounded)" -> "q_text_batch_auto",
      "q_pq_rerank — IVF-PQ + exact re-rank (ADC heap shortlist, broadcast semi-join onto raw vectors, second bounded heap rank)" -> "q_pq_rerank",
      "q_html_extract — HTML→text extraction (native codegen kernel inline in the scan)" -> "q_html_extract",
      "q_robots — robots.txt filter (broadcast rule join + one URL-keyed aggregate)" -> "q_robots",
      "q_trigram_ppl — trigram stupid-backoff LM (n-gram count equi-joins + broadcast scalars)" -> "q_trigram_ppl",
      "q_kn_ppl — Kneser-Ney bigram LM (type-census joins, broadcast B/V scalar)" -> "q_kn_ppl",
    )
    val out = new StringBuilder
    out.append("# PLANS — formatted physical plans of representative queries\n\n")
    out.append("Generated by `sbt \"runMain graft.PlanDump\"` at sf0.01. What to look\n")
    out.append("for: `ReadSchema` pruned to the used columns, `PushedFilters` at the\n")
    out.append("scan, partial+final `HashAggregate` around a single `Exchange`,\n")
    out.append("`TakeOrderedAndProject` for top-k, and no UDF nodes in hot paths.\n")
    sections.foreach { case (title, name) =>
      val df = SparkEntry.queries(name)(spark, dir)
      out.append(s"\n## $title\n\n```\n")
      out.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      out.append("```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), out.toString)
    println(s"wrote PLANS.md (${out.length} chars)")
    spark.stop()
  }
}
