package graft
// Plan-audit generator for PLANS.md (kept in-tree so each round can
// regenerate after operator changes).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val interesting = Seq("q3_shipping_priority", "q_broadcast_dims",
      "q_merge_continued", "q_positional_join", "q_asof_join",
      "q_asof_forward", "q_range_join", "q_dedup_ngram_jaccard",
      "q_ann_brute_force", "q_ann_ivf", "q_ann_ivf_joined",
      "q_dedup_simhash", "q_dedup_embedding", "q_tfidf", "q_ngram_freq",
      "q_salted_join", "q_contamination", "q_approx_distinct",
      "q_pii_redact", "q_hash_split",
      "q_asof_bucketed", "q_shuffle_shards", "q_pack_sequences",
      "q_sample_stratified", "q_cap_strata", "q_vocab_coverage",
      "q_repetition",
      "q_lm_score", "q_apply_mixture", "q_payload_stats",
      "q_approx_percentile",
      "q_dedup_substring", "q_semdedup", "q_char_entropy",
      "q_classifier_score", "q_countmin", "q_bloom",
      "q_hll", "q_hll_overlap", "q_bloom_join", "q_scd2", "q_pagerank",
      "q_weighted_sample", "q_profile", "q_corpus_diff",
      "q_embed_normalize", "q_embed_normalize_approx",
      "q_bpe_encode", "q_dict_tag", "q_interval_overlap", "q_safe_split",
      "q_fuzzy_join", "q_lm_backoff", "q_label_vote",
      "q_skipgram", "q_bleu", "q_heaps",
      "q_dedup_minhash_lsh", "q_ann_pq", "q_recommend",
      "q_hits", "q_harmonic")
    interesting.foreach { name =>
      println(s"########## $name")
      println(SparkEntry.queries(name)(spark, d)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
