package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"           -> Relational.q1Agg _,
    "q2_join_filter"   -> Relational.q2JoinFilter _,
    "q3_topk"          -> Relational.q3TopK _,
    "q4_window"        -> Relational.q4Window _,
    "q5_rollup"        -> Relational.q5Rollup _,
    "q6_semijoin"      -> Relational.q6SemiJoin _,
    "q7_events_window" -> Relational.q7EventsWindow _,
    "q8_sessionize"    -> Relational.q8Sessionize _,
    "q9_tag_trusted"   -> Sequence.q9TagTrusted _,
    "q9_precorrect"    -> Sequence.q9PreCorrect _,
    "q10_kmer_count"   -> Sequence.q10KmerCount _,
    "q11_high_kmers"   -> Sequence.q11HighKmers _,
    "q12_kmer_stats"   -> Sequence.q12KmerStats _,
    "q13_dedup_exact"  -> Sequence.q13DedupExact _,
    "q14_contained"    -> Sequence.q14NonContained _,
    "q15_kmer_read_freq" -> Sequence.q15KmerReadFreq _,
    "q16_trusted"      -> Sequence.q16Trusted _,
    "q17_best_overlap" -> GraphOps.q17BestOverlap _,
    "q18_chimeric_cut" -> GraphOps.q18ChimericCut _,
    "q19_repeat_nodes" -> GraphOps.q19RepeatNodes _,
    "q20_overlap_edges" -> GraphOps.q20OverlapEdges _,
    "q21_reverse_edges" -> GraphOps.q21ReverseEdges _,
    "q22_transitive_reduction" -> GraphOps.q22TransitiveReduction _,
    "q23_degrees"      -> GraphOps.q23Degrees _,
    "q24_tips"         -> GraphOps.q24Tips _,
    "q25_bubbles"      -> GraphOps.q25Bubbles _,
    "q26_low_coverage" -> GraphOps.q26LowCoverage _,
    "q27_chain_compress" -> GraphOps.q27ChainCompress _,
    "q28_graph_stats"  -> GraphOps.q28GraphStats _,
    "q29_graph2fasta"  -> GraphOps.q29Graph2Fasta _,
    "q35_mate_consistent" -> GraphOps.q35MateConsistent _,
    "q36_braids"       -> GraphOps.q36Braids _,
    "q37_graph2sfa"    -> GraphOps.q37Graph2Sfa _,
    "q38_consensus"    -> GraphOps.q38Consensus _,
    "q30_minhash_sig"  -> Dedup.q30MinhashSig _,
    "q31_minhash_pairs" -> Dedup.q31MinhashPairs _,
    "q32_simhash"      -> Dedup.q32Simhash _,
    "q33_jaccard_pairs" -> Dedup.q33JaccardPairs _,
    "q34_embed_neardup" -> Dedup.q34EmbedNearDup _,
    "q40_ann_brute"    -> Similarity.q40AnnBrute _,
    "q41_ann_ivf"      -> Similarity.q41AnnIvf _,
    "q50_token_count"  -> TextAnalysis.q50TokenCount _,
    "q51_quality"      -> TextAnalysis.q51Quality _,
    "q52_langid"       -> TextAnalysis.q52LangId _,
    "q53_fingerprint"  -> TextAnalysis.q53Fingerprint _,
    "q60_multimodal"   -> Multimodal.q60Multimodal _,
  )

  /** DuckDB-equivalent SQL per query key (same column names, same
    * decimal-exact aggregation so hashes match bitwise). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"           -> Relational.q1Sql,
    "q2_join_filter"   -> Relational.q2Sql,
    "q3_topk"          -> Relational.q3Sql,
    "q4_window"        -> Relational.q4Sql,
    "q5_rollup"        -> Relational.q5Sql,
    "q6_semijoin"      -> Relational.q6Sql,
    "q7_events_window" -> Relational.q7Sql,
    "q8_sessionize"    -> Relational.q8Sql,
    "q9_tag_trusted"   -> Sequence.q9TagSql,
    "q9_precorrect"    -> Sequence.q9PreCorrectSql,
    "q10_kmer_count"   -> Sequence.q10Sql,
    "q11_high_kmers"   -> Sequence.q11Sql,
    "q12_kmer_stats"   -> Sequence.q12Sql,
    "q13_dedup_exact"  -> Sequence.q13Sql,
    "q14_contained"    -> Sequence.q14Sql,
    "q15_kmer_read_freq" -> Sequence.q15Sql,
    "q16_trusted"      -> Sequence.q16Sql,
    "q17_best_overlap" -> GraphOps.q17Sql,
    "q18_chimeric_cut" -> GraphOps.q18Sql,
    "q19_repeat_nodes" -> GraphOps.q19Sql,
    "q20_overlap_edges" -> GraphOps.q20Sql,
    "q21_reverse_edges" -> GraphOps.q21Sql,
    "q22_transitive_reduction" -> GraphOps.q22Sql,
    "q23_degrees"      -> GraphOps.q23Sql,
    "q24_tips"         -> GraphOps.q24Sql,
    "q25_bubbles"      -> GraphOps.q25Sql,
    "q26_low_coverage" -> GraphOps.q26Sql,
    "q27_chain_compress" -> GraphOps.q27Sql,
    "q28_graph_stats"  -> GraphOps.q28Sql,
    "q29_graph2fasta"  -> GraphOps.q29Sql,
    "q35_mate_consistent" -> GraphOps.q35Sql,
    "q36_braids"       -> GraphOps.q36Sql,
    "q37_graph2sfa"    -> GraphOps.q37Sql,
    "q38_consensus"    -> GraphOps.q38Sql,
    "q30_minhash_sig"  -> Dedup.q30Sql,
    "q31_minhash_pairs" -> Dedup.q31Sql,
    "q32_simhash"      -> Dedup.q32Sql,
    "q33_jaccard_pairs" -> Dedup.q33Sql,
    "q34_embed_neardup" -> Dedup.q34Sql,
    "q40_ann_brute"    -> Similarity.q40Sql,
    "q41_ann_ivf"      -> Similarity.q41Sql,
    "q50_token_count"  -> TextAnalysis.q50Sql,
    "q51_quality"      -> TextAnalysis.q51Sql,
    // q52_langid, q60_multimodal: non-SQL-expressible → rows-only check
    "q53_fingerprint"  -> TextAnalysis.q53Sql,
  )
}
