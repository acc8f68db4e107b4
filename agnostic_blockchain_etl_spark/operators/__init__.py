"""Operator library: the reference's relational surface (SURVEY.md §2.3-§2.7)
re-expressed as Spark DataFrame plans, plus the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Every public operator has a ``queries()`` entry in ``__spark_entry__.py``
paired with DuckDB oracle SQL for the driver's correctness gate.
"""

from .bloom import (bloom_build, bloom_content_key, bloom_decontaminate,
                    bloom_filter_array, bloom_probe, bloom_probe_join,
                    bloom_stats, bloom_union, incremental_bloom_dedup)
from .bpe import bpe_encode, train_bpe, word_histogram
from .cms import cms_build, cms_counters, cms_estimate, cms_merge
from .langid import detect_language, train_language_profiles
from .lm import (bigram_perplexity_score, perplexity_score,
                 perplexity_score_rowwise, train_bigram_lm,
                 train_unigram_lm)
from .clean import c4_clean
from .corpus import (chunk, pack_manifest, pack_sequences,
                     stratified_sample, token_budget_cap, weighted_sample)
from .curate import corpus_datacard, curate_corpus
from .dedup import (connected_components, decontaminate, doc_shingles,
                    duplicate_clusters, exact_dedup, minhash_bands,
                    minhash_lsh_pairs, minhash_wide, ngram_jaccard_pairs,
                    select_cluster_canonical,
                    simhash_pairs, simhash_signatures)
from .imagedup import (audio_fingerprint, audio_near_dup_pairs,
                       curate_media,
                       hamming_near_dup_pairs, image_near_dup_pairs,
                       image_phash, video_frame_phashes,
                       video_near_dup_pairs)
from .incremental import (corpus_diff, digest_store, incremental_dedup,
                          incremental_exact_dedup,
                          incremental_neardup_pairs, signature_store,
                          stored_neardup_pairs,
                          write_signature_store_tables)
from .similarity import (compact_semantic_store, cosine_topk,
                         fit_tfidf_stats, hashed_tfidf_vectors,
                         incremental_semantic_dedup, ivf_search,
                         ivf_train, semantic_decontamination,
                         semantic_dedup, semantic_member_store,
                         text_semantic_dedup)
from .tables import load_tables
from .mixture import (apply_mixture_rates, compose_corpus_mix,
                      epoch_upsample, mixture_weights,
                      stratum_counts, temperature_mixture)
from .ordering import (global_order_index, interleaved_order_index,
                       stratified_split_exact)
from .retrieval import (ann_recall, bm25_hard_negatives, bm25_scores,
                        bm25_scores_from_stats, bm25_stats, bm25_topk,
                        merge_bm25_stats, ndcg_at_k, rrf_fuse)
from .winnow import winnow_fingerprints, winnow_pairs
from .zipf import corpus_zipf_stats, zipf_rank_frequencies
from .multimodal import (audio_feature_stage, decode_features,
                         mp3_metadata_stage,
                         resize_images, sample_frames)
from .pii import luhn_valid, pii_scrub, pii_scrub_extended
from .shards import balanced_shard_assign, write_training_shards
from .profile import merge_profile_sketches, profile_sketch, profile_table
from .dsir import (dsir_log_weights, dsir_sample,
                   hashed_bucket_logprobs)
from .paragraphs import (dedup_paragraphs, doc_paragraphs,
                         incremental_dedup_paragraphs,
                         compact_paragraph_store,
                         merge_paragraph_stores, paragraph_frequency,
                         paragraph_store)
from .quality import (quality_classifier_score, quality_pareto_keep,
                      quality_weighted_sample, train_quality_classifier)
from .sourcecap import (source_cap, source_cap_rate,
                        source_doc_counts)
from .spans import (decontaminate_spans, duplicate_spans,
                    remove_duplicate_spans,
                    span_dedup_stats)
from .textstats import gopher_quality, repetition_signals, text_stats

__all__ = [
    "load_tables",
    # DataFrame-form LLM-data APIs (the gate queries in __spark_entry__
    # are thin wrappers over these, bound to the testdata corpus)
    "bpe_encode", "train_bpe", "word_histogram",
    "detect_language", "train_language_profiles",
    "perplexity_score", "train_unigram_lm",
    "bigram_perplexity_score", "train_bigram_lm",
    "perplexity_score_rowwise",
    "chunk", "pack_manifest", "pack_sequences", "stratified_sample",
    "weighted_sample", "token_budget_cap",
    "curate_corpus", "corpus_datacard", "c4_clean",
    "connected_components", "decontaminate", "doc_shingles",
    "duplicate_clusters", "exact_dedup",
    "minhash_bands", "minhash_lsh_pairs", "minhash_wide",
    "ngram_jaccard_pairs",
    "incremental_dedup", "incremental_neardup_pairs", "signature_store",
    "stored_neardup_pairs", "write_signature_store_tables",
    "corpus_diff", "digest_store", "incremental_exact_dedup",
    "select_cluster_canonical", "simhash_pairs", "simhash_signatures",
    "compact_semantic_store", "cosine_topk", "fit_tfidf_stats",
    "hashed_tfidf_vectors", "incremental_semantic_dedup",
    "ivf_search", "ivf_train", "semantic_decontamination",
    "semantic_dedup", "semantic_member_store",
    "text_semantic_dedup",
    "audio_feature_stage", "decode_features", "mp3_metadata_stage",
    "resize_images",
    "audio_fingerprint", "audio_near_dup_pairs", "curate_media",
    "hamming_near_dup_pairs", "image_near_dup_pairs", "image_phash",
    "video_frame_phashes", "video_near_dup_pairs",
    "sample_frames",
    "repetition_signals", "gopher_quality",
    "decontaminate_spans", "dsir_log_weights", "dsir_sample",
    "duplicate_spans", "hashed_bucket_logprobs", "remove_duplicate_spans",
    "apply_mixture_rates", "compose_corpus_mix", "epoch_upsample",
    "mixture_weights", "stratum_counts", "temperature_mixture",
    "pii_scrub", "pii_scrub_extended", "luhn_valid",
    "dedup_paragraphs", "doc_paragraphs", "paragraph_frequency",
    "compact_paragraph_store",
    "incremental_dedup_paragraphs", "merge_paragraph_stores",
    "paragraph_store",
    "quality_classifier_score", "quality_pareto_keep",
    "quality_weighted_sample", "train_quality_classifier",
    "source_cap", "source_cap_rate", "source_doc_counts",
    "balanced_shard_assign", "write_training_shards",
    "profile_table", "profile_sketch", "merge_profile_sketches",
    "span_dedup_stats",
    "text_stats",
    "bloom_build", "bloom_content_key", "bloom_decontaminate",
    "bloom_filter_array", "bloom_probe", "bloom_probe_join",
    "bloom_stats", "bloom_union", "incremental_bloom_dedup",
    "cms_build", "cms_counters", "cms_estimate", "cms_merge",
    "global_order_index", "interleaved_order_index",
    "stratified_split_exact",
    "ann_recall", "bm25_hard_negatives", "bm25_scores", "bm25_topk",
    "bm25_scores_from_stats", "bm25_stats", "merge_bm25_stats",
    "ndcg_at_k", "rrf_fuse",
    "winnow_fingerprints", "winnow_pairs",
    "corpus_zipf_stats", "zipf_rank_frequencies",
]
