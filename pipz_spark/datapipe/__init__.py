"""LLM-training-data pipeline operators (driver north-star additions).

The reference has no analog (SURVEY §2 covers only its pipeline
vocabulary); these are the Spark-native operators a 100 TB
training-data pipeline needs: deduplication (exact + MinHash-LSH +
SimHash + n-gram Jaccard), similarity search over embeddings
(brute-force cosine baseline + LSH-bucketed scale path), text
analysis (language ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

All hot paths are Column expressions / higher-order array functions
(JVM-side, whole-stage codegen); Python appears only in the
multimodal decode stubs (Arrow-batched mapInPandas).
"""

from ._caches import release_caches
from .dedup import (
    banded_signatures,
    cross_near_dup_pairs,
    contamination,
    connected_components,
    dedup_clusters,
    exact_dedup,
    jaccard_near_dup_pairs,
    line_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    minhash_signatures_df,
    near_dup_pairs,
    ngram_jaccard,
    remove_repeated_spans,
    repeated_spans,
    simhash,
    simhash_near_dup_pairs,
)
from .similarity import (
    cosine_similarity,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_pq,
    cross_embedding_pairs,
    embedding_index,
    embedding_near_dup_pairs,
    semantic_dedup,
)
from .text import (
    chunk_documents,
    ngram_repetition,
    fingerprint,
    lang_id,
    pack_ffd,
    pack_sequences,
    quality_score,
    redact_pii,
    gopher_quality,
    regex_token_count,
    text_stats,
    token_count,
    top_ngrams,
)
from .bpe import (
    bpe_token_count,
    bpe_tokens_df,
    bpe_train,
    pretoken_histogram,
    pretoken_topk,
    save_merges,
)
from .search import bm25_topk
from .rank import grouped_rank, ntile_expr
from .lm_quality import (
    fit_bigram_lm,
    lm_quality_scores,
    perplexity_buckets,
    score_bigram_lm,
)
from .classifier import pareto_keep, train_quality_classifier
from .graph import pagerank, propagate_min_labels, triangle_count
from .winnow import winnow_fingerprints
from .kmeans import kmeans_embeddings
from .pca import pca_project
from .sketches import (
    bloom_contamination,
    build_bloom,
    cms_lookup,
    cms_merge,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_register_cols,
    hll_sketch,
)
from .sampling import (
    approx_dataset_profile,
    dataset_profile,
    deterministic_sample,
    deterministic_shuffle,
    deterministic_split,
    doremi_weights,
    dsir_log_ratio,
    exact_stratified_split,
    hash_bucket,
    priority_sample,
    mixture_resample,
    stratified_sample,
    temperature_resample,
    token_budget_cap,
)
from .multimodal import (
    attach_blob,
    blob_metadata,
    decode_image_features,
    pil_available,
    sample_frames,
)

__all__ = [
    "attach_blob",
    "blob_metadata",
    "cosine_similarity",
    "approx_dataset_profile",
    "dataset_profile",
    "deterministic_sample",
    "deterministic_shuffle",
    "deterministic_split",
    "hash_bucket",
    "mixture_resample",
    "stratified_sample",
    "temperature_resample",
    "token_budget_cap",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "cosine_topk_pq",
    "decode_image_features",
    "banded_signatures",
    "cross_near_dup_pairs",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "line_dedup",
    "bm25_topk",
    "bpe_train",
    "pretoken_histogram",
    "pretoken_topk",
    "save_merges",
    "fingerprint",
    "fit_bigram_lm",
    "lang_id",
    "lm_quality_scores",
    "doremi_weights",
    "dsir_log_ratio",
    "exact_stratified_split",
    "priority_sample",
    "bloom_contamination",
    "build_bloom",
    "cms_lookup",
    "cms_merge",
    "cms_sketch",
    "hll_distinct",
    "hll_estimate",
    "hll_merge",
    "hll_register_cols",
    "hll_sketch",
    "kmeans_embeddings",
    "pagerank",
    "propagate_min_labels",
    "triangle_count",
    "winnow_fingerprints",
    "pca_project",
    "pareto_keep",
    "train_quality_classifier",
    "grouped_rank",
    "ntile_expr",
    "perplexity_buckets",
    "semantic_dedup",
    "lsh_candidate_pairs",
    "minhash_signature",
    "minhash_signatures_df",
    "connected_components",
    "dedup_clusters",
    "jaccard_near_dup_pairs",
    "near_dup_pairs",
    "ngram_jaccard",
    "pil_available",
    "quality_score",
    "regex_token_count",
    "release_caches",
    "sample_frames",
    "score_bigram_lm",
    "simhash",
    "simhash_near_dup_pairs",
    "text_stats",
    "token_count",
    "top_ngrams",
    "gopher_quality",
    "chunk_documents",
    "contamination",
    "ngram_repetition",
    "pack_ffd",
    "pack_sequences",
    "redact_pii",
]
