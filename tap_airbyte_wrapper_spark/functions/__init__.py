"""LLM-data-pipeline function layer: text analysis, dedup, similarity
search, multimodal column plumbing."""

from .text import (
    bpe_token_estimate,
    fingerprint,
    language_id,
    minhash_fingerprints,
    normalize_text,
    quality_score,
    token_count,
    winnow_fingerprints,
)
from .dedup import (
    connected_components,
    exact_dedup,
    exact_jaccard_on_pairs,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_near_dup_pairs,
    minhash_signature,
    minhash_signatures_df,
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    paragraph_dedup,
    shingles,
    simhash,
    simhash_df,
    simhash_near_dup_pairs,
    simhash_verified_pairs,
)
from .similarity import (
    IvfIndex,
    cosine,
    embedding_dedup_delta,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    dot,
    embedding_near_dup_pairs,
    ivf_build,
    ivf_load,
    ivf_search,
    l2_norm,
    nearest_centroid_assign,
    quantize_embeddings,
    semantic_dedup,
)
from .corpus import (
    chunk_documents,
    dup_span_stats,
    heavy_hitter_values,
    heavy_hitters,
    ngram_contamination,
    pack_token_budget,
    repetition_signals,
    tfidf_top_terms,
    vocab_topk,
    word_ngrams,
    words,
)
from .projection import (
    PcaModel,
    covariance_long,
    fit_pca,
    load_pca,
    pca_project,
    save_pca,
)
from .dedup import (
    boilerplate_removal,
    minhash_dedup_delta,
    minhash_index_write,
)
from .pii import PII_PATTERNS, pii_counts, redact_pii
from .sampling import (
    assign_shards,
    hash_bucket,
    hash_split,
    mixture_sample,
    sample_per_group,
    stratified_sample,
    write_training_shards,
)
from .bpe import bpe_segment, train_bpe
from .udtf import SentenceSplitter, split_sentences
from .multimodal import (
    MEDIA_SCHEMA,
    as_media,
    decode_audio,
    decode_image,
    extract_features,
    header_dimensions,
    audio_ahash,
    hamming_near_dup_pairs,
    image_ahash,
    image_near_dup_pairs,
    resize_image,
    sample_frames,
    with_media_metadata,
)

__all__ = [
    "token_count", "bpe_token_estimate", "language_id", "quality_score",
    "fingerprint", "minhash_fingerprints", "winnow_fingerprints",
    "exact_dedup", "paragraph_dedup", "minhash_signature",
    "minhash_signatures_df", "lsh_candidate_pairs",
    "minhash_near_dup_pairs", "minhash_dedup", "connected_components",
    "simhash", "simhash_df",
    "simhash_near_dup_pairs", "ngram_jaccard_pairs", "shingles",
    "dot", "l2_norm", "cosine", "cosine_topk", "cosine_topk_lsh",
    "cosine_topk_ivf",
    "embedding_near_dup_pairs",
    "IvfIndex", "ivf_build", "ivf_load", "ivf_search", "quantize_embeddings", "nearest_centroid_assign", "semantic_dedup",
    "hash_bucket", "hash_split", "mixture_sample", "stratified_sample",
    "assign_shards", "write_training_shards",
    "boilerplate_removal", "dup_span_stats",
    "minhash_index_write", "minhash_dedup_delta", "embedding_dedup_delta",
    "SentenceSplitter", "split_sentences",
    "train_bpe", "bpe_segment",
    "MEDIA_SCHEMA", "as_media", "with_media_metadata", "decode_image",
    "decode_audio", "header_dimensions", "image_ahash", "image_near_dup_pairs", "audio_ahash", "hamming_near_dup_pairs",
    "extract_features", "resize_image", "sample_frames",
    "heavy_hitters", "heavy_hitter_values", "normalize_text",
    "chunk_documents",
    "sample_per_group",
    "PcaModel", "fit_pca", "pca_project", "covariance_long",
    "save_pca", "load_pca",
]
