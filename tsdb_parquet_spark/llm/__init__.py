"""LLM training-data pipeline operators (north-star extension, SURVEY.md §2.2).

Not in the reference; these are the operations a 100 TB pretraining-data
pipeline runs over a ``documents``/``embeddings`` corpus: deduplication
(exact + near-dup families), similarity search, text analysis, and
multimodal column conventions.  All hot paths are built-in Spark functions
(JVM, whole-stage codegen); Python appears only in the clearly-marked
multimodal decode stubs (Arrow-batched ``mapInPandas``).
"""

from .dedup import (
    exact_dedup,
    char_shingles,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_neardup_pairs,
    embedding_neardup_pairs,
    connected_components_star,
    neardup_clusters,
    keep_one_per_cluster,
)
from .similarity import (
    cosine_cols,
    cosine_topk_exact,
    ensure_ivf_layout,
    ivf_topk,
    ivf_topk_at_rest,
    lsh_bucketed_ann,
    vector_lit,
)
from .incremental import (
    ensure_fingerprint_index,
    incremental_dedup,
)
from .paragraphs import (
    boilerplate_strip,
    segment_documents,
)
from .text import (
    chunk_documents,
    doc_bigram_counts,
    doc_fingerprint,
    doc_token_counts,
    fingerprint_col,
    rolling_fingerprint,
    language_id,
    text_quality,
    token_count,
    tokenize_counts,
    unigram_logprob,
    tokens_col,
)
from .corpus import (
    decontaminate,
    leakage_safe_split,
    repetition_stats,
    sample_mixture,
    stratified_sample,
    weighted_sample,
    shuffle_shards,
    split_corpus,
    word_ngrams,
)
from .multimodal import (
    decode_audio,
    decode_images,
    extract_features,
    frame_sample_plan,
    frame_sample,
    make_audio_payload_table,
    make_image_payload_table,
    make_video_payload_table,
    make_multimodal_table,
    png_decode,
    png_encode,
    png_resize_nearest,
    resize_images,
)

__all__ = [
    "exact_dedup",
    "char_shingles",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "connected_components_star",
    "neardup_clusters",
    "keep_one_per_cluster",
    "cosine_cols",
    "cosine_topk_exact",
    "ensure_ivf_layout",
    "ivf_topk",
    "ivf_topk_at_rest",
    "lsh_bucketed_ann",
    "vector_lit",
    "tokenize_counts",
    "doc_token_counts",
    "doc_bigram_counts",
    "unigram_logprob",
    "chunk_documents",
    "tokens_col",
    "token_count",
    "text_quality",
    "language_id",
    "doc_fingerprint",
    "fingerprint_col",
    "ensure_fingerprint_index",
    "incremental_dedup",
    "boilerplate_strip",
    "segment_documents",
    "leakage_safe_split",
    "rolling_fingerprint",
    "sample_mixture",
    "stratified_sample",
    "weighted_sample",
    "shuffle_shards",
    "split_corpus",
    "decontaminate",
    "repetition_stats",
    "word_ngrams",
    "decode_images",
    "resize_images",
    "extract_features",
    "frame_sample_plan",
    "make_multimodal_table",
    "make_image_payload_table",
    "make_video_payload_table",
    "make_audio_payload_table",
    "decode_audio",
    "frame_sample",
    "png_decode",
    "png_encode",
    "png_resize_nearest",
]
