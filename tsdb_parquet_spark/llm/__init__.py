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
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
    embedding_neardup_pairs,
)
from .similarity import cosine_topk_exact, lsh_bucketed_ann
from .text import tokenize_counts, text_quality, language_id, doc_fingerprint

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "embedding_neardup_pairs",
    "cosine_topk_exact",
    "lsh_bucketed_ann",
    "tokenize_counts",
    "text_quality",
    "language_id",
    "doc_fingerprint",
]
