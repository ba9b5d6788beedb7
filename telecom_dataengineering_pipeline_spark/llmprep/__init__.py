"""Training-data pipeline operators (BASELINE.json north star): dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search, text
analysis, multimodal columns — all designed for 100 TB scale (no driver-side
collects; shuffles only on bounded keys; candidate generation before any
pairwise work).
"""

from .dedup import (
    exact_dup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    minhash_signatures,
    shingle_stream,
    simhash_fingerprints,
)
from .similarity import cosine_topk, sign_lsh_buckets
from .text import quality_metrics, shingles, token_hash32, tokens

__all__ = [
    "exact_dup_groups",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_near_dup_pairs",
    "minhash_signatures",
    "shingle_stream",
    "simhash_fingerprints",
    "cosine_topk",
    "sign_lsh_buckets",
    "quality_metrics",
    "shingles",
    "token_hash32",
    "tokens",
]
