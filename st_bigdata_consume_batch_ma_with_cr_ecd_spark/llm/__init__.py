"""LLM-training-data pipeline operators (north-star extensions).

Beyond the reference's own surface (BASELINE.json): deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language ID, quality stats, token counting, fingerprinting), and
multimodal column plumbing — all designed shuffle-aware for 100 TB.
"""

from .dedup import (  # noqa: F401
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .similarity import brute_force_topk, cosine_pairs, cosine_similarity  # noqa: F401
from .text import (  # noqa: F401
    fingerprint,
    lang_scores,
    shingles,
    text_stats,
    tokenize,
)
