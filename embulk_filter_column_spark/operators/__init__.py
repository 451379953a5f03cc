from .dedup import (  # noqa: F401
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .similarity import brute_force_topk, lsh_topk  # noqa: F401
from .textquality import annotate_text  # noqa: F401
