from .groups import (  # noqa: F401
    connected_components,
    dedup_groups,
)
from .curation import (  # noqa: F401
    domain_stats,
    filter_domains,
    filter_urls,
)
from .decontaminate import decontaminate  # noqa: F401
from .incremental import FingerprintIndex, MinHashIndex  # noqa: F401
from .packing import pack_documents  # noqa: F401
from .sampling import (  # noqa: F401
    mixture_fractions,
    plan_mixture,
    sample_corpus_stratified,
    shuffle_corpus,
    split_corpus,
    unit_hash,
)
from .dedup import (  # noqa: F401
    dedup_corpus_lines,
    dedup_substrings,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_band_keys,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    ivf_assign,
    ivf_knn_join,
    ivf_topk,
    ivf_topk_bucketed,
    knn_join,
    lsh_topk,
    lsh_topk_bucketed,
    topk_recall,
    train_ivf_centroids,
    write_bucketed_embeddings,
    write_ivf_table,
)
from .textquality import annotate_text  # noqa: F401
