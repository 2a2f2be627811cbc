from .endpoints import resolve_endpoints  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from .similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
from .skew import salted_join, two_phase_count  # noqa: F401
