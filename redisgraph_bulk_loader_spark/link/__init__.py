from .alias import link_mentions, normalize_surface  # noqa: F401
from .lsh import lsh_candidate_pairs, minhash_signatures  # noqa: F401
