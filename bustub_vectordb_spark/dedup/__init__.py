from .exact import exact_dedup, exact_dup_groups
from .minhash import minhash_lsh_candidates, minhash_signature, near_dup_pairs, shingles
from .semantic import semantic_dedup
from .simhash import simhash, simhash_near_dup_pairs
from .spans import remove_repeated_spans

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_lsh_candidates",
    "minhash_signature",
    "near_dup_pairs",
    "semantic_dedup",
    "shingles",
    "remove_repeated_spans",
    "simhash",
    "simhash_near_dup_pairs",
]
