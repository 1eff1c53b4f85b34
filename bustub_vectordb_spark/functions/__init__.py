from .bpe import (
    BPETokenizer,
    bpe_token_count,
    learn_bpe,
    load_merges,
    repo_tokenizer,
    save_merges,
)
from .lm import bigram_lm_scores, doc_bigrams
from .sketch import kmv_distinct_estimate, kmv_hash
from .vector import (
    cosine_distance,
    cosine_similarity,
    inner_product,
    l2_dist,
    l2_norm,
    vec_lit,
)

__all__ = [
    "BPETokenizer",
    "bigram_lm_scores",
    "bpe_token_count",
    "doc_bigrams",
    "cosine_distance",
    "cosine_similarity",
    "inner_product",
    "kmv_distinct_estimate",
    "kmv_hash",
    "l2_dist",
    "l2_norm",
    "learn_bpe",
    "load_merges",
    "repo_tokenizer",
    "save_merges",
    "vec_lit",
]
