from .vector import (
    cosine_distance,
    cosine_similarity,
    inner_product,
    l2_dist,
    l2_norm,
    vec_lit,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "inner_product",
    "l2_dist",
    "l2_norm",
    "vec_lit",
]
