from .bloom import bloom_build, bloom_contamination_flags
from .relational import delete_rows, distinct, top_n, top_n_per_group, update_rows

__all__ = [
    "bloom_build",
    "bloom_contamination_flags",
    "delete_rows",
    "distinct",
    "top_n",
    "top_n_per_group",
    "update_rows",
]
