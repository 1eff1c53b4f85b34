from .bloom import bloom_build, bloom_contamination_flags
from .cdc import apply_changes, merge_upsert, scd2_intervals
from .fuzzy import fuzzy_self_pairs
from .relational import delete_rows, distinct, top_n, top_n_per_group, update_rows

__all__ = [
    "apply_changes",
    "bloom_build",
    "bloom_contamination_flags",
    "delete_rows",
    "fuzzy_self_pairs",
    "distinct",
    "merge_upsert",
    "scd2_intervals",
    "top_n",
    "top_n_per_group",
    "update_rows",
]
