from .relational import delete_rows, distinct, top_n, top_n_per_group, update_rows

__all__ = ["delete_rows", "distinct", "top_n", "top_n_per_group", "update_rows"]
