from .bq import BQModel
from .brute import knn, knn_join

__all__ = ["BQModel", "knn", "knn_join"]
