from .brute import knn, knn_join

__all__ = ["knn", "knn_join"]
