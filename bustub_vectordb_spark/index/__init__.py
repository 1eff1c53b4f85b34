from .hnsw import HNSWIndex, ShardedHNSW
from .ivfflat import IVFFlatIndex
from .registry import VectorIndexRegistry
from .selection import KnnPlan, plan_knn

__all__ = [
    "HNSWIndex",
    "IVFFlatIndex",
    "ShardedHNSW",
    "VectorIndexRegistry",
    "KnnPlan",
    "plan_knn",
]
