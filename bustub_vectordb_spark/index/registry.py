"""Vector-index registry — the catalog's per-table index map.

The reference's Catalog tracks IndexInfo{key_schema, index, index_type} per
table (src/include/catalog/catalog.h:46-120); vector index creation binds a
distance-ops class (vector_l2_ops | vector_ip_ops | vector_cosine_ops) to the
distance function (catalog.h:322-331). Spark's catalog has no index concept,
so this registry carries that metadata and the built index objects
(IVFFlat / HNSW), which are themselves DataFrame-backed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

OPS_TO_DIST = {
    "vector_l2_ops": "l2",
    "vector_ip_ops": "ip",
    "vector_cosine_ops": "cosine",
}


@dataclass
class VectorIndexInfo:
    name: str
    table: str
    column: str
    method: str  # 'ivfflat' | 'hnsw'
    dist: str  # 'l2' | 'ip' | 'cosine'
    index: Any  # IVFFlatIndex | HNSWIndex


class VectorIndexRegistry:
    def __init__(self) -> None:
        self._by_table: dict[tuple[str, str], list[VectorIndexInfo]] = {}

    def create(
        self,
        name: str,
        table: str,
        column: str,
        method: str,
        index: Any,
        ops: str = "vector_l2_ops",
    ) -> VectorIndexInfo:
        info = VectorIndexInfo(name, table, column, method, OPS_TO_DIST[ops], index)
        self._by_table.setdefault((table, column), []).append(info)
        return info

    def lookup(self, table: str, column: str) -> list[VectorIndexInfo]:
        return self._by_table.get((table, column), [])

    def drop(self, name: str) -> None:
        for key, infos in list(self._by_table.items()):
            self._by_table[key] = [i for i in infos if i.name != name]
