"""Connected components over a near-duplicate pair graph.

The single-pass dedup policy (dedup/minhash.py `minhash_dedup`: drop the
greater id of each verified pair) under-merges chains — A~B and B~C leaves
{A} and {A, C} as separate keepers even though {A, B, C} is one duplicate
cluster. Full transitive clustering assigns every document the MINIMUM id
reachable through the pair graph; training-data pipelines then keep one
representative per component.

Spark-first shape: min-label propagation. Each iteration is

  neighbor_min = edges ⋈ labels, groupBy(dst).min(label)   (one shuffle)
  labels       = least(label, neighbor_min)

which converges in `diameter(graph)` iterations. Near-dup clusters are
dense and tiny (duplicates of one source document), so the diameter is a
handful; the loop stops at the first iteration with zero label changes.
At adversarial diameters (long chains) the classic large-star/small-star
rewrite (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) converges in O(log²) rounds — not needed for dedup graphs.

The DuckDB oracle is a recursive CTE computing min reachable id over the
symmetrized edge set — an independent fixpoint formulation of the same
component function (queries.py `dedup_components`).

The reference has no graph/dedup surface; north-star extension alongside
dedup/minhash.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_cols: tuple[str, str] = ("id1", "id2"),
    max_iter: int = 20,
) -> DataFrame:
    """(id_col, component) for every node; component = min id reachable
    through the undirected ``pairs`` graph (isolated nodes map to
    themselves).

    Runs min-label propagation until a fixpoint, checked with one small
    count action per iteration; raises if ``max_iter`` rounds don't
    converge (a dedup graph that deep means the pair threshold is broken).
    """
    a, b = pair_cols
    edges = (
        pairs.select(F.col(a).alias("__src"), F.col(b).alias("__dst"))
        .union(pairs.select(F.col(b).alias("__src"), F.col(a).alias("__dst")))
        .distinct()
    )
    # localCheckpoint each round: iterative self-referencing plans otherwise
    # grow exponentially in the analyzer (persist caches data but NOT the
    # logical plan) — the classic iterative-algorithm trap on Spark
    labels = (
        nodes.select(F.col(id_col), F.col(id_col).alias("component"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nb_min = (
            edges.join(labels, edges["__src"] == labels[id_col])
            .groupBy("__dst")
            .agg(F.min("component").alias("__nb"))
        )
        new_labels = (
            labels.join(nb_min, labels[id_col] == nb_min["__dst"], "left")
            .select(
                labels[id_col],
                F.least(
                    F.col("component"), F.coalesce(F.col("__nb"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), id_col)
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations — "
        "graph diameter too large for plain label propagation (use a "
        "large-star/small-star variant)"
    )
