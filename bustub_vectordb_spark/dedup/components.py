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
SoCC'14) converges in O(log² n) rounds; ``algorithm="auto"`` (default)
runs propagation inside the round budget and escalates to the alternating
algorithm instead of failing, so callers never have to know the diameter
up front.

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
    algorithm: str = "auto",
) -> DataFrame:
    """(id_col, component) for every node; component = min id reachable
    through the undirected ``pairs`` graph (isolated nodes map to
    themselves).

    algorithm:
      'propagate' — min-label propagation, `diameter` rounds; raises past
                    ``max_iter`` (a dedup graph that deep usually means the
                    pair threshold is broken).
      'star'      — alternating large-star/small-star (Kiveris et al.,
                    SoCC'14), O(log² n) rounds regardless of diameter.
      'auto'      — propagation first (cheapest for the dense, tiny
                    clusters dedup produces); if the round budget runs out,
                    escalate to 'star' instead of raising.
    """
    if algorithm not in ("auto", "propagate", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    a, b = pair_cols
    # materialize `pairs` BEFORE the symmetrizing self-union: Spark does
    # not share an unmaterialized subplan between the two sides of a union
    # (the NOTES LSH-self-join lesson), so without this checkpoint the
    # whole near-dup pipeline (MinHash bands + verify joins) executes
    # TWICE just to flip (a, b) — measured ~2.9 s vs ~1.5 s for the edge
    # materialization at sf0.1. The checkpointed relation is tiny
    # (verified pairs only); the second checkpoint below then pins the
    # symmetrized set every propagation round joins against.
    pairs = pairs.select(F.col(a).alias("__src"), F.col(b).alias("__dst"))
    # EAGER here: the union below references the checkpoint from BOTH
    # branches inside one job — a lazy checkpoint could compute the pairs
    # pipeline twice in-flight before the cache exists. LAZY for `edges`:
    # its first consumer (round 1 / the star rewrite) is a single
    # reference, so that job materializes it for free.
    pairs = pairs.localCheckpoint(eager=True)
    edges = (
        pairs.union(
            pairs.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    if algorithm == "star":
        return _star_components(nodes, edges, id_col)
    # localCheckpoint each round: iterative self-referencing plans otherwise
    # grow exponentially in the analyzer (persist caches data but NOT the
    # logical plan) — the classic iterative-algorithm trap on Spark.
    # LAZY checkpoints (eager=False): the convergence-sum agg right below
    # each one is the frame's first action, so one job both materializes
    # the checkpoint and reads the sum — an eager checkpoint would spend a
    # separate job per round for the same bytes (2 jobs/round → 1; the
    # per-round cost of this iterative op is job scheduling, not data).
    labels = (
        nodes.select(F.col(id_col), F.col(id_col).alias("component"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def label_sum(df: DataFrame):
        # labels are elementwise NON-INCREASING across rounds (least(old,
        # nb_min)), so an exact decimal sum is a complete convergence
        # signature: equal sums ⟺ no label moved. One cheap agg over the
        # freshly-checkpointed frame instead of a join of two label frames.
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(labels)
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
            .localCheckpoint(eager=False)
        )
        cur_sum = label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    if algorithm == "auto":
        # diameter exceeded the round budget: escalate to the alternating
        # algorithm, which is insensitive to diameter
        return _star_components(nodes, edges, id_col)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations — "
        "graph diameter too large for plain label propagation (use "
        "algorithm='star' or 'auto')"
    )


# =========================================================================
# Alternating large-star / small-star (Kiveris et al., SoCC'14)
# =========================================================================
# Both operations are one shuffle each (groupBy-min + join), and the edge
# set provably converges to component stars — every non-minimum node ends
# up with a single edge to its component's minimum id — in O(log² n)
# alternations, independent of graph diameter. This is the 100 TB shape for
# adversarial graphs: no step ever materializes a neighborhood larger than
# the skew the data already has, and large-star specifically SPLITS
# high-degree neighborhoods toward the minimum, taming skew as it runs.


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: for every node u (over the symmetrized neighborhood),
    connect each strictly-larger neighbor v > u to m = min(Γ(u) ∪ {u})."""
    sym = edges.union(
        edges.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
    ).distinct()
    mins = sym.groupBy("__src").agg(F.min("__dst").alias("__mn"))
    return (
        sym.join(mins, "__src")
        .filter(F.col("__dst") > F.col("__src"))
        .select(
            F.col("__dst").alias("u"),
            F.least(F.col("__src"), F.col("__mn")).alias("v"),
        )
        .distinct()
        .select(F.col("u").alias("__src"), F.col("v").alias("__dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: orient every edge large→small, then for every node u link
    u and all its smaller neighbors to m = min(Γ(u) ∪ {u})."""
    oriented = (
        edges.select(
            F.greatest("__src", "__dst").alias("u"), F.least("__src", "__dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    j = oriented.join(oriented.groupBy("u").agg(F.min("v").alias("m")), "u")
    return (
        j.select(F.col("u").alias("a"), F.col("m").alias("b"))
        .union(
            j.filter(F.col("v") != F.col("m")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            )
        )
        .distinct()
        .select(F.col("a").alias("__src"), F.col("b").alias("__dst"))
    )


def _star_components(
    nodes: DataFrame, edges: DataFrame, id_col: str, max_rounds: int = 30
) -> DataFrame:
    """Run alternating large-star/small-star to the edge-set fixpoint, then
    read labels off the final stars. Fixpoint detection: (count, xxhash64
    sum) signature of the canonically-oriented edge set — one tiny agg
    action per round (a hash-sum collision between different edge sets is
    ~2⁻⁶⁴; the alternation is monotone toward stars, so a false match
    cannot oscillate)."""

    def sig(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: a long sum of 2⁶⁴-range hashes overflows ANSI mode
            F.sum(F.xxhash64("__src", "__dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # lazy checkpoints: the sig() agg right below is each frame's first
    # action, so one job materializes the checkpoint AND reads the
    # signature (same fuse as the propagation loop above)
    cur = (
        edges.select(
            F.greatest("__src", "__dst").alias("__src"),
            F.least("__src", "__dst").alias("__dst"),
        )
        .filter(F.col("__src") != F.col("__dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig = sig(cur)
    for _ in range(max_rounds):
        # localCheckpoint per round — same iterative-plan-growth trap as the
        # propagation loop above
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        cur_sig = sig(cur)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge in {max_rounds} rounds"
        )
    # at the fixpoint every edge is (member, component_min); nodes absent
    # from the member side are component minima or isolated → themselves
    comp = cur.groupBy("__src").agg(F.min("__dst").alias("__comp"))
    nd = nodes.select(F.col(id_col)).distinct()
    return nd.join(comp, nd[id_col] == comp["__src"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("__comp"), F.col(id_col)).alias("component"),
    )
