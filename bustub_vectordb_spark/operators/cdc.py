"""Change-data-capture composites: MERGE upsert and SCD2 history.

The reference mutates tables in place row-by-row (Insert/Update/Delete
executors, src/execution/update_executor.cpp:16-60 — update is literally
delete-then-insert per tuple). A Spark engine over immutable columnar
files expresses the same intent as *set-level rewrites* — the semantics of
ANSI SQL:2003 MERGE and of the lakehouse MERGE INTO (Delta/Iceberg),
re-derived here with plain joins so the output is engine-agnostic:

  merge_upsert   target FULL OUTER JOIN source on the key; matched rows
                 take the source's values (WHEN MATCHED THEN UPDATE),
                 source-only rows are inserted (WHEN NOT MATCHED THEN
                 INSERT), target-only rows pass through. One shuffle on
                 the key — and when the change batch is small (the usual
                 CDC shape: daily deltas against a 100 TB base), pass
                 broadcast_source=True to keep the base un-shuffled. Spark
                 cannot broadcast a FULL OUTER join (the hint is dropped),
                 so the small-delta path decomposes into base LEFT JOIN
                 broadcast(delta) (updates + passthrough, zero exchanges)
                 plus delta ANTI broadcast-semi(base keys) (inserts; the
                 second base scan is pruned to the key column). Source
                 keys must be unique and non-null (MERGE's own precondition
                 — duplicate source keys would fan out matched base rows).

  scd2_intervals slowly-changing-dimension type-2 history from an event
                 log: per key, ordered by time, keep only rows where the
                 tracked attribute CHANGED vs the previous row (lag), then
                 stitch validity windows [valid_from, valid_to) with lead;
                 the current version carries valid_to NULL. Two window
                 functions over ONE partitioning (key, ordered by time) —
                 a single shuffle, no self-join (the naive formulation
                 joins the log to itself on "next change", which is a
                 second shuffle plus a skew hazard on hot keys).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    broadcast_source: bool = False,
) -> DataFrame:
    """ANSI-MERGE upsert: source wins on key match, unmatched source rows
    insert, unmatched target rows survive. Schemas must agree."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"merge schemas differ: {sorted(target.columns)} vs {sorted(source.columns)}"
        )
    keys = list(key_cols)
    s = source.select(*target.columns)
    if broadcast_source:
        # Spark refuses to broadcast either side of a FULL OUTER join (the
        # hint is dropped with a warning), so the small-delta path is two
        # broadcast-friendly passes instead:
        #   1. base LEFT JOIN broadcast(delta)  -> updates + passthrough
        #      (every base file read once, no exchange);
        #   2. delta LEFT ANTI broadcast-semi against the base's key
        #      column -> inserts. This re-scans the base, but column-pruned
        #      to the key alone — at 100 TB a pruned second scan is far
        #      cheaper than the full-width shuffle a full-outer would cost.
        t = target.alias("t")
        sb = F.broadcast(s).alias("s")
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else cond & c
        matched = F.col(f"s.{keys[0]}").isNotNull()
        upserted = t.join(sb, cond, "left").select(
            *[
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                for c in target.columns
            ]
        )
        # matched keys are a subset of the (small) delta: broadcast them
        # back onto the delta to isolate the insert rows
        matched_keys = target.select(*keys).join(F.broadcast(s.select(*keys)), keys, "left_semi")
        inserts = s.join(F.broadcast(matched_keys), keys, "left_anti")
        return upserted.unionByName(inserts)
    t = target.alias("t")
    s = s.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full_outer")
    # row-level presence test on the source's (non-null) join key — NOT
    # per-column coalesce, which would silently keep the target value when
    # a source row legitimately updates a column to NULL
    matched = F.col(f"s.{keys[0]}").isNotNull()
    out_cols = [
        F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*out_cols)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "_op",
    broadcast_source: bool = False,
) -> DataFrame:
    """Full CDC apply — the Debezium/DMS change shape: ``changes`` carries
    the target's columns plus ``op_col`` ('U' upsert / 'D' delete).

    Deletes are an anti-join on the key (set-level tombstoning, the same
    rewrite as operators.relational.delete_rows); survivors then merge the
    upserts. With ``broadcast_source`` both the tombstone anti-join and the
    merge broadcast the (small) change batch — the base still never
    shuffles. A key appearing as both 'U' and 'D' in one batch is refused:
    the outcome would depend on application order, which a set-level
    rewrite cannot honor."""
    keys = list(key_cols)
    # ONE validation job (this runs per micro-batch in the streaming sink):
    # the op vocabulary and the U∩D conflict test fold into a single agg —
    # with ops ⊆ {U, D}, a key carrying both shows up as
    # countDistinct(key, op) > countDistinct(key)
    row = changes.agg(
        F.collect_set(op_col).alias("ops"),
        F.count(F.lit(1)).alias("nrows"),
        F.countDistinct(*keys, op_col).alias("key_ops"),
        F.countDistinct(*keys).alias("nkeys"),
    ).collect()[0]
    bad = set(row["ops"]) - {"U", "D"}
    if bad:
        raise ValueError(f"unknown CDC ops: {sorted(bad)} (expected 'U'/'D')")
    if row["key_ops"] > row["nkeys"]:
        raise ValueError(
            "a key carries more than one change row in one batch "
            "(e.g. both upserted and deleted)"
        )
    if row["nrows"] > row["key_ops"]:
        # two change rows with the same (key, op) — countDistinct collapses
        # them, so this needs the raw row count: merge_upsert would fan the
        # matched target row out once per duplicate (ANSI MERGE's own
        # cardinality violation, same check the SQL frontend's _merge does)
        raise ValueError(
            "duplicate change rows for the same key and op in one batch "
            "(MERGE cardinality violation — each key may change at most once)"
        )
    dels = changes.where(F.col(op_col) == "D").select(*keys)
    ups = changes.where(F.col(op_col) == "U").drop(op_col)
    dside = F.broadcast(dels) if broadcast_source else dels
    survivors = target.join(dside, keys, "left_anti")
    return merge_upsert(survivors, ups, keys, broadcast_source=broadcast_source)


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Collapse an event log into SCD2 validity intervals per key.

    Output: (key, attr, valid_from, valid_to) — one row per *change* of
    ``attr_col``, valid_to NULL on the open (current) interval. ``tie_col``
    disambiguates equal timestamps (required for a deterministic history
    when the log has same-instant events)."""
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    # null-SAFE change detection: attr != prev is NULL (dropped) whenever
    # either side is NULL, which would erase transitions to/from a NULL
    # attribute; and "prev IS NULL" cannot distinguish the first row from
    # a NULL-valued predecessor, so first-row-ness is its own test
    changed = (
        df.withColumn("_prev", prev)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) | ~F.col(attr_col).eqNullSafe(F.col("_prev")))
    )
    # re-window over the change rows only: same partitioning/order, so
    # Catalyst reuses the existing shuffle (no second Exchange)
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
