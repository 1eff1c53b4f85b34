"""Sketch aggregates — the 100 TB scale path for distinct counts and
percentiles.

Exact countDistinct shuffles every distinct value; exact percentile
materializes whole groups. At cluster scale the mergeable-sketch forms
(HyperLogLog++ for distinct, t-digest/GK for percentiles) are the only
viable plans: fixed-size state, map-side partial aggregation, one narrow
shuffle of sketches. The exact twins are oracle-gated queries
(agg_count_distinct, agg_quantiles); these tests pin the sketches to their
exact twins within the documented error bounds so the scale path is safe to
swap in."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(tables):
    li = tables["lineitem"]
    exact = li.agg(
        F.countDistinct("l_suppkey").alias("s"), F.countDistinct("l_orderkey").alias("o")
    ).collect()[0]
    approx = li.agg(
        F.approx_count_distinct("l_suppkey", rsd=0.05).alias("s"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("o"),
    ).collect()[0]
    for col in ("s", "o"):
        rel = abs(approx[col] - exact[col]) / exact[col]
        assert rel < 0.15, f"{col}: approx {approx[col]} vs exact {exact[col]}"


def test_approx_percentile_within_accuracy(tables):
    li = tables["lineitem"]
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
    ).collect()[0]
    # accuracy=1000 → rank error <= n/1000; translate to a loose value bound
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_sketches_are_partial_aggregable(tables):
    """The property that makes sketches the scale path: the plan must show
    a two-phase (partial -> final) hash aggregate, i.e. map-side combine of
    sketch state, not a value shuffle."""
    import io
    from contextlib import redirect_stdout

    li = tables["lineitem"]
    df = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").alias("n")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("HashAggregate") >= 2  # partial + final


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — functions/sketch.py. Unlike the
# HLL/t-digest built-ins above, this one is engine-replayable (md5-derived
# hashes), so its gated entry (sketch_distinct_kmv) hash-matches DuckDB.
# ---------------------------------------------------------------------------


def test_kmv_small_range_is_exact(spark):
    """Fewer than k distinct hashes → the sketch IS the distinct set and
    the estimate is the exact count."""
    from bustub_vectordb_spark.functions.sketch import kmv_distinct_estimate

    df = spark.range(100).selectExpr("cast(id % 37 as string) AS v")
    row = kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert row["k"] == 256
    assert row["n_est"] == 37.0


def test_kmv_estimate_within_error_bound(spark):
    """50k distinct values, k=256 → std error ~1/sqrt(255) ≈ 6.3%;
    assert within 3σ (deterministic — md5 has no seed to vary)."""
    from bustub_vectordb_spark.functions.sketch import kmv_distinct_estimate

    df = spark.range(50_000).selectExpr("cast(id as string) AS v")
    row = kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert abs(row["n_est"] - 50_000) / 50_000 < 0.20, row["n_est"]


def test_kmv_ignores_duplicates(spark):
    """The estimate depends on the distinct value set only — feeding every
    value 5x must produce the identical sketch output."""
    from bustub_vectordb_spark.functions.sketch import kmv_distinct_estimate

    once = spark.range(10_000).selectExpr("cast(id as string) AS v")
    five = spark.range(50_000).selectExpr("cast(id % 10000 as string) AS v")
    a = kmv_distinct_estimate(once, "v").collect()[0]
    b = kmv_distinct_estimate(five, "v").collect()[0]
    assert a["n_est"] == b["n_est"]


def test_kmv_take_is_per_partition_topk(spark):
    """ORDER BY h LIMIT k must plan as TakeOrderedAndProject (per-partition
    local top-k, driver merge) — not a global sort: that is the property
    that keeps the sketch scale-safe."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.functions.sketch import kmv_hash

    df = spark.range(10_000).selectExpr("cast(id as string) AS v")
    h = df.select(kmv_hash("v").alias("h")).distinct().orderBy("h").limit(256)
    buf = io.StringIO()
    with redirect_stdout(buf):
        h.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_kmv_groupwise_matches_global_on_single_group(spark):
    """kmv_distinct_estimate_by over one group must produce exactly the
    global sketch's estimate (same hash set, same bottom-k)."""
    from bustub_vectordb_spark.functions.sketch import (
        kmv_distinct_estimate,
        kmv_distinct_estimate_by,
    )

    df = spark.range(20_000).selectExpr("'g' AS g", "cast(id as string) AS v")
    g = kmv_distinct_estimate(df, "v", k=128).collect()[0]["n_est"]
    b = kmv_distinct_estimate_by(df, "g", "v", k=128).collect()[0]["n_est"]
    assert g == b


def test_kmv_groupwise_per_group_independence(spark):
    """Each group's estimate depends only on that group's values: adding a
    huge second group must not move the first group's estimate."""
    from bustub_vectordb_spark.functions.sketch import kmv_distinct_estimate_by

    a = spark.range(5_000).selectExpr("'a' AS g", "cast(id as string) AS v")
    big = spark.range(80_000).selectExpr("'b' AS g", "cast(id + 1000000 as string) AS v")
    solo = {r["g"]: r["n_est"] for r in kmv_distinct_estimate_by(a, "g", "v").collect()}
    both = {r["g"]: r["n_est"] for r in
            kmv_distinct_estimate_by(a.union(big), "g", "v").collect()}
    assert solo["a"] == both["a"]
    assert abs(both["b"] - 80_000) / 80_000 < 0.25
