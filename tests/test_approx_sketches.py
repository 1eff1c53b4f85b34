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
