"""Bucketed layout: the co-located join must read with zero Exchange below
the join and produce byte-identical results to the plain parquet join."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    from bustub_vectordb_spark.layout import bucketize

    prefix = str(tmp_path_factory.mktemp("bucketed"))
    names = bucketize(spark, sf_dir, n_buckets=4, path_prefix=prefix)
    yield names
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _join_plan(spark, names):
    li = spark.table(names["lineitem"])
    o = spark.table(names["orders"])
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return j, j._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark, bucketed):
    """With broadcast disabled (forcing the shuffle-sensitive SMJ path),
    neither join input may introduce an Exchange — the bucket layout IS the
    partitioning the join needs."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j, plan = _join_plan(spark, bucketed)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_one_file_per_bucket(bucketed, spark):
    """repartition(n, key) before bucketBy(n, key) aligns write tasks with
    buckets: exactly one file per bucket (a cluster-scale write would
    otherwise emit tasks×buckets files)."""
    import os

    loc = (
        spark.sql(f"DESCRIBE EXTENDED {bucketed['lineitem']}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    files = [
        f
        for f in os.listdir(loc.replace("file:", ""))
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    assert len(files) == 4, files


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed, tables):
    from bustub_vectordb_spark.layout import colocated_join_agg

    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in colocated_join_agg(spark, sf_dir, n_buckets=4).collect()
    }
    li, o = tables["lineitem"], tables["orders"]
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
            )
        ).collect()
    }
    assert got == want and got


def test_training_export_shards_roundtrip(spark, tables, tmp_path):
    """Training export: one directory per shard (readers partition-prune),
    deterministic engine-independent assignment, reproducible intra-shard
    order, no rows lost, roughly balanced shards."""
    import glob
    import os

    from bustub_vectordb_spark.operators.export import (
        export_shards,
        write_training_shards,
    )

    docs = tables["documents"]
    path = str(tmp_path / "shards")
    write_training_shards(docs, "doc_id", 4, path)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/shard=*"))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    counts = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert max(counts.values()) < 3 * min(counts.values()), counts

    # (shard, shard_pos) is a pure function of ids — identical across runs,
    # and shard_pos is a dense 1..n_k permutation within each shard
    a = sorted(
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in export_shards(docs, "doc_id", 4).collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in export_shards(docs, "doc_id", 4).collect()
    )
    assert a == b
    per_shard = {}
    for _, s, p in a:
        per_shard.setdefault(s, []).append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_partitioned_layout_prunes_at_planning_time(spark, sf_dir, tmp_path):
    """Hive-style partitionBy(event_type) + IN-filter read: the scan must
    carry the predicate as PartitionFilters (planning-time directory
    pruning) and touch only the 2 selected partitions' files — the lever
    that turns a 100 TB scan into a 2-partition scan."""
    from bustub_vectordb_spark.catalog import read_table

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "part_events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    q = back.filter(F.col("event_type").isin("view", "purchase")).groupBy(
        "event_type"
    ).count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters:")[1].split("]")[0]
    # row-level check: pruned read equals filtered full read
    got = {r["event_type"]: r["count"] for r in q.collect()}
    want = {
        r["event_type"]: r["count"]
        for r in ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert got == want and set(got) == {"view", "purchase"}


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs 1-D sort, measured from parquet footer min/max stats:
    for a box selective in the SECOND dimension only, every file of the
    custkey-sorted layout overlaps the box (no pruning possible), while
    the z-ordered layout leaves most files prunable on totalprice."""
    import pyarrow.parquet as pq

    from bustub_vectordb_spark.catalog import read_table
    from bustub_vectordb_spark.layout import zorder_write

    o = read_table(spark, sf_dir, "orders")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(o, "o_custkey", "o_totalprice", zdir, n_files=16)
    (
        o.repartitionByRange(16, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def overlapping_files(d, lo, hi):
        import glob

        total, hit = 0, 0
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin = min(
                md.row_group(i).column(3).statistics.min for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(3).statistics.max for i in range(md.num_row_groups)
            )
            total += 1
            hit += int(fmax >= lo and fmin <= hi)
        return total, hit

    # column 3 = o_totalprice in both layouts (schema order preserved)
    assert o.columns[3] == "o_totalprice"
    lo, hi = 180000.0, 220000.0
    z_total, z_hit = overlapping_files(zdir, lo, hi)
    l_total, l_hit = overlapping_files(ldir, lo, hi)
    assert l_hit == l_total, "1-D custkey sort cannot prune a totalprice box"
    assert z_hit <= z_total // 2, f"z-order should prune most files, hit {z_hit}/{z_total}"

    # and the clustered copy is bit-exact: same row multiset
    back = spark.read.parquet(zdir)
    assert back.count() == o.count()
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0
