"""Plan-shape assertions — the Spark analogue of the reference's
``ensure:index_scan`` / ``ensure:seq_scan`` sqllogictest options
(tools/sqllogictest/sqllogictest.cpp:66-100).

At 100 TB these shapes ARE the performance model: a filter that misses
PushedFilters re-reads the whole table; a dim join that misses broadcast
shuffles the fact table; a top-n that misses TakeOrderedAndProject sorts
the world. Correct results with the wrong plan shape fail these tests.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(tables):
    li = tables["lineitem"]
    q = li.filter((F.col("l_quantity") >= 30) & (F.col("l_returnflag") == "R"))
    p = plan_of(q)
    assert "PushedFilters" in p
    assert "l_quantity" in p.split("PushedFilters")[1].splitlines()[0]
    assert "l_returnflag" in p.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning_reaches_parquet(tables):
    li = tables["lineitem"]
    q = li.select("l_orderkey", "l_quantity")
    p = plan_of(q)
    schema_line = p.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in schema_line and "l_quantity" in schema_line
    assert "l_shipdate" not in schema_line, "projection must prune unread columns"


def test_small_dim_join_broadcasts(tables):
    cust, nation = tables["customer"], tables["nation"]
    q = cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"]).select(
        "c_custkey", "n_name"
    )
    p = plan_of(q)
    assert "BroadcastHashJoin" in p, "25-row nation must broadcast, not shuffle"
    assert "SortMergeJoin" not in p


def test_topn_is_take_ordered(tables):
    li = tables["lineitem"]
    q = li.orderBy(F.col("l_extendedprice").desc()).limit(5)
    p = plan_of(q)
    assert "TakeOrderedAndProject" in p, "ORDER BY + LIMIT must fuse to top-n"
    assert "\n   Sort " not in p, "no global sort for a top-n"


def test_knn_is_take_ordered(tables):
    """The reference's TopN executor (topn_executor.cpp) over a distance
    expression — Spark must plan the same heap-based top-n, not a sort."""
    from bustub_vectordb_spark.functions.vector import l2_dist
    from bustub_vectordb_spark.queries import QUERY_VEC

    emb = tables["embeddings"]
    q = (
        emb.withColumn("distance", l2_dist(F.col("embedding"), QUERY_VEC))
        .orderBy("distance")
        .limit(10)
    )
    assert "TakeOrderedAndProject" in plan_of(q)


def _assert_jvm_side(spark, sf_dir, pred):
    from bustub_vectordb_spark.queries import QUERIES

    exempt = {"multimodal_decode_features"}  # stubbed decode is a Pandas UDF
    for name, fn in QUERIES.items():
        if name in exempt or not pred(name):
            continue
        df = fn(spark, sf_dir)
        p = plan_of(df, "extended")
        assert "BatchEvalPython" not in p, f"{name} fell off the JVM fast path"
        assert "pythonUDF" not in p, f"{name} fell off the JVM fast path"


def test_relational_queries_stay_jvm_side(spark, sf_dir):
    """No row-at-a-time Python evaluation in any relational/text/dedup plan —
    everything must stay in codegen'd JVM expressions (Pandas UDFs are only
    allowed in the explicitly-exempt multimodal decode path). The ann_*
    entries sweep in the slow twin below: CONSTRUCTING their DataFrames
    runs real index builds, which is what made the single combined sweep
    ~200 s of the gate's pytest budget (VERDICT r12 #1)."""
    _assert_jvm_side(spark, sf_dir, lambda n: not n.startswith("ann_"))


@pytest.mark.slow
def test_ann_queries_stay_jvm_side(spark, sf_dir):
    """The ann_* half of the JVM-side sweep (index builds make it the
    most expensive single test in the suite — slow-marked, builder loop
    runs it with SPARK_GRAFT_RUN_SLOW=1)."""
    _assert_jvm_side(spark, sf_dir, lambda n: n.startswith("ann_"))


def test_index_selection_explain_shapes(spark, sf_dir, tables):
    """vector.03-index-selection.slt: the session var drives the chosen plan."""
    from bustub_vectordb_spark.index.ivfflat import IVFFlatIndex
    from bustub_vectordb_spark.index.registry import VectorIndexRegistry
    from bustub_vectordb_spark.index.selection import plan_knn
    from bustub_vectordb_spark.queries import QUERY_VEC

    emb = tables["embeddings"]
    reg = VectorIndexRegistry()
    idx = IVFFlatIndex.build(emb, "embedding", lists=4, probe_lists=2, max_iter=3)
    reg.create("emb_ivf", "embeddings", "embedding", "ivfflat", idx)

    chosen = plan_knn(reg, "embeddings", emb, "embedding", QUERY_VEC, 5, method="unset")
    assert chosen.strategy.startswith("vector_index_scan")
    none = plan_knn(reg, "embeddings", emb, "embedding", QUERY_VEC, 5, method="none")
    assert none.strategy == "seq_scan"
    hnsw_only = plan_knn(
        reg, "embeddings", emb, "embedding", QUERY_VEC, 5, method="hnsw"
    )
    assert hnsw_only.strategy == "seq_scan", "no hnsw index registered -> exact scan"


def test_explicit_method_distance_mismatch_is_seq_scan(spark, sf_dir, tables):
    """ref MatchVectorIndex: the mismatched-distance fallback only applies
    when vector_index_method is 'unset'; an explicit method with no
    distance-fn match returns nullptr → seq scan (probing a wrong-distance
    index would return wrongly ordered top-k)."""
    from bustub_vectordb_spark.index.ivfflat import IVFFlatIndex
    from bustub_vectordb_spark.index.registry import VectorIndexRegistry
    from bustub_vectordb_spark.index.selection import plan_knn
    from bustub_vectordb_spark.queries import QUERY_VEC

    emb = tables["embeddings"]
    reg = VectorIndexRegistry()
    idx = IVFFlatIndex.build(emb, "embedding", lists=4, probe_lists=2, max_iter=3)
    reg.create("emb_ivf_l2", "embeddings", "embedding", "ivfflat", idx)

    explicit = plan_knn(
        reg, "embeddings", emb, "embedding", QUERY_VEC, 5,
        dist="cosine", method="ivfflat",
    )
    assert explicit.strategy == "seq_scan", (
        "explicit method + no distance match must fall back to exact scan"
    )
    # 'unset' keeps the reference's lenient fallback to the first candidate
    unset = plan_knn(
        reg, "embeddings", emb, "embedding", QUERY_VEC, 5,
        dist="cosine", method="unset",
    )
    assert unset.strategy == "vector_index_scan(ivfflat)"


def test_decontaminate_broadcasts_bench_side(spark, tables):
    """Decontamination must broadcast the (small) benchmark shingle set —
    the 100 TB corpus side never shuffles for the semi-join."""
    from bustub_vectordb_spark.operators.decontaminate import contamination_flags

    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = contamination_flags(docs, bench, "text", "doc_id")
    p = plan_of(out)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_export_shards_single_exchange(spark, tables):
    """The export layout pays exactly ONE shuffle: the shard-key window
    (assignment itself is a pure projection). No extra Exchange sneaks in."""
    from bustub_vectordb_spark.operators.export import export_shards

    out = export_shards(tables["documents"], "doc_id", 8)
    p = plan_of(out)
    # formatted mode lists each node twice (tree + detail) — count tree rows
    assert p.count("Exchange (") == 1, p


def test_mixture_upsample_is_narrow(spark, tables):
    """Mixture upsampling is projection + filter + explode — zero shuffle,
    zero Python."""
    from bustub_vectordb_spark.operators.sampling import mixture_upsample

    out = mixture_upsample(
        tables["documents"], "doc_id", "lang", {"en": 1.5, "de": 3.0}
    )
    p = plan_of(out)
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_sequence_packing_single_exchange(spark, tables):
    """Sequence packing pays exactly ONE shuffle (the per-shard window);
    digest/shard assignment is a pure projection, everything JVM-side."""
    from bustub_vectordb_spark.functions.text import token_count
    from bustub_vectordb_spark.operators.packing import pack_sequences

    out = pack_sequences(tables["documents"], "doc_id", token_count("text"))
    p = plan_of(out)
    assert p.count("Exchange (") == 1, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_boilerplate_removal_no_pairwise_join(spark, tables):
    """Boilerplate removal must never go pairwise: no cartesian / broadcast
    nested loop anywhere — frequency aggregation IS the dedup predicate —
    and the whole pipeline stays JVM-side."""
    from bustub_vectordb_spark.dedup.boilerplate import remove_boilerplate

    out = remove_boilerplate(tables["documents"], "doc_id", "text")
    p = plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_funnel_single_user_shuffle(spark, sf_dir):
    """The 3 chained stage-windows all partition on user_id and must share
    ONE Exchange; the per-user rollup reuses that partitioning. Only the
    final global 3-count aggregate may add its single-partition exchange."""
    from bustub_vectordb_spark.queries import QUERIES

    out = QUERIES["events_funnel"](spark, sf_dir)
    p = plan_of(out)
    # hashpartitioning exchange for user_id exactly once; the global agg's
    # SinglePartition exchange is the only other one
    assert p.count("Exchange (") <= 2, p
    assert p.count("hashpartitioning(user_id") <= 1, p
