"""Capture .explain("formatted") plans for the bench workloads (guide §1.1).

Writes plans/<round>/<key>_<suffix>.txt for each bench query DataFrame that can be
captured as a plan (build thunks that only produce side effects are
represented by their dominant internal DataFrame where exposed).

Usage: python tools/capture_plans.py <round> <suffix>   # e.g. r12 before
-> writes plans/<round>/<key>_<suffix>.txt
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from bustub_vectordb_spark.catalog import read_table
from bustub_vectordb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    li = read_table(spark, SF_DIR, "lineitem")
    orders = read_table(spark, SF_DIR, "orders")
    customer = read_table(spark, SF_DIR, "customer")
    emb = read_table(spark, SF_DIR, "embeddings")
    docs = read_table(spark, SF_DIR, "documents")

    plans: dict[str, object] = {}

    plans["q1_filter_scan"] = li.filter(
        (F.col("l_quantity") >= 45) & (F.col("l_linenumber") == 3)
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter((F.col("l_quantity") < 49) & (F.col("o_totalprice") > 1000.0))
    )
    plans["q2_join_agg"] = j.agg(
        F.count("*").alias("cnt"), F.max("l_extendedprice").alias("m1"),
        F.max("o_totalprice").alias("m2"), F.max("c_acctbal").alias("m3"),
        F.max("l_quantity").alias("m4"), F.max("l_discount").alias("m5"),
        F.max("l_tax").alias("m6"),
    )
    w = Window.partitionBy("l_partkey").orderBy(F.col("l_extendedprice").desc())
    top3 = li.withColumn("rk", F.rank().over(w)).filter(F.col("rk") <= 3)
    plans["q4_window_topn"] = top3.orderBy(F.col("l_extendedprice").desc()).limit(10)

    from bustub_vectordb_spark.dedup.minhash import minhash_lsh_candidates, near_dup_pairs
    plans["minhash_dedup"] = minhash_lsh_candidates(docs, "text", id_col="doc_id")

    from bustub_vectordb_spark.dedup.components import connected_components
    pairs = near_dup_pairs(docs, "text", "doc_id", threshold=0.5)
    plans["dedup_components"] = connected_components(
        docs.select("doc_id"), pairs, "doc_id"
    )

    from bustub_vectordb_spark.queries import QUERIES
    plans["cdc_merge"] = QUERIES["merge_upsert"](spark, SF_DIR)
    plans["pipeline_prep"] = QUERIES["pipeline_prep"](spark, SF_DIR)

    # vamana: the build IS the edges pipeline; serving plan via pq batch
    from bustub_vectordb_spark.index.vamana import VamanaIndex
    vam = VamanaIndex.build(emb, "embedding", "vec_id", shards=8, overlap_eps=0.2, r=16)
    plans["vamana_build_edges"] = vam.edges
    from bustub_vectordb_spark.similarity.pq import PQModel
    model = PQModel.train(emb, "embedding", "vec_id", m=16, k=32)
    vpq = vam.quantize_pq(model)
    queries = emb.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    plans["vamana_pq_batch"] = vpq.search_batch(queries, "embedding", "qid", k=10)

    from bustub_vectordb_spark.index.hnsw import HNSWIndex
    routed = HNSWIndex.build_routed(
        emb, "embedding", "vec_id", shards=4, m=8, ef_construction=48, ef_search=48
    )
    plans["hnsw_routed_blobs"] = routed.blobs
    plans["hnsw_routed_batch_search"] = routed.search_batch(
        queries, "embedding", "qid", k=10, n_probe=2
    )

    from bustub_vectordb_spark.index.ivfflat import IVFFlatIndex
    ivf = IVFFlatIndex.build(
        emb, "embedding", lists=16, probe_lists=4, max_iter=5, init_order="vec_id"
    )
    plans["ivfflat_batch_probe"] = ivf.probe_batch(
        emb.filter(F.col("vec_id") % 7 == 0), "embedding", "vec_id", k=10, probe_lists=4
    )

    from bustub_vectordb_spark.similarity.bq import BQModel
    bq = BQModel.train(emb, "embedding")
    plans["bq_batch"] = bq.hamming_join(
        emb.filter(F.col("vec_id") % 7 == 0), "embedding", "vec_id",
        emb, "embedding", "vec_id", 10,
    )

    # ShardedHNSW.insert's cogroup upsert (r13): the eager localCheckpoint
    # inside insert() truncates the returned plan, so capture with
    # checkpointing stubbed to identity — the physical plan of the delta
    # (REPARTITION pins feeding FlatMapCoGroupsInPandas) becomes visible
    # in the returned blobs view. Capture-only; never affects real runs.
    _DF = type(emb)  # the concrete (classic) DataFrame class on Spark 4

    _orig_ckpt = _DF.localCheckpoint
    try:
        _DF.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
        burst = emb.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
        plans["sharded_insert_upsert"] = routed.insert(burst).blobs
    finally:
        _DF.localCheckpoint = _orig_ckpt

    for name, df in plans.items():
        try:
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib, io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
