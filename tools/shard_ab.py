"""A/B the routed-HNSW DDL auto-shard granularity (VERDICT r7 #3).

The 2.2M scale drill found 256 shards (≈8.6k rows each) built 3.5× faster
than 64 shards (≈34k rows each) at IDENTICAL float recall — suggesting the
SQL frontend's then-250k HNSW_SHARD_TARGET_ROWS default left a large
build-time win on the table for every big CREATE INDEX. This script sweeps
rows-per-shard over a clustered corpus (the scale_drill generator) and
reports build wall-clock, batch-serving wall-clock, and recall@10 per
granularity so the default can be chosen from data. The r8 600k sweep
(drills/shard_ab_600k.json) set the default to 25k (clamped at 1024
shards); NOTE when reading its output that configs coarser than
max_shard_rows=60k get silently re-split by the straggler cap, and fixed
n_probe means the probed FRACTION varies across granularities — the
clean head-to-head is between configs under the cap.

Usage: python tools/shard_ab.py [--rows 600000] [--dim 64]
       [--targets 8000,25000,50000,100000] [--out /tmp/shard_ab]
Prints one JSON line per granularity plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scale_drill import K, N_QUERIES, SEED, exact_topk, gen_corpus, recall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=600_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--targets", default="8000,25000,50000,100000")
    ap.add_argument("--n-probe", dest="n_probe", type=int, default=4)
    # --ddl-n-probe: per-config n_probe = max(2, shards // 4), the SQL
    # frontend's default serving geometry — every config then probes the
    # same ~25% corpus fraction, removing the fixed-n_probe confound the
    # r8 sweep suffered (4 of 12 shards probed 33% while 4 of 75 probed 5%)
    ap.add_argument("--ddl-n-probe", dest="ddl_n_probe", action="store_true")
    # --max-shard-rows 0 disables the straggler cap entirely (the r8 sweep's
    # >=50k configs were silently re-split by the 60k cap, contaminating
    # the coarse points)
    ap.add_argument(
        "--max-shard-rows", dest="max_shard_rows", type=int, default=60_000
    )
    ap.add_argument("--out", default="/tmp/shard_ab")
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.hnsw import HNSWIndex
    from bustub_vectordb_spark.session import get_spark

    spark = get_spark("shard-ab")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{args.out}/embeddings.parquet"
    if not args.skip_gen or not os.path.exists(path):
        gen_corpus(spark, args.rows, args.dim, path)
    emb = spark.read.parquet(path)
    n = emb.count()

    qrows = (
        emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0)
        .orderBy("vec_id").limit(N_QUERIES).collect()
    )
    rq = np.random.RandomState(SEED + 1)
    qmat = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qmat = qmat + 0.25 * rq.standard_normal(qmat.shape)
    qids = [int(r["vec_id"]) for r in qrows]
    qdf = spark.createDataFrame(
        [(q, v.tolist()) for q, v in zip(qids, qmat)],
        "qid long, embedding array<double>",
    )
    truth = exact_topk(emb, qmat, qids)

    results = []
    for target in [int(t) for t in args.targets.split(",")]:
        import math

        shards = max(2, math.ceil(n / target))
        n_probe = (
            max(2, shards // 4) if args.ddl_n_probe else args.n_probe
        )
        t0 = time.time()
        routed = HNSWIndex.build_routed(
            emb, "embedding", "vec_id", shards=shards, m=8,
            ef_construction=48, ef_search=48, replicate_eps=0.2,
            max_shard_rows=args.max_shard_rows or None,
        )
        routed.blobs.cache().count()
        t_build = round(time.time() - t0, 1)
        t0 = time.time()
        hits = routed.search_batch(qdf, "embedding", "qid", K, n_probe=n_probe).collect()
        t_batch = round(time.time() - t0, 1)
        rec = round(recall(truth, hits), 4)
        row = {
            "rows_per_shard_target": target, "shards": shards,
            "n_probe": n_probe,
            "build_sec": t_build, "batch_sec": t_batch, "recall": rec,
        }
        routed.blobs.unpersist()
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"rows": n, "dim": args.dim, "n_probe": args.n_probe,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
