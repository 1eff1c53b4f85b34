"""Past-clamp BQ serving (ef, rerank_mult) sweep (r11 task 4 follow-up).

The r11 visited-set harvest decoupled shortlist depth from walk beam —
correct and recall-neutral at ordinary shard sizes (1.2M×64sh A/B) — but
the 6M/1024-shard clamp drill measured the ESCALATED tier losing recall
through the harvest (0.762 coupled → 0.666 harvest at rerank 32): at
5.9k-row single-entry shards, a default-ef(48) walk's visited set is too
small to feed a 320-deep shortlist, so the escalation must deepen the
WALK as well as the shortlist. This sweep rebuilds the clamp-drill
geometry once and serves the same batch at an (ef, mult) grid to find
the stamp for params['rerank_harvest_ef']: the target is recall ≥ 0.75
at batch ≤ ~40 s (the r10 coupled point was 0.762 at 57.9 s).

Usage: python tools/clamp_ef_sweep.py [--rows 6000000]
       [--out /tmp/clamp_drill] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scale_drill import K, N_QUERIES, SEED, exact_topk, gen_corpus, recall


def _log(msg: str) -> None:
    print(f"[ef-sweep] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-probe", dest="n_probe", type=int, default=8)
    ap.add_argument("--out", default="/tmp/clamp_drill")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--grid", default="48:32,96:32,160:32,320:32,160:48")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.hnsw import HNSWIndex
    from bustub_vectordb_spark.session import get_spark
    from bustub_vectordb_spark.similarity.quantize import dim_stats
    from bustub_vectordb_spark.sql import SqlEngine

    spark = get_spark("clamp-ef-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{args.out}/embeddings.parquet"
    times: dict[str, float] = {}
    if not args.skip_gen or not os.path.exists(path):
        t0 = time.time()
        gen_corpus(spark, args.rows, args.dim, path)
        times["gen"] = round(time.time() - t0, 1)
    emb = spark.read.parquet(path)
    n = emb.count()

    eng = SqlEngine.__new__(SqlEngine)
    shards = eng._auto_shards(n, quantized=True)
    assert shards == SqlEngine.HNSW_MAX_AUTO_SHARDS == 1024, shards
    ratio = (n / shards) / SqlEngine.HNSW_SHARD_TARGET_ROWS_QUANTIZED
    assert ratio > 1.0

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
    t0 = time.time()
    truth = exact_topk(emb, qmat, qids)
    times["ground_truth"] = round(time.time() - t0, 1)

    t0 = time.time()
    routed = HNSWIndex.build_routed(
        emb, "embedding", "vec_id", shards=shards, m=8,
        ef_construction=48, ef_search=48, replicate_eps=0.2,
        max_shard_rows=60_000,
    )
    routed.blobs.cache().count()
    times["routed_build"] = round(time.time() - t0, 1)
    _log(f"build done {times['routed_build']}s")

    t0 = time.time()
    stats = dim_stats(emb, "embedding").orderBy("dim").collect()
    bq = routed.quantize_bq([r["mn"] for r in stats], [r["mx"] for r in stats])
    bq.blobs.cache().count()
    times["bq_quantize"] = round(time.time() - t0, 1)

    report: dict[str, object] = {
        "rows": n, "dim": args.dim, "shards": shards,
        "rows_per_shard": round(n / shards),
        "ratio_over_quantized_target": round(ratio, 3),
        "n_probe": args.n_probe, "grid": [],
    }
    for spec in args.grid.split(","):
        ef_s, mult_s = spec.split(":")
        ef, mult = int(ef_s), int(mult_s)
        t0 = time.time()
        hits = bq.search_batch(
            qdf, "embedding", "qid", K, n_probe=args.n_probe,
            rerank=emb, rerank_mult=mult, ef=ef,
        ).collect()
        row = {
            "ef": ef, "rerank_mult": mult,
            "batch_sec": round(time.time() - t0, 1),
            "recall": round(recall(truth, hits), 4),
        }
        report["grid"].append(row)
        _log(f"{row}")

    report["times_sec"] = times
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
