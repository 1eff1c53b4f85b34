"""Sampled-path vs full-path entry seeds A/B (VERDICT r8 #7 / NOTES r9
lead 4).

The merged-Vamana multi-entry serving seeds are entry-cell k-means
medoids. Below DRIVER_TRAIN_MAX_CELLS the k-means trains on the FULL
id-sorted corpus driver-side; past it (every real big table) it trains on
a bounded SAMPLE and picks each cell's medoid with one distributed pass.
The open question: do sample-trained entry cells degrade serving recall
vs full-table cells? This drill builds the SAME corpus twice at a size
where both paths are lawful (default 450k × dim 64 → n·dim = 28.8M, just
under the 32M cap) — once on the full path, once with the cap
monkeypatched down so the build takes the sampled path exactly as a
10×-bigger table would — and reports merged-serving recall@10 for both.
Pass criterion (VERDICT): ≤2pt recall delta.

Usage: python tools/entries_ab.py [--rows 450000] [--dim 64]
       [--out /tmp/entries_ab]
Prints one JSON line (drills/ records it).
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
    ap.add_argument("--rows", type=int, default=450_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--out", default="/tmp/entries_ab")
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.ivfflat import IVFFlatIndex
    from bustub_vectordb_spark.index.vamana import VamanaIndex
    from bustub_vectordb_spark.session import get_spark

    spark = get_spark("entries-ab")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{args.out}/embeddings.parquet"
    if not args.skip_gen or not os.path.exists(path):
        gen_corpus(spark, args.rows, args.dim, path)
    emb = spark.read.parquet(path)
    n = emb.count()
    assert n * args.dim <= IVFFlatIndex.DRIVER_TRAIN_MAX_CELLS, (
        "corpus must sit under the cap so the FULL path is lawful"
    )

    qrows = (
        emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0)
        .orderBy("vec_id").limit(N_QUERIES).collect()
    )
    rq = np.random.RandomState(SEED + 1)
    qmat = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qmat = qmat + 0.25 * rq.standard_normal(qmat.shape)
    qids = [int(r["vec_id"]) for r in qrows]
    truth = exact_topk(emb, qmat, qids)

    report: dict[str, object] = {"rows": n, "dim": args.dim, "shards": args.shards}

    def run(tag: str) -> None:
        t0 = time.time()
        vam = VamanaIndex.build(
            emb, "embedding", "vec_id", shards=args.shards,
            overlap_eps=0.2, r=16, ef_construction=48, ef_search=48,
            max_cell_rows=60_000,
        )
        vam.edges.cache().count()
        report[f"build_sec_{tag}"] = round(time.time() - t0, 1)
        report[f"n_entries_{tag}"] = len(vam.params.get("entry_ids") or [])
        t0 = time.time()
        hits = []
        for q, v in zip(qids, qmat):
            h = vam.probe(v.tolist(), K).collect()
            hits.extend([{"qid": q, "vec_id": r["vec_id"]} for r in h])
        report[f"probe_sec_{tag}"] = round(time.time() - t0, 1)
        report[f"recall_{tag}"] = round(recall(truth, hits), 4)
        print(json.dumps({k: report[k] for k in report if k.endswith(tag)}),
              flush=True)
        vam.edges.unpersist()

    run("full")
    # force the SAMPLED path: cap low enough that frac ≈ the ratio a
    # 10×-bigger table would see (28.8M cells / 8M cap → frac ≈ 0.28)
    saved = IVFFlatIndex.DRIVER_TRAIN_MAX_CELLS
    try:
        IVFFlatIndex.DRIVER_TRAIN_MAX_CELLS = 8_000_000
        run("sampled")
    finally:
        IVFFlatIndex.DRIVER_TRAIN_MAX_CELLS = saved

    report["recall_delta"] = round(
        float(report["recall_full"]) - float(report["recall_sampled"]), 4
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
