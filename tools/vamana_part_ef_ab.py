"""Partitioned-vamana in-cell navigation A/B at density (r10).

The 1.2M drills pin partitioned recall at EXACTLY 0.858 for every n_probe
2..32, before AND after the reachability repair (whose BFS test proves
every cell vertex is now walk-reachable). n_probe-invariance means the
missing neighbors sit in cells that ARE probed, and reachability is no
longer in question — so the remaining suspect is IN-CELL NAVIGABILITY:
restricting the merged adjacency to in-cell edges deletes the cross-cell
paths RobustPrune relied on, leaving the survivors reachable but hard for
a greedy beam to navigate.

Two measurements separate the mechanisms:

  assignment ceiling — exact KNN restricted to the n_probe nearest cells'
      members. This is what a PERFECT in-cell search would score; the gap
      between it and served recall is pure in-cell walk loss.
  ef sweep — shells rebuilt at ef_search 48/96/192 (build unchanged; the
      merged graph is built once). If deeper beams close the gap, the fix
      is a serving-ef default; if not, the in-cell graph structure itself
      is the ceiling (→ boundary-replicated cells, the SPANN overlap
      answer, as the next lever).

Usage: python tools/vamana_part_ef_ab.py [--rows 1200000]
       [--out /tmp/drill_r10]   (reuses the corpus if present)
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


def probed_cell_ceiling(emb, centroids, qmat, qids, n_probe):
    """Exact top-K restricted to members of each query's n_probe nearest
    cells — the recall a perfect in-cell search would achieve. Distributed
    (per-partition numpy top-k + global merge), same shape as exact_topk."""
    from pyspark.sql import Window, functions as F

    cents = np.asarray(centroids, dtype=np.float64)
    qd = ((qmat * qmat).sum(axis=1)[:, None]
          - 2.0 * qmat @ cents.T
          + (cents * cents).sum(axis=1)[None, :])
    probed = np.argsort(qd, axis=1, kind="stable")[:, :n_probe]
    probed_sets = [set(row.tolist()) for row in probed]
    qid_arr = list(qids)
    qmat_b = qmat

    def part_topk(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            mat = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            cell = np.argmin(
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * mat @ cents.T
                + (cents * cents).sum(axis=1)[None, :],
                axis=1,
            )
            rows = {"qid": [], "vec_id": [], "d2": []}
            for qi in range(qmat_b.shape[0]):
                keep = np.isin(cell, list(probed_sets[qi]))
                if not keep.any():
                    continue
                sub = mat[keep]
                sid = ids[keep]
                d2 = ((sub * sub).sum(axis=1)
                      - 2.0 * sub @ qmat_b[qi]
                      + float(qmat_b[qi] @ qmat_b[qi]))
                kk = min(K, len(sid))
                top = np.argpartition(d2, kk - 1)[:kk]
                rows["qid"].extend([qid_arr[qi]] * kk)
                rows["vec_id"].extend(sid[top].tolist())
                rows["d2"].extend(d2[top].tolist())
            yield pd.DataFrame(rows)

    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    out = (
        emb.mapInPandas(part_topk, "qid long, vec_id long, d2 double")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= K)
        .select("qid", "vec_id")
        .collect()
    )
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    return got


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--n-probe", dest="n_probe", type=int, default=4)
    ap.add_argument("--out", default="/tmp/drill_r10")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.vamana import VamanaIndex
    from bustub_vectordb_spark.session import get_spark

    spark = get_spark("vamana-part-ef-ab")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{args.out}/embeddings.parquet"
    if not os.path.exists(path):
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

    times: dict[str, float] = {}
    t0 = time.time()
    vam = VamanaIndex.build(
        emb, "embedding", "vec_id", shards=64, overlap_eps=0.2,
        r=16, ef_construction=48, ef_search=48, max_cell_rows=60_000,
    )
    vam.edges.cache().count()
    times["merged_build"] = round(time.time() - t0, 1)
    print(f"[ef-ab] build done {times['merged_build']}s",
          file=sys.stderr, flush=True)

    report: dict[str, object] = {
        "rows": n, "dim": args.dim, "cells": args.cells,
        "n_probe": args.n_probe, "ef_sweep": [],
    }

    part0 = vam.to_partitioned(cells=args.cells, n_probe=args.n_probe)
    ceiling = probed_cell_ceiling(
        emb, part0.centroids, qmat, qids, args.n_probe
    )
    per = [
        len(ceiling.get(q, set()) & t) / len(t) for q, t in truth.items()
    ]
    report["assignment_ceiling"] = round(float(sum(per) / len(per)), 4)
    print(f"[ef-ab] assignment ceiling (n_probe={args.n_probe}): "
          f"{report['assignment_ceiling']}", file=sys.stderr, flush=True)

    for efs in (48, 96, 192):
        t0 = time.time()
        # ef_serve EXPLICIT (ADVICE r10): to_partitioned floors shells at
        # max(ef_search, PARTITIONED_EF_SERVE), so mutating
        # params["ef_search"] alone would cut ef-192 shells at every sweep
        # point and all three rows would measure the same configuration
        part = vam.to_partitioned(
            cells=args.cells, n_probe=args.n_probe, ef_serve=efs
        )
        part.blobs.cache().count()
        cut_sec = round(time.time() - t0, 1)
        t0 = time.time()
        hits = part.search_batch(
            qdf, "embedding", "qid", K, n_probe=args.n_probe
        ).collect()
        row = {
            "ef_search": efs,
            "to_partitioned_sec": cut_sec,
            "batch_sec": round(time.time() - t0, 1),
            "recall": round(recall(truth, hits), 4),
        }
        report["ef_sweep"].append(row)
        print(f"[ef-ab] {row}", file=sys.stderr, flush=True)

    # ---- merged residual-PQ serving grid (shares the merged build):
    # separates shortlist-ordering (rerank_mult axis) from walk
    # exploration (ef axis) on the 0.3-recall merged-PQR tier ----
    from bustub_vectordb_spark.similarity.pq import PQModel

    t0 = time.time()
    model = PQModel.train(vam.residual_source(), "__res", "vec_id", m=16, k=32)
    vpq = vam.quantize_pq(model, residual=True)
    times["pqr_train"] = round(time.time() - t0, 1)
    print(f"[ef-ab] pqr train done {times['pqr_train']}s",
          file=sys.stderr, flush=True)
    nq_pq = min(25, len(qids))  # driver walks are ~4-10 s each
    report["pqr_merged_grid"] = []
    for rm, ef in ((4, None), (16, None), (48, None), (4, 256), (16, 256)):
        t0 = time.time()
        hits = []
        for q, v in zip(qids[:nq_pq], qmat[:nq_pq]):
            h = vpq.probe(v.tolist(), K, ef=ef, rerank_mult=rm).collect()
            hits.extend([{"qid": q, "vec_id": r["vec_id"]} for r in h])
        tsub = {q: t for q, t in truth.items() if q in set(qids[:nq_pq])}
        row = {
            "rerank_mult": rm, "ef": ef or "default(48)",
            "probe_sec_total": round(time.time() - t0, 1),
            "recall": round(recall(tsub, hits), 4),
        }
        report["pqr_merged_grid"].append(row)
        print(f"[ef-ab] pqr {row}", file=sys.stderr, flush=True)

    report["times_sec"] = times
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
