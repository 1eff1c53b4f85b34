"""Boundary-replicated partitioned-vamana A/B at density (r12 stretch,
VERDICT r11 #8 / r10 lead #3).

The r10 ef sweep localized the partitioned tier's recall gap to in-cell
NAVIGABILITY: restricting the merged adjacency to in-cell edges deletes
the cross-cell paths RobustPrune's degree budget was spent around, and the
shipped answer (ef_serve 192) pays a deeper beam on EVERY query to walk
around the loss (0.86/0.932/0.974 at ef 48/96/192 vs merged 0.978).
SPANN closure assignment attacks the cause instead: boundary vertices
join every cell within (1+eps)x of their nearest (capped), so the
restriction keeps their neighborhoods alive — a one-time storage cost
(replication factor <= cap) instead of a per-query beam cost.

Measured here, one merged 1.2M build shared across legs:
  eps=0      at ef 192   — the shipped baseline (r10: 0.974)
  eps=.1/.2  at ef 192   — does replication close the merged gap?
  eps=.1/.2  at ef 96/48 — does replication buy the beam back (same
                           recall at half/quarter the serving beam)?
Each leg: replication factor, cut time, batch serving time, recall@10.

Usage: python tools/part_replicate_ab.py [--rows 1200000] [--cells 64]
       [--n-probe 4] [--out /tmp/drill_r10]  (reuses corpus + any
       /tmp parquet from earlier drills at the same --out)
Prints one JSON line (drills/ records it).

RUN ONE LEG PER PROCESS at 1.2M (--legs "0.2:96"): replicated cuts carry
~2.3x bigger cell blobs through driver task results, and the third
same-process leg reproducibly dies on driver-heap GCLocker exhaustion at
the default 16g (scale_drill's one-JSON-per-process note, same cause).
The merged artifact persists to --out on first build, so per-leg
processes pay index load + cut only. SPARK_GRAFT_DRIVER_MEM=32g gives
headroom.
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
    ap.add_argument("--rows", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--n-probe", dest="n_probe", type=int, default=4)
    ap.add_argument("--out", default="/tmp/drill_r10")
    ap.add_argument(
        "--legs",
        default="0:192,0.1:192,0.2:192,0.1:96,0.2:96,0.2:48",
        help="comma list of eps:ef_serve legs",
    )
    ap.add_argument("--cap", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.vamana import VamanaIndex
    from bustub_vectordb_spark.session import get_spark

    spark = get_spark("part-replicate-ab")
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

    report: dict[str, object] = {
        "rows": n, "dim": args.dim, "cells": args.cells,
        "n_probe": args.n_probe, "replicate_cap": args.cap, "legs": [],
    }

    # the merged build is ~30 min at 1.2M and every leg shares it — persist
    # the artifact so a crashed/extended sweep resumes at cut cost only
    idx_path = f"{args.out}/rep_ab_vamana_{n}"
    if os.path.exists(idx_path):
        vam = VamanaIndex.load(spark, idx_path)
        vam.edges.cache().count()
        report["merged_build_sec"] = "loaded"
        print("[rep-ab] merged index loaded", file=sys.stderr, flush=True)
    else:
        t0 = time.time()
        vam = VamanaIndex.build(
            emb, "embedding", "vec_id", shards=64, overlap_eps=0.2,
            r=16, ef_construction=48, ef_search=48, max_cell_rows=60_000,
        )
        vam.edges.cache().count()
        report["merged_build_sec"] = round(time.time() - t0, 1)
        print(f"[rep-ab] build done {report['merged_build_sec']}s",
              file=sys.stderr, flush=True)
        vam.save(idx_path)

    for leg in args.legs.split(","):
        eps_s, ef_s = leg.split(":")
        eps, efs = float(eps_s), int(ef_s)
        t0 = time.time()
        part = vam.to_partitioned(
            cells=args.cells, n_probe=args.n_probe, ef_serve=efs,
            replicate_eps=eps, replicate_cap=args.cap,
        )
        part.blobs.cache().count()
        cut_sec = round(time.time() - t0, 1)
        # replication factor: total shell members / corpus rows (shells
        # carry their member count in the pickled graph — count via the
        # members_df the serving machinery already exposes)
        stored = part.members().count()
        t0 = time.time()
        hits = part.search_batch(
            qdf, "embedding", "qid", K, n_probe=args.n_probe
        ).collect()
        batch_sec = round(time.time() - t0, 1)
        row = {
            "replicate_eps": eps, "ef_serve": efs,
            "to_partitioned_sec": cut_sec,
            "replication_factor": round(stored / n, 3),
            "batch_sec": batch_sec,
            "recall": round(recall(truth, hits), 4),
        }
        report["legs"].append(row)
        print(f"[rep-ab] {row}", file=sys.stderr, flush=True)
        part.blobs.unpersist()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
