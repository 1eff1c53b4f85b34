"""A/B: visited-set shortlist harvest vs pre-r11 coupled walk (r11 task).

ShardedHNSW.RERANK_HARVEST decouples the quantized-rerank shortlist depth
from the walk beam: the walk runs at the graph's configured ef and the
k·rerank_mult ADC candidates are harvested from its visited set
(_Graph.search(shortlist=...)), instead of widening the beam to
k·rerank_mult. For SQ8 (4x) and the partitioned-vamana shells (ef 192)
the two are bit-identical (the final result heap IS the top-ef of the
visited set); the tiers that actually diverge are the ones whose
shortlist outruns the beam — BQ 16x+ and past-clamp escalations — where
the coupled walk pays beam cost the r10 merged grid says buys nothing.
This tool measures that claim on the sharded tier at the clustered 1.2M
geometry (and any --rows): routed 64-shard build, local-threshold BQ,
search_batch(rerank=...) at several depths, harvest vs coupled, recall@10
vs exact ground truth + wall-clock.

--vamana instead runs the merged-vamana residual-PQ leg: probe() at
rerank_mult 16/48 through the HARVEST path (the coupled numbers for the
same corpus are already recorded in drills/drill_1200k_r10_part_ef_ab.json
pqr_merged_grid; rerank 16 is bit-identical by the seed-floor argument —
the check asserts it).

Usage: python tools/harvest_ab.py [--rows 1200000] [--shards 64]
       [--n-probe 4] [--out /tmp/scale_drill] [--skip-gen] [--vamana]
Run the two legs in separate processes (disk-pressure note in
scale_drill.py's docstring applies).
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


def _log(msg: str) -> None:
    print(f"[harvest-ab] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--n-probe", dest="n_probe", type=int, default=4)
    ap.add_argument("--out", default="/tmp/scale_drill")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--mults", default="16,32")
    ap.add_argument("--vamana", action="store_true")
    # follow-up legs (r11): merged-PQR rerank knee (32), deep rerank on
    # the cells=64 PQR shells, and the granularity-law test for per-cell
    # books (cells=256 == mode structure)
    ap.add_argument("--vamana-extra", dest="vamana_extra", action="store_true")
    # r12: A/B the aligned harvest (stop_n termination) against the r11
    # unaligned one — flip the class flag before any build/serve
    ap.add_argument("--no-align", dest="no_align", action="store_true")
    args = ap.parse_args()
    if args.no_align:
        from bustub_vectordb_spark.index.hnsw import _Graph

        _Graph.HARVEST_ALIGNED = False

    from bustub_vectordb_spark.session import get_spark

    spark = get_spark("harvest-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.hnsw import HNSWIndex, ShardedHNSW

    path = f"{args.out}/embeddings.parquet"
    times: dict[str, float] = {}
    if not args.skip_gen or not os.path.exists(path):
        t0 = time.time()
        gen_corpus(spark, args.rows, args.dim, path)
        times["gen"] = round(time.time() - t0, 1)
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
    _log(f"corpus ready: {n} rows")
    t0 = time.time()
    truth = exact_topk(emb, qmat, qids)
    times["ground_truth"] = round(time.time() - t0, 1)

    report: dict[str, object] = {
        "rows": n, "dim": args.dim, "shards": args.shards,
        "n_probe": args.n_probe, "legs": [],
    }

    if args.vamana_extra:
        from bustub_vectordb_spark.index.vamana import VamanaIndex
        from bustub_vectordb_spark.similarity.pq import PQModel

        t0 = time.time()
        vam = VamanaIndex.build(
            emb, "embedding", "vec_id", shards=64, overlap_eps=0.2,
            r=16, ef_construction=48, ef_search=48, max_cell_rows=60_000,
        )
        vam.edges.cache().count()
        times["vamana_merged_build"] = round(time.time() - t0, 1)
        _log(f"merged build done {times['vamana_merged_build']}s")
        t0 = time.time()
        model = PQModel.train(
            vam.residual_source(), "__res", "vec_id", m=16, k=32
        )
        vpq = vam.quantize_pq(model, residual=True)
        times["pqr_train"] = round(time.time() - t0, 1)
        _log(f"pqr train done {times['pqr_train']}s")
        nq = min(25, len(qids))
        sub = {q: truth[q] for q in qids[:nq]}
        for mult in (24, 32):
            t0 = time.time()
            hits = []
            for q, v in list(zip(qids, qmat))[:nq]:
                h = vpq.probe(v.tolist(), K, rerank_mult=mult).collect()
                hits.extend({"qid": q, "vec_id": r["vec_id"]} for r in h)
            leg = {
                "tier": "vamana_pqr_merged_probe", "mode": "harvest",
                "rerank_mult": mult, "nq": nq,
                "probe_sec_total": round(time.time() - t0, 1),
                "recall": round(recall(sub, hits), 4),
            }
            report["legs"].append(leg)
            _log(f"{leg}")
        # deep rerank on the cells=64 PQR shells (VERDICT r10 #3 target)
        t0 = time.time()
        part_pqr = vpq.to_partitioned(cells=64, n_probe=args.n_probe)
        part_pqr.blobs.cache().count()
        times["pqr_to_partitioned_64"] = round(time.time() - t0, 1)
        for mult in (32, 48):
            t0 = time.time()
            hits = part_pqr.search_batch(
                qdf, "embedding", "qid", K, n_probe=args.n_probe,
                rerank=emb, rerank_mult=mult,
            ).collect()
            leg = {
                "tier": "vamana_pqr_partitioned_batch", "mode": "harvest",
                "rerank_mult": mult, "cells": 64,
                "batch_sec": round(time.time() - t0, 1),
                "recall": round(recall(truth, hits), 4),
            }
            report["legs"].append(leg)
            _log(f"{leg}")
        # granularity-law test: per-cell books at cells == mode structure
        t0 = time.time()
        part_pql = vam.to_partitioned(
            cells=256, n_probe=16
        ).quantize_pq_local(m=16, k=32)
        part_pql.blobs.cache().count()
        times["pql_to_partitioned_and_train_256"] = round(time.time() - t0, 1)
        for mult in (16, 48):
            t0 = time.time()
            hits = part_pql.search_batch(
                qdf, "embedding", "qid", K, n_probe=16,
                rerank=emb, rerank_mult=mult,
            ).collect()
            leg = {
                "tier": "vamana_pql_partitioned_batch", "mode": "harvest",
                "rerank_mult": mult, "cells": 256, "n_probe": 16,
                "batch_sec": round(time.time() - t0, 1),
                "recall": round(recall(truth, hits), 4),
            }
            report["legs"].append(leg)
            _log(f"{leg}")
        # frozen-residual books at the same fine cells, for the ordering
        t0 = time.time()
        part_pqr256 = vpq.to_partitioned(cells=256, n_probe=16)
        part_pqr256.blobs.cache().count()
        times["pqr_to_partitioned_256"] = round(time.time() - t0, 1)
        t0 = time.time()
        hits = part_pqr256.search_batch(
            qdf, "embedding", "qid", K, n_probe=16, rerank=emb,
            rerank_mult=16,
        ).collect()
        leg = {
            "tier": "vamana_pqr_partitioned_batch", "mode": "harvest",
            "rerank_mult": 16, "cells": 256, "n_probe": 16,
            "batch_sec": round(time.time() - t0, 1),
            "recall": round(recall(truth, hits), 4),
        }
        report["legs"].append(leg)
        _log(f"{leg}")
    elif args.vamana:
        from bustub_vectordb_spark.index.vamana import VamanaIndex
        from bustub_vectordb_spark.similarity.pq import PQModel

        t0 = time.time()
        vam = VamanaIndex.build(
            emb, "embedding", "vec_id", shards=64, overlap_eps=0.2,
            r=16, ef_construction=48, ef_search=48, max_cell_rows=60_000,
        )
        vam.edges.cache().count()
        times["vamana_merged_build"] = round(time.time() - t0, 1)
        _log(f"merged build done {times['vamana_merged_build']}s")
        t0 = time.time()
        model = PQModel.train(
            vam.residual_source(), "__res", "vec_id", m=16, k=32
        )
        vpq = vam.quantize_pq(model, residual=True)
        times["pqr_train"] = round(time.time() - t0, 1)
        _log(f"pqr train done {times['pqr_train']}s")
        nq = min(25, len(qids))  # the r10 grid used the first 25 too
        sub = {q: truth[q] for q in qids[:nq]}
        from bustub_vectordb_spark.index.hnsw import _Graph

        mode = "harvest-aligned" if _Graph.HARVEST_ALIGNED else "harvest"
        for mult in [int(m) for m in args.mults.split(",")]:
            t0 = time.time()
            hits = []
            for q, v in list(zip(qids, qmat))[:nq]:
                h = vpq.probe(v.tolist(), K, rerank_mult=mult).collect()
                hits.extend({"qid": q, "vec_id": r["vec_id"]} for r in h)
            leg = {
                "tier": "vamana_pqr_merged_probe", "mode": mode,
                "rerank_mult": mult, "nq": nq,
                "probe_sec_total": round(time.time() - t0, 1),
                "recall": round(recall(sub, hits), 4),
            }
            report["legs"].append(leg)
            _log(f"{leg}")

        # ---- partitioned quantized tiers: frozen residual books (r10's
        # 0.856) vs per-CELL local books (the r11 lead) — same cells,
        # same n_probe, same rerank depth ----
        cells = 64
        t0 = time.time()
        part_pqr = vpq.to_partitioned(cells=cells, n_probe=args.n_probe)
        part_pqr.blobs.cache().count()
        times["pqr_to_partitioned"] = round(time.time() - t0, 1)
        t0 = time.time()
        hits = part_pqr.search_batch(
            qdf, "embedding", "qid", K, n_probe=args.n_probe, rerank=emb,
            rerank_mult=16,
        ).collect()
        leg = {
            "tier": "vamana_pqr_partitioned_batch", "mode": "harvest",
            "rerank_mult": 16, "cells": cells,
            "batch_sec": round(time.time() - t0, 1),
            "recall": round(recall(truth, hits), 4),
        }
        report["legs"].append(leg)
        _log(f"{leg}")

        t0 = time.time()
        part_pql = vam.to_partitioned(
            cells=cells, n_probe=args.n_probe
        ).quantize_pq_local(m=16, k=32)
        part_pql.blobs.cache().count()
        times["pql_to_partitioned_and_train"] = round(time.time() - t0, 1)
        for mult in (16, 48):
            t0 = time.time()
            hits = part_pql.search_batch(
                qdf, "embedding", "qid", K, n_probe=args.n_probe,
                rerank=emb, rerank_mult=mult,
            ).collect()
            leg = {
                "tier": "vamana_pql_partitioned_batch", "mode": "harvest",
                "rerank_mult": mult, "cells": cells,
                "batch_sec": round(time.time() - t0, 1),
                "recall": round(recall(truth, hits), 4),
            }
            report["legs"].append(leg)
            _log(f"{leg}")
    else:
        t0 = time.time()
        routed = HNSWIndex.build_routed(
            emb, "embedding", "vec_id", shards=args.shards, m=8,
            ef_construction=48, ef_search=48, replicate_eps=0.2,
            max_shard_rows=60_000,
        )
        routed.blobs.cache().count()
        times["routed_build"] = round(time.time() - t0, 1)
        _log(f"routed build done {times['routed_build']}s")

        from bustub_vectordb_spark.similarity.quantize import dim_stats

        stats = dim_stats(emb, "embedding").orderBy("dim").collect()
        t0 = time.time()
        bq = routed.quantize_bq(
            [r["mn"] for r in stats], [r["mx"] for r in stats]
        )
        bq.blobs.cache().count()
        times["bq_quantize"] = round(time.time() - t0, 1)

        for mult in [int(x) for x in args.mults.split(",")]:
            for mode in ("coupled", "harvest"):
                ShardedHNSW.RERANK_HARVEST = mode == "harvest"
                t0 = time.time()
                hits = bq.search_batch(
                    qdf, "embedding", "qid", K, n_probe=args.n_probe,
                    rerank=emb, rerank_mult=mult,
                ).collect()
                leg = {
                    "tier": "hnsw_routed_bq_batch", "mode": mode,
                    "rerank_mult": mult,
                    "batch_sec": round(time.time() - t0, 1),
                    "recall": round(recall(truth, hits), 4),
                }
                report["legs"].append(leg)
                _log(f"{leg}")
        ShardedHNSW.RERANK_HARVEST = True

    report["times_sec"] = times
    print(json.dumps(report))


if __name__ == "__main__":
    main()
