"""Auto-celled per-cell-books A/B at 1.2M (VERDICT r11 #4 done-criterion).

r12 wires the pql tier's DDL cell count to the corpus's MEASURED mode
structure: estimate_modes (k-means inertia elbow on a bounded driver
sample) floors the rows/cell auto target at the granularity where k-means
cells go unimodal, and the unpinned n_probe scales so the probed fraction
holds. This drill runs that exact arithmetic on the 1.2M × 256-mode
corpus and serves the auto-celled `quantize_pq_local` artifact next to
the r11 hand-tuned mode-granular row (cells=256, n_probe=16 — recall
0.918@16 / 0.958@48, drills/drill_1200k_r11_harvest.json vamana-extra
leg): the target is auto within ~2pts of hand-tuned at matched probed
fraction.

Usage: python tools/pql_auto_cells_ab.py [--rows 1200000] [--skip-gen]
       [--out /tmp/scale_drill]
Prints one JSON line (drills/ records it). Own process (disk-pressure
note in scale_drill.py's docstring).
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
    print(f"[pql-auto] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--out", default="/tmp/scale_drill")
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.ivfflat import estimate_modes
    from bustub_vectordb_spark.index.vamana import VamanaIndex
    from bustub_vectordb_spark.session import get_spark
    from bustub_vectordb_spark.sql import SqlEngine

    spark = get_spark("pql-auto-cells")
    spark.sparkContext.setLogLevel("ERROR")

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
    t0 = time.time()
    truth = exact_topk(emb, qmat, qids)
    times["ground_truth"] = round(time.time() - t0, 1)

    # the EXACT r12 DDL arithmetic (sql._create_index pql branch)
    eng = SqlEngine.__new__(SqlEngine)
    auto_cells = eng._auto_shards(n, quantized=True)
    t0 = time.time()
    est = estimate_modes(
        emb, "embedding", "vec_id", max_modes=SqlEngine.HNSW_MAX_AUTO_SHARDS
    )
    times["estimate_modes"] = round(time.time() - t0, 1)
    cells = max(auto_cells, min(est, max(2, n // SqlEngine.PQL_MIN_CELL_ROWS)))
    _log(f"auto_cells={auto_cells} estimated_modes={est} -> cells={cells}")
    # serve at the HAND-TUNED row's probed fraction (16/256) so the
    # comparison isolates the cell-count choice
    n_probe = max(2, math.ceil(16 * cells / 256))

    t0 = time.time()
    vam = VamanaIndex.build(
        emb, "embedding", "vec_id", shards=64, overlap_eps=0.2,
        r=16, ef_construction=48, ef_search=48, max_cell_rows=60_000,
    )
    vam.edges.cache().count()
    times["vamana_merged_build"] = round(time.time() - t0, 1)
    _log(f"merged build done {times['vamana_merged_build']}s")

    t0 = time.time()
    part = vam.to_partitioned(cells=cells, n_probe=n_probe).quantize_pq_local(
        m=16, k=32
    )
    part.blobs.cache().count()
    times["pql_to_partitioned_and_train"] = round(time.time() - t0, 1)
    _log(f"pql cut+train done {times['pql_to_partitioned_and_train']}s")

    report = {
        "rows": n, "dim": args.dim, "auto_cells": auto_cells,
        "estimated_modes": est, "cells": cells, "n_probe": n_probe,
        "hand_tuned_reference": {
            "cells": 256, "n_probe": 16, "recall_16": 0.918,
            "recall_48": 0.958, "source": "drill_1200k_r11_harvest.json",
        },
        "legs": [],
    }
    for mult in (16, 48):
        t0 = time.time()
        hits = part.search_batch(
            qdf, "embedding", "qid", K, n_probe=n_probe,
            rerank=emb, rerank_mult=mult,
        ).collect()
        leg = {
            "tier": "vamana_pql_partitioned_batch_AUTO", "mode": "harvest-aligned",
            "rerank_mult": mult, "cells": cells, "n_probe": n_probe,
            "batch_sec": round(time.time() - t0, 1),
            "recall": round(recall(truth, hits), 4),
        }
        report["legs"].append(leg)
        _log(f"{leg}")
    report["times_sec"] = times
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
