"""Past-clamp rerank-escalation drill (VERDICT r9 #3).

The quantized DDL auto-shard target (HNSW_SHARD_TARGET_ROWS_QUANTIZED =
5k rows/shard) is clamped at HNSW_MAX_AUTO_SHARDS = 1024 shards; past
~5.1M rows, shards grow beyond mode granularity again and the remaining
recall knob is the exact-rerank shortlist depth. r10 automates that: the
DDL stamps params['rerank_mult_default'] scaled to the rows/shard excess.
This drill validates the escalation at a REAL past-clamp geometry
(default 6M rows x dim 64 -> 1024 shards ~ 5.9k rows/shard, ratio 1.17
-> BQ default escalates 16 -> 32): it builds the routed+BQ tier once,
then serves the same query batch at the pre-escalation depth (16) and at
the DDL-escalated depth, reporting recall@10 and wall-clock for both.
The expectation (from the r8 2.2M measurement, 0.478 -> 0.718 for 4 ->
16 at identical serving time) is recall up at ~equal serving cost — the
rerank join stays broadcast-sized (n_probe x k x mult rows per query).

Run it AFTER the other drills (own process, own /tmp dir — the corpus is
~3 GB parquet and the routed build shuffles tens of GB).

Usage: python tools/clamp_rerank_drill.py [--rows 6000000] [--dim 64]
       [--out /tmp/clamp_drill]
Prints one JSON line (drills/ records it).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-probe", dest="n_probe", type=int, default=8)
    ap.add_argument("--out", default="/tmp/clamp_drill")
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.index.hnsw import HNSWIndex
    from bustub_vectordb_spark.session import get_spark
    from bustub_vectordb_spark.similarity.quantize import dim_stats
    from bustub_vectordb_spark.sql import SqlEngine

    spark = get_spark("clamp-rerank-drill")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{args.out}/embeddings.parquet"
    times: dict[str, float] = {}
    if not args.skip_gen or not os.path.exists(path):
        t0 = time.time()
        gen_corpus(spark, args.rows, args.dim, path)
        times["gen"] = round(time.time() - t0, 1)
    emb = spark.read.parquet(path)
    n = emb.count()

    # the REAL DDL shard/escalation arithmetic, asserted un-lowered
    eng = SqlEngine.__new__(SqlEngine)  # arithmetic only, no session state
    shards = eng._auto_shards(n, quantized=True)
    assert shards == SqlEngine.HNSW_MAX_AUTO_SHARDS == 1024, shards
    ratio = (n / shards) / SqlEngine.HNSW_SHARD_TARGET_ROWS_QUANTIZED
    assert ratio > 1.0, "corpus must sit past the clamp"
    escalated = min(64, 16 * int(math.ceil(ratio)))

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
    print(f"[clamp-drill] truth done {times['ground_truth']}s",
          file=sys.stderr, flush=True)

    report: dict[str, object] = {
        "rows": n, "dim": args.dim, "shards": shards,
        "rows_per_shard": round(n / shards),
        "ratio_over_quantized_target": round(ratio, 3),
        "escalated_rerank_mult": escalated, "n_probe": args.n_probe,
    }

    t0 = time.time()
    routed = HNSWIndex.build_routed(
        emb, "embedding", "vec_id", shards=shards, m=8,
        ef_construction=48, ef_search=48, replicate_eps=0.2,
        max_shard_rows=60_000,
    )
    routed.blobs.cache().count()
    times["routed_build"] = round(time.time() - t0, 1)
    print(f"[clamp-drill] build done {times['routed_build']}s",
          file=sys.stderr, flush=True)

    t0 = time.time()
    stats = dim_stats(emb, "embedding").orderBy("dim").collect()
    bq = routed.quantize_bq([r["mn"] for r in stats], [r["mx"] for r in stats])
    # stamp exactly what the DDL's escalation block would
    bq.params["rerank_mult_default"] = escalated
    assert bq._rerank_mult(None) == escalated
    times["bq_quantize"] = round(time.time() - t0, 1)
    print(f"[clamp-drill] bq done {times['bq_quantize']}s",
          file=sys.stderr, flush=True)

    for tag, mult in (("pre_escalation_16", 16), ("ddl_escalated", None)):
        t0 = time.time()
        hits = bq.search_batch(
            qdf, "embedding", "qid", K, n_probe=args.n_probe,
            rerank=emb, rerank_mult=mult,
        ).collect()
        times[f"bq_batch_{tag}"] = round(time.time() - t0, 1)
        report[f"recall_bq_{tag}"] = round(recall(truth, hits), 4)
        print(f"[clamp-drill] {tag} recall={report[f'recall_bq_{tag}']} "
              f"({times[f'bq_batch_{tag}']}s)", file=sys.stderr, flush=True)

    report["times_sec"] = times
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
