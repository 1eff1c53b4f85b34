"""Ship this package to executor Python workers.

Any path that serializes engine objects into tasks (broadcast HNSW graphs,
pickled shard blobs, mapInPandas closures touching package classes) needs
``bustub_vectordb_spark`` importable inside the worker interpreter. On a real
cluster that is `--py-files`; for a driver session launched from an arbitrary
cwd (the round driver, notebooks) we zip the package once and addPyFile it.
Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import zipfile

_SHIPPED: set[int] = set()


def ensure_package_on_workers(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    sources.sort()
    # content-keyed zip name: a fixed path would keep shipping a STALE
    # snapshot across sessions after the package changes on disk — workers
    # would then unpickle current driver objects against old class code
    import hashlib

    h = hashlib.sha256()
    for full in sources:
        st = os.stat(full)
        h.update(f"{os.path.relpath(full, pkg_dir)}:{st.st_mtime_ns}:{st.st_size};".encode())
    zip_path = os.path.join("/tmp", f"{pkg_name}_shipped_{h.hexdigest()[:16]}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for full in sources:
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)


def release_checkpoint(df) -> None:
    """Release the executor storage behind a ``localCheckpoint``ed
    DataFrame. ``DataFrame.unpersist()`` only touches the cache manager —
    a local checkpoint lives as a persisted RDD under a LogicalRDD leaf,
    so long-running delta/compaction schemes (ShardedHNSW.insert, the
    streaming ingest sinks) must unpersist THAT RDD or every superseded
    generation stays pinned in block-manager storage until the context
    dies. No-op for plans that are not a checkpoint leaf (best-effort:
    storage reclaim must never fail a query)."""
    try:
        df.unpersist()  # covers .cache()d frames (e.g. a load()ed base)
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass
