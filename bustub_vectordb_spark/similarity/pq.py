"""Product quantization (PQ) — the deepest vector-compression tier.

SQ8 (similarity/quantize.py) stores one byte per DIMENSION (8× smaller
than float64). PQ stores one byte-sized code per SUBSPACE: the vector
splits into ``m`` contiguous sub-vectors, each quantized to its nearest
of ``k`` per-subspace centroids, so a 64-dim float64 vector (512 B)
becomes ``m`` small ints (8 B at m=8) — 64×. This is the FAISS IndexPQ /
IVFPQ storage model (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) — the standard way a 100 TB embedding
corpus becomes RAM-resident.

Pipeline (mirrors the SQ8 module's contracts):

  train    per-subspace Lloyd's k-means on a bounded, id-sorted driver
           sample (same recipe and determinism contract as IVF centroid
           training — the model is a pure function of table contents);
  encode   one Arrow-batched mapInPandas pass: per-subspace argmin over
           the k centroids (vectorized; first-min ties like np.argmin);
  probe    asymmetric distance (ADC): per query, an m×k lookup table of
           partial squared distances ||q_sub − centroid||² is inlined as
           a LITERAL array-of-arrays column, and the distance is a pure
           whole-stage-codegen fold over the code array — table lookups,
           zero Python on the scan, zero UDF in the hot path. An exact
           rerank of the shortlist (broadcast candidate ids back to the
           raw vectors) recovers full-precision ordering.

Correctness: training, encoding, and ADC are deterministic, so a
numpy-only offline replay reproduces codes and top-k bit-exactly and the
DuckDB oracle inlines the replayed hits as VALUES
(queries.py `ann_pq_adc` / `ann_pq_rerank`).

The reference stores raw doubles in all of its indexes
(src/storage/index/*.cpp); north-star scale extension beside SQ8.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..index.ivfflat import _lloyds_numpy


def _split(dim: int, m: int) -> list[tuple[int, int]]:
    """Contiguous subspace [start, end) bounds; dim need not divide m."""
    if not (0 < m <= dim):
        raise ValueError(f"need 0 < m <= dim, got m={m} dim={dim}")
    base, extra = divmod(dim, m)
    bounds, s = [], 0
    for i in range(m):
        e = s + base + (1 if i < extra else 0)
        bounds.append((s, e))
        s = e
    return bounds


@dataclass
class PQModel:
    """Trained per-subspace codebooks: centroids[i] is (k, dsub_i)."""

    centroids: list[np.ndarray]
    bounds: list[tuple[int, int]]

    @property
    def m(self) -> int:
        return len(self.centroids)

    @property
    def k(self) -> int:
        return len(self.centroids[0])

    @classmethod
    def train_rows(
        cls, mat: np.ndarray, m: int = 8, k: int = 16, max_iter: int = 5
    ) -> "PQModel":
        """Train from an in-memory (n, dim) matrix — the numpy core shared
        by the Spark path and the offline-replay oracle. Init: the first k
        sample rows' sub-vectors (the IVF seeding recipe, deterministic)."""
        if len(mat) < k:
            raise ValueError(f"need at least k={k} training rows, got {len(mat)}")
        bounds = _split(mat.shape[1], m)
        cents = []
        for s, e in bounds:
            sub = mat[:, s:e]
            cents.append(
                np.asarray(
                    _lloyds_numpy(sub.tolist(), sub[:k].tolist(), max_iter),
                    dtype=np.float64,
                )
            )
        return cls(cents, bounds)

    @classmethod
    def train(
        cls,
        df: DataFrame,
        vec_col: str,
        id_col: str,
        m: int = 8,
        k: int = 16,
        max_iter: int = 5,
        max_cells: int = 32_000_000,
    ) -> "PQModel":
        """Driver-side training over a bounded, id-SORTED sample (pure
        function of table contents — offline replays reproduce it)."""
        vec = F.col(vec_col).cast("array<double>")
        n = df.count()
        first = df.select(vec.alias("v")).first()
        dim = len(first["v"])
        frac = min(1.0, max_cells / max(n * dim, 1))
        sample = (
            df if frac >= 1.0 else df.sample(fraction=frac, seed=42)
        ).select(F.col(id_col).alias("__id"), vec.alias("v"))
        rows = sorted(sample.collect(), key=lambda r: r["__id"])
        mat = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
        return cls.train_rows(mat, m=m, k=k, max_iter=max_iter)

    # -- encode ------------------------------------------------------------
    def encode_rows(self, mat: np.ndarray) -> np.ndarray:
        """(n, m) int codes — per-subspace argmin (first-min ties)."""
        out = np.empty((len(mat), self.m), dtype=np.int64)
        for i, (s, e) in enumerate(self.bounds):
            sub = mat[:, s:e]
            c = self.centroids[i]
            d = -2.0 * (sub @ c.T) + (c * c).sum(axis=1)
            out[:, i] = np.argmin(d, axis=1)
        return out

    def encode(
        self,
        df: DataFrame,
        vec_col: str,
        id_col: str,
        codes_col: str = "codes",
        keep: tuple = (),
    ) -> DataFrame:
        """(id, *keep, codes array<int>) — one Arrow-batched mapInPandas
        pass; ``keep`` columns (e.g. an IVF bucket id) pass through."""
        import pandas as pd

        model = self
        passthrough = [id_col, *keep]

        def run(batches):
            for pdf in batches:
                mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                codes = model.encode_rows(mat) if len(mat) else np.empty((0, model.m))
                out = pdf[passthrough].copy()
                out[codes_col] = [list(map(int, c)) for c in codes]
                yield out

        types = {f.name: f.dataType.simpleString() for f in df.schema}
        schema = ", ".join(f"{c} {types[c]}" for c in passthrough)
        src = df.select(
            *[F.col(c) for c in passthrough],
            F.col(vec_col).cast("array<double>").alias(vec_col),
        )
        return src.mapInPandas(run, f"{schema}, {codes_col} array<int>")

    # -- ADC probe ---------------------------------------------------------
    def lut(self, query: list[float], metric: str = "l2") -> list[list[float]]:
        """m×k per-subspace partials — the per-query lookup table
        (O(m·k·dsub) driver floats). l2: ||q_sub − centroid||²; ip:
        ⟨q_sub, centroid⟩ (the distance/similarity decomposes exactly over
        subspaces in both cases). Cosine does NOT decompose (norms are
        global) — the standard recipe is normalize-at-encode + ip, exactly
        as with SQ8 (similarity/projection.normalize)."""
        q = np.asarray(query, dtype=np.float64)
        out = []
        for i, (s, e) in enumerate(self.bounds):
            if metric == "l2":
                diff = self.centroids[i] - q[s:e]
                out.append([float(x) for x in (diff * diff).sum(axis=1)])
            elif metric == "ip":
                out.append([float(x) for x in self.centroids[i] @ q[s:e]])
            else:
                raise ValueError(f"unsupported PQ ADC metric {metric!r}")
        return out

    def adc_dist(
        self, codes_col: Column | str, query: list[float], metric: str = "l2"
    ) -> Column:
        """Σ_i lut[i][code_i] (sqrt'd for l2) as a PURE native expression:
        the lookup table is a literal array<array<double>>, the fold is
        whole-stage-codegen — table lookups on the scan, no UDF. l2 orders
        ascending; ip is a similarity, order it descending."""
        codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
        lut_lit = F.array(
            *[F.array(*[F.lit(v) for v in row]) for row in self.lut(query, metric)]
        )
        partial = F.zip_with(
            lut_lit, codes, lambda row, c: F.element_at(row, c + 1)
        )
        total = F.aggregate(partial, F.lit(0.0), lambda a, v: a + v)
        return F.sqrt(total) if metric == "l2" else total

    def adc_topk(
        self,
        codes_df: DataFrame,
        id_col: str,
        query: list[float],
        n: int,
        codes_col: str = "codes",
        dist_col: str = "distance",
        metric: str = "l2",
    ) -> DataFrame:
        order = F.col(dist_col).asc() if metric == "l2" else F.col(dist_col).desc()
        return (
            codes_df.select(
                F.col(id_col),
                self.adc_dist(codes_col, query, metric).alias(dist_col),
            )
            .orderBy(order, F.col(id_col).asc())
            .limit(n)
        )


def pq_rerank_topk(
    model: PQModel,
    codes_df: DataFrame,
    source_df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int,
    rerank_mult: int = 4,
    dist_col: str = "distance",
) -> DataFrame:
    """ADC shortlist of k·rerank_mult over the codes, exact l2 rerank
    against the full-precision source (broadcast candidate ids — the
    corpus never shuffles), true top-k."""
    from ..functions.vector import l2_dist

    short = model.adc_topk(codes_df, id_col, query, k * rerank_mult).select(id_col)
    return (
        source_df.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(short), id_col)
        .select(F.col(id_col), l2_dist(vec_col, query).alias(dist_col))
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k)
    )


def _residual_df(ivf_index, vec_col: str, id_col: str) -> DataFrame:
    """(id, bucket, __res = x − centroid[bucket]) — the centroid table is
    bucket-count-sized and broadcasts; the subtraction is elementwise
    (no reduction order to vary → bit-identical to the numpy replay)."""
    from ..index.ivfflat import BUCKET_COL

    spark = ivf_index.assignments.sparkSession
    cents = F.broadcast(
        spark.createDataFrame(
            [(b, [float(x) for x in c]) for b, c in enumerate(ivf_index.centroids)],
            f"{BUCKET_COL} int, __cent array<double>",
        )
    )
    res = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("__cent"), lambda x, c: x - c
    )
    return ivf_index.assignments.join(cents, BUCKET_COL).select(
        F.col(id_col), F.col(BUCKET_COL), res.alias("__res")
    )


@dataclass
class IVFPQIndex:
    """IVF routing over PQ codes — the FAISS IVFPQ layout (Jégou 2011 §V):
    coarse centroids prune to ``probe_lists`` buckets, the probed buckets'
    MATERIALIZED codes are ADC-scanned (m bytes/vector — at 100 TB the
    codes sweep is RAM-resident where a float scan spills), and the raw
    vectors are touched only for the exact re-rank of the shortlist.
    Mirrors similarity/quantize.IVFSQ8Index one compression tier deeper
    (l2 ops class; deterministic end to end → offline-replay oracle,
    queries.py `ann_ivfpq_rerank`)."""

    ivf: object  # IVFFlatIndex (l2)
    model: PQModel
    codes: DataFrame  # (id_col, BUCKET_COL, codes) — no raw vectors
    vec_col: str
    id_col: str
    # residual=True (IVFADC, Jégou 2011 §III-D — the DEFAULT, and the
    # published standard): codes quantize the RESIDUAL
    # x − centroid[bucket(x)], not x itself. On clustered corpora global
    # codebooks spend their k centroids separating CLUSTERS, so all of a
    # bucket's codes collapse toward the same few codewords and the
    # shallow shortlist loses within-bucket resolution (the same failure
    # mode the per-bucket BQ thresholds fix one tier down; measured at
    # 1.2M clustered rows: global-PQ recall@10 0.128 vs residual 0.906,
    # drills/drill_1200k_ivf_tiers.json — global collapses at density).
    # Residuals re-center every bucket at the origin, so the full codebook
    # budget resolves LOCAL structure. The query's LUT then differs per
    # probed bucket (q − centroid[b]) and rides a broadcast (bucket, lut)
    # join. residual=False keeps the single-LUT global-codebook mode
    # (uniform corpora measure the two equal — sf0.01 recall report:
    # 0.785 residual vs 0.795 global — and pre-upgrade saves load as it).
    residual: bool = True

    @classmethod
    def build(
        cls,
        ivf_index,
        vec_col: str,
        id_col: str,
        m: int = 16,
        k: int = 32,
        residual: bool = True,
    ) -> "IVFPQIndex":
        from ..index.ivfflat import BUCKET_COL

        if ivf_index.dist != "l2":
            raise ValueError("IVFPQIndex supports l2 indexes (ADC LUT is l2)")
        if residual:
            src = _residual_df(ivf_index, vec_col, id_col)
            model = PQModel.train(src, "__res", id_col, m=m, k=k)
            codes = model.encode(src, "__res", id_col, keep=(BUCKET_COL,)).persist()
        else:
            model = PQModel.train(ivf_index.assignments, vec_col, id_col, m=m, k=k)
            codes = model.encode(
                ivf_index.assignments, vec_col, id_col, keep=(BUCKET_COL,)
            ).persist()
        return cls(ivf_index, model, codes, vec_col, id_col, residual)

    @property
    def assignments(self) -> DataFrame:
        """Underlying IVF assignments — routes the planner's filtered-search
        dispatch (index/selection.py) to the ``where`` path here."""
        return self.ivf.assignments

    def probe(
        self,
        query: list[float],
        k: int,
        rerank: int | None = None,
        probe_lists: int | None = None,
        dist_col: str = "distance",
        where=None,
    ) -> DataFrame:
        """route → ADC fold over probed buckets' codes → exact re-rank.
        ``where`` semi-joins matching ids into the codes scan BEFORE the
        shortlist, so top-k is among matching rows (filtered search)."""
        from ..functions.vector import l2_dist
        from ..index.ivfflat import BUCKET_COL

        rerank = rerank or 4 * k
        buckets = self.ivf.rank_buckets(query)[
            : (probe_lists or self.ivf.probe_lists)
        ]
        cand = self.codes.filter(F.col(BUCKET_COL).isin(buckets))
        if where is not None:
            allowed = self.ivf.assignments.filter(where).select(self.id_col)
            cand = cand.join(allowed, self.id_col, "left_semi")
        if self.residual:
            # per-bucket LUT: codes are residuals against THEIR bucket's
            # centroid, so the query's table is built from (q − centroid[b])
            # for each probed b — a probe_lists-sized broadcast join, the
            # same shape as IVFBQIndex's per-bucket query words
            spark = self.codes.sparkSession
            q = np.asarray(query, dtype=np.float64)
            lut_rows = []
            for b in buckets:
                qr = [float(x) for x in (q - np.asarray(self.ivf.centroids[b]))]
                lut_rows.append((int(b), self.model.lut(qr)))
            lut_df = F.broadcast(
                spark.createDataFrame(
                    lut_rows, f"{BUCKET_COL} int, __lut array<array<double>>"
                )
            )
            adc = F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("__lut"),
                        F.col("codes"),
                        lambda row, c: F.element_at(row, c + 1),
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
            )
            shortlist = (
                cand.join(lut_df, BUCKET_COL)
                .select(F.col(self.id_col), adc.alias("__adc"))
                .orderBy(F.col("__adc").asc(), F.col(self.id_col).asc())
                .limit(rerank)
            )
        else:
            shortlist = (
                cand.select(
                    F.col(self.id_col),
                    self.model.adc_dist("codes", query).alias("__adc"),
                )
                .orderBy(F.col("__adc").asc(), F.col(self.id_col).asc())
                .limit(rerank)
            )
        raw = self.ivf.assignments.filter(F.col(BUCKET_COL).isin(buckets)).select(
            F.col(self.id_col), F.col(self.vec_col)
        )
        return (
            raw.join(F.broadcast(shortlist.select(self.id_col)), self.id_col)
            .select(
                F.col(self.id_col), l2_dist(self.vec_col, query).alias(dist_col)
            )
            .orderBy(F.col(dist_col).asc(), F.col(self.id_col).asc())
            .limit(k)
        )

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        """Codes partitioned by bucket (probe = partition pruning on disk),
        the per-subspace codebooks as one small parquet, and the IVF
        index's own layout beside them."""
        from ..index.ivfflat import BUCKET_COL

        self.codes.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(
            f"{path}/codes"
        )
        spark = self.codes.sparkSession
        rows = [
            (i, j, [float(x) for x in self.model.centroids[i][j]])
            for i in range(self.model.m)
            for j in range(self.model.k)
        ]
        spark.createDataFrame(
            rows, "subspace int, code int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
        spark.createDataFrame(
            [(self.vec_col, self.id_col, int(self.ivf.probe_lists), int(self.residual))],
            "vec_col string, id_col string, probe_lists int, residual int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
        self.ivf.save(f"{path}/ivf")

    @classmethod
    def load(cls, spark, path: str) -> "IVFPQIndex":
        from ..index.ivfflat import IVFFlatIndex

        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        cb = spark.read.parquet(f"{path}/codebooks").collect()
        m = max(r["subspace"] for r in cb) + 1
        cents = []
        for i in range(m):
            sub = sorted((r for r in cb if r["subspace"] == i), key=lambda r: r["code"])
            cents.append(np.asarray([list(r["centroid"]) for r in sub], dtype=np.float64))
        dim = sum(c.shape[1] for c in cents)
        model = PQModel(cents, _split(dim, m))
        ivf = IVFFlatIndex.load(
            spark, f"{path}/ivf", meta["vec_col"], meta["probe_lists"]
        )
        codes = spark.read.parquet(f"{path}/codes").persist()
        # pre-upgrade saves carry no residual column -> global-codebook mode
        residual = bool(meta.asDict().get("residual", 0))
        return cls(ivf, model, codes, meta["vec_col"], meta["id_col"], residual)


# -- offline replay (oracle) ----------------------------------------------


def offline_pq(
    parquet_path: str, vec_col: str, id_col: str, m: int = 8, k: int = 16
) -> tuple[PQModel, list, np.ndarray]:
    """Replay train + encode without Spark: (model, ids, codes), a pure
    function of the parquet contents (id-sorted, same init, same argmin)."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(parquet_path, columns=[id_col, vec_col])
    pairs = sorted(zip(t[id_col].to_pylist(), t[vec_col].to_pylist()))
    ids = [p[0] for p in pairs]
    mat = np.asarray([p[1] for p in pairs], dtype=np.float64)
    if mat.size > 32_000_000:
        # PQModel.train switches to a sampled collect past this budget;
        # the full-table replay would silently train a DIFFERENT model
        raise ValueError(
            "offline_pq only replicates the full-table training path "
            f"({mat.shape[0]}×{mat.shape[1]} cells exceeds the budget)"
        )
    model = PQModel.train_rows(mat, m=m, k=k)
    return model, ids, model.encode_rows(mat)


def offline_pq_adc(
    model: PQModel,
    ids: list,
    codes: np.ndarray,
    query: list[float],
    n: int,
    metric: str = "l2",
) -> list[tuple]:
    """Replay adc_topk with the same left-fold arithmetic as the codegen
    expression (sequential adds over subspaces; sqrt for l2)."""
    import math

    lut = model.lut(query, metric)
    out = []
    for rid, row in zip(ids, codes):
        s = 0.0
        for i, c in enumerate(row):
            s = s + lut[i][int(c)]
        out.append((rid, math.sqrt(s) if metric == "l2" else s))
    asc = metric == "l2"
    out.sort(key=lambda t: (t[1] if asc else -t[1], t[0]))
    return out[:n]


def offline_ivfpq_probe(
    centroids: list[list[float]],
    model: PQModel,
    ids: list,
    codes: np.ndarray,
    vectors_by_id: dict,
    query: list[float],
    k: int,
    probe_lists: int,
    rerank: int,
) -> list[tuple]:
    """Replay ``IVFPQIndex.probe``: bucket assignment by the same left-fold
    argmin the codegen expression evaluates (first-min ties), driver-style
    bucket ranking (math.dist), ADC over probed buckets, exact left-fold
    l2 re-rank of the shortlist."""
    import math

    def fold_l2_sq(v, c):
        s = 0.0
        for x, y in zip(v, c):
            d = x - y
            s = s + d * d
        return s

    assign = {}
    for rid in ids:
        v = [float(x) for x in vectors_by_id[rid]]
        dists = [fold_l2_sq(v, c) for c in centroids]
        assign[rid] = dists.index(min(dists))
    ranked = sorted(range(len(centroids)), key=lambda i: math.dist(centroids[i], query))
    probed = set(ranked[:probe_lists])

    lut = model.lut(query)
    adc = []
    for rid, row in zip(ids, codes):
        if assign[rid] not in probed:
            continue
        s = 0.0
        for i, c in enumerate(row):
            s = s + lut[i][int(c)]
        adc.append((rid, math.sqrt(s)))
    adc.sort(key=lambda t: (t[1], t[0]))
    out = []
    for rid, _ in adc[:rerank]:
        s = 0.0
        for x, y in zip(vectors_by_id[rid], query):
            d = float(x) - y
            s = s + d * d
        out.append((rid, math.sqrt(s)))
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]


def offline_ivfpq_residual_probe(
    centroids: list[list[float]],
    vectors_by_id: dict,
    query: list[float],
    k: int,
    probe_lists: int,
    rerank: int,
    m: int = 16,
    k_codes: int = 32,
) -> list[tuple]:
    """Replay ``IVFPQIndex.build(residual=True).probe``: same fold-argmin
    bucket assignment, residuals x − centroid[bucket] (elementwise —
    order-free), PQ TRAINED ON THE ID-SORTED RESIDUALS (mirroring
    PQModel.train's full-table path over _residual_df), per-bucket query
    LUT from q − centroid[b], left-fold ADC, exact l2 re-rank."""
    import math

    def fold_l2_sq(v, c):
        s = 0.0
        for x, y in zip(v, c):
            d = x - y
            s = s + d * d
        return s

    ids = sorted(vectors_by_id)
    cents = np.asarray(centroids, dtype=np.float64)
    assign = {}
    res_rows = []
    for rid in ids:
        v = [float(x) for x in vectors_by_id[rid]]
        dists = [fold_l2_sq(v, c) for c in centroids]
        b = dists.index(min(dists))
        assign[rid] = b
        res_rows.append(np.asarray(v, dtype=np.float64) - cents[b])
    res_mat = np.asarray(res_rows, dtype=np.float64)
    model = PQModel.train_rows(res_mat, m=m, k=k_codes)
    codes = model.encode_rows(res_mat)

    ranked = sorted(range(len(centroids)), key=lambda i: math.dist(centroids[i], query))
    probed = ranked[:probe_lists]
    q = np.asarray(query, dtype=np.float64)
    luts = {b: model.lut([float(x) for x in (q - cents[b])]) for b in probed}
    probed_set = set(probed)
    adc = []
    for rid, row in zip(ids, codes):
        b = assign[rid]
        if b not in probed_set:
            continue
        lut = luts[b]
        s = 0.0
        for i, c in enumerate(row):
            s = s + lut[i][int(c)]
        adc.append((rid, math.sqrt(s)))
    adc.sort(key=lambda t: (t[1], t[0]))
    out = []
    for rid, _ in adc[:rerank]:
        s = 0.0
        for x, y in zip(vectors_by_id[rid], query):
            d = float(x) - y
            s = s + d * d
        out.append((rid, math.sqrt(s)))
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]


def offline_pq_rerank(
    model: PQModel,
    ids: list,
    codes: np.ndarray,
    vectors_by_id: dict,
    query: list[float],
    k: int,
    rerank_mult: int = 4,
) -> list[tuple]:
    """Replay pq_rerank_topk: ADC shortlist, exact left-fold l2 rerank."""
    import math

    short = [rid for rid, _ in offline_pq_adc(model, ids, codes, query, k * rerank_mult)]
    out = []
    for rid in short:
        s = 0.0
        for x, y in zip(vectors_by_id[rid], query):
            d = float(x) - y
            s = s + d * d
        out.append((rid, math.sqrt(s)))
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]
