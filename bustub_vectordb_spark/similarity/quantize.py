"""Scalar quantization (SQ8) — compressed-vector ANN, the memory-scale path.

At 100 TB of float32 embeddings, the working set is the problem: a
1-billion-row corpus of 768-dim float vectors is ~3 TB; quantized to one
byte per dimension it is ~0.75 TB — the difference between spilling and a
RAM-resident scan (FAISS's SQ8 storage makes the same trade; cf. the
IndexScalarQuantizer design in the FAISS paper, Johnson et al. 2017).

Pipeline:

  train    per-dimension (min, max) over the corpus — posexplode +
           groupBy(dim): one shuffle of (dim, val) pairs, output is
           dimension-sized (collected to the driver like IVF centroids);
  encode   code[d] = clamp(floor(255·(x−mn)/(mx−mn) + 0.5), 0..255) —
           a narrow zip_with projection, no shuffle;
  probe    asymmetric distance (ADC): the query stays full-precision,
           stored codes are decoded on the fly (mn + code·(mx−mn)/255);
           L2 over decoded values, global top-k.

Every arithmetic step uses the same operation order as the DuckDB oracle
SQL (sq8_adc_oracle_sql), so the driver gate hash-matches the whole
compressed pipeline bit-for-bit (only the final distance is rounded, to
absorb summation order). `floor(x + 0.5)` is used instead of round() —
Spark rounds half-to-even, DuckDB half-away-from-zero; floor(+0.5) is
identical everywhere.

Recall: SQ8 is near-lossless for KNN at 64-256 dims (max per-dim error =
scale/2); tests/test_quantize.py pins recall@10 vs exact KNN.

The reference has no quantization surface (its IVFFlat/HNSW store raw
doubles, src/storage/index/*.cpp); north-star scale extension.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


def dim_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """(dim, mn, mx) per dimension — distributed, one shuffle keyed by dim."""
    return (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


@dataclass
class SQ8Model:
    """Trained per-dimension quantizer. mins/maxs are dimension-sized
    (driver-resident like IVF centroids — O(dims), not O(rows))."""

    mins: list[float]
    maxs: list[float]

    @classmethod
    def train(cls, df: DataFrame, vec_col: str) -> "SQ8Model":
        rows = dim_stats(df, vec_col).orderBy("dim").collect()
        return cls([r["mn"] for r in rows], [r["mx"] for r in rows])

    def _lits(self) -> tuple[Column, Column]:
        mn = F.array(*[F.lit(float(v)) for v in self.mins])
        mx = F.array(*[F.lit(float(v)) for v in self.maxs])
        return mn, mx

    def encode(self, vec: Column | str) -> Column:
        """array<int> codes in 0..255; constant dimensions encode to 0."""
        v = (F.col(vec) if isinstance(vec, str) else vec).cast("array<double>")
        mn, mx = self._lits()
        with_mn = F.zip_with(v, mn, lambda x, lo: x - lo)
        # pair with the per-dim range, then quantize
        return F.zip_with(
            with_mn,
            F.zip_with(mx, mn, lambda hi, lo: hi - lo),
            lambda cen, rng: F.when(rng == 0, F.lit(0)).otherwise(
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(255), F.floor(F.lit(255.0) * cen / rng + 0.5).cast("int")
                    ),
                )
            ),
        )

    def _decoded(self, codes: Column | str) -> Column:
        """On-the-fly decode: mn + code·(mx−mn)/255 (matches the oracle)."""
        c = F.col(codes) if isinstance(codes, str) else codes
        mn, mx = self._lits()
        return F.transform(
            c, lambda code, i: F.get(mn, i) + code * (F.get(mx, i) - F.get(mn, i)) / 255.0
        )

    def adc_dist_sq(self, codes: Column | str, query: list[float]) -> Column:
        """Squared L2 between the full-precision query and the decoded codes
        (asymmetric: the query is never quantized)."""
        decoded = self._decoded(codes)
        q = F.array(*[F.lit(float(x)) for x in query])
        return F.aggregate(
            F.zip_with(decoded, q, lambda d, qq: (d - qq) * (d - qq)),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    def adc_ip(self, codes: Column | str, query: list[float]) -> Column:
        """Asymmetric inner product ⟨decoded, q⟩ — larger is nearer
        (vector_ip_ops; ops classes per reference catalog.h:322-331)."""
        decoded = self._decoded(codes)
        q = F.array(*[F.lit(float(x)) for x in query])
        return F.aggregate(
            F.zip_with(decoded, q, lambda d, qq: d * qq),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    def adc_cosine(self, codes: Column | str, query: list[float]) -> Column:
        """Asymmetric cosine similarity: ⟨decoded,q⟩ / (‖decoded‖·‖q‖).
        ‖q‖ is a driver-computed literal (query-derived, same literal is
        inlined into the oracle SQL); ‖decoded‖ is per-row."""
        import math

        decoded = self._decoded(codes)
        q = F.array(*[F.lit(float(x)) for x in query])
        dot = F.aggregate(
            F.zip_with(decoded, q, lambda d, qq: d * qq), F.lit(0.0), lambda s, v: s + v
        )
        dn = F.sqrt(
            F.aggregate(
                F.transform(decoded, lambda d: d * d), F.lit(0.0), lambda s, v: s + v
            )
        )
        qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1e-300
        return dot / (dn * F.lit(qn))

    # metric → (score builder attr, ascending?) — 'l2' orders ascending
    # (distance), 'ip'/'cosine' descending (similarity), mirroring
    # similarity.brute.ASCENDING
    _METRICS = {"l2": True, "ip": False, "cosine": False}

    def adc_score(self, codes: Column | str, query: list[float], metric: str) -> Column:
        if metric == "l2":
            return self.adc_dist_sq(codes, query)
        if metric == "ip":
            return self.adc_ip(codes, query)
        if metric == "cosine":
            return self.adc_cosine(codes, query)
        raise ValueError(f"unknown SQ8 metric: {metric}")

    def adc_topk(
        self,
        df: DataFrame,
        vec_col: str,
        id_col: str,
        query: list[float],
        k: int,
        dist_col: str = "adc_dist",
        metric: str = "l2",
    ) -> DataFrame:
        """End-to-end compressed probe: encode (narrow) → ADC score →
        global top-k (TakeOrderedAndProject). Ties broken by id. ``metric``
        covers all three reference ops classes (l2 ascending, ip/cosine
        descending)."""
        codes = self.encode(vec_col)
        score = F.round(self.adc_score(codes, query, metric), 6)
        order = (
            F.col(dist_col).asc() if self._METRICS[metric] else F.col(dist_col).desc()
        )
        return (
            df.select(F.col(id_col), score.alias(dist_col))
            .orderBy(order, F.col(id_col).asc())
            .limit(k)
        )


def sq8_adc_oracle_sql(
    table: str, vec_col: str, id_col: str, query: list[float], k: int,
    dist_col: str = "adc_dist", metric: str = "l2",
) -> str:
    """Self-contained DuckDB replica of train→encode→ADC→top-k: the
    per-dimension stats are computed in SQL (no data-derived literals), and
    every arithmetic step mirrors SQ8Model's operation order. ``metric``
    mirrors adc_topk's: l2 (squared distance, ASC), ip / cosine
    (similarity, DESC)."""
    import math

    qvals = ", ".join(repr(float(x)) for x in query)
    dec = "(mn + code * (mx - mn) / 255.0)"
    if metric == "l2":
        score = f"round(sum(({dec} - qx) * ({dec} - qx)), 6)"
        direction = "ASC"
    elif metric == "ip":
        score = f"round(sum({dec} * qx), 6)"
        direction = "DESC"
    elif metric == "cosine":
        qn = repr(math.sqrt(sum(float(x) * float(x) for x in query)) or 1e-300)
        score = f"round(sum({dec} * qx) / (sqrt(sum({dec} * {dec})) * {qn}), 6)"
        direction = "DESC"
    else:
        raise ValueError(f"unknown SQ8 metric: {metric}")
    return f"""
    WITH dims AS (
        SELECT i AS dim, min(x) AS mn, max(x) AS mx
        FROM (SELECT unnest({vec_col}::DOUBLE[]) AS x,
                     generate_subscripts({vec_col}, 1) AS i
              FROM {table})
        GROUP BY i
    ),
    q AS (SELECT unnest([{qvals}]) AS qx,
                 generate_subscripts([{qvals}], 1) AS dim),
    elems AS (
        SELECT {id_col}, generate_subscripts({vec_col}, 1) AS dim,
               unnest({vec_col}::DOUBLE[]) AS x
        FROM {table}
    ),
    coded AS (
        SELECT e.{id_col}, e.dim, d.mn, d.mx, q.qx,
               CASE WHEN d.mx - d.mn = 0 THEN 0
                    ELSE greatest(0, least(255,
                         CAST(floor(255.0 * (e.x - d.mn) / (d.mx - d.mn) + 0.5) AS INTEGER)))
               END AS code
        FROM elems e JOIN dims d USING (dim) JOIN q USING (dim)
    ),
    dists AS (
        SELECT {id_col}, {score} AS {dist_col}
        FROM coded GROUP BY {id_col}
    )
    SELECT {id_col}, {dist_col} FROM dists
    ORDER BY {dist_col} {direction}, {id_col} ASC LIMIT {k}
    """


CODES_COL = "__codes"


@dataclass
class IVFSQ8Index:
    """IVF + materialized SQ8 codes — the FAISS IVFSQ layout, realized.

    ``build`` encodes the corpus ONCE and persists a codes relation of
    (id, bucket, codes) with NO raw-vector column: the ADC probe scans 1
    byte/dim instead of 4-8, which at 100 TB is the difference between a
    RAM-resident codes sweep and a spilling float scan. Raw vectors are
    touched only (a) per-shortlist-row in the exact re-rank join and (b) at
    save() time. The probe plan provably reads codes, not vectors —
    asserted in tests/test_quantize.py::test_probe_plan_reads_codes_only.
    """

    ivf: object  # IVFFlatIndex
    model: SQ8Model
    codes: DataFrame  # (id_col, BUCKET_COL, CODES_COL) — no raw vectors
    vec_col: str
    id_col: str
    # probes without an explicit rerank depth use this; None → 4×k
    default_rerank: int | None = None

    @classmethod
    def build(cls, ivf_index, vec_col: str, id_col: str, model: SQ8Model | None = None) -> "IVFSQ8Index":
        from ..index.ivfflat import BUCKET_COL

        if ivf_index.dist not in SQ8Model._METRICS:
            raise ValueError(
                f"IVFSQ8Index supports {sorted(SQ8Model._METRICS)} indexes, "
                f"got {ivf_index.dist!r}"
            )
        model = model or SQ8Model.train(ivf_index.assignments, vec_col)
        codes = ivf_index.assignments.select(
            F.col(id_col), F.col(BUCKET_COL), model.encode(vec_col).alias(CODES_COL)
        ).persist()
        return cls(ivf_index, model, codes, vec_col, id_col)

    @property
    def assignments(self) -> DataFrame:
        """The underlying IVF assignment relation — lets the planner's
        filtered-search dispatch (index/selection.py) route a ``where``
        predicate here instead of the HNSW allowed-set path."""
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
        """route → ADC over codes → exact re-rank of the shortlist.

        ``where`` (Column predicate over the base table) plans FILTERED
        search: matching ids semi-join into the codes scan BEFORE the ADC
        shortlist, so the top-k is taken among matching rows.

        1. nearest ``probe_lists`` IVF buckets (driver-side, O(lists));
        2. ADC distance over the probed buckets' CODES (columnar-pruned
           scan of the persisted codes relation — raw vectors unread);
        3. exact distance on raw vectors for the ADC top-``rerank`` ids
           only (shortlist broadcast into the fetch join), emit top-``k``.

        Deterministic (ADC ties broken by id) → hash-match gated end to end
        (queries.py `ann_ivf_sq8_rerank`); approximation comes only from
        bucket pruning and the rerank depth. Scoring follows the IVF
        index's ops class (l2 / cosine / ip): ADC shortlist and exact
        re-rank both order ascending for l2, descending for similarities.
        """
        from ..functions.vector import cosine_similarity, inner_product, l2_dist
        from ..index.ivfflat import BUCKET_COL

        metric = self.ivf.dist
        asc = SQ8Model._METRICS[metric]
        if rerank is None:
            rerank = self.default_rerank or 4 * k  # shortlist 4× the ask
        buckets = self.ivf.rank_buckets(query)[: (probe_lists or self.ivf.probe_lists)]
        cand = self.codes.filter(F.col(BUCKET_COL).isin(buckets))
        if where is not None:
            allowed = self.ivf.assignments.filter(where).select(self.id_col)
            cand = cand.join(allowed, self.id_col, "left_semi")
        # ADC rounded to 9 decimals before ordering: Spark folds the dim sum
        # left-to-right, DuckDB's list_sum may differ in the last bits — the
        # rounding makes the shortlist boundary engine-independent
        adc = cand.select(
            F.col(self.id_col),
            F.round(self.model.adc_score(CODES_COL, query, metric), 9).alias("__adc"),
        )
        adc_order = F.col("__adc").asc() if asc else F.col("__adc").desc()
        shortlist = adc.orderBy(adc_order, F.col(self.id_col).asc()).limit(rerank)
        # raw-vector fetch: only the probed buckets are scanned (partition
        # pruning on bucket-partitioned storage) and only shortlist ids
        # survive the broadcast semi-join
        raw = self.ivf.assignments.filter(F.col(BUCKET_COL).isin(buckets)).select(
            F.col(self.id_col), F.col(self.vec_col)
        )
        rer = raw.join(F.broadcast(shortlist.select(self.id_col)), self.id_col)
        exact_fn = {"l2": l2_dist, "cosine": cosine_similarity, "ip": inner_product}[
            metric
        ]
        order = F.col(dist_col).asc() if asc else F.col(dist_col).desc()
        return (
            rer.select(
                F.col(self.id_col),
                F.round(exact_fn(self.vec_col, query), 8).alias(dist_col),
            )
            .orderBy(order, F.col(self.id_col).asc())
            .limit(k)
        )

    def save(self, path: str) -> None:
        """Codes partitioned by bucket (probe = partition pruning) next to
        the IVF index's own layout, plus the quantizer stats + meta so
        ``load`` restores a probe-identical index."""
        from ..index.ivfflat import BUCKET_COL

        self.codes.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(
            f"{path}/codes"
        )
        spark = self.codes.sparkSession
        spark.createDataFrame(
            [(i, float(mn), float(mx)) for i, (mn, mx) in enumerate(zip(self.model.mins, self.model.maxs))],
            "dim int, mn double, mx double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
        spark.createDataFrame(
            [
                (
                    self.vec_col,
                    self.id_col,
                    int(self.ivf.probe_lists),
                    self.ivf.dist,
                    self.default_rerank,
                )
            ],
            "vec_col string, id_col string, probe_lists int, dist string, default_rerank int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
        self.ivf.save(f"{path}/ivf")

    @classmethod
    def load(cls, spark, path: str) -> "IVFSQ8Index":
        from ..index.ivfflat import IVFFlatIndex

        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        stats = spark.read.parquet(f"{path}/stats").orderBy("dim").collect()
        model = SQ8Model([r["mn"] for r in stats], [r["mx"] for r in stats])
        ivf = IVFFlatIndex.load(
            spark, f"{path}/ivf", meta["vec_col"], meta["probe_lists"], meta["dist"]
        )
        codes = spark.read.parquet(f"{path}/codes").persist()
        out = cls(ivf, model, codes, meta["vec_col"], meta["id_col"])
        out.default_rerank = meta["default_rerank"]
        return out


def ivf_sq8_rerank_topk(
    index,
    model: SQ8Model,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int,
    rerank: int,
    probe_lists: int | None = None,
    dist_col: str = "distance",
) -> DataFrame:
    """One-shot convenience wrapper over :class:`IVFSQ8Index` (build codes +
    probe). For repeated probes build the index once — the codes relation
    is persisted and each probe then scans codes only."""
    sq = IVFSQ8Index.build(index, vec_col, id_col, model=model)
    return sq.probe(query, k, rerank, probe_lists=probe_lists, dist_col=dist_col)
