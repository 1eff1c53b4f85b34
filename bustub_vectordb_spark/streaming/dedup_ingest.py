"""Streaming near-duplicate document ingestion — the online dedup filter.

A training-data pipeline at 100 TB does not re-run corpus-wide dedup per
crawl: new documents arrive continuously and must be admitted or rejected
against the already-admitted corpus within a micro-batch. This module is
the streaming twin of ``dedup.minhash`` (whose batch semantics are
driver-gated: `dedup_minhash_neardup`, `minhash_dedup` entries), using the
same ``foreachBatch`` + checkpointed-relation discipline as
``streaming/ann_ingest.py`` (the state IS a pair of DataFrames, not a
stateful-operator store, because it must also serve batch joins):

  * state = two distributed relations over ADMITTED docs, localCheckpointed
    per batch so lineage stays bounded: the LSH band relation
    (id, band_idx, band_hash) and the shingle-set relation (id, shingles);
  * each micro-batch is first deduped WITHIN itself (single-pass
    lower-id-wins, exactly ``minhash_dedup``'s policy), then its band
    relation joins the state's on (band_idx, band_hash) — candidate pairs
    only, never a cross join — and candidates are verified with exact
    shingle Jaccard ≥ threshold (same verify as ``near_dup_pairs``);
  * verified near-dups of the corpus are rejected; survivors append to
    both state relations and to the admitted output.

Per-batch cost: O(batch) signature work + a band-key equi-join against the
state (shuffle on band hash, the state side can be bucketed at scale) + a
verify join proportional to candidate count. Nothing is ever collected to
the driver.

Delivery semantics: foreachBatch is at-least-once; already-admitted ids
drop via an anti-join first, and rejection is a deterministic function of
(batch, state), so replays are idempotent.

Ordering note: admission is sequential by arrival (a doc is checked
against docs admitted BEFORE it). Micro-batch boundaries therefore do not
change results for docs in different batches, and within a batch the
single-pass lower-id-wins policy applies — the same order-dependence the
batch ``minhash_dedup`` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..dedup.minhash import minhash_dedup, minhash_signatures, shingles


class NearDupIngest:
    """foreachBatch sink admitting only documents that are not near-dups
    of the already-admitted corpus."""

    COMPACT_EVERY = 64  # fold the union-of-deltas state into one checkpoint

    def __init__(
        self,
        spark,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
        n: int = 3,
        k: int = 32,
        bands: int = 16,
        seed_df: DataFrame | None = None,
        id_type: str = "bigint",
    ):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.n, self.k, self.bands = n, k, bands
        self.batches = 0
        if seed_df is not None:  # derive the id type from the real schema
            id_type = {f.name: f.dataType.simpleString() for f in seed_df.schema}[
                id_col
            ]
        empty_docs = spark.createDataFrame(
            [], f"{id_col} {id_type}, {text_col} string"
        )
        seed = seed_df.select(id_col, text_col) if seed_df is not None else empty_docs
        self.admitted = seed.localCheckpoint(eager=True)
        self._bands = self._band_rel(self.admitted).localCheckpoint(eager=True)
        self._shingles = self._shingle_rel(self.admitted).localCheckpoint(eager=True)
        # checkpoint leaves backing each state view, released at compaction
        # (their storage would otherwise pin ~1 stale generation per fold)
        self._leaves = [self.admitted, self._bands, self._shingles]

    # -- state relations ---------------------------------------------------
    def _band_rel(self, df: DataFrame) -> DataFrame:
        """(id, __b, __h): one row per LSH band — the same band hashing as
        minhash_lsh_candidates, exposed as a joinable relation."""
        rows = self.k // self.bands
        sig = minhash_signatures(df, self.text_col, self.id_col, self.n, self.k)
        arr = F.array(
            *[
                F.xxhash64(*[F.col(f"__m{j * rows + i}") for i in range(rows)])
                for j in range(self.bands)
            ]
        )
        return sig.select(
            F.col(self.id_col), F.posexplode(arr).alias("__b", "__h")
        )

    def _shingle_rel(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col), shingles(self.text_col, self.n).alias("__sh")
        )

    # -- the sink ----------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(self.id_col, self.text_col).dropDuplicates(
            [self.id_col]
        )
        # idempotence under at-least-once replay: admitted ids drop; their
        # rejected batch-mates then re-reject deterministically
        rows = rows.join(
            self.admitted.select(self.id_col), self.id_col, "left_anti"
        )
        if rows.isEmpty():
            return
        # 1) within-batch single-pass dedup (lower id wins — the batch
        #    minhash_dedup policy, driver-gated)
        rows = minhash_dedup(
            rows, self.text_col, self.id_col, self.threshold,
            n=self.n, k=self.k, bands=self.bands,
        )
        # 2) LSH candidates vs the admitted corpus: band-key equi-join
        cand = (
            self._band_rel(rows)
            .select(F.col(self.id_col).alias("__new"), "__b", "__h")
            .join(
                self._bands.select(
                    F.col(self.id_col).alias("__old"), "__b", "__h"
                ),
                ["__b", "__h"],
            )
            .select("__new", "__old")
            .distinct()
        )
        # 3) exact shingle-Jaccard verify (same arithmetic as
        #    near_dup_pairs) — only verified near-dups reject
        verified = (
            cand.join(
                self._shingle_rel(rows).select(
                    F.col(self.id_col).alias("__new"), F.col("__sh").alias("__sh1")
                ),
                "__new",
            )
            .join(
                self._shingles.select(
                    F.col(self.id_col).alias("__old"), F.col("__sh").alias("__sh2")
                ),
                "__old",
            )
            .withColumn(
                "__j",
                # round-6 BEFORE the threshold compare — near_dup_pairs (and
                # therefore the within-batch step above) rounds, so a raw
                # compare here could admit/reject borderline docs differently
                # from the batch twin
                F.round(
                    F.size(F.array_intersect("__sh1", "__sh2"))
                    / F.size(F.array_union("__sh1", "__sh2")),
                    6,
                ),
            )
            .filter(F.col("__j") >= self.threshold)
            .select(F.col("__new").alias(self.id_col))
            .distinct()
        )
        survivors = rows.join(verified, self.id_col, "left_anti")
        # 4) append as a CHECKPOINTED DELTA: only the batch's survivors
        #    materialize (O(batch) write), the state stays a union view of
        #    checkpointed leaves — re-checkpointing the whole state per
        #    batch would be an O(corpus) copy every micro-batch. The union
        #    plan grows one leaf per batch; COMPACT_EVERY batches it folds
        #    back into a single checkpoint (amortized O(corpus/C)/batch).
        delta = survivors.localCheckpoint(eager=True)
        self.admitted = self.admitted.unionByName(delta)
        # band/shingle deltas checkpoint too (each O(batch)) so later
        # joins scan materialized leaves instead of recomputing every old
        # delta's signatures per batch
        band_delta = self._band_rel(delta).localCheckpoint(eager=True)
        self._bands = self._bands.unionByName(band_delta)
        shingle_delta = self._shingle_rel(delta).localCheckpoint(eager=True)
        self._shingles = self._shingles.unionByName(shingle_delta)
        self._leaves += [delta, band_delta, shingle_delta]
        self.batches += 1
        if self.batches % self.COMPACT_EVERY == 0:
            from ..shipping import release_checkpoint

            self.admitted = self.admitted.localCheckpoint(eager=True)
            self._bands = self._bands.localCheckpoint(eager=True)
            self._shingles = self._shingles.localCheckpoint(eager=True)
            # the folds materialized — release the superseded leaves so a
            # long-running stream holds exactly one state generation
            for leaf in self._leaves:
                release_checkpoint(leaf)
            self._leaves = [self.admitted, self._bands, self._shingles]


    # -- persistence across stream restarts --------------------------------
    def save(self, path: str) -> None:
        """Persist the admitted corpus (the whole state — bands and
        shingles are pure functions of it). On restart, seed a fresh sink
        with :meth:`load`'s DataFrame: both relations rebuild in one
        distributed pass, and the source's own checkpoint dir resumes the
        offsets, so the restarted stream continues admission exactly where
        it stopped."""
        self.admitted.write.mode("overwrite").parquet(path)

    @classmethod
    def load(
        cls, spark, path: str, text_col: str = "text", id_col: str = "doc_id", **kw
    ) -> "NearDupIngest":
        return cls(
            spark, text_col=text_col, id_col=id_col,
            seed_df=spark.read.parquet(path), **kw,
        )


def ingest_dedup_stream(
    stream_df: DataFrame,
    spark,
    checkpoint_dir: str,
    **kw,
) -> tuple:
    """Attach the near-dup ingest sink to a streaming DataFrame;
    availableNow drains the staged input and stops. Returns
    (query, ingest) — read ``ingest.admitted`` after
    ``query.awaitTermination()``."""
    ingest = NearDupIngest(spark, **kw)
    q = (
        stream_df.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, ingest
