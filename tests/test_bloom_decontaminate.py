"""Bloom-filter decontamination (operators/bloom.py) — the constant-size
broadcast variant of the exact shingle-set decontaminate. Properties that
make it safe to swap in at scale: no false negatives vs the exact flags,
bounded false-positive rate, deterministic build."""

from pyspark.sql import functions as F

from bustub_vectordb_spark.operators.bloom import (
    DEFAULT_M_BITS,
    bloom_build,
    bloom_contamination_flags,
)
from bustub_vectordb_spark.operators.decontaminate import contamination_flags


def _flags(df):
    return {r["doc_id"]: r["contaminated"] for r in df.collect()}


def test_bloom_is_superset_of_exact_with_bounded_fpr(tables):
    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    exact = _flags(contamination_flags(docs, bench, "text", "doc_id"))
    words = bloom_build(bench, "text")
    bloom = _flags(
        bloom_contamination_flags(docs, words, "text", "doc_id").select(
            "doc_id", "contaminated"
        )
    )
    assert set(bloom) == set(exact)
    # no false negatives: every exactly-contaminated doc is bloom-flagged
    for d, c in exact.items():
        if c:
            assert bloom[d], f"doc {d} contaminated but not bloom-flagged"
    clean = [d for d, c in exact.items() if not c]
    fp = [d for d in clean if bloom[d]]
    # 16 Kbit / 4 probes over a tiny bench set → FPR should be far under 5%
    assert len(fp) <= max(1, len(clean) // 20), (len(fp), len(clean))


def test_bloom_build_deterministic_signed_words(tables):
    bench = tables["documents"].filter(F.col("doc_id") % 50 == 0)
    w1 = bloom_build(bench, "text")
    w2 = bloom_build(bench, "text")
    assert w1 == w2
    assert len(w1) == DEFAULT_M_BITS // 64
    assert any(w != 0 for w in w1)
    assert all(-(1 << 63) <= w < (1 << 63) for w in w1)


def test_bloom_short_docs_never_flag(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    words = bloom_build(docs.filter("doc_id = 3"), "text")
    out = _flags(bloom_contamination_flags(docs, words, "text", "doc_id"))
    assert out[1] is False and out[2] is False
    assert out[3] is True  # the bench doc itself trivially collides


def test_bloom_probe_plan_has_no_join_on_corpus_side(tables):
    """The scale property: probing is a projection/filter over the corpus
    shingles against a constant-folded literal — the corpus side must not
    shuffle for a join against a bench relation (only the doc-id flag
    aggregation and the final left join on the tiny flagged set remain)."""
    import io
    from contextlib import redirect_stdout

    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    words = bloom_build(bench, "text")
    out = bloom_contamination_flags(docs, words, "text", "doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # exact decontaminate scans documents 3x (docs + corpus shingles +
    # bench shingles → 6 "Scan parquet" lines in formatted output: tree +
    # detail); the bloom probe has no bench relation at all → 2 scans
    assert plan.count("Scan parquet") <= 4, plan.count("Scan parquet")
