"""Dedup operator correctness: MinHash-LSH recall vs exact pairwise truth,
SimHash pigeonhole recall, exact dedup determinism, embedding near-dup."""

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    near_dup_pairs,
    simhash_near_dup_pairs,
)
from bustub_vectordb_spark.dedup.minhash import shingles
from bustub_vectordb_spark.similarity.neardup import (
    cosine_similarity_join,
    random_hyperplane_pairs,
)


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


def _true_pairs(docs, threshold):
    """Exact O(n²) trigram-shingle Jaccard ≥ threshold (ground truth)."""
    sh = docs.select(F.col("doc_id"), shingles("text").alias("sh"))
    a = sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("s1"))
    b = sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("s2"))
    j = a.join(b, F.col("id1") < F.col("id2")).withColumn(
        "j",
        F.size(F.array_intersect("s1", "s2")) / F.size(F.array_union("s1", "s2")),
    )
    return {(r["id1"], r["id2"]) for r in j.filter(F.col("j") >= threshold).collect()}


def test_minhash_finds_planted_near_dups(docs):
    truth = _true_pairs(docs, 0.5)
    assert truth, "testdata should contain planted near-duplicates"
    found = {
        (r["id1"], r["id2"])
        for r in near_dup_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    # jaccard>=0.8 planted dups ⇒ LSH recall ~1 at b=16,r=2
    assert truth == found


def test_lsh_candidate_set_is_small(docs):
    n = docs.count()
    cands = minhash_lsh_candidates(docs, "text", "doc_id").count()
    assert cands < n * n / 20, "LSH must prune the quadratic pair space"


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "Hello world"), (3, "different doc")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "text", "doc_id").collect())
    assert kept == [1, 3]  # 2 is a normalized dup of 1


def test_ngram_jaccard_exact_parity(docs):
    """Prefix-filtered Jaccard join must equal the O(n²) truth exactly."""
    from bustub_vectordb_spark.dedup.jaccard import ngram_jaccard_pairs

    truth = _true_pairs(docs, 0.5)  # trigram shingles, same as the operator's n=3
    found = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5, n=3).collect()
    }
    assert truth == found


def test_ngram_jaccard_high_threshold_parity(docs):
    """Shorter prefixes at a higher threshold must still lose no pairs."""
    from bustub_vectordb_spark.dedup.jaccard import ngram_jaccard_pairs

    truth = _true_pairs(docs, 0.8)
    found = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.8, n=3).collect()
    }
    assert truth == found


def test_simhash_near_dups(docs):
    truth = _true_pairs(docs, 0.8)
    got = {
        (r["id1"], r["id2"])
        for r in simhash_near_dup_pairs(
            docs, "text", "doc_id", max_hamming=7, chunks=8
        ).collect()
    }
    # 64-bit simhash at hamming≤7 recovers nearly all high-jaccard planted
    # dups (empirically 27/28 at sf0.001; simhash is a different similarity
    # than shingle-jaccard, so exact parity isn't expected)
    assert truth
    assert len(got & truth) / len(truth) >= 0.9


@pytest.mark.slow
def test_embedding_near_dup_exact_vs_lsh(tables):
    emb = tables["embeddings"]
    exact = {
        (r["id1"], r["id2"])
        for r in cosine_similarity_join(emb, "embedding", "vec_id", 0.4).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in random_hyperplane_pairs(
            emb, "embedding", "vec_id", 0.4, n_planes=16, bands=8
        ).collect()
    }
    # LSH output ⊆ exact (verification is exact) with decent recall
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.5


def test_minhash_hot_bucket_cap(spark, caplog):
    """A planted boilerplate cluster (thousands of identical docs) must not
    expand to O(cluster²) pairs — the max_bucket cap drops the hot LSH
    buckets (and logs them) while genuine near-dup pairs elsewhere are
    still found."""
    import logging

    n_boiler = 3000
    rows = [(i, "lorem ipsum dolor sit amet boilerplate footer text here") for i in range(n_boiler)]
    # one genuine near-dup pair, distinct from the boilerplate
    rows += [
        (100000, "the quick brown fox jumps over the lazy dog tonight"),
        (100001, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with caplog.at_level(logging.WARNING, logger="bustub_vectordb_spark.dedup.minhash"):
        cands = minhash_lsh_candidates(
            df, "text", "doc_id", max_bucket=100, log_dropped=True
        ).collect()
    pairs = {(r["id1"], r["id2"]) for r in cands}
    # bounded: no boilerplate pair survives (its buckets were all dropped),
    # far below the ~4.5M pairs an uncapped expansion would build
    assert len(pairs) < 1000
    assert (100000, 100001) in pairs
    assert all(not (a < n_boiler and b < n_boiler) for a, b in pairs)
    assert any("hot bucket" in r.message for r in caplog.records)


def test_connected_components_chain(spark):
    """Transitive clustering: a chain A~B~C is ONE component even though
    A and C never pair directly; isolated nodes keep their own id; a
    10-node chain exercises multi-round propagation."""
    from bustub_vectordb_spark.dedup.components import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    pairs = [(0, 1), (1, 2), (4, 5)] + [(i, i + 1) for i in range(6, 15)]
    pdf = spark.createDataFrame(pairs, "id1 long, id2 long")
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, pdf, "doc_id").collect()
    }
    assert {out[i] for i in (0, 1, 2)} == {0}
    assert out[3] == 3
    assert {out[4], out[5]} == {4}
    assert {out[i] for i in range(6, 16)} == {6}
    assert out[15] == 6  # far end of the chain reached the min label


def test_star_components_long_chain_vs_recursive_cte(spark):
    """Adversarial diameter (100-node path): large-star/small-star (Kiveris
    et al., SoCC'14) must converge within its O(log² n) round budget —
    plain propagation's 20-round budget cannot — and match the same
    recursive-CTE fixpoint DuckDB oracle the dedup_components registry
    entry uses."""
    import duckdb

    from bustub_vectordb_spark.dedup.components import connected_components

    n = 100
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    prs = [(i, i + 1) for i in range(n - 1)]
    pdf = spark.createDataFrame(prs, "id1 long, id2 long")

    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, pdf, "doc_id", algorithm="star").collect()
    }

    vals = ", ".join(f"({a}, {b})" for a, b in prs)
    oracle = duckdb.sql(
        f"""
        WITH RECURSIVE pr(id1, id2) AS (VALUES {vals}),
        edges AS (
          SELECT id1 AS src, id2 AS dst FROM pr
          UNION ALL SELECT id2, id1 FROM pr
        ),
        reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id, min(lab) FROM reach GROUP BY id
        """
    ).fetchall()
    exp = {i: lab for i, lab in oracle}
    assert got == exp
    assert all(v == 0 for v in got.values())


@pytest.mark.slow
def test_components_auto_escalates_past_budget(spark):
    """algorithm='auto' (the default): when propagation's round budget runs
    out on a long chain, the star algorithm takes over instead of raising;
    'propagate' keeps the strict raise."""
    import pytest as _pytest

    from bustub_vectordb_spark.dedup.components import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    pdf = spark.createDataFrame([(i, i + 1) for i in range(63)], "id1 long, id2 long")

    out = connected_components(nodes, pdf, "doc_id", max_iter=3, algorithm="auto")
    assert all(r["component"] == 0 for r in out.collect())

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, pdf, "doc_id", max_iter=3, algorithm="propagate")


def test_repeated_spans_removes_phase_shifted_repeats(spark):
    """Overlapping-window exact-substring removal (dedup/spans.py): a
    >= k-token span repeated across docs is excised at ANY alignment —
    including offsets where boilerplate_removal's non-overlapping chunks
    would miss it — and unique text survives untouched."""
    from bustub_vectordb_spark.dedup.spans import remove_repeated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"unique one two three {shared} tail1 tail2"),
            # the same span at a DIFFERENT token offset
            (2, f"x {shared} completely different ending here"),
            (3, "no repeats in this document at all folks"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_repeated_spans(
        docs, "doc_id", "text", k=8, min_docs=2
    ).collect()}
    for tok in shared.split():
        assert tok not in out[1]["clean_text"].split()
        assert tok not in out[2]["clean_text"].split()
    assert out[1]["removed_tokens"] == 8 and out[2]["removed_tokens"] == 8
    assert "unique" in out[1]["clean_text"] and "tail2" in out[1]["clean_text"]
    assert out[3]["removed_tokens"] == 0
    assert out[3]["clean_text"] == "no repeats in this document at all folks"


def test_repeated_spans_within_doc_mode(spark):
    """within_doc=True counts TOTAL occurrences: a span repeated twice
    inside ONE document is excised (self-repetition), which the
    distinct-document mode deliberately ignores."""
    from bustub_vectordb_spark.dedup.spans import remove_repeated_spans

    span = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, f"start {span} middle {span} end"), (2, "totally unrelated words here")],
        "doc_id long, text string",
    )
    by_doc = {r["doc_id"]: r for r in remove_repeated_spans(
        docs, "doc_id", "text", k=8, min_docs=2
    ).collect()}
    assert by_doc[1]["removed_tokens"] == 0  # corpus mode: only 1 distinct doc

    by_doc = {r["doc_id"]: r for r in remove_repeated_spans(
        docs, "doc_id", "text", k=8, min_docs=2, within_doc=True
    ).collect()}
    assert by_doc[1]["removed_tokens"] == 16  # both occurrences excised
    assert by_doc[1]["clean_text"] == "start middle end"
    assert by_doc[2]["removed_tokens"] == 0


def test_semantic_dedup_drops_planted_paraphrase(spark):
    """SemDeDup: a planted near-identical embedding pair collapses to one
    kept row; distant vectors survive; the chain rule keeps only the
    first-ranked member of a similarity neighborhood."""
    from bustub_vectordb_spark.dedup.semantic import semantic_dedup

    base = [1.0, 0.0, 0.0, 0.0]
    para = [0.999, 0.04, 0.0, 0.0]      # cos ≈ 0.9992 with base
    chain = [0.95, 0.31, 0.0, 0.0]      # cos ≈ 0.96 with para, ~0.95 with base
    lone = [0.0, 1.0, 0.0, 0.0]         # orthogonal — kept
    other = [0.0, 0.0, 1.0, 0.0]        # second cluster
    df = spark.createDataFrame(
        [(1, base), (2, para), (3, chain), (4, lone), (5, other)],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.3, 0.0, 0.0], [0.0, 0.5, 0.5, 0.0]]
    out = {r["vec_id"]: r for r in semantic_dedup(
        df, "embedding", "vec_id", cents, threshold=0.9, keep="id"
    ).collect()}
    assert len(out) == 5
    assert out[1]["kept"] == 1          # first of the neighborhood
    assert out[2]["kept"] == 0          # paraphrase of 1
    assert out[3]["kept"] == 0          # similar to an EARLIER item (1 or 2)
    assert out[4]["kept"] == 1
    assert out[5]["kept"] == 1


def test_semantic_dedup_keep_policies_and_cap(spark):
    from bustub_vectordb_spark.dedup.semantic import semantic_dedup

    # two near-dup vectors at different radii from the centroid: farthest
    # policy keeps the far one, closest keeps the near one
    near = [1.0, 0.0]
    far = [3.0, 0.05]
    df = spark.createDataFrame(
        [(1, near), (2, far)], "vec_id long, embedding array<double>"
    )
    cents = [[1.0, 0.0]]
    kept = lambda rows: {r["vec_id"] for r in rows if r["kept"] == 1}
    assert kept(semantic_dedup(
        df, "embedding", "vec_id", cents, 0.9, keep="farthest").collect()) == {2}
    assert kept(semantic_dedup(
        df, "embedding", "vec_id", cents, 0.9, keep="closest").collect()) == {1}
    # max_cell=1: only the first-ranked row enters the comparison pool —
    # the later row is kept unexamined (conservative cap)
    assert kept(semantic_dedup(
        df, "embedding", "vec_id", cents, 0.9, keep="closest", max_cell=1
    ).collect()) == {1, 2}
    with pytest.raises(ValueError):
        semantic_dedup(df, "embedding", "vec_id", cents, 0.9, keep="best")


@pytest.mark.slow
def test_leakage_safe_split_never_straddles_near_dups(docs):
    """The whole point of splitting at component granularity: NO verified
    near-dup pair may have one side in train and the other in val (a
    key-hash split leaks reworded training rows into validation). Also:
    the split is exhaustive and binary, and same-component docs share a
    side by construction."""
    from bustub_vectordb_spark.operators.sampling import leakage_safe_split

    out = leakage_safe_split(docs, "text", "doc_id", test_rate=0.3).collect()
    side = {r["doc_id"]: r["split"] for r in out}
    comp = {r["doc_id"]: r["component"] for r in out}
    assert set(side.values()) <= {"train", "val"}
    assert len(side) == docs.count()
    truth = _true_pairs(docs, 0.5)
    assert truth, "testdata should contain planted near-duplicates"
    for a, b in truth:
        assert side[a] == side[b], (a, b, side[a], side[b])
        assert comp[a] == comp[b]
    # both sides non-empty at this rate on the planted corpus
    assert {"train", "val"} == set(side.values())
