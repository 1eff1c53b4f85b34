"""Text-pipeline operators: repetition metrics, chunking, TF-IDF/BM25,
stratified sampling (functions/repetition.py, operators/chunking.py,
functions/ranking.py, operators/sampling.py)."""

import math

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.functions.ranking import bm25_search, tfidf_top_terms
from bustub_vectordb_spark.functions.repetition import ngrams, repetition_metrics, tokens
from bustub_vectordb_spark.operators.chunking import chunk_documents
from bustub_vectordb_spark.operators.sampling import stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a b a b"),          # pure 2-gram repetition
        (2, "one two three four five"),  # no repetition
        (3, "x"),                        # too short for any 2-gram
        (4, "p q r p q r p q r s"),      # repeated 3-gram
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ngrams_short_doc_empty(docs):
    out = {
        r["doc_id"]: r["g"]
        for r in docs.select("doc_id", ngrams(tokens("text"), 2).alias("g")).collect()
    }
    assert out[3] == []  # no descending-sequence fabrication
    assert out[1][:3] == ["a b", "b a", "a b"] and len(out[1]) == 7


def test_repetition_metrics_values(docs):
    m = {r["doc_id"]: r for r in repetition_metrics(docs, "doc_id", "text").collect()}
    # doc 1: 7 bigrams, 'a b' x4, 'b a' x3 -> top=4/7, all duplicated -> dup3=1.0
    assert m[1]["top2gram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert m[1]["dup3gram_frac"] == 1.0
    # doc 2: all bigrams unique
    assert m[2]["top2gram_frac"] == pytest.approx(0.25, abs=1e-6)
    assert m[2]["dup3gram_frac"] == 0.0
    # doc 3: too short -> filled 0.0, but the doc row must exist
    assert m[3]["top2gram_frac"] == 0.0 and m[3]["dup3gram_frac"] == 0.0
    # doc 4: 'p q r' occurs 3x among 8 trigrams; 'q r p'/'r p q' twice each
    assert m[4]["dup3gram_frac"] == pytest.approx(7 / 8, abs=1e-6)


def test_chunking_coverage_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = chunk_documents(df, "doc_id", "text", window=32, stride=24).collect()
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3, 4]
    # every token appears in at least one chunk, consecutive chunks overlap by 8
    toks = text.split()
    covered = set()
    for r in out:
        covered.update(r["chunk"].split())
    assert covered == set(toks)
    c0, c1 = out[0]["chunk"].split(), out[1]["chunk"].split()
    assert c0[24:] == c1[:8]
    # last chunk is the ragged tail: tokens 96..99
    assert out[4]["chunk_tokens"] == 4 and out[4]["chunk"].split() == toks[96:]


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only four tokens here")], "doc_id bigint, text string")
    out = chunk_documents(df, "doc_id", "text", window=32, stride=24).collect()
    assert len(out) == 1 and out[0]["chunk"] == "only four tokens here"


def test_tfidf_prefers_rare_terms(spark):
    rows = [(i, "common filler words " + ("rare" if i == 0 else "boring")) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    top = {r["doc_id"]: r["term"] for r in tfidf_top_terms(df, "doc_id", "text").collect()}
    assert top[0] == "rare"  # df=1 -> max idf
    expected = round(1 * math.log(10 / 1), 6)
    scores = {r["doc_id"]: r["score"] for r in tfidf_top_terms(df, "doc_id", "text").collect()}
    assert scores[0] == pytest.approx(expected, abs=1e-6)


def test_bm25_ranks_matching_docs_first(spark):
    rows = [
        (1, "spark join table spark join"),
        (2, "spark only mentioned once here pad pad pad"),
        (3, "nothing relevant at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bm25_search(df, "doc_id", "text", ["spark", "join"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1, 2]  # doc 3 matches nothing
    assert out[0]["score"] > out[1]["score"] > 0


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from bustub_vectordb_spark.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    rates = {"en": 0.2, "de": 1.0}
    s1 = stratified_sample(docs, "doc_id", "lang", rates)
    got = s1.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    total = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(by_lang) <= {"en", "de"}  # unlisted strata dropped
    assert by_lang["de"] == total["de"]  # rate 1.0 keeps everything
    assert 0 < by_lang.get("en", 0) < total["en"]
    # deterministic: same rows again
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "lang", rates).collect()
    )
    assert ids1 == ids2


def test_chunking_plan_is_shuffle_free(spark):
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    out = chunk_documents(df, "doc_id", "text")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_pii_scrub_planted_and_engine_parity(spark):
    """Planted PII must be redacted, and the Spark and DuckDB formulations
    must rewrite the text identically (the synthetic corpus has no PII, so
    the oracle gate alone would never exercise a real match)."""
    import duckdb

    from bustub_vectordb_spark.functions.text import (
        pii_counts,
        pii_counts_sql,
        pii_scrub,
        pii_scrub_sql,
    )

    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk for details"),
        (2, "call (555) 123 4567 or +1 555-123-4567 tomorrow"),
        (3, "ssn is 123-45-6789 do not share"),
        (4, "no pii here at all"),
        (5, "two mails a@b.io and c.d@e-f.org in one line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["scrubbed"], r["n_pii"])
        for r in df.select(
            "doc_id",
            pii_scrub("text").alias("scrubbed"),
            pii_counts("text").alias("n_pii"),
        ).collect()
    }
    assert got[1] == ("contact me at [EMAIL] for details", 1)
    assert got[2][1] == 2 and "[PHONE]" in got[2][0] and "555" not in got[2][0]
    assert got[3] == ("ssn is [SSN] do not share", 1)
    assert got[4] == ("no pii here at all", 0)
    assert got[5][1] == 2 and "@" not in got[5][0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{s}')" for i, s in rows) + ") v(doc_id, text)")
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, {pii_scrub_sql('text')}, {pii_counts_sql('text')} FROM t"
        ).fetchall()
    }
    assert oracle == got


def test_quality_filter_selectivity(tables):
    """The keep verdict must be a real split (not all-pass/all-fail) on the
    corpus, and equal the conjunction of its component rules."""
    from bustub_vectordb_spark.functions.text import quality_exprs, quality_keep

    d = tables["documents"]
    n = d.count()
    kept = d.filter(quality_keep("text")).count()
    assert 0 < kept < n
    m = quality_exprs("text")
    manual = d.select(
        ((m["n_tokens"] >= 30) & (m["n_tokens"] <= 200_000)
         & (m["mean_token_len"] >= 2.0) & (m["mean_token_len"] <= 12.0)
         & (m["punct_ratio"] <= 0.3) & (m["stopword_ratio"] >= 0.05)).alias("k")
    ).filter("k").count()
    assert manual == kept


def test_mixture_upsample_multiset_semantics(spark):
    """Weights > 1 repeat rows deterministically: every listed-stratum row
    appears floor(w) or ceil(w) times with dense 1-based rep indexes; the
    overall count approaches w × stratum size; unlisted strata are dropped;
    two runs emit the identical multiset."""
    from bustub_vectordb_spark.operators.sampling import mixture_upsample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    weights = {"a": 2.0, "b": 0.5}
    out = mixture_upsample(df, "doc_id", "src", weights).collect()

    per_doc = {}
    for r in out:
        per_doc.setdefault((r["doc_id"], r["src"]), []).append(r["rep"])
    for (i, src), reps in per_doc.items():
        w = weights[src]
        assert len(reps) in (int(w), int(w) + 1)
        assert sorted(reps) == list(range(1, len(reps) + 1))
    assert all(src != "c" for _, src in per_doc)
    n_a = sum(len(v) for (_, s), v in per_doc.items() if s == "a")
    n_b = sum(len(v) for (_, s), v in per_doc.items() if s == "b")
    assert n_a == 200  # integral weight: exact
    assert 30 <= n_b <= 70  # 0.5 of 100, hash-thresholded

    again = mixture_upsample(df, "doc_id", "src", weights).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_decontaminate_flags_exact_overlaps(spark):
    """A doc is contaminated iff it shares a word trigram with the bench
    set — verified against a brute-force Python shingle intersection."""
    from bustub_vectordb_spark.operators.decontaminate import (
        contamination_flags,
        decontaminate,
    )

    corpus = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a completely different sentence with no overlap at all"),
        (2, "we meet the quick brown fox again in this text"),  # shares trigram w/ 0
        (3, "short doc"),  # < 3 tokens: never flagged
        (4, "no overlap here either just filler words everywhere"),
    ]
    bench = [(100, "someone saw the quick brown fox yesterday")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")

    def tris(t):
        ts = t.lower().split()
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    bench_tris = set().union(*(tris(t) for _, t in bench))
    want = {i: bool(tris(t) & bench_tris) for i, t in corpus}

    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(docs, bdf, "text", "doc_id").collect()
    }
    assert got == want
    assert want[0] and want[2] and not want[1] and not want[3]

    kept = {r["doc_id"] for r in decontaminate(docs, bdf, "text", "doc_id").collect()}
    assert kept == {i for i, f in want.items() if not f}


def test_boilerplate_removal_planted(spark):
    """A span planted verbatim into several documents must vanish from ALL
    of them, while unique text survives byte-for-byte (non-overlapping
    chunks make reassembly lossless)."""
    from bustub_vectordb_spark.dedup.boilerplate import remove_boilerplate

    bp = "subscribe to our newsletter now"  # window=5 tokens, aligned
    rows = [
        (1, bp + " alpha beta gamma delta epsilon"),
        (2, bp + " one two three four five"),
        (3, "totally unique text here today friend"),
        (4, bp),  # all-boilerplate doc → empty clean_text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["removed_chunks"])
        for r in remove_boilerplate(df, "doc_id", "text", window=5, min_docs=2).collect()
    }
    assert out[1] == ("alpha beta gamma delta epsilon", 1)
    assert out[2] == ("one two three four five", 1)
    assert out[3] == ("totally unique text here today friend", 0)
    assert out[4] == ("", 1)
    # determinism: a second run reproduces the identical assignment
    out2 = {
        r["doc_id"]: (r["clean_text"], r["removed_chunks"])
        for r in remove_boilerplate(df, "doc_id", "text", window=5, min_docs=2).collect()
    }
    assert out == out2


def test_sequence_packing_invariants(tables):
    """Greedy per-shard packing: within a shard, pack ids are non-decreasing
    in pack order, every row's pack equals cum-tokens-before // budget, and
    the whole assignment is a pure function of ids (two runs identical)."""
    from pyspark.sql import functions as F

    from bustub_vectordb_spark.functions.text import token_count
    from bustub_vectordb_spark.operators.packing import pack_sequences

    docs = tables["documents"]
    budget = 256
    out = pack_sequences(docs, "doc_id", token_count("text"), budget=budget, n_shards=4)
    rows = out.orderBy("shard", "pack_pos").collect()
    assert len(rows) == docs.count()
    cum: dict[int, int] = {}
    last_pack: dict[int, int] = {}
    for r in rows:
        s = r["shard"]
        before = cum.get(s, 0)
        assert r["pack_id"] == s * 2**32 + before // budget
        assert last_pack.get(s, -1) <= r["pack_id"]
        last_pack[s] = r["pack_id"]
        cum[s] = before + r["n_tokens"]
    again = pack_sequences(
        docs, "doc_id", token_count("text"), budget=budget, n_shards=4
    ).orderBy("shard", "pack_pos").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_hybrid_rrf_fuses_both_signals(spark, tables):
    """RRF hybrid retrieval: a doc ranked by BOTH branches outscores one
    ranked by a single branch at the same position; rank-1 in one branch
    only yields exactly 1/(60+1); fused output is (rrf desc, id) top-k."""
    from bustub_vectordb_spark.functions.ranking import (
        bm25_search,
        hybrid_search_rrf,
    )

    docs, emb = tables["documents"], tables["embeddings"]
    q = [0.1 * ((i % 7) - 3) for i in range(64)]
    terms = ["spark", "table", "join"]
    out = hybrid_search_rrf(
        docs, emb, "doc_id", "text", "vec_id", "embedding", terms, q,
        k=10, depth=20,
    ).collect()
    assert len(out) == 10
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    lex_ids = {r["doc_id"] for r in bm25_search(docs, "doc_id", "text", terms, 20).collect()}
    from bustub_vectordb_spark.functions.vector import cosine_similarity
    from pyspark.sql import functions as F

    vec_ids = {
        r["vec_id"]
        for r in emb.select("vec_id", cosine_similarity("embedding", q).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id")).limit(20).collect()
    }
    both = lex_ids & vec_ids
    single_max = round(1.0 / 61.0, 6)
    for r in out:
        if r["doc_id"] in both:
            assert r["rrf_score"] > single_max  # two reciprocal terms
        else:
            assert r["rrf_score"] <= single_max  # one branch only


# -- byte-level BPE (functions/bpe.py) -------------------------------------


def test_bpe_byte_map_is_reversible_and_printable():
    from bustub_vectordb_spark.functions.bpe import bytes_to_unicode

    bm = bytes_to_unicode()
    assert len(bm) == 256 and len(set(bm.values())) == 256
    # printable latin-1 bytes map to themselves; the rest shift past 0x100
    assert bm[ord("A")] == "A" and bm[ord("~")] == "~"
    assert ord(bm[0]) >= 0x100 and ord(bm[ord(" ")]) >= 0x100


def test_bpe_greedy_merge_order():
    from bustub_vectordb_spark.functions.bpe import BPETokenizer

    # rank 0 merges first even when a later merge also applies
    tok = BPETokenizer([("a", "b"), ("ab", "c"), ("b", "c")])
    assert tok.encode("abc") == ["abc"]
    tok2 = BPETokenizer([("b", "c"), ("a", "bc")])
    assert tok2.encode("abc") == ["abc"]
    assert tok2.encode("ab") == ["a", "b"]
    # utf-8 multibyte survives the byte mapping
    assert tok2.token_count("héllo") == len("héllo".encode()) 


def test_bpe_merges_roundtrip(tmp_path):
    from bustub_vectordb_spark.functions.bpe import (
        BPETokenizer, learn_bpe, load_merges, save_merges,
    )

    texts = ["the quick brown fox the quick dog the the"] * 3
    merges = learn_bpe(texts, 32)
    assert merges, "trainer should learn merges from repeated text"
    p = tmp_path / "merges.txt"
    save_merges(merges, str(p))
    assert load_merges(str(p)) == merges
    # training determinism: same input, same merges
    assert learn_bpe(texts, 32) == merges
    # learned table compresses the training text below byte count
    tok = BPETokenizer(merges)
    s = texts[0]
    assert tok.token_count(s) < len(s.encode())
    assert "".join(tok.encode(s)).replace("Ġ", " ") == s


def test_bpe_vocab_ids_deterministic():
    from bustub_vectordb_spark.functions.bpe import BPETokenizer

    tok = BPETokenizer([("a", "b")])
    v = tok.vocab()
    assert v["A"] == ord("A") and v["ab"] == 256
    assert tok.encode_ids("ab") == [256]


def test_bpe_distributed_matches_reference_encoder(spark, tables):
    from bustub_vectordb_spark.functions.bpe import (
        bpe_token_count, repo_tokenizer,
    )

    docs = tables["documents"].limit(200)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_count(docs, "text", "doc_id").collect()
    }
    tok = repo_tokenizer()
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == tok.token_count(r["text"]), r["doc_id"]


def test_bigram_lm_scores_rank_gibberish_below_natural(spark):
    """The LM signal the shape ratios miss: a doc of unique never-repeated
    token sequences (gibberish) must score a lower mean log-prob than docs
    built from a small repeated vocabulary (natural-ish), given a shared
    corpus model."""
    from bustub_vectordb_spark.functions.lm import bigram_lm_scores

    natural = "the cat sat on the mat and the cat sat again " * 4
    docs = [(i, natural) for i in range(5)]
    gibberish = " ".join(f"zq{i}x w{i*7}k" for i in range(20))
    docs.append((99, gibberish))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r["avg_logp"] for r in
            bigram_lm_scores(df, "text", "doc_id").collect()}
    assert rows[99] < rows[0], rows
    # repeated natural docs share every bigram 5x -> high probability
    assert rows[0] > -2.0


def test_bigram_lm_short_docs_absent(spark):
    from bustub_vectordb_spark.functions.lm import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in bigram_lm_scores(df, "text", "doc_id").collect()}
    assert got == {3}
