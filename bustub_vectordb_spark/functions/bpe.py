"""Byte-level BPE tokenization — real merge-table encoding, GPT-2 format.

`text.subword_count` approximates token budgets with a regex; this module
does the real thing: a byte-level Byte-Pair-Encoding tokenizer in the
GPT-2 lineage (Sennrich et al. ACL 2016 for BPE; Radford et al. 2019 for
the byte-level variant), with

  - the GPT-2 ``bytes_to_unicode`` reversible byte↔printable-unicode
    mapping (public algorithm, re-derived from its published description:
    the 188 printable latin-1 bytes map to themselves, the rest shift
    past U+0100 in order);
  - GPT-2-style pre-tokenization (contractions, letter runs, digit runs,
    punctuation runs, leading-space attachment) — expressed with stdlib
    ``re`` unicode classes since the container has no ``regex`` module;
  - a rank-table encoder: repeatedly merge the lowest-rank adjacent pair
    (the standard greedy BPE loop), LRU-cached per pre-token;
  - a deterministic trainer (``learn_bpe``) so the repo can ship a
    merges file without network access, and GPT-2-format save/load
    (``#version``-headed "left right" lines) so OpenAI's actual
    ``merges.txt`` drops in unchanged.

Distributed encode (``bpe_token_count``) is an Arrow-batched
``mapInPandas`` stage: the merge-rank dict broadcasts once per executor
(a real 50k-merge GPT-2 table is ~1 MB — broadcast, never a plan
literal), each batch encodes in pure Python over Arrow-delivered
strings, and only (id, n_tokens) comes back — the 100 TB shape for token
budgeting (operators/packing.py consumes exactly such counts). The
DuckDB oracle replays the SAME encoder offline over the parquet
(queries.py `token_count_bpe`), so any drift between the distributed and
reference paths hash-fails the gate.
"""

from __future__ import annotations

import re
from functools import lru_cache

# GPT-2's pre-tokenizer, re-expressed for stdlib `re`: \p{L} → [^\W\d_]
# (unicode letters), \p{N} → \d (unicode digits). The contraction
# alternates, leading-space attachment and trailing-space lookahead are
# verbatim GPT-2.
GPT2_SPLIT_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w']+|\s+(?!\S)|\s+"
)


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte → printable-unicode map."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word, word[1:]))


class BPETokenizer:
    """Greedy lowest-rank-first BPE over byte-unicode symbols.

    ``merges``: ordered list of (left, right) symbol pairs — rank = list
    position, exactly the GPT-2 merges.txt contract."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_map = bytes_to_unicode()
        # per-instance cache: pre-tokens repeat heavily in natural text
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_raw)

    def _encode_word_raw(self, token: str) -> tuple[str, ...]:
        word = tuple(self.byte_map[b] for b in token.encode("utf-8"))
        if len(word) < 2:
            return word
        while True:
            pairs = _get_pairs(word)
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                return word
            merged: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) < 2:
                return word

    def encode(self, text: str) -> list[str]:
        """Token symbols (strings over the byte-unicode alphabet)."""
        out: list[str] = []
        for tok in GPT2_SPLIT_PAT.findall(text or ""):
            out.extend(self._encode_word(tok))
        return out

    def token_count(self, text: str) -> int:
        n = 0
        for tok in GPT2_SPLIT_PAT.findall(text or ""):
            n += len(self._encode_word(tok))
        return n

    # -- vocab -------------------------------------------------------------
    def vocab(self) -> dict[str, int]:
        """Deterministic symbol → id: 256 byte symbols in byte order,
        then one merged symbol per merge in rank order (the GPT-2 vocab
        construction, minus its special tokens)."""
        bm = self.byte_map
        v = {bm[b]: b for b in range(256)}  # id == byte value for the base
        nxt = 256
        for (l, r), _rank in sorted(self.ranks.items(), key=lambda kv: kv[1]):
            sym = l + r
            if sym not in v:
                v[sym] = nxt
                nxt += 1
        return v

    def encode_ids(self, text: str) -> list[int]:
        v = self.vocab()
        return [v[s] for s in self.encode(text)]


# -- trainer (deterministic, so the repo ships a merges file offline) ------


def learn_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over pre-token frequencies. Deterministic:
    the most frequent pair wins, ties break lexicographically — no dict
    order or hash seed leaks into the result."""
    from collections import Counter

    bm = bytes_to_unicode()
    words: Counter = Counter()
    for t in texts:
        for tok in GPT2_SPLIT_PAT.findall(t or ""):
            words[tuple(bm[b] for b in tok.encode("utf-8"))] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for w, c in words.items():
            for p in zip(w, w[1:]):
                pair_freq[p] += c
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break
        merges.append(best)
        new_words: Counter = Counter()
        for w, c in words.items():
            merged: list[str] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == best[0] and w[i + 1] == best[1]:
                    merged.append(w[i] + w[i + 1])
                    i += 2
                else:
                    merged.append(w[i])
                    i += 1
            new_words[tuple(merged)] += c
        words = new_words
    return merges


# -- GPT-2 merges.txt format ----------------------------------------------


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for l, r in merges:
            f.write(f"{l} {r}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    """Reads GPT-2 merges.txt: skips the #version header and blank lines;
    OpenAI's published file parses unchanged."""
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            l, _, r = line.partition(" ")
            merges.append((l, r))
    return merges


_REPO_MERGES: list[tuple[str, str]] | None = None


def repo_tokenizer() -> BPETokenizer:
    """The checked-in merges table (data/bpe_merges.txt — trained
    deterministically on the synthetic corpus; swap in OpenAI's
    merges.txt for real GPT-2 tokenization)."""
    global _REPO_MERGES
    if _REPO_MERGES is None:
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "bpe_merges.txt",
        )
        _REPO_MERGES = load_merges(path)
    return BPETokenizer(_REPO_MERGES)


# -- distributed encode ----------------------------------------------------


def bpe_token_count(df, text_col: str, id_col: str, merges=None):
    """(id_col, n_tokens) per row, BPE-encoded distributed.

    Arrow-batched mapInPandas; the merge table rides an executor
    broadcast (NOT a plan literal — a 50k-merge GPT-2 table serialises
    ~1 MB and would bloat every plan that embeds it). Python is the
    right tool here: the greedy merge loop is data-dependent control
    flow no Catalyst expression expresses, and the per-batch cost is
    amortised by the pre-token LRU."""
    from ..shipping import ensure_package_on_workers

    spark = df.sparkSession
    ensure_package_on_workers(spark)
    if merges is None:
        merges = repo_tokenizer().ranks
        merges = [p for p, _ in sorted(merges.items(), key=lambda kv: kv[1])]
    bc = spark.sparkContext.broadcast(list(merges))
    idt = {f.name: f.dataType.simpleString() for f in df.schema}[id_col]
    schema = f"{id_col} {idt}, n_tokens bigint"
    src = df.select(id_col, text_col)
    # the greedy merge loop is CPU-bound per row; a single-split documents
    # table would pin every encode to one worker (cf. dedup.minhash
    # _spread — no-op at scale where inputs carry many splits)
    want = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < want:
        src = src.repartition(want, id_col)

    def run(batches):
        tok = BPETokenizer(bc.value)
        for pdf in batches:
            if not len(pdf):
                continue
            out = pdf[[id_col]].copy()
            out["n_tokens"] = [
                tok.token_count(t) for t in pdf[text_col].tolist()
            ]
            yield out

    return src.mapInPandas(run, schema)
