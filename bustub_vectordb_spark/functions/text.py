"""Text-analysis expressions for large-scale training-data pipelines.

All hot-path expressions are native Catalyst (regexp/length/split/xxhash64 —
JVM codegen, no Python). Each operator has a *dual implementation*: a Spark
``Column`` builder and an ANSI-SQL string builder (DuckDB dialect) computing
the identical formula, so the driver's oracle comparison is exact by
construction. The SQL builders are the single source of truth for the
formulas — keep both sides in sync.

Operators:
  token_count        whitespace tokenization count
  quality_score      length / punctuation / stopword / uppercase heuristics
  langid             stopword-profile scoring over {en,de,fr,es} + argmax
  fingerprint        document fingerprint = md5 of whitespace-normalized text
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword profiles for the langid heuristic. Word-boundary regexes behave
# identically in Java regex (Spark) and RE2 (DuckDB) for these literals.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "que", "y", "es", "un", "en"],
}

PUNCT_CLASS = r"[.,!?;:]"


# --------------------------------------------------------------------------
# token count
def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


def token_count_sql(col: str = "text") -> str:
    return f"len(regexp_split_to_array(trim({col}), '\\s+'))"


# GPT-2-style pre-tokenizer approximation: contraction suffixes, letter
# runs, single digits, punctuation runs. Restricted to syntax Java regex
# (Spark) and RE2 (DuckDB) tokenize identically — verified char-for-char in
# the oracle gate. A real BPE merges within these pieces, so this counts an
# upper-bound-ish proxy at full scan speed with zero Python.
SUBWORD_PATTERN = r"'(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}|[^\s\p{L}\p{N}]+"


def subword_count(text: Column | str) -> Column:
    """BPE-ish token count — pre-tokenizer pieces per document."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(SUBWORD_PATTERN), F.lit(0)))


def subword_count_sql(col: str = "text") -> str:
    pat = SUBWORD_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))"


# --------------------------------------------------------------------------
# quality scoring
def quality_exprs(text: Column | str) -> dict[str, Column]:
    """Component expressions for document quality scoring.

    n_chars, n_tokens, punct_ratio (punctuation chars / chars),
    stopword_ratio (English stopword tokens / tokens),
    mean_token_len.
    """
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = token_count(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    sw_pattern = r"\b(" + "|".join(LANG_PROFILES["en"]) + r")\b"
    stop_hits = F.size(F.regexp_extract_all(F.lower(c), F.lit(sw_pattern), F.lit(1)))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": F.round(punct / F.nullif(n_chars, F.lit(0)), 6),
        "stopword_ratio": F.round(stop_hits / F.nullif(n_tokens, F.lit(0)), 6),
        "mean_token_len": F.round(
            (F.length(F.regexp_replace(c, r"\s+", ""))) / F.nullif(n_tokens, F.lit(0)), 6
        ),
    }


def quality_sql(col: str = "text") -> dict[str, str]:
    sw_pattern = r"\b(" + "|".join(LANG_PROFILES["en"]) + r")\b"
    n_tokens = token_count_sql(col)
    return {
        "n_chars": f"length({col})::BIGINT",
        "n_tokens": f"({n_tokens})::BIGINT",
        "punct_ratio": (
            f"round((length({col}) - length(regexp_replace({col}, '{PUNCT_CLASS}', '', 'g')))"
            f" / nullif(length({col}), 0), 6)"
        ),
        "stopword_ratio": (
            f"round(len(regexp_extract_all(lower({col}), '{sw_pattern}', 1))"
            f" / nullif({n_tokens}, 0), 6)"
        ),
        "mean_token_len": (
            f"round(length(regexp_replace({col}, '\\s+', '', 'g'))"
            f" / nullif({n_tokens}, 0), 6)"
        ),
    }


# --------------------------------------------------------------------------
# language identification (stopword-profile scoring)
def langid_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratio (hits / tokens)."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    n_tokens = token_count(c)
    out = {}
    for lang, words in LANG_PROFILES.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        hits = F.size(F.regexp_extract_all(lowered, F.lit(pattern), F.lit(1)))
        out[lang] = F.round(hits / F.nullif(n_tokens, F.lit(0)), 6)
    return out


def langid(text: Column | str) -> Column:
    """argmax language; deterministic tie-break = profile order en,de,fr,es.

    Implemented as a greatest()+CASE chain — pure codegen, no UDF.
    """
    scores = langid_scores(text)
    langs = list(scores)
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    # reverse so earlier profile wins ties after the fold
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    # no tokens → undetermined
    return F.when(best.isNull() | (best == 0), F.lit("und")).otherwise(expr)


def langid_sql(col: str = "text") -> str:
    n_tokens = token_count_sql(col)
    score = {}
    for lang, words in LANG_PROFILES.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        score[lang] = (
            f"round(len(regexp_extract_all(lower({col}), '{pattern}', 1))"
            f" / nullif({n_tokens}, 0), 6)"
        )
    langs = list(score)
    best = "greatest(" + ", ".join(score.values()) + ")"
    case = "'und'"
    for lg in reversed(langs):
        case = f"CASE WHEN {score[lg]} = {best} THEN '{lg}' ELSE {case} END"
    return f"CASE WHEN {best} IS NULL OR {best} = 0 THEN 'und' ELSE {case} END"


# --------------------------------------------------------------------------
# document fingerprint
def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 over lowercased, whitespace-collapsed text.

    Runs are collapsed BEFORE trimming: trim() strips only spaces, so
    collapsing first makes the key invariant under any leading/trailing
    whitespace (tabs/newlines included) — the equivalence class exact dedup
    is defined over (property-tested in tests/test_properties.py).
    Identical formula on both engines; used as the exact-dedup key.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def fingerprint_sql(col: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"


# --------------------------------------------------------------------------
# quality FILTER (Gopher-style keep/drop verdict over the metrics above;
# cf. the published Gopher data-quality rules, Rae et al. 2021 §A1.1)
QUALITY_RULES = {
    "min_tokens": 30,
    "max_tokens": 200_000,
    "min_mean_token_len": 2.0,
    "max_mean_token_len": 12.0,
    "max_punct_ratio": 0.3,
    "min_stopword_ratio": 0.05,
}


def quality_keep(text: Column | str, rules: dict | None = None) -> Column:
    """Boolean keep verdict from the quality metrics (one codegen pass)."""
    r = {**QUALITY_RULES, **(rules or {})}
    m = quality_exprs(text)
    return (
        (m["n_tokens"] >= r["min_tokens"])
        & (m["n_tokens"] <= r["max_tokens"])
        & (m["mean_token_len"] >= r["min_mean_token_len"])
        & (m["mean_token_len"] <= r["max_mean_token_len"])
        & (m["punct_ratio"] <= r["max_punct_ratio"])
        & (m["stopword_ratio"] >= r["min_stopword_ratio"])
    )


def quality_keep_sql(col: str = "text", rules: dict | None = None) -> str:
    r = {**QUALITY_RULES, **(rules or {})}
    m = quality_sql(col)
    return (
        f"({m['n_tokens']} >= {r['min_tokens']} AND {m['n_tokens']} <= {r['max_tokens']}"
        f" AND {m['mean_token_len']} >= {r['min_mean_token_len']}"
        f" AND {m['mean_token_len']} <= {r['max_mean_token_len']}"
        f" AND {m['punct_ratio']} <= {r['max_punct_ratio']}"
        f" AND {m['stopword_ratio']} >= {r['min_stopword_ratio']})"
    )


# --------------------------------------------------------------------------
# PII scrubbing (training-data redaction). Patterns restricted to syntax
# Java regex (Spark) and RE2 (DuckDB) interpret identically — no
# backreferences, no lookaround.
PII_PATTERNS = {
    # local@domain.tld
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # +1 555-123-4567 / (555) 123 4567 / 555.123.4567
    "PHONE": r"\+?[0-9]{0,2}[ .-]?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}",
    # 123-45-6789
    "SSN": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_scrub(text: Column | str) -> Column:
    """Redact each PII class to a [CLASS] placeholder (order: EMAIL, PHONE,
    SSN — fixed so both engines rewrite identically)."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name}]")
    return c


def pii_scrub_sql(col: str = "text") -> str:
    expr = col
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '[{name}]', 'g')"
    return expr


def pii_counts(text: Column | str) -> Column:
    """Total PII matches in the document (sum over classes)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.lit(0)
    for pat in PII_PATTERNS.values():
        n = n + F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
    return n.cast("bigint")


def pii_counts_sql(col: str = "text") -> str:
    terms = " + ".join(
        f"len(regexp_extract_all({col}, '{p}'))" for p in PII_PATTERNS.values()
    )
    return f"({terms})::BIGINT"
