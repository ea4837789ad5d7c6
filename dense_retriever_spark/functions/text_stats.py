"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All native column expressions (JVM-side, whole-stage codegen) — the heavy
string work is regex/split/aggregate, no Python in the hot path. Each has an
ANSI-SQL twin in __spark_entry__.oracle_sql() for the DuckDB parity gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dense_retriever_spark.functions.tokenizer import tokenize_text_expr

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, "\\s+"), lambda x: x != ""))


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish token estimate: count of word-piece-like regex matches
    (letter runs, digit runs, single punctuation) — a deterministic proxy for
    a learned BPE vocabulary's token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            F.split(c, r"(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])(?=[a-zA-Z0-9])"),
            lambda x: x.rlike("\\S"),
        )
    )


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    no_punct = F.regexp_replace(c, "[^a-zA-Z0-9\\s]", "")
    return (F.length(c) - F.length(no_punct)).cast("double") / F.greatest(
        F.length(c).cast("double"), F.lit(1.0)
    )


def stopword_ratio(
    col: Column | str, stopwords: list[str], toks: Column | None = None
) -> Column:
    """Pass ``toks`` (a materialized token-array COLUMN) on hot paths: the
    inline tokenizer expression is otherwise duplicated into every reference
    (Catalyst shares no common subexpressions across an expression tree)."""
    toks = tokenize_text_expr(col) if toks is None else toks
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return hits.cast("double") / F.greatest(F.size(toks).cast("double"), F.lit(1.0))


def quality_score(col: Column | str, toks: Column | None = None) -> Column:
    """Composite quality score in [0,1]: favors moderate length, low
    punctuation, some stopwords (prose-ness). ``toks``: see stopword_ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count_ws(c).cast("double")
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    p = punct_ratio(c)
    sw = stopword_ratio(c, LANG_STOPWORDS["en"], toks=toks)
    return F.round(
        F.lit(0.5) * len_score + F.lit(0.25) * (F.lit(1.0) - F.least(p * 5, F.lit(1.0)))
        + F.lit(0.25) * F.least(sw * 5, F.lit(1.0)),
        6,
    )


def langid_scores(col: Column | str, toks: Column | None = None) -> Column:
    """Predicted language by max stopword-hit count across LANG_STOPWORDS;
    'und' (undetermined) when no stopword hits at all. Ties break to the
    alphabetically-first language code.

    Shaped as ONE array_max over (hits, -lang_index) structs: the previous
    when-chain argmax nested every language's hit expression into every later
    branch, duplicating the tokenizer subtree ~3x per language (no
    common-subexpression sharing pre-analysis). ``toks``: see stopword_ratio.
    """
    toks = tokenize_text_expr(col) if toks is None else toks
    langs = sorted(LANG_STOPWORDS)
    entries = []
    for i, lang in enumerate(langs):
        sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        # struct ordering is field-lexicographic: max hits first, then max
        # (-i) = the earliest alphabetical language on a hit tie
        entries.append(
            F.struct(hits.alias("hits"), F.lit(-i).alias("negi"))
        )
    best = F.array_max(F.array(*entries))
    lang_arr = F.array(*[F.lit(x) for x in langs])
    return F.when(
        best["hits"] >= 1, F.element_at(lang_arr, -best["negi"] + 1)
    ).otherwise(F.lit("und"))


def fingerprint_md5(col: Column | str) -> Column:
    """Normalization + hash document fingerprint: md5 of the space-joined
    token stream (case/punct/whitespace-insensitive identity)."""
    return F.md5(F.array_join(tokenize_text_expr(col), " "))


def fingerprint_rolling(col: Column | str, mod: int = 2**31 - 1) -> Column:
    """Order-sensitive rolling polynomial hash over tokens:
    h = fold(h*31 + crc32(token)) mod 2^31-1 — native F.aggregate fold.
    (Modulus sized so acc*31 + crc32 cannot overflow int64 under ANSI mode.)"""
    toks = tokenize_text_expr(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(31) + F.crc32(x).cast("long"), F.lit(mod)),
    )
