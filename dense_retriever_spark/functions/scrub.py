"""Training-data scrubbing: PII/secret redaction and repetition filtering.

Every serious LLM training-data pipeline scrubs emails/IPs/secrets and drops
highly-repetitive documents (the C4/RefinedWeb/Gopher filter family). Both
operators are pure native column expressions — regexp_replace / split /
array ops, whole-stage codegen, zero Python — and both have exact DuckDB
oracle twins (contract5.q45/q46). Patterns are deliberately RE2-safe (plain
character classes, no lookaround) so the Java-regex engine and the oracle's
RE2 engine match identically.

Reference analog: the reference has no scrubbing (its corpora are
pre-cleaned benchmark sets); these extend the engine for the 100 TB
training-data case per the task brief's pipeline-operator family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — applied in order. RE2-safe by construction.
REDACT_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    # 32+ hex chars: API keys, tokens, sha/md5 digests pasted into code
    ("hex_secret", r"[0-9a-fA-F]{32,}", "<SECRET>"),
]


def redact_expr(col: Column | str) -> Column:
    """Chained regexp_replace over REDACT_RULES (all occurrences — Spark's
    regexp_replace is global; the DuckDB twin passes the 'g' flag)."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, repl in REDACT_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def redaction_counts(col: Column | str) -> Column:
    """struct<email,ipv4,hex_secret>: how many replacements each rule ACTUALLY
    makes — the audit column a scrubbing job writes next to the cleaned text.
    Rule N is counted on the text after rules 1..N-1 have been applied (the
    same sequential order as redact_expr), so overlapping patterns are never
    double-counted: a 32+-hex-char email local part is one <EMAIL>
    replacement, not an <EMAIL> plus a phantom <SECRET> (round-3 ADVICE).
    Counted as size(regexp_extract_all), not by diffing lengths."""
    cur = F.col(col) if isinstance(col, str) else col
    counts = []
    for name, pat, repl in REDACT_RULES:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(name)
        )
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(*counts)


def repetition_ratio(col: Column | str) -> Column:
    """Duplicate-line mass in [0,1]: 1 - distinct_nonempty_lines / nonempty
    lines (0 for docs with no nonempty lines). The Gopher-style repetition
    signal: boilerplate/template docs score high and get dropped."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double") / n.cast("double"),
            6,
        )
    )
