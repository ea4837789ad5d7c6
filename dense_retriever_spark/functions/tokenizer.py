"""Code-aware tokenization.

Reference analog: the subword tokenizer applied in Arrow batches of 10k
(/root/reference/dense_retriever/transforms/preprocessing.py:19-28). The rebuild
replaces BERT subwords with a code-aware tokenizer (north_star): split on
non-alphanumerics, segment camelCase / snake_case identifiers, emit the segments
plus the whole compound identifier.

Two implementations with IDENTICAL semantics (golden-tested against each other):

- ``tokenize_code_pandas`` — Arrow-vectorized ``pandas_udf`` using pandas
  ``.str`` ops (no per-row Python). **This is the default hot path**: measured
  5x faster than the expression variant (2.8s vs 15.5s over 40k docs /
  11M tokens on local[8]) — the 5-pass Java-regex expression chain (2x
  regexp_replace + 2x split + per-element rlike) loses to two vectorized RE2
  passes over Arrow batches. Matches the north star's "vectorized Arrow UDF
  tokenizer" requirement.
- ``tokenize_code_expr``  — pure Catalyst column expression, zero Python.
  Kept for SQL-parity oracles, golden tests, and environments where Python
  workers are unavailable.

``tokenize_text_expr`` is the simple natural-text variant (lower + split) whose
semantics are reproducible in DuckDB SQL for the driver's oracle checks.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# --- simple text tokenizer (oracle-parity path) -------------------------------

#: DuckDB equivalent of tokenize_text_expr, parameterized by column expression.
TOKENIZE_TEXT_DUCKDB_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
)


def tokenize_text_expr(col: Column | str) -> Column:
    """lower → split on non-alphanumeric runs → drop empties. JVM-side only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")


# --- code-aware tokenizer -----------------------------------------------------

# camel boundaries: aB -> a B ; ABCd -> AB Cd (acronym followed by capitalized word)
_CAMEL_1 = ("([a-z0-9])([A-Z])", r"$1 $2")
_CAMEL_2 = ("([A-Z]+)([A-Z][a-z])", r"$1 $2")
# identifiers: runs of word chars (incl. underscore)
_IDENT_SPLIT = "[^A-Za-z0-9_]+"
# a compound identifier: contains an underscore or an internal case boundary
# (lower/digit->upper like helloWorld/Box2D, or acronym->word like HTTPServer)
_COMPOUND = "(_|[a-z0-9][A-Z]|[A-Z]{2,}[a-z])"


def tokenize_code_expr(col: Column | str) -> Column:
    """Code-aware tokenizer as a pure Catalyst expression.

    Emits, in order: (1) lowercased segments of every identifier after camelCase
    and snake_case splitting; then (2) the lowercased whole identifier for each
    compound identifier (one containing '_' or a case boundary), underscores
    preserved. Example: ``getHTTPResponse snake_case`` ->
    ``[get, http, response, snake, case, gethttpresponse, snake_case]``.
    """
    c = F.col(col) if isinstance(col, str) else col
    seg_text = F.regexp_replace(
        F.regexp_replace(c, _CAMEL_2[0], _CAMEL_2[1]), _CAMEL_1[0], _CAMEL_1[1]
    )
    segments = F.filter(F.split(F.lower(seg_text), "[^a-z0-9]+"), lambda x: x != "")
    idents = F.filter(F.split(c, _IDENT_SPLIT), lambda x: x != "")
    compound = F.transform(
        F.filter(idents, lambda x: x.rlike(_COMPOUND)), lambda x: F.lower(x)
    )
    return F.concat(segments, compound)


def _segment_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas mirror of the segment half of tokenize_code_expr."""
    seg = s.str.replace(_CAMEL_2[0], r"\1 \2", regex=True)
    seg = seg.str.replace(_CAMEL_1[0], r"\1 \2", regex=True)
    return seg.str.lower().str.split("[^a-z0-9]+", regex=True)


_COMPOUND_RE = re.compile(_COMPOUND)


def tokenize_code_series(content: pd.Series) -> pd.Series:
    """Vectorized pandas implementation — shared by the pandas_udf wrapper and
    by index-build UDF bodies that tokenize inside their own Arrow batch."""
    content = content.fillna("")
    segments = _segment_series(content).map(lambda xs: [x for x in xs if x])
    idents = content.str.split(_IDENT_SPLIT, regex=True)
    compounds = idents.map(
        lambda xs: [x.lower() for x in xs if x and _COMPOUND_RE.search(x)]
    )
    return segments.combine(compounds, lambda a, b: a + b)


@pandas_udf(ArrayType(StringType()))
def tokenize_code_pandas(content: pd.Series) -> pd.Series:
    """Arrow-vectorized pandas UDF with semantics identical to
    ``tokenize_code_expr`` (asserted by tests/test_tokenizer.py)."""
    return tokenize_code_series(content)


def _pos_within_runs(parent):
    """Position of each element within its run of equal ``parent`` values
    (parent must be sorted ascending — list_parent_indices order)."""
    import numpy as np

    n = parent.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    new_run = np.r_[True, parent[1:] != parent[:-1]]
    starts = np.flatnonzero(new_run)
    run_ids = np.cumsum(new_run) - 1
    return np.arange(n, dtype=np.int64) - starts[run_ids]


def tokenize_code_flat(content: pd.Series, with_positions: bool = False):
    """Flat tokenization on pure Arrow compute kernels (RE2, C++; measured
    ~3.4x tokenize_code_series and far less allocator/memory-bus traffic —
    no per-token Python strings exist at any point).

    ``with_positions=True`` additionally returns ``pos`` — each token's
    index in the doc's CANONICAL token order (the tokenize_code_series
    order: every segment in text order, then every compound identifier in
    text order), aligned with ``doc_idx``/``codes``. This is the order
    positional postings store for phrase search (index/phrase.py); on text
    with no compound identifiers it reduces to plain textual token order,
    which is what the DuckDB oracle reproduces.

    Returns ``(doc_idx, codes, uniques, dl)`` (+ ``pos`` when requested):
      doc_idx — int64 position of each token's document within ``content``
      codes   — int32 dictionary code per token
      uniques — np.ndarray of the dictionary strings (code -> term)
      dl      — int64 per-document token count, aligned with ``content``

    Token MULTISET per doc is identical to tokenize_code_series (asserted in
    tests); within-doc ORDER differs (segments stream then compounds stream),
    which is irrelevant for tf/dl/postings.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(content.fillna(""))
    s = pc.replace_substring_regex(arr, pattern=_CAMEL_2[0], replacement=r"\1 \2")
    s = pc.replace_substring_regex(s, pattern=_CAMEL_1[0], replacement=r"\1 \2")
    s = pc.utf8_lower(s)
    segs = pc.split_pattern_regex(s, pattern="[^a-z0-9]+")
    seg_flat = pc.list_flatten(segs)
    seg_parent = pc.list_parent_indices(segs)
    m = pc.not_equal(seg_flat, "")
    seg_flat = pc.filter(seg_flat, m)
    seg_parent = pc.filter(seg_parent, m)

    idents = pc.split_pattern_regex(arr, pattern=_IDENT_SPLIT)
    id_flat = pc.list_flatten(idents)
    id_parent = pc.list_parent_indices(idents)
    m2 = pc.and_(
        pc.not_equal(id_flat, ""), pc.match_substring_regex(id_flat, _COMPOUND)
    )
    comp_flat = pc.utf8_lower(pc.filter(id_flat, m2))
    comp_parent = pc.filter(id_parent, m2)

    all_tokens = pa.concat_arrays(
        [pa.array(seg_flat) if isinstance(seg_flat, pa.ChunkedArray) else seg_flat,
         comp_flat]
    )
    doc_idx = np.concatenate(
        [np.asarray(seg_parent, dtype=np.int64),
         np.asarray(comp_parent, dtype=np.int64)]
    )
    de = pc.dictionary_encode(all_tokens)
    codes = np.asarray(de.indices, dtype=np.int32)
    uniques = np.asarray(de.dictionary)
    dl = np.bincount(doc_idx, minlength=len(content)).astype(np.int64)
    if not with_positions:
        return doc_idx, codes, uniques, dl
    segp = np.asarray(seg_parent, dtype=np.int64)
    compp = np.asarray(comp_parent, dtype=np.int64)
    n_seg_per_doc = np.bincount(segp, minlength=len(content)).astype(np.int64)
    pos = np.concatenate(
        [
            _pos_within_runs(segp),
            n_seg_per_doc[compp] + _pos_within_runs(compp),
        ]
    )
    return doc_idx, codes, uniques, dl, pos
