"""Code-aware tokenization.

Reference analog: the subword tokenizer applied in Arrow batches of 10k
(/root/reference/dense_retriever/transforms/preprocessing.py:19-28). The rebuild
replaces BERT subwords with a code-aware tokenizer (north_star): split on
non-alphanumerics, segment camelCase / snake_case identifiers, emit the segments
plus the whole compound identifier.

Two implementations with IDENTICAL semantics (golden-tested against each other):

- ``tokenize_code_expr``  — pure Catalyst column expression (regexp_replace +
  split + filter + transform). Stays inside whole-stage codegen, zero Python.
  This is the default hot path: at 100 TB nothing beats staying JVM-side.
- ``tokenize_code_pandas`` — Arrow-vectorized ``pandas_udf`` using pandas ``.str``
  ops (no per-row Python), kept as the extension seam for tokenizers that cannot
  be expressed as SQL (e.g. a real BPE) and to satisfy/benchmark the vectorized
  UDF path the north star names.

``tokenize_text_expr`` is the simple natural-text variant (lower + split) whose
semantics are reproducible in DuckDB SQL for the driver's oracle checks.
"""

from __future__ import annotations

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


@pandas_udf(ArrayType(StringType()))
def tokenize_code_pandas(content: pd.Series) -> pd.Series:
    """Arrow-vectorized pandas UDF with semantics identical to
    ``tokenize_code_expr`` (asserted by tests/test_tokenizer.py)."""
    content = content.fillna("")
    segments = _segment_series(content).map(lambda xs: [x for x in xs if x])
    idents = content.str.split(_IDENT_SPLIT, regex=True)
    compound_re = __import__("re").compile(_COMPOUND)
    compounds = idents.map(
        lambda xs: [x.lower() for x in xs if x and compound_re.search(x)]
    )
    return segments.combine(compounds, lambda a, b: a + b)
