"""Arrow-vectorized text normalization (SURVEY.md §2.2 P4).

Mirrors the reference's DocumentCleaner stage
(ETL/batch_ecs/source/pipeline.py:43) — strip extra whitespace / empty
lines — which runs row-at-a-time Python inside Haystack. Here it is a
scalar pandas_udf: Arrow batches in, vectorized pandas string ops, Arrow
batches out. Per BASELINE.json input_hint: no per-row Python.

Semantics (kept identical to datagen.normalize_text_py, the test oracle):
  1. Unicode NFC normalization
  2. zero-width-space removal
  3. collapse all whitespace runs (incl. NBSP, tabs, CRLF) to single spaces
  4. strip leading/trailing whitespace
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _normalize_series(s: pd.Series) -> pd.Series:
    # .str ops are vectorized over the whole Arrow batch; NFC via
    # Series.str.normalize (pandas → per-batch C-loop, no Python row loop
    # in user code; this is the reference-mirroring "Arrow-batched text
    # normalization" required by the north_star).
    out = s.str.normalize("NFC")
    out = out.str.replace("​", "", regex=False)
    # \s in Python regex with str.replace covers unicode whitespace
    # (NBSP etc.) because pandas uses re.UNICODE by default.
    out = out.str.replace(r"\s+", " ", regex=True)
    return out.str.strip()


# DataType object (not DDL string) so the UDF can be built without an
# active SparkSession at import time.
_normalize_udf = pandas_udf(_normalize_series, T.StringType())


def normalize_text(col: Column | str) -> Column:
    """Arrow-vectorized normalizer (the engine's ingest path uses this)."""
    return _normalize_udf(F.col(col) if isinstance(col, str) else col)


def normalize_text_sql(col: Column | str) -> Column:
    """Pure-SQL (JVM codegen) subset of the normalizer: whitespace collapse +
    trim, no NFC. Used where an exact DuckDB oracle twin is needed
    (__spark_entry__ parity queries) and in hot paths whose input is known
    ASCII — stays inside WholeStageCodegen, zero Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))
