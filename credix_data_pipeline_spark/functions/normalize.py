"""Vectorized text normalization (SURVEY §2.7 F7, §2.9).

The reference standardizes text columns with SQL ``UPPER(TRIM(x))``
(dbt/business_case/models/silver/cnpj_ws_clean.sql:27-29, contract kept in
models/silver/schema.yml:48-53) and does pandas/Arrow driver-side coercions
(credix_pipeline/utils/data_processing.py:19-42).  The engine generalizes this
to transcript text as an **Arrow-batched pandas UDF** (no per-row Python, per
the north rule): Unicode NFC + strip + whitespace-run collapse.

``normalize_text_py`` is the exact same function on a plain string — the test
oracle calls it so the UDF is pinned bit-for-bit (FIXTURES determinism rules).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

_WS_RUN = re.compile(r"\s+")


def normalize_text_py(s: str | None) -> str | None:
    if s is None:
        return None
    return _WS_RUN.sub(" ", unicodedata.normalize("NFC", s)).strip()


@pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    # Vectorized where pandas allows; NFC needs a per-value call but stays
    # inside the Arrow batch (no Python round-trip per row through Spark).
    out = s.map(lambda v: unicodedata.normalize("NFC", v) if v is not None else None)
    return out.str.replace(_WS_RUN, " ", regex=True).str.strip()


def with_normalized_text(df, col: str = "text"):
    """Apply the UDF if the column exists (delete events carry NULL text —
    the UDF is NULL-preserving either way)."""
    if col not in df.columns:
        return df
    return df.withColumn(col, normalize_text(F.col(col)))
