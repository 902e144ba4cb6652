"""Arrow-vectorized pandas UDFs — the sanctioned slow path.

Policy (BASELINE.json input_hint: "vectorized pandas/Arrow UDFs, no
per-row Python"): every function here has a Catalyst-native twin in the
operator library; the pandas UDF exists for logic that outgrows SQL
expressions (real tokenizers, language models, codecs). Tests assert the
twin pairs agree, so swapping one for the other is always safe.

Row-at-a-time ``F.udf`` is banned in this codebase — a Series→Series
pandas UDF amortizes serialization over Arrow batches (~10-100x faster).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

from ..operators.text_analysis import TOKEN_RE


# return types passed as type objects (not DDL strings) so the module
# imports without an active SparkSession
@pandas_udf(T.LongType())
def token_count_vec(texts: pd.Series) -> pd.Series:
    """Vectorized twin of the Catalyst ``regexp_count`` token counter —
    the seam where a real BPE tokenizer (tiktoken etc.) would plug in."""
    return texts.str.count(TOKEN_RE).astype("int64")


@pandas_udf(T.StringType())
def normalize_text_vec(texts: pd.Series) -> pd.Series:
    """Vectorized text normalization (trim/upper/squash spaces) — twin of
    the reference's country/categorical string cleanse (STR-NORM,
    /root/reference/etl/transformation/cleanse.py:1-3)."""
    return (
        texts.str.strip().str.upper().str.replace(r"\s+", " ", regex=True)
    )


def normalize_text_catalyst(col) -> F.Column:
    """The Catalyst twin of normalize_text_vec (JVM-side, codegen)."""
    return F.regexp_replace(F.upper(F.trim(col)), r"\s+", " ")
