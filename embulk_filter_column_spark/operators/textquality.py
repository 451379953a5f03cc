"""Text-analysis annotation operator: one select appending language id,
quality score, token counts, and fingerprint — all codegen'd native
expressions (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.text import (
    TOKEN_PATTERN,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from .dedup import _widen


def annotate_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    # the annotation projection is regex/HOF-heavy; a narrow input (a
    # benchmark table arriving as 1-2 parquet splits) would evaluate it
    # single-threaded — _widen is a no-op once the scan has >= cores
    # splits, i.e. at any real corpus size
    return _widen(df).select(
        *df.columns,
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        token_count(text_col).alias("n_tokens"),
        token_count(text_col, TOKEN_PATTERN).alias("n_bpe_tokens"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
