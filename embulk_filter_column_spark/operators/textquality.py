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


def annotate_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        *df.columns,
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        token_count(text_col).alias("n_tokens"),
        token_count(text_col, TOKEN_PATTERN).alias("n_bpe_tokens"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
