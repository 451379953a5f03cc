from .text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from .web import extract_text  # noqa: F401
