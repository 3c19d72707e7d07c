"""Scalar/text column functions."""

from sparkx.ops.textstats import (  # noqa: F401
    fingerprint,
    lang_id,
    normalized,
    punct_ratio,
    quality_score,
    stopword_ratio,
    text_profile,
    token_count,
    with_shingles,
)
