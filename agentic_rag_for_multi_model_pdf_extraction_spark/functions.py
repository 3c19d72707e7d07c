"""Scalar/text column functions."""

from sparkx.ops.textstats import (  # noqa: F401
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    line_repetition_ratio,
    normalized,
    punct_ratio,
    quality_score,
    scrub_pii,
    stopword_ratio,
    text_profile,
    token_count,
    winnow_fingerprints,
    with_shingles,
)
