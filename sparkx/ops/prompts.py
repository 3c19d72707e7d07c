"""P11: extraction prompt build as derived columns.

The reference constructs agent prompts from the chunk's raw content plus a
retry suffix when the first pass came back low-confidence
(``src/agents/extraction.py:93-98`` text, ``:159-164`` table;
``RETRY_SUFFIX`` at ``src/agents/base.py:43``).  The prompt STRINGS are a
pure function of (chunk_type, raw_content, retried) — re-expressed here as
native column expressions so R3's retry contract is visible in output, not
just as a flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRY_SUFFIX = (
    "\n[RETRY] Low confidence. Be conservative; flag unknowns explicitly."
)  # base.py:43
TEXT_PREFIX = "PASSAGE:\n"  # extraction.py:96
TABLE_PREFIX = "TABLE:\n"  # extraction.py:162


def build_prompts(blocks: DataFrame) -> DataFrame:
    """User-message prompt per accepted text/table block.  Rows with
    ``retried`` carry the retry-attempt prompt (content + RETRY_SUFFIX,
    extraction.py:93); others the first-attempt prompt."""
    content = F.concat(
        F.col("raw_content"),
        F.when(F.col("retried"), F.lit(RETRY_SUFFIX)).otherwise(F.lit("")),
    )
    prompt = F.concat(
        F.when(F.col("chunk_type") == "text", F.lit(TEXT_PREFIX)).otherwise(
            F.lit(TABLE_PREFIX)
        ),
        content,
    )
    return blocks.filter(F.col("chunk_type").isin("text", "table")).select(
        "conv_id", "turn_idx", "chunk_type", "block_idx", prompt.alias("prompt")
    )
