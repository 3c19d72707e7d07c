"""Sinks (SURVEY S5/S6): chunks-JSON export and idempotent upsert.

* :func:`serialized_chunks` / :func:`save_chunks_json` — the reference's
  chunks-JSON sink (``src/utils/serialization.py:20-68``): ``structured_text``
  truncated to 500 chars + ``"..."`` **only when longer than 500** (line 37),
  corrected text truncated the same way, validation flattened.
* :func:`upsert_extracted` — the vector-store upsert analog
  (``src/core/store.py:45-77``): deterministic ``chunk_id`` makes the write
  idempotent; re-ingesting the same conversations replaces rather than
  duplicates (dynamic partition overwrite on ``conv_bucket``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SERIALIZED_TRUNC = 500  # serialization.py:37


def _trunc_500(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > SERIALIZED_TRUNC,
        F.concat(F.substring(c, 1, SERIALIZED_TRUNC), F.lit("...")),
    ).otherwise(c)


def serialized_chunks(extracted: DataFrame) -> DataFrame:
    """Row-shape of serialize_chunk (serialization.py:33-51), flattened."""
    return extracted.select(
        "chunk_id",
        "chunk_type",
        F.col("turn_idx").alias("page_num"),  # graft mapping: page_num → turn_idx
        F.col("conv_id").alias("source_file"),
        _trunc_500("structured_text").alias("structured_text"),
        "intuition_summary",
        "key_concepts",
        "confidence",
        "agent_notes",
        F.struct(
            F.col("verdict_score"),
            F.col("issues"),
            F.when(F.col("was_corrected"), _trunc_500("structured_text")).alias(
                "corrected_text"
            ),
        ).alias("validation"),
    )


def save_chunks_json(extracted: DataFrame, out_dir: str) -> None:
    """JSON-lines export of the serialized shape.  ``coalesce(1)`` mirrors the
    reference's single-file output for small exports; large exports should
    drop the coalesce (documented scale knob)."""
    serialized_chunks(extracted).coalesce(1).write.mode("overwrite").json(out_dir)


def save_answers_json(answers: DataFrame, out_dir: str) -> None:
    """S7: JSON-lines export of the answer shape (serialization.py:71-108),
    reasoning traces already truncated by serialized_answer.  Same
    ``coalesce(1)`` small-export knob as save_chunks_json."""
    from sparkx.ops.answers import serialized_answer

    serialized_answer(answers).coalesce(1).write.mode("overwrite").json(out_dir)


def upsert_extracted(extracted: DataFrame, table_path: str, sink=None) -> None:
    """Idempotent append-or-replace by conv_bucket partition (store.py:45-77
    upsert semantics under deterministic ids).  ``sink`` is the storage seam
    (sparkx.table_sink.TableSink): the default ParquetDirSink gives dynamic
    partition overwrite on a path; pass IcebergTableSink on a cluster with
    the Iceberg runtime to make the same call a catalog-table snapshot
    commit."""
    from sparkx.table_sink import DEFAULT_SINK

    (sink or DEFAULT_SINK).overwrite_partitions(
        extracted, table_path, ["conv_bucket"]
    )
