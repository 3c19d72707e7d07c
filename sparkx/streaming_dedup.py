"""Streaming exact dedup: first-seen-wins across micro-batches.

The batch engine dedups with one groupBy (`sparkx.ops.dedup.exact_dedup`);
an INCREMENTAL ingest cannot — each micro-batch only sees its own slice, so
"have I seen this fingerprint before?" is state.  This operator keeps the
seen-fingerprint set in Spark's streaming state store
(applyInPandasWithState keyed by content fingerprint) and emits exactly the
rows whose fingerprint is NEW — the streaming twin of the corpus funnel's
``is_canonical`` gate, usable in front of any downstream sink.

Semantics (mirrors the batch funnel's deterministic pick):

* within one micro-batch, the minimum ``chunk_id`` per fingerprint wins
  (same rule as ``corpus_flags``: chunk_id is a deterministic content/
  coordinate hash, so re-runs pick identical canonicals);
* across batches, first-seen wins — later arrivals of a known fingerprint
  are dropped;
* state per fingerprint is one (chunk_id, n_dups) pair, NOT the row — the
  store grows with distinct content, never with payload size;
* ``idle_timeout_ms`` bounds the store on unbounded streams: a fingerprint
  not re-seen within the timeout is evicted (its dup count emitted on a
  side row with ``evicted=True`` for the metrics sink).  After eviction a
  re-arrival is treated as new — the standard windowed-dedup trade
  (exactly-once dedup over an UNBOUNDED key space needs unbounded state;
  the timeout makes the window explicit instead of the store unbounded).

The fingerprint is ``sparkx.ops.textstats.fingerprint`` (md5 of normalized
text) computed as a narrow map BEFORE the stateful operator, so the state
key is 32 hex chars regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkx.ops.textstats import fingerprint
from sparkx.streaming import run_catchup, stream_transcripts

DEDUP_STATE_SCHEMA = "first_chunk_id string, n_dups long"
DEDUP_OUT_SCHEMA = (
    "fp string, chunk_id string, conv_id string, turn_idx integer, "
    "text string, n_dups long, evicted boolean"
)


def _dedup_fn(timeout_ms, timeout_mode, key, pdfs, state):
    """Keep the first-seen chunk_id per fingerprint; drop the rest.

    Emits one row per NEW fingerprint (the canonical row, ``evicted=False``)
    and, on state eviction, one metrics row (``evicted=True``, text NULL)
    carrying the duplicate count observed during the fingerprint's
    residency."""
    import pandas as pd

    if state.hasTimedOut:
        first_chunk_id, n_dups = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "fp": [key[0]],
                "chunk_id": [first_chunk_id],
                "conv_id": [None],
                "turn_idx": [None],
                "text": [None],
                "n_dups": [n_dups],
                "evicted": [True],
            }
        )
        return

    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("chunk_id", kind="mergesort")  # deterministic pick
    if state.exists:
        first_chunk_id, n_dups = state.get
        n_dups += len(batch)
        state.update((first_chunk_id, n_dups))
        out = batch.iloc[0:0]  # known fingerprint: emit nothing
    else:
        n_dups = len(batch) - 1
        first = batch.iloc[0]
        state.update((first.chunk_id, n_dups))
        out = batch.iloc[[0]]
    from sparkx.streaming import _set_state_timeout

    max_ts = batch["ts"].max() if timeout_mode == "event" and len(batch) else None
    _set_state_timeout(state, timeout_ms, timeout_mode, max_ts)
    if len(out):
        yield pd.DataFrame(
            {
                "fp": [key[0]],
                "chunk_id": [out.iloc[0].chunk_id],
                "conv_id": [out.iloc[0].conv_id],
                "turn_idx": [int(out.iloc[0].turn_idx)],
                "text": [out.iloc[0].text],
                "n_dups": [int(n_dups)],
                "evicted": [False],
            }
        )


def start_dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    idle_timeout_ms: int | None = 60_000,
    timeout_mode: str = "processing",
    watermark_delay: str = "0 seconds",
):
    """First-seen-wins dedup over the transcript stream, keyed by the
    normalized-content fingerprint.  Same synchronous catch-up contract as
    ``sparkx.streaming.start_conv_progress_stream`` (progress-watching stop;
    timers due between runs fire on the next run's first batches), and the
    same ``timeout_mode`` choice: ``"event"`` makes the dedup WINDOW
    event-time-defined — a fingerprint is forgotten when its newest
    occurrence falls ``idle_timeout_ms`` behind the watermark — so a
    checkpoint replay at any speed forgets the identical fingerprint set
    (processing-time eviction depends on wall-clock pacing)."""
    import functools

    from sparkx.streaming import _timeout_conf

    transcripts = stream_transcripts(spark, in_dir)
    rows = transcripts.select(
        fingerprint("text").alias("fp"),
        # chunk_id: deterministic coordinate hash, the same pick rule the
        # batch funnel uses (min chunk_id per fingerprint)
        F.md5(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"))).alias(
            "chunk_id"
        ),
        "conv_id",
        "turn_idx",
        "text",
        "ts",
    )
    if timeout_mode == "event" and idle_timeout_ms is not None:
        rows = rows.withWatermark("ts", watermark_delay)
    deduped = rows.groupBy("fp").applyInPandasWithState(
        functools.partial(_dedup_fn, idle_timeout_ms, timeout_mode),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_timeout_conf(idle_timeout_ms, timeout_mode),
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_dir}/batches"
        )

    writer = (
        deduped.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if not available_now:
        return writer.start()
    return run_catchup(writer)
