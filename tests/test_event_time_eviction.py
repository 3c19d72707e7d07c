"""Event-time (watermark-driven) state eviction: replay-DETERMINISTIC.

With timeout_mode="event" a group is evicted when its newest event falls
idle_timeout_ms behind the stream's watermark — a property of the DATA, not
of wall-clock pacing.  The tests run the same input sequence twice, once
with an artificial inter-run sleep far exceeding the timeout, and assert the
eviction sets are identical (with processing-time eviction that sleep flips
the outcome — exactly the nondeterminism VERDICT r3 flagged)."""

from __future__ import annotations

import time

import pandas as pd

from sparkx.streaming import start_conv_progress_stream
from sparkx.streaming_dedup import start_dedup_stream
from sparkx.synth import synth_pandas, write_transcripts_parquet

TIMEOUT_MS = 3_600_000  # 1 event-time hour


def _write(tmp_path, name, seed, suffix, day):
    """Transcript file whose convs are pinned to one event-time day."""
    pdf = synth_pandas(n_convs=3, turns_per_conv=3, seed=seed)
    pdf["conv_id"] = pdf["conv_id"] + suffix
    pdf["ts"] = pd.Timestamp(f"2026-01-{day:02d}") + pd.to_timedelta(
        pdf["turn_idx"] * 7, unit="s"
    )
    write_transcripts_parquet(pdf, str(tmp_path / "in" / name))
    return pdf


def _drive(spark, tmp_path, label, sleep_between, op):
    """Two catch-up runs over (day-1 convs, then day-10 convs); return the
    evicted key set.  Day 10 advances the watermark ~9 days past day 1's
    events — far beyond the 1 h timeout — so day-1 state must evict in run
    2 regardless of wall-clock pacing."""
    (tmp_path / "in").mkdir(parents=True, exist_ok=True)
    out = str(tmp_path / f"out_{label}")
    ckpt = str(tmp_path / f"ckpt_{label}")

    _write(tmp_path, f"{label}_a.parquet", seed=5, suffix=f"_{label}_a", day=1)
    kw = dict(idle_timeout_ms=TIMEOUT_MS, timeout_mode="event")
    op(spark, str(tmp_path / "in"), out, ckpt, **kw).awaitTermination(120)
    if sleep_between:
        time.sleep(sleep_between)
    _write(tmp_path, f"{label}_b.parquet", seed=6, suffix=f"_{label}_b", day=10)
    op(spark, str(tmp_path / "in"), out, ckpt, **kw).awaitTermination(120)

    got = spark.read.parquet(f"{out}/batches").toPandas()
    return got


def test_conv_progress_event_eviction_is_replay_deterministic(spark, tmp_path):
    fast = _drive(spark, tmp_path / "fast", "f", 0, start_conv_progress_stream)
    slow = _drive(spark, tmp_path / "slow", "s", 3.0, start_conv_progress_stream)

    def keyset(got, flag):
        # strip the per-run label suffix so the two runs compare
        s = got[got.evicted == flag].conv_id
        return set(s.str.replace(r"_[fs]_", "_", regex=True))

    # day-1 convs evicted in both runs; day-10 convs in neither — the
    # watermark never passes their deadline
    assert keyset(fast, True) == keyset(slow, True)
    assert keyset(fast, True) == {f"conv_{i:06d}_a" for i in range(3)}
    assert not any("_b" in c for c in keyset(fast, True))
    # eviction rows carry final totals identically across pacings
    ev_f = fast[fast.evicted].assign(
        conv_id=lambda d: d.conv_id.str.replace("_f_", "_")
    ).set_index("conv_id")[["n_turns", "n_chars"]].sort_index()
    ev_s = slow[slow.evicted].assign(
        conv_id=lambda d: d.conv_id.str.replace("_s_", "_")
    ).set_index("conv_id")[["n_turns", "n_chars"]].sort_index()
    assert ev_f.equals(ev_s)


def test_dedup_stream_event_eviction_is_replay_deterministic(spark, tmp_path):
    fast = _drive(spark, tmp_path / "fast", "f", 0, start_dedup_stream)
    slow = _drive(spark, tmp_path / "slow", "s", 3.0, start_dedup_stream)

    # the dedup key is a content fingerprint; identical input text across
    # the paced/unpaced runs gives identical fp sets (conv suffix does not
    # enter the fingerprint), so compare fp sets directly
    assert set(fast[fast.evicted].fp) == set(slow[slow.evicted].fp)
    assert len(set(fast[fast.evicted].fp)) > 0
    # no day-10 fingerprint is evicted (watermark never passes it): every
    # evicted fp's canonical chunk came from a day-1 conv
    a_chunks = set(fast[(~fast.evicted) & fast.conv_id.str.contains("_a")].chunk_id)
    assert set(fast[fast.evicted].chunk_id) <= a_chunks
