"""Streaming first-seen-wins dedup: state carries the seen-fingerprint set
across micro-batches and restarts; eviction bounds the store."""

from __future__ import annotations

import pandas as pd

from sparkx.streaming_dedup import start_dedup_stream
from sparkx.synth import synth_pandas, write_transcripts_parquet

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
]


def _write(tmp_path, name, seed, texts, suffix=""):
    pdf = synth_pandas(n_convs=3, turns_per_conv=3, seed=seed)
    pdf["conv_id"] = pdf["conv_id"] + suffix
    pdf["text"] = [texts[i % len(texts)] for i in range(len(pdf))]
    write_transcripts_parquet(pdf, str(tmp_path / "in" / name))
    return pdf


def test_stream_dedup_first_seen_wins_across_restarts(spark, tmp_path):
    (tmp_path / "in").mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: 9 rows over 3 distinct texts → 3 canonicals
    p1 = _write(tmp_path, "a.parquet", seed=5, texts=TEXTS)
    q = start_dedup_stream(spark, str(tmp_path / "in"), out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(f"{out}/batches").toPandas()
    live1 = got1[~got1.evicted]
    assert sorted(live1.fp.unique()) == sorted(live1.fp)  # one row per fp
    assert len(live1) == len(set(TEXTS))
    # n_dups on the canonical row counts the batch's other copies
    assert int(live1.n_dups.sum()) == len(p1) - len(set(TEXTS))

    # run 2 (same checkpoint): two known texts + one new → exactly one new
    # canonical; known fingerprints emit nothing
    new_text = "how vexingly quick daft zebras jump"
    _write(
        tmp_path, "b.parquet", seed=6, texts=[TEXTS[0], TEXTS[1], new_text],
        suffix="_r2",
    )
    q2 = start_dedup_stream(spark, str(tmp_path / "in"), out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(f"{out}/batches").toPandas()
    live2 = got2[~got2.evicted]
    assert len(live2) == len(set(TEXTS)) + 1
    added = set(live2.fp) - set(live1.fp)
    assert len(added) == 1
    # the new canonical is the minimum chunk_id among its batch copies
    new_rows = live2[live2.fp.isin(added)]
    assert new_rows.iloc[0].text == new_text


def test_stream_dedup_evicts_and_rekeys(spark, tmp_path):
    import time

    (tmp_path / "in").mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    timeout_ms = 500

    _write(tmp_path, "a.parquet", seed=5, texts=TEXTS)
    q = start_dedup_stream(
        spark, str(tmp_path / "in"), out, ckpt, idle_timeout_ms=timeout_ms
    )
    q.awaitTermination(120)

    # idle past the timeout; the next run's batches fire the due timers
    time.sleep(2.0)
    _write(tmp_path, "b.parquet", seed=6, texts=["unrelated fresh content"],
           suffix="_r2")
    q2 = start_dedup_stream(
        spark, str(tmp_path / "in"), out, ckpt, idle_timeout_ms=timeout_ms
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(f"{out}/batches").toPandas()
    evicted = got[got.evicted]
    # all three run-1 fingerprints evicted with their dup counts; text NULL
    run1_fps = set(got[~got.evicted][got[~got.evicted].text.isin(TEXTS)].fp)
    assert run1_fps <= set(evicted.fp)
    assert evicted.text.isna().all()
    ev = evicted[evicted.fp.isin(run1_fps)]
    assert int(ev.n_dups.sum()) >= 9 - len(set(TEXTS))

    # a re-arrival AFTER eviction is new again (windowed-dedup contract)
    time.sleep(2.0)
    _write(tmp_path, "c.parquet", seed=7, texts=[TEXTS[0]], suffix="_r3")
    q3 = start_dedup_stream(
        spark, str(tmp_path / "in"), out, ckpt, idle_timeout_ms=timeout_ms
    )
    q3.awaitTermination(120)
    got3 = spark.read.parquet(f"{out}/batches").toPandas()
    re_keyed = got3[(~got3.evicted) & (got3.text == TEXTS[0])]
    assert len(re_keyed) == 2  # once per residency segment
