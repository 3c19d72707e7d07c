"""Event-time windowed aggregation with watermark: on-time aggregation,
within-watermark late rows counted, beyond-watermark late rows dropped,
append-once emission across incremental runs."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from sparkx.streaming import start_turn_window_stream

H = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write(tmp_path, name, rows):
    """rows: list of (conv_id, turn_idx, role, text, minutes-from-H)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        [
            (c, i, r, t, None, H + dt.timedelta(minutes=m))
            for c, i, r, t, m in rows
        ],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, str(tmp_path / "in" / name), coerce_timestamps="us",
                   allow_truncated_timestamps=True)


def test_event_window_watermark(spark, tmp_path):
    (tmp_path / "in").mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: hour-0 and hour-1 events; max ts = 1:30 → watermark 0:30 →
    # no window end (1:00, 2:00) is below it yet → nothing emitted
    _write(tmp_path, "a.parquet", [
        ("c1", 0, "user", "aaaa", 10),
        ("c1", 1, "assistant", "bbbbbb", 20),
        ("c2", 0, "user", "cc", 70),
        ("c2", 1, "user", "dd", 90),
    ])
    start_turn_window_stream(spark, str(tmp_path / "in"), out, ckpt,
                             window_seconds=3600, watermark="1 hour")
    import glob
    assert not glob.glob(f"{out}/windows/*.parquet") or \
        len(spark.read.parquet(f"{out}/windows").collect()) == 0

    # run 2: an hour-3 event advances the watermark to 2:00 → hour-0 and
    # hour-1 windows finalize and emit; a LATE hour-0 row arriving now is
    # older than the watermark state (0:30 from run 1)?? — no: watermark at
    # batch start is still 0:30, so a 0:15 user row is within the open
    # hour-0 window and must be counted before finalization
    _write(tmp_path, "b.parquet", [
        ("c3", 0, "user", "eee", 15),      # late but within watermark: counted
        ("c4", 0, "user", "ffff", 190),    # hour-3: advances watermark
    ])
    start_turn_window_stream(spark, str(tmp_path / "in"), out, ckpt,
                             window_seconds=3600, watermark="1 hour")
    got = spark.read.parquet(f"{out}/windows").toPandas()
    h0 = got[(got.window_start == H) & (got.role == "user")]
    assert len(h0) == 1 and int(h0.n_turns.iloc[0]) == 2  # on-time + late-but-ok
    h0a = got[(got.window_start == H) & (got.role == "assistant")]
    assert int(h0a.n_turns.iloc[0]) == 1
    h1 = got[(got.window_start == H + dt.timedelta(hours=1))]
    assert int(h1.n_turns.sum()) == 2

    # run 3: a TOO-LATE hour-0 row (watermark is now 2:00) is dropped — the
    # finalized window is never re-emitted or modified
    _write(tmp_path, "c.parquet", [
        ("c5", 0, "user", "gggg", 25),     # beyond watermark: dropped
        ("c6", 0, "user", "hh", 250),      # hour-4: keeps the stream moving
    ])
    start_turn_window_stream(spark, str(tmp_path / "in"), out, ckpt,
                             window_seconds=3600, watermark="1 hour")
    got3 = spark.read.parquet(f"{out}/windows").toPandas()
    h0_after = got3[(got3.window_start == H) & (got3.role == "user")]
    assert len(h0_after) == 1 and int(h0_after.n_turns.iloc[0]) == 2
