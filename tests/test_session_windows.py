"""Event-time session windows: dynamic gap-close windows, cross-run session
MERGE, append-once finalization when the watermark passes session end."""

from __future__ import annotations

import datetime as dt
import glob

import pandas as pd

from sparkx.streaming import start_session_window_stream

H = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write(tmp_path, name, rows):
    """rows: list of (event_id, user_id, minutes-from-H, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        [
            (e, H + dt.timedelta(minutes=m), u, "click", v, "{}")
            for e, u, m, v in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, str(tmp_path / "in" / name),
                   coerce_timestamps="us", allow_truncated_timestamps=True)


def test_session_window_merge_and_finalize(spark, tmp_path):
    (tmp_path / "in").mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: user 1 has an open session (events at 0', 10'), user 2 one
    # event at 5'.  Watermark = 10' - 1h < epoch → nothing finalizes.
    _write(tmp_path, "a.parquet", [
        (0, 1, 0, 1.0),
        (1, 1, 10, 2.5),
        (2, 2, 5, 4.0),
    ])
    start_session_window_stream(spark, str(tmp_path / "in"), out, ckpt,
                                gap_seconds=1800, watermark="1 hour")
    assert not glob.glob(f"{out}/sessions/*.parquet") or \
        len(spark.read.parquet(f"{out}/sessions").collect()) == 0

    # run 2: user 1's event at 25' lands INSIDE the open session's gap
    # horizon (15' after the last event < 30' gap) and must MERGE into the
    # session state from run 1; user 9 at 300' advances the watermark to
    # 240', past both sessions' ends → they finalize and emit exactly once.
    _write(tmp_path, "b.parquet", [
        (3, 1, 25, 0.5),
        (4, 9, 300, 9.0),
    ])
    start_session_window_stream(spark, str(tmp_path / "in"), out, ckpt,
                                gap_seconds=1800, watermark="1 hour")

    got = {
        (r["user_id"]): (
            r["session_start"], r["session_end"], r["n_events"],
            r["total_value_e4"],
        )
        for r in spark.read.parquet(f"{out}/sessions").collect()
    }
    gap = dt.timedelta(seconds=1800)
    # user 1: ONE merged session spanning all three events (not two rows —
    # the cross-batch merge is the point); end = last event + gap
    assert got[1] == (H, H + dt.timedelta(minutes=25) + gap, 3, 40000)
    assert got[2] == (
        H + dt.timedelta(minutes=5),
        H + dt.timedelta(minutes=5) + gap, 1, 40000,
    )
    # user 9's session is still open (nothing past it): not emitted
    assert 9 not in got
    assert len(got) == 2

    # run 3 with no new input: append-once — nothing re-emits
    start_session_window_stream(spark, str(tmp_path / "in"), out, ckpt,
                                gap_seconds=1800, watermark="1 hour")
    assert len(spark.read.parquet(f"{out}/sessions").collect()) == 2
