"""Stream-stream interval join (view→purchase attribution): in-horizon
pairs emit exactly once, cross-micro-batch state matches, out-of-horizon
pairs never emit, beyond-watermark late rows are dropped, and a closed
input equals the batch interval join row-for-row.
"""

from __future__ import annotations

import datetime as dt
import glob

import pandas as pd

from sparkx.streaming import start_attribution_stream

H = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write(tmp_path, name, rows):
    """rows: list of (event_id, user_id, event_type, value, minutes-from-H)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        [
            (e, H + dt.timedelta(minutes=m), u, t, v, None)
            for e, u, t, v, m in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "in" / name),
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )


def _pairs(spark, out):
    if not glob.glob(f"{out}/pairs/*.parquet"):
        return set()
    return {
        (r["user_id"], r["view_id"], r["purchase_id"], r["lag_sec"])
        for r in spark.read.parquet(f"{out}/pairs")
        .dropDuplicates(["view_id", "purchase_id"]).collect()
    }


def test_interval_join_incremental_and_late_drop(spark, tmp_path):
    (tmp_path / "in").mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # run 1: two views buffer; u1's purchase 20 min later matches in-batch.
    # u9's purchase has no view at all → never emits.
    _write(tmp_path, "a.parquet", [
        (1, 1, "view", 0.0, 10),
        (2, 2, "view", 0.0, 20),
        (3, 1, "purchase", 5.0, 30),
        (4, 9, "purchase", 7.0, 25),
    ])
    start_attribution_stream(spark, str(tmp_path / "in"), out, ckpt)
    assert _pairs(spark, out) == {(1, 1, 3, 1200)}

    # run 2: u2's purchase arrives in a LATER micro-batch — the buffered
    # view must still match (cross-batch state join).  The u3 events at
    # the 3h mark advance BOTH sides' watermarks: the global watermark is
    # min(view_wm, purchase_wm), so a side that stops receiving events
    # pins it forever — the eviction demo needs both to move.  The
    # watermark change also makes availableNow run a follow-up batch,
    # which is where eviction executes (it uses the batch-start watermark,
    # one batch behind the event that advanced it).
    _write(tmp_path, "b.parquet", [
        (5, 2, "purchase", 3.0, 50),
        (9, 3, "view", 0.0, 180),
        (10, 3, "purchase", 1.0, 185),
    ])
    start_attribution_stream(spark, str(tmp_path / "in"), out, ckpt)
    assert _pairs(spark, out) == {
        (1, 1, 3, 1200), (2, 2, 5, 1800), (3, 9, 10, 300),
    }

    # run 3: a purchase 40 min in — within u1's view horizon but far
    # behind the 2:00 watermark, and the view's state was evicted by run
    # 2's follow-up batch → nothing new emits
    _write(tmp_path, "c.parquet", [(7, 1, "purchase", 9.0, 40)])
    start_attribution_stream(spark, str(tmp_path / "in"), out, ckpt)
    assert _pairs(spark, out) == {
        (1, 1, 3, 1200), (2, 2, 5, 1800), (3, 9, 10, 300),
    }


def test_interval_join_closed_input_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    (tmp_path / "in").mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rows = []
    eid = 0
    for u in range(6):
        for m in (5, 25, 65, 95):
            rows.append((eid, u, "view", 0.0, m + u)); eid += 1
        for m in (15, 70, 130):
            rows.append((eid, u, "purchase", float(u) + 0.5, m + 2 * u))
            eid += 1
    _write(tmp_path, "all.parquet", rows)
    start_attribution_stream(spark, str(tmp_path / "in"), out, ckpt,
                             horizon_seconds=1800, watermark="10 hours")
    got = _pairs(spark, out)

    from sparkx.schemas import EVENTS

    # read with the declared schema — schema inference yields TIMESTAMP_NTZ
    # for pyarrow-written files, which cannot cast to long
    ev = spark.read.schema(EVENTS).parquet(str(tmp_path / "in"))
    v = ev.where("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("v_ts"))
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    want = {
        (r["user_id"], r["view_id"], r["purchase_id"], r["lag_sec"])
        for r in v.join(
            p,
            F.expr("user_id = p_user AND p_ts >= v_ts "
                   "AND p_ts <= v_ts + interval 1800 seconds"),
        ).select(
            "user_id", "view_id", "purchase_id",
            (F.col("p_ts").cast("long") - F.col("v_ts").cast("long"))
            .alias("lag_sec"),
        ).collect()
    }
    assert got == want and len(want) > 10


def test_left_outer_emits_unmatched_view_after_watermark(spark, tmp_path):
    (tmp_path / "in").mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # run 1: u1's view matches in-batch; u5's view has no purchase.  The
    # null-attributed row must NOT appear yet — the watermark has not
    # proven a match impossible.
    _write(tmp_path, "a.parquet", [
        (1, 1, "view", 0.0, 10),
        (2, 5, "view", 0.0, 15),
        (3, 1, "purchase", 5.0, 30),
    ])
    start_attribution_stream(spark, str(tmp_path / "in"), out, ckpt,
                             join_type="left_outer")
    assert _pairs(spark, out) == {(1, 1, 3, 1200)}

    # run 2: u3's pair at the 3h mark advances BOTH watermarks to 2:00;
    # the follow-up batch then proves u5's view (horizon closed 1:15)
    # unmatched and emits it ONCE with null purchase columns.  u1's view
    # matched, so no null row for it.
    _write(tmp_path, "b.parquet", [
        (9, 3, "view", 0.0, 180),
        (10, 3, "purchase", 1.0, 185),
    ])
    start_attribution_stream(spark, str(tmp_path / "in"), out, ckpt,
                             join_type="left_outer")
    assert _pairs(spark, out) == {
        (1, 1, 3, 1200), (3, 9, 10, 300), (5, 2, None, None),
    }
