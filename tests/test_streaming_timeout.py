"""StreamingTimeout (streaming/timeout.py): A notFollowedBy B within T.

Ground truth: the whole-input anti-join (``batch_timeouts``) — the
DataFrame form of the SQL NOT EXISTS oracle. Checks:
1. handcrafted outcomes (cancelled / timed out / open until flush);
2. a match is emitted as soon as the watermark passes its deadline —
   not only at flush;
3. streaming over random micro-batch splits == batch, with replays;
4. a cancelling B that arrives LATE (below the watermark) is dropped
   and the A times out — the watermark contract, both engines agree;
5. recent-B state is trimmed to the (T + lateness) window.
"""

from __future__ import annotations

import datetime as dt
import random
import tempfile

from pyspark.sql import functions as F

from flink_tpcds_spark.streaming.timeout import (
    StreamingTimeout,
    batch_timeouts,
)

T0 = dt.datetime(2026, 1, 1)
DDL = "user_id long, event_id long, ts timestamp, event_type string"


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (uid, eid, T0 + dt.timedelta(minutes=m), et)
            for uid, eid, m, et in rows
        ],
        DDL,
    )


def _run(spark, batches, within_min=120, lateness_min=10, replay=False):
    work = tempfile.mkdtemp(prefix="st_timeout_")
    m = StreamingTimeout(
        work + "/state",
        "A",
        "B",
        dt.timedelta(minutes=within_min),
        dt.timedelta(minutes=lateness_min),
    )
    for i, rows in enumerate(batches):
        m.foreach_batch(_mk(spark, rows), i)
        if replay:
            m.foreach_batch(_mk(spark, rows), i)
    return m


def test_handcrafted_outcomes(spark):
    # key 1: A(e0)@0 cancelled by B@60; A(e2)@200 has B@340 > 120min
    #        after it -> timeout; key 2: A(e4)@0, no B ever -> timeout
    batches = [
        [(1, 0, 0, "A"), (1, 1, 60, "B"), (2, 4, 0, "A")],
        [(1, 2, 200, "A"), (1, 3, 340, "B"), (2, 5, 400, "view")],
        [(1, 6, 900, "click")],
    ]
    m = _run(spark, batches)
    m.flush(spark)
    got = sorted(
        (r.user_id, r.event_id) for r in m.matches(spark).collect()
    )
    assert got == [(1, 2), (2, 4)]
    assert m.late_dropped() == 0


def test_emitted_at_watermark_not_flush(spark):
    # A@0 with no B; a batch at minute 300 pushes the watermark to
    # 290 > deadline 120 -> the match must exist BEFORE flush
    m = _run(spark, [[(1, 0, 0, "A")], [(1, 1, 300, "view")]])
    assert [
        (r.user_id, r.event_id) for r in m.matches(spark).collect()
    ] == [(1, 0)]


def test_late_cancelling_b_is_dropped(spark):
    # the B that would cancel arrives after the watermark passed its
    # event time: dropped, so the A times out (both engines would
    # agree only because the late row never enters either side)
    batches = [
        [(1, 0, 0, "A")],
        [(1, 1, 500, "view")],  # wm -> 490
        [(1, 2, 30, "B")],  # late: 30 < 490
    ]
    m = _run(spark, batches)
    m.flush(spark)
    assert [r.event_id for r in m.matches(spark).collect()] == [0]
    assert m.late_dropped() == 1


def test_streaming_equals_batch_random_splits(spark):
    rnd = random.Random(77)
    rows = []
    eid = 0
    for uid in range(6):
        t = 0
        for _ in range(rnd.randint(5, 40)):
            t += rnd.randint(1, 180)
            rows.append(
                (uid, eid, t, rnd.choice(["A", "B", "view", "click"]))
            )
            eid += 1
    rows.sort(key=lambda r: r[2])
    for trial in range(3):
        rnd2 = random.Random(trial)
        cuts = sorted(
            rnd2.sample(range(1, len(rows)), rnd2.randint(1, 4))
        )
        batches, lo = [], 0
        for c in cuts + [len(rows)]:
            batches.append(rows[lo:c])
            lo = c
        m = _run(spark, batches, replay=(trial == 1))
        m.flush(spark)
        got = sorted(
            (r.user_id, r.event_id) for r in m.matches(spark).collect()
        )
        want = sorted(
            (r.user_id, r.event_id)
            for r in batch_timeouts(
                _mk(spark, rows), "A", "B", dt.timedelta(minutes=120)
            ).collect()
        )
        assert got == want, f"trial {trial}"
        assert m.late_dropped() == 0


def test_recent_b_state_is_trimmed(spark):
    # 50 B's spread over 10000 minutes: after the last batch the rb
    # side must only hold B's inside (wm - T, wm]
    batches = [
        [(1, i, i * 200, "B") for i in range(k * 10, k * 10 + 10)]
        for k in range(5)
    ]
    m = _run(spark, batches)
    counts = m.pending_counts(spark)
    # wm = 9800-10 = 9790; window T=120 -> only B's with ts > 9670
    assert counts.get("rb", 0) <= 2
    assert counts.get("pa", 0) == 0
