"""StreamingCountWindows: per-key tumbling count-N windows.

Ground truth: the batch row_number assignment (window k = rows
[kN,(k+1)N) in (ts,event_id) order; only full windows fire)."""

from __future__ import annotations

import datetime as dt
import random
import tempfile

from pyspark.sql import functions as F

from flink_tpcds_spark.streaming.countwin import StreamingCountWindows

T0 = dt.datetime(2026, 1, 1)
DDL = "user_id long, ts timestamp, event_id long, value double"


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), e, v) for u, m, e, v in rows],
        DDL,
    )


def _batch_windows(rows, n):
    by = {}
    for u, m, e, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by.setdefault(u, []).append((m, e, v))
    out = []
    for u, rs in by.items():
        for k in range(len(rs) // n):
            grp = rs[k * n : (k + 1) * n]
            out.append(
                (
                    u,
                    k,
                    n,
                    round(sum(round(v * 1e6) for _, _, v in grp) / 1e6, 6),
                    grp[0][0],
                    grp[-1][0],
                )
            )
    return sorted(out)


def _collect(m, spark):
    return sorted(
        (
            r.user_id,
            r.win,
            r.cnt,
            round(r.total, 6),
            int((r.start_ts - T0).total_seconds() // 60),
            int((r.end_ts - T0).total_seconds() // 60),
        )
        for r in m.windows(spark).collect()
    )


def test_streaming_equals_batch_random_splits(spark):
    rnd = random.Random(11)
    rows = []
    eid = 0
    for u in range(5):
        t = 0
        for _ in range(rnd.randint(3, 30)):
            t += rnd.randint(1, 60)
            rows.append((u, t, eid, round(rnd.uniform(0, 100), 2)))
            eid += 1
    rows.sort(key=lambda r: r[1])
    for trial in range(3):
        rnd2 = random.Random(trial)
        cuts = sorted(rnd2.sample(range(1, len(rows)), 3))
        batches, lo = [], 0
        for c in cuts + [len(rows)]:
            batches.append(rows[lo:c])
            lo = c
        work = tempfile.mkdtemp(prefix="st_cw_")
        m = StreamingCountWindows(
            work + "/s", 4, dt.timedelta(minutes=5)
        )
        for i, b in enumerate(batches):
            m.foreach_batch(_mk(spark, b), i)
            if trial == 1 and i == 0:
                m.foreach_batch(_mk(spark, b), i)  # replay no-op
        m.flush(spark)
        assert _collect(m, spark) == _batch_windows(rows, 4), trial
        assert m.late_dropped() == 0


def test_partials_never_fire_and_are_reported(spark):
    rows = [(1, i, i, 1.0) for i in range(7)]  # N=5 -> 1 win + 2 left
    work = tempfile.mkdtemp(prefix="st_cwp_")
    m = StreamingCountWindows(work + "/s", 5, dt.timedelta(minutes=1))
    m.foreach_batch(_mk(spark, rows), 0)
    m.flush(spark)
    assert [r.win for r in m.windows(spark).collect()] == [0]
    res = m.residuals(spark).collect()
    assert [(r.win, r.cnt) for r in res] == [(1, 2)]


def test_late_rows_dropped(spark):
    work = tempfile.mkdtemp(prefix="st_cwl_")
    m = StreamingCountWindows(work + "/s", 2, dt.timedelta(minutes=1))
    m.foreach_batch(_mk(spark, [(1, 0, 0, 1.0), (1, 100, 1, 1.0)]), 0)
    m.foreach_batch(_mk(spark, [(1, 50, 2, 9.0)]), 1)  # late: 50 < 99
    m.flush(spark)
    got = _collect(m, spark)
    assert got == [(1, 0, 2, 2.0, 0, 100)]
    assert m.late_dropped() == 1


def test_untouched_keys_pass_through(spark):
    work = tempfile.mkdtemp(prefix="st_cwu_")
    m = StreamingCountWindows(work + "/s", 3, dt.timedelta(minutes=1))
    m.foreach_batch(
        _mk(spark, [(1, 0, 0, 1.0), (2, 0, 1, 2.0)]), 0
    )
    s0 = sorted(
        map(
            tuple,
            m._state(spark)
            .filter(F.col("user_id") == 2)
            .collect(),
        )
    )
    # batch touching only key 1, watermark unmoved for key 2's region
    m.foreach_batch(_mk(spark, [(1, 1, 2, 1.0)]), 1)
    s1 = sorted(
        map(
            tuple,
            m._state(spark)
            .filter(F.col("user_id") == 2)
            .collect(),
        )
    )
    assert s0 == s1


def _batch_sliding(rows, n, slide):
    by = {}
    for u, m, e, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by.setdefault(u, []).append((m, e, v))
    out = []
    for u, rs in by.items():
        k = 0
        while k * slide + n <= len(rs):
            grp = rs[k * slide : k * slide + n]
            out.append(
                (
                    u,
                    k,
                    n,
                    round(sum(round(v * 1e6) for _, _, v in grp) / 1e6, 6),
                    grp[0][0],
                    grp[-1][0],
                )
            )
            k += 1
    return sorted(out)


def test_sliding_equals_batch_random_splits(spark):
    rnd = random.Random(23)
    rows = []
    eid = 0
    for u in range(4):
        t = 0
        for _ in range(rnd.randint(4, 25)):
            t += rnd.randint(1, 60)
            rows.append((u, t, eid, round(rnd.uniform(0, 50), 2)))
            eid += 1
    rows.sort(key=lambda r: r[1])
    for trial in range(2):
        rnd2 = random.Random(100 + trial)
        cuts = sorted(rnd2.sample(range(1, len(rows)), 3))
        batches, lo = [], 0
        for c in cuts + [len(rows)]:
            batches.append(rows[lo:c])
            lo = c
        work = tempfile.mkdtemp(prefix="st_cws_")
        m = StreamingCountWindows(
            work + "/s", 4, dt.timedelta(minutes=5), slide=2
        )
        for i, b in enumerate(batches):
            m.foreach_batch(_mk(spark, b), i)
            if trial == 0 and i == 1:
                m.foreach_batch(_mk(spark, b), i)  # replay no-op
        m.flush(spark)
        assert _collect(m, spark) == _batch_sliding(rows, 4, 2), trial


def test_sliding_open_partials_bounded(spark):
    # n=6, slide=2 -> at most ceil(6/2)=3 open partials per key
    rows = [(1, i, i, 1.0) for i in range(20)]
    work = tempfile.mkdtemp(prefix="st_cwb_")
    m = StreamingCountWindows(
        work + "/s", 6, dt.timedelta(minutes=1), slide=2
    )
    m.foreach_batch(_mk(spark, rows), 0)
    m.flush(spark)
    res = m.residuals(spark).collect()
    assert len(res) <= 3
    # every row is in 3 windows except edges; totals are window size
    wins = m.windows(spark).collect()
    assert all(r.cnt == 6 and abs(r.total - 6.0) < 1e-9 for r in wins)
