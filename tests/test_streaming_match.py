"""StreamingMatchRecognize (streaming/match.py): watermark-driven
V-shape CEP must converge, after flush, to EXACTLY the batch
``match_v_shapes`` output over the on-time rows — under in-order
delivery, bounded disorder, micro-batch replays, and late data."""

from __future__ import annotations

import datetime as dt
import random
import tempfile

from pyspark.sql import functions as F

from flink_tpcds_spark.operators.match_recognize import match_v_shapes
from flink_tpcds_spark.streaming.match import StreamingMatchRecognize

T0 = dt.datetime(2026, 1, 1)
ROWS_DDL = "user_id long, ts timestamp, event_id long, value double"


def _mk_rows(series: dict[int, list[float]]):
    """{user_id: [values...]} → rows with ts = T0 + i minutes."""
    rows = []
    for uid, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (uid, T0 + dt.timedelta(minutes=i), 1000 * uid + i, float(v))
            )
    return rows


def _drive(spark, rows, n_batches, lateness_min=5, order_key=None, seed=0):
    """Feed rows to the matcher in n_batches chunks of the given
    arrival order; flush; return (matcher, matches-as-set)."""
    work = tempfile.mkdtemp(prefix="st_match_")
    m = StreamingMatchRecognize(
        work + "/state", dt.timedelta(minutes=lateness_min)
    )
    arr = sorted(rows, key=lambda r: (r[1], r[2]))  # arrival = event time
    if order_key == "shuffle-bounded":
        # bounded disorder: perturb arrival by < lateness positions
        rnd = random.Random(seed)
        arr.sort(key=lambda r: (r[1], rnd.uniform(-2, 2)))
    step = max(1, (len(arr) + n_batches - 1) // n_batches)
    for b, i in enumerate(range(0, len(arr), step)):
        m.foreach_batch(
            spark.createDataFrame(arr[i : i + step], ROWS_DDL), b
        )
    m.flush(spark)
    got = {
        tuple(r)
        for r in m.matches(spark)
        .select(
            "user_id",
            "start_ts",
            "bottom_ts",
            "end_ts",
            "start_value",
            "bottom_value",
            "end_value",
            "down_rows",
            "up_rows",
        )
        .collect()
    }
    return m, got


def _batch_oracle(spark, rows):
    df = spark.createDataFrame(rows, ROWS_DDL)
    return {
        tuple(r)
        for r in match_v_shapes(df, "user_id", ["ts", "event_id"], "value")
        .select(
            "user_id",
            "start_ts",
            "bottom_ts",
            "end_ts",
            "start_value",
            "bottom_value",
            "end_value",
            "down_rows",
            "up_rows",
        )
        .collect()
    }


def test_in_order_equals_batch(spark):
    rows = _mk_rows(
        {
            1: [5, 4, 3, 4, 5, 2, 1, 3],  # two V-shapes
            2: [1, 2, 3, 4],  # monotone up: no match
            3: [4, 3, 2, 1],  # monotone down: no match
            4: [3, 3, 3],  # flat: no match
            5: [5, 1, 5, 1, 5],  # nested Vs
        }
    )
    _, got = _drive(spark, rows, n_batches=4)
    assert got == _batch_oracle(spark, rows)
    assert len(got) >= 3


def test_single_batch_then_flush(spark):
    rows = _mk_rows({7: [9, 7, 8, 6, 7, 7, 5, 9]})
    _, got = _drive(spark, rows, n_batches=1)
    assert got == _batch_oracle(spark, rows)


def test_bounded_disorder_equals_batch(spark):
    rows = _mk_rows(
        {
            1: [5, 4, 3, 4, 5, 2, 1, 3, 2, 4, 6, 1, 2],
            2: [2, 1, 2, 1, 2, 1, 2],
            3: [1, 5, 2, 6, 3, 7, 4],
        }
    )
    _, got = _drive(
        spark, rows, n_batches=5, order_key="shuffle-bounded", seed=3
    )
    assert got == _batch_oracle(spark, rows)


def test_replay_is_idempotent(spark):
    rows = _mk_rows({1: [5, 4, 3, 4, 5, 2, 1, 3]})
    work = tempfile.mkdtemp(prefix="st_match_")
    m = StreamingMatchRecognize(work + "/state", dt.timedelta(minutes=5))
    df1 = spark.createDataFrame(rows[:4], ROWS_DDL)
    df2 = spark.createDataFrame(rows[4:], ROWS_DDL)
    m.foreach_batch(df1, 0)
    m.foreach_batch(df1, 0)  # at-least-once replay: must be a no-op
    m.foreach_batch(df2, 1)
    m.foreach_batch(df2, 1)
    m.flush(spark)
    got = {tuple(r) for r in m.matches(spark).collect()}
    assert got == {
        tuple(r)
        for r in match_v_shapes(
            spark.createDataFrame(rows, ROWS_DDL),
            "user_id",
            ["ts", "event_id"],
            "value",
        ).collect()
    }


def test_late_rows_dropped_and_counted(spark):
    on_time = _mk_rows({1: [5, 4, 3, 4, 5]})
    work = tempfile.mkdtemp(prefix="st_match_")
    m = StreamingMatchRecognize(work + "/state", dt.timedelta(minutes=1))
    m.foreach_batch(spark.createDataFrame(on_time, ROWS_DDL), 0)
    # watermark is now max(ts) - 1min; a row far in the past is late
    late = [(1, T0 - dt.timedelta(hours=1), 999, 100.0)]
    m.foreach_batch(spark.createDataFrame(late, ROWS_DDL), 1)
    m.flush(spark)
    assert m.late_dropped() == 1
    got = {tuple(r) for r in m.matches(spark).collect()}
    assert got == _batch_oracle(spark, on_time)  # late row contributed 0


def test_monotone_key_state_stays_bounded(spark):
    """A strictly increasing series never matches; pending state must
    hold only the mutable (≥ watermark) region + anchor, not the
    whole history — the O(lateness) bound that matters at scale."""
    rows = _mk_rows({1: list(range(200))})
    work = tempfile.mkdtemp(prefix="st_match_")
    m = StreamingMatchRecognize(work + "/state", dt.timedelta(minutes=3))
    for b, i in enumerate(range(0, 200, 25)):
        m.foreach_batch(
            spark.createDataFrame(rows[i : i + 25], ROWS_DDL), b
        )
        pend = (
            m._state(spark).filter(F.col("kind") == "pending").count()
        )
        assert pend <= 3 + 2 + 25, f"batch {b}: pending={pend}"
    m.flush(spark)
    assert m.matches(spark).count() == 0


def test_randomized_equivalence(spark):
    rnd = random.Random(42)
    series = {
        uid: [rnd.randint(0, 6) for _ in range(rnd.randint(5, 40))]
        for uid in range(1, 9)
    }
    rows = _mk_rows(series)
    for n_batches, seed in ((3, 1), (7, 2)):
        _, got = _drive(
            spark,
            rows,
            n_batches=n_batches,
            order_key="shuffle-bounded",
            seed=seed,
        )
        assert got == _batch_oracle(spark, rows), (n_batches, seed)


def test_property_streaming_equals_batch(spark):
    """Model-based property test: random multi-key integer series,
    random batch split points, random lateness — after flush the
    streaming matcher must equal the batch matcher on the on-time
    rows (arrival is event-time ordered, so everything is on time)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        series=st.dictionaries(
            st.integers(1, 4),
            st.lists(st.integers(0, 4), min_size=2, max_size=25),
            min_size=1,
            max_size=4,
        ),
        n_batches=st.integers(1, 6),
        lateness=st.integers(1, 8),
    )
    def run(series, n_batches, lateness):
        rows = _mk_rows(series)
        _, got = _drive(
            spark, rows, n_batches=n_batches, lateness_min=lateness
        )
        assert got == _batch_oracle(spark, rows)

    run()


def test_untouched_keys_pass_through(spark):
    """Touched-key isolation (same contract as StreamingCep): a batch
    touching only key 1 leaves key 2's pending state rows verbatim,
    and the final result stays exact."""
    rows1 = _mk_rows({1: [5, 4, 3, 4, 5]})
    rows2 = _mk_rows({2: [3, 2, 3, 2, 3]})
    work = tempfile.mkdtemp(prefix="st_match_")
    m = StreamingMatchRecognize(work + "/state", dt.timedelta(minutes=2))
    m.foreach_batch(spark.createDataFrame(rows1 + rows2, ROWS_DDL), 0)
    key2 = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in m._state(spark)
        .filter((F.col("kind") == "pending") & (F.col("user_id") == 2))
        .collect()
    )
    before = key2()
    extra1 = [(1, T0 + dt.timedelta(minutes=4), 1999, 5.0)]
    m.foreach_batch(spark.createDataFrame(extra1, ROWS_DDL), 1)
    after = key2()
    assert after == before and len(after) > 0
    m.flush(spark)
    got = {tuple(r) for r in m.matches(spark).collect()}
    want = _batch_oracle(spark, rows1 + rows2 + extra1)
    assert got == want
